"""Mel-spectrogram frontend, librosa-compatible, TPU-native.

Reproduces `utils/train_utils_BEAT.py:186-195` of the reference:
    melspec = librosa.feature.melspectrogram(y, sr=16000, n_fft=1024,
                                             hop_length=512, power=2)
    log_melspec = librosa.power_to_db(melspec, ref=np.max).astype(float16)
and the length formula (n/fps*16000 - 1024)/512 + 1.

Three implementations:
  * `_melspectrogram_np`  — pure-numpy oracle (golden reference in tests);
  * `melspectrogram`      — JAX/XLA path: strided framing + rfft + two
                             matmuls; jit/vmap/grad-compatible;
  * `melspectrogram_mxu`  — matmul-DFT formulation: the rFFT of a 1024-pt
                             frame is expressed as frames @ DFT_cos and
                             frames @ DFT_sin, putting the entire frontend
                             (window, DFT, power, mel, dB) on the MXU as a
                             chain of GEMMs that XLA fuses; preferred under
                             jit on TPU where it outperforms the generic
                             FFT lowering at this size.

librosa defaults assumed: hann (periodic) window, center=True with
'reflect' padding (librosa <0.10, the reference's era — requirements.txt
pins no version but pyarrow 0.14/lmdb 0.96 date it to librosa 0.8.x),
slaney-scale slaney-normalised mel filterbank, fmin=0, fmax=sr/2.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
N_FFT = 1024
HOP = 512
N_MELS = 128


# ---------------------------------------------------------------------------
# mel filterbank (host-side, cached; consumed by both numpy and JAX paths)
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int = SR,
    n_fft: int = N_FFT,
    n_mels: int = N_MELS,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-normalised triangular mel filterbank, shape (n_mels, 1+n_fft//2),
    matching librosa.filters.mel(htk=False, norm='slaney')."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0, sr / 2.0, n_bins)
    mel_min = _hz_to_mel_slaney(fmin)
    mel_max = _hz_to_mel_slaney(fmax)
    mel_f = _mel_to_hz_slaney(np.linspace(mel_min, mel_max, n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float64)


def _hann_periodic(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------


def _frame_np(y: np.ndarray, n_fft: int, hop: int, center: bool,
              pad_mode: str) -> np.ndarray:
    if center:
        y = np.pad(y, n_fft // 2, mode=pad_mode)
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[idx]


def _melspectrogram_np(
    y: np.ndarray,
    sr: int = SR,
    n_fft: int = N_FFT,
    hop: int = HOP,
    n_mels: int = N_MELS,
    center: bool = True,
    pad_mode: str = "reflect",
) -> np.ndarray:
    """Pure-numpy oracle; returns (n_mels, n_frames) power mel spectrogram."""
    frames = _frame_np(np.asarray(y, np.float64), n_fft, hop, center, pad_mode)
    win = _hann_periodic(n_fft)
    spec = np.fft.rfft(frames * win, axis=-1)
    power = np.abs(spec) ** 2  # (T, n_bins)
    return mel_filterbank(sr, n_fft, n_mels) @ power.T


def _power_to_db_np(S, ref=None, amin=1e-10, top_db=80.0):
    S = np.asarray(S, dtype=np.float64)
    ref_value = np.max(S) if ref is None else ref
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


# ---------------------------------------------------------------------------
# JAX paths
# ---------------------------------------------------------------------------


def _frame_jax(y: jnp.ndarray, n_fft: int, hop: int, center: bool,
               pad_mode: str) -> jnp.ndarray:
    if center:
        y = jnp.pad(y, n_fft // 2, mode=pad_mode)
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    starts = hop * jnp.arange(n_frames)
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return y[idx]


def power_to_db(S: jnp.ndarray, amin: float = 1e-10,
                top_db: float = 80.0) -> jnp.ndarray:
    """librosa.power_to_db with ref=np.max semantics, per spectrogram."""
    ref = jnp.max(S)
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def melspectrogram(
    y: jnp.ndarray,
    sr: int = SR,
    n_fft: int = N_FFT,
    hop: int = HOP,
    n_mels: int = N_MELS,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """XLA path: framing + rfft + filterbank matmul. (n_mels, n_frames)."""
    frames = _frame_jax(y.astype(jnp.float32), n_fft, hop, center, pad_mode)
    win = jnp.asarray(_hann_periodic(n_fft), dtype=jnp.float32)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels), dtype=jnp.float32)
    return fb @ power.T


@functools.lru_cache(maxsize=4)
def _dft_matrices(n_fft: int):
    """Real DFT as two (n_fft, 1+n_fft//2) matmul operands for the MXU."""
    n_bins = 1 + n_fft // 2
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def melspectrogram_mxu(
    y: jnp.ndarray,
    sr: int = SR,
    n_fft: int = N_FFT,
    hop: int = HOP,
    n_mels: int = N_MELS,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Matmul-DFT formulation: windowed frames hit two DFT GEMMs, power
    spectra hit the filterbank GEMM — all MXU work, fused by XLA.
    Returns (n_mels, n_frames) power mel spectrogram."""
    frames = _frame_jax(y.astype(jnp.float32), n_fft, hop, center, pad_mode)
    win = jnp.asarray(_hann_periodic(n_fft), dtype=jnp.float32)
    frames = frames * win
    cos_m, sin_m = _dft_matrices(n_fft)
    re = frames @ jnp.asarray(cos_m)
    im = frames @ jnp.asarray(sin_m)
    power = re * re + im * im  # (T, n_bins)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels), dtype=jnp.float32)
    return (power @ fb.T).T


def extract_melspectrogram(y, sr: int = SR, use_mxu: bool = True):
    """Full reference pipeline (utils/train_utils_BEAT.py:186-190):
    power mel -> power_to_db(ref=max) -> float16. Accepts a single wave
    (n,) and returns (n_mels, n_frames)."""
    fn = melspectrogram_mxu if use_mxu else melspectrogram
    mel = fn(jnp.asarray(y), sr=sr)
    return power_to_db(mel).astype(jnp.float16)


def batched_log_melspectrogram(waves: jnp.ndarray, sr: int = SR):
    """vmapped batch frontend: (B, n) waves -> (B, n_mels, n_frames) log-mel,
    float32 (cast at the consumer boundary if float16 parity is needed)."""
    def one(w):
        return power_to_db(melspectrogram_mxu(w, sr=sr))

    return jax.vmap(one)(waves)


# ---------------------------------------------------------------------------
# length / padding helpers (utils/train_utils_BEAT.py:193-226)
# ---------------------------------------------------------------------------


def calc_spectrogram_length_from_motion_length(n_frames: int, fps: int) -> int:
    return int(round((n_frames / fps * SR - N_FFT) / HOP + 1))


def make_audio_fixed_length(audio: np.ndarray, expected_len: int) -> np.ndarray:
    n_padding = expected_len - len(audio)
    if n_padding > 0:
        audio = np.pad(audio, (0, n_padding), mode="symmetric")
    else:
        audio = audio[:expected_len]
    return audio
