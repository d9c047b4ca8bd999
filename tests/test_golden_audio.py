"""Cross-library golden validation of the mel/onset frontend
(VERDICT round-1 item 4: the round-1 parity proof was circular — our XLA
paths were tested only against our own numpy oracle).

Real librosa cannot run in this image (zero egress; librosa/numba/
torchaudio absent), so the strongest available validation stack is:

  * torch.stft (independent C++ implementation, librosa conventions:
    periodic hann, center=True, reflect pad, onesided) pins the framing/
    window/FFT/power machinery at float64 — committed as
    tests/fixtures/audio_golden.npz;
  * scipy.signal.get_window independently pins the window;
  * the Slaney filterbank formula (the librosa DEFINITION,
    librosa.filters.mel(htk=False, norm='slaney')) is property-tested:
    unit triangle area under slaney normalisation, peak placement at the
    mel center frequencies, contiguous support;
  * the onset stack (model/Beat_score_v2.py:58-76 semantics) is
    behaviorally tested on a click train with KNOWN onset times.

Reference parity targets: utils/train_utils_BEAT.py:186-195 (mel) and
model/Beat_score_v2.py:58-76 (onsets).
"""
from pathlib import Path

import numpy as np
import pytest

from emotiongestures_tpu.eval import beat as B
from emotiongestures_tpu.ops import mel as M

FIXTURES = Path(__file__).parent / "fixtures"
GOLDEN = np.load(FIXTURES / "audio_golden.npz")


def _waves():
    import sys

    sys.path.insert(0, str(FIXTURES))
    try:
        from make_audio_fixtures import make_waves
    finally:
        sys.path.remove(str(FIXTURES))
    return make_waves()


WAVES = _waves()


def test_wave_regeneration_matches_committed_fixture():
    """Guards against silent drift between the generator script and the
    committed npz."""
    for name in ("noise", "clicks", "chirp"):
        np.testing.assert_allclose(
            WAVES[name].astype(np.float32), GOLDEN[f"wave_{name}"],
            rtol=0, atol=0)


def test_hann_window_matches_scipy():
    from scipy.signal import get_window

    ours = M._hann_periodic(1024)
    ref = get_window("hann", 1024, fftbins=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("name", ["noise", "clicks", "chirp"])
@pytest.mark.parametrize("n_fft,tag", [(1024, "mel1024"), (2048, "mel2048")])
def test_numpy_oracle_matches_torch_stft_golden(name, n_fft, tag):
    """The fp64 numpy oracle must agree with the independent torch.stft
    pipeline to near machine precision — this is the cross-library check
    that breaks the round-1 circularity."""
    mel = M._melspectrogram_np(WAVES[name], sr=16000, n_fft=n_fft, hop=512,
                               n_mels=128)
    ref = GOLDEN[f"{tag}_{name}"]
    assert mel.shape == ref.shape
    np.testing.assert_allclose(mel, ref, rtol=1e-9, atol=1e-13)


@pytest.mark.parametrize("name", ["noise", "chirp"])
def test_power_to_db_matches_golden(name):
    got = M._power_to_db_np(GOLDEN[f"mel1024_{name}"])
    np.testing.assert_allclose(got, GOLDEN[f"mel1024db_{name}"],
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("name", ["noise", "clicks", "chirp"])
def test_xla_mel_matches_golden(name):
    got = np.asarray(M.melspectrogram(WAVES[name].astype(np.float32)))
    ref = GOLDEN[f"mel1024_{name}"]
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("name", ["noise", "clicks", "chirp"])
def test_mxu_mel_matches_golden(name):
    got = np.asarray(M.melspectrogram_mxu(WAVES[name].astype(np.float32)))
    ref = GOLDEN[f"mel1024_{name}"]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-3)


def test_full_log_mel_pipeline_matches_golden_db():
    """extract_melspectrogram (float16 output) vs fp64 golden dB within
    half-precision quantisation + fp32 accumulation tolerance."""
    got = np.asarray(
        M.extract_melspectrogram(WAVES["chirp"].astype(np.float32)),
        dtype=np.float64)
    ref = GOLDEN["mel1024db_chirp"]
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 0.1  # dB


def test_filterbank_slaney_properties():
    """Independent checks of the filterbank FORMULA (the part torch cannot
    cross-validate): slaney normalisation makes each triangle integrate to
    ~1 over Hz, peaks sit at the mel center frequencies, support is
    contiguous and covers (fmin, fmax)."""
    sr, n_fft, n_mels = 16000, 1024, 128
    fb = M.mel_filterbank(sr, n_fft, n_mels)
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    df = fftfreqs[1] - fftfreqs[0]
    mel_f = M._mel_to_hz_slaney(
        np.linspace(M._hz_to_mel_slaney(0.0),
                    M._hz_to_mel_slaney(sr / 2.0), n_mels + 2))
    # unit area: sum(w)*df ~ 1 once the triangle spans >> one fft bin
    areas = fb.sum(axis=1) * df
    wide = (mel_f[2:] - mel_f[:-2]) > 8 * df
    assert wide.sum() > 40  # the upper (log-spaced) filters
    np.testing.assert_allclose(areas[wide], 1.0, rtol=0.08)
    # peak placement: argmax bin within one bin of the center frequency
    peak_bins = fb.argmax(axis=1)
    centers = mel_f[1:-1]
    assert np.all(np.abs(fftfreqs[peak_bins] - centers) <= df + 1e-9)
    # contiguous support
    for row in fb:
        nz = np.flatnonzero(row > 0)
        assert len(nz) > 0 and (np.diff(nz) == 1).all()


def test_onset_detect_finds_click_train():
    """Behavioral onset parity (model/Beat_score_v2.py:58-76 stack): every
    click in the fixture must be detected within 2 hops (64 ms) and no
    spurious onsets far from any click."""
    y = WAVES["clicks"]
    truth = GOLDEN["click_times"]
    env = B.onset_strength(y)
    det = B.onset_detect(env)
    det_t = B.frames_to_time(det)
    tol = 2 * 512 / 16000  # 64 ms
    for t in truth:
        assert np.min(np.abs(det_t - t)) <= tol, (t, det_t)
    for t in det_t:
        assert np.min(np.abs(truth - t)) <= tol, (t, truth)


def test_onset_backtrack_rolls_to_preceding_minimum():
    y = WAVES["clicks"]
    env = B.onset_strength(y)
    det = B.onset_detect(env)
    bt = B.onset_backtrack(det, env)
    assert len(bt) == len(det)
    assert np.all(bt <= det)
    # each backtracked frame is a local minimum of the envelope (or 0)
    for f in bt:
        if 0 < f < len(env) - 1:
            assert env[f] <= env[f - 1] and env[f] < env[f + 1]


def test_stft_rms_matches_torch_oracle():
    """Frame RMS via our numpy STFT vs the torch.stft power pipeline."""
    import torch

    y = WAVES["chirp"]
    spec = torch.stft(
        torch.tensor(y), n_fft=2048, hop_length=512,
        window=torch.hann_window(2048, periodic=True, dtype=torch.float64),
        center=True, pad_mode="reflect", return_complex=True)
    power = (spec.abs() ** 2).numpy()  # (n_bins, T)
    power[0] *= 0.5
    power[-1] *= 0.5
    ref = np.sqrt(2.0 * power.sum(axis=0) / 2048**2)
    got = B.stft_rms(y)
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-14)


def _speechlike(rng_seed=7, n=64000):
    """Broadband noise with syllable-rate (4 Hz) amplitude bursts — the
    spectral character of the BEAT domain (speech)."""
    r = np.random.RandomState(rng_seed)
    t = np.arange(n) / 16000
    envelope = np.clip(np.sin(2 * np.pi * 4.0 * t), 0, None) ** 2
    return (r.randn(n) * (0.05 + envelope)).astype(np.float64)


def test_device_onset_frontend_matches_host_broadband():
    """batched_onset_frontend (one jitted TPU/XLA pass for all clips) must
    reproduce the host numpy onset_strength/stft_rms for BROADBAND
    signals (the speech domain) with IDENTICAL detected onsets. Pure
    tones are excluded by design: their true mel power sits below the
    fp32 noise floor (see the function's precision note — real librosa is
    fp32 there too)."""
    waves = np.stack([WAVES["clicks"], WAVES["noise"],
                      _speechlike()]).astype(np.float32)
    envs, rmss = B.batched_onset_frontend(waves)
    for i, name in enumerate(("clicks", "noise", "speechlike")):
        env_host = B.onset_strength(waves[i].astype(np.float64))
        rms_host = B.stft_rms(waves[i].astype(np.float64))
        assert envs[i].shape == env_host.shape
        peak = env_host.max()
        assert np.abs(envs[i] - env_host).max() < 0.03 * peak, name
        np.testing.assert_allclose(rmss[i], rms_host, rtol=5e-3, atol=1e-5)
        np.testing.assert_array_equal(
            B.onset_detect(envs[i]), B.onset_detect(env_host),
            err_msg=name)


def test_score_batch_device_frontend_matches_host(rng):
    poses = rng.randn(3, 60, 282).astype(np.float64).cumsum(axis=1) * 0.01
    waves = np.stack([WAVES["clicks"], WAVES["noise"], _speechlike(11)])
    al = B.BeatAligner()
    host = al.score_batch(waves, poses)
    dev = al.score_batch(waves, poses, device_frontend=True)
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6)
