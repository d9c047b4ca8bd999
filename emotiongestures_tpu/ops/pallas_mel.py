"""Fused Pallas mel-spectrogram kernel (SURVEY.md §7: "Pallas where the
MXU/VPU wins: fused STFT + mel filterbank + log kernel").

One kernel invocation per 128-frame block computes, entirely in VMEM:

    windowed = frames * hann            (VPU)
    re = windowed @ DFT_cos             (MXU, 1024 x 640)
    im = windowed @ DFT_sin             (MXU)
    power = re^2 + im^2                 (VPU)
    mel = power @ FB^T                  (MXU, 640 x 128)

The 513 rFFT bins are zero-padded to 640 (a lane multiple) so every
matmul is tile-aligned; the padded bins carry zero filterbank weight so
the result is exact. The final log10/ref-max normalisation needs a
global max, so it stays outside (one cheap XLA reduction).

VMEM budget per block: frames 128x1024 (0.5 MB) + two DFT operands
1024x640 (2.6 MB each) + FB 640x128 (0.3 MB) + intermediates ~ 6.9 MB
< 16 MB.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mel import HOP, N_FFT, N_MELS, SR, _dft_matrices, _hann_periodic, \
    mel_filterbank

FRAME_BLOCK = 128
PADDED_BINS = 640  # 513 rFFT bins rounded up to a multiple of 128


@functools.lru_cache(maxsize=4)
def _padded_operands(sr: int, n_fft: int, n_mels: int):
    cos_m, sin_m = _dft_matrices(n_fft)  # (n_fft, n_bins)
    n_bins = cos_m.shape[1]
    cos_p = np.zeros((n_fft, PADDED_BINS), np.float32)
    sin_p = np.zeros((n_fft, PADDED_BINS), np.float32)
    cos_p[:, :n_bins] = cos_m
    sin_p[:, :n_bins] = sin_m
    fb = np.zeros((PADDED_BINS, n_mels), np.float32)
    fb[:n_bins, :] = mel_filterbank(sr, n_fft, n_mels).T.astype(np.float32)
    win = _hann_periodic(n_fft).astype(np.float32)
    return cos_p, sin_p, fb, win


def _mel_kernel(frames_ref, win_ref, cos_ref, sin_ref, fb_ref, out_ref):
    x = frames_ref[:] * win_ref[:]  # (BLK, n_fft) * (1, n_fft) broadcast
    re = jnp.dot(x, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(x, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    out_ref[:] = jnp.dot(power, fb_ref[:],
                         preferred_element_type=jnp.float32)


def melspectrogram_pallas(
    y: jnp.ndarray,
    sr: int = SR,
    n_fft: int = N_FFT,
    hop: int = HOP,
    n_mels: int = N_MELS,
    center: bool = True,
    pad_mode: str = "reflect",
    interpret: bool = False,
) -> jnp.ndarray:
    """Power mel spectrogram (n_mels, n_frames) via the fused kernel.
    Matches ops.mel.melspectrogram_mxu numerically (same math, fused)."""
    from .mel import _frame_jax

    frames = _frame_jax(y.astype(jnp.float32), n_fft, hop, center, pad_mode)
    n_frames = frames.shape[0]
    n_blocks = pl.cdiv(n_frames, FRAME_BLOCK)
    padded_T = n_blocks * FRAME_BLOCK
    if padded_T != n_frames:
        frames = jnp.pad(frames, ((0, padded_T - n_frames), (0, 0)))

    cos_p, sin_p, fb, win = _padded_operands(sr, n_fft, n_mels)

    out = pl.pallas_call(
        _mel_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((FRAME_BLOCK, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, PADDED_BINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, PADDED_BINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PADDED_BINS, n_mels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FRAME_BLOCK, n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_T, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded_T * n_fft * PADDED_BINS * 2
            + 2 * padded_T * PADDED_BINS * n_mels,
            bytes_accessed=4 * (padded_T * n_fft + 2 * n_fft * PADDED_BINS
                                + PADDED_BINS * n_mels
                                + padded_T * n_mels),
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames, jnp.asarray(win)[None, :], jnp.asarray(cos_p),
      jnp.asarray(sin_p), jnp.asarray(fb))
    return out[:n_frames].T  # (n_mels, n_frames)


def batched_melspectrogram_pallas(
    waves: jnp.ndarray,
    sr: int = SR,
    n_fft: int = N_FFT,
    hop: int = HOP,
    n_mels: int = N_MELS,
    center: bool = True,
    pad_mode: str = "reflect",
    interpret: bool = False,
) -> jnp.ndarray:
    """Batch-native fused kernel: (B, n) waves -> (B, n_mels, n_frames).

    All clips' frames are flattened into ONE frame axis before the kernel,
    so the DFT/filterbank operands (index_map constant across the grid)
    are fetched into VMEM once and stay resident — unlike vmapping the
    single-clip kernel, which would re-fetch ~5.5 MB per clip."""
    from .mel import _frame_jax

    B = waves.shape[0]
    frames = jax.vmap(
        lambda y: _frame_jax(y.astype(jnp.float32), n_fft, hop, center,
                             pad_mode))(waves)
    n_frames = frames.shape[1]
    flat = frames.reshape(B * n_frames, n_fft)
    n_blocks = pl.cdiv(flat.shape[0], FRAME_BLOCK)
    padded_T = n_blocks * FRAME_BLOCK
    if padded_T != flat.shape[0]:
        flat = jnp.pad(flat, ((0, padded_T - flat.shape[0]), (0, 0)))

    cos_p, sin_p, fb, win = _padded_operands(sr, n_fft, n_mels)
    out = pl.pallas_call(
        _mel_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((FRAME_BLOCK, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, PADDED_BINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, PADDED_BINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PADDED_BINS, n_mels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FRAME_BLOCK, n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_T, n_mels), jnp.float32),
        interpret=interpret,
    )(flat, jnp.asarray(win)[None, :], jnp.asarray(cos_p),
      jnp.asarray(sin_p), jnp.asarray(fb))
    out = out[: B * n_frames].reshape(B, n_frames, n_mels)
    return jnp.transpose(out, (0, 2, 1))


def extract_melspectrogram_pallas(y, sr: int = SR, interpret: bool = False):
    """Full reference pipeline on the fused kernel: power mel ->
    power_to_db(ref=max) -> float16 (utils/train_utils_BEAT.py:186-190)."""
    from .mel import power_to_db

    mel = melspectrogram_pallas(jnp.asarray(y), sr=sr, interpret=interpret)
    return power_to_db(mel).astype(jnp.float16)
