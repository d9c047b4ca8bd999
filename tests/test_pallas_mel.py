"""Fused Pallas mel kernel vs the numpy oracle (interpret mode on CPU;
the same kernel compiles to Mosaic on TPU — exercised by bench/CLI)."""
import numpy as np

from emotiongestures_tpu.ops import mel as M
from emotiongestures_tpu.ops.pallas_mel import (
    extract_melspectrogram_pallas,
    melspectrogram_pallas,
)


def test_pallas_mel_matches_oracle(rng):
    y = rng.randn(16000).astype(np.float32)
    ref = M._melspectrogram_np(y)
    got = np.asarray(melspectrogram_pallas(y, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-3)


def test_pallas_mel_nonaligned_frames(rng):
    """124-frame output (not a block multiple) must be exact too."""
    y = rng.randn(64000).astype(np.float32)
    ref = M._melspectrogram_np(y)
    got = np.asarray(melspectrogram_pallas(y, interpret=True))
    assert got.shape == ref.shape  # 126 frames at 64000 samples
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-3)


def test_pallas_batched_matches_oracle(rng):
    from emotiongestures_tpu.ops.pallas_mel import (
        batched_melspectrogram_pallas,
    )

    y = rng.randn(3, 32000).astype(np.float32)
    got = np.asarray(batched_melspectrogram_pallas(y, interpret=True))
    for b in range(3):
        ref = M._melspectrogram_np(y[b])
        np.testing.assert_allclose(got[b], ref, rtol=2e-3, atol=1e-3)


def test_pallas_full_pipeline(rng):
    y = rng.randn(32000).astype(np.float32)
    spec = np.asarray(extract_melspectrogram_pallas(y, interpret=True))
    ref = np.asarray(M.extract_melspectrogram(y, use_mxu=False))
    assert spec.dtype == np.float16
    np.testing.assert_allclose(spec.astype(np.float32),
                               ref.astype(np.float32), atol=0.1)
