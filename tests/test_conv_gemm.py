"""Parity of the GEMM conv formulations (ops/conv_gemm.py) against
lax.conv_general_dilated — the serving SoL stage-3 experiment's
correctness gate (VERDICT r4 item 5; BASELINE.md records the race)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotiongestures_tpu.ops.conv_gemm import (CONV3X3_IMPLS,
                                               conv3x3_im2col, conv3x3_taps)


def _ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("impl", sorted(CONV3X3_IMPLS))
@pytest.mark.parametrize("shape", [(2, 8, 7, 16, 16), (1, 5, 5, 4, 12)])
def test_matches_xla_conv(impl, shape):
    B, H, W, C, K = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, K) * 0.1, jnp.float32)
    got = CONV3X3_IMPLS[impl](x, w)
    want = _ref(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_bf16_dtype_preserved():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.bfloat16)
    for fn in (conv3x3_taps, conv3x3_im2col):
        y = fn(x, w)
        assert y.dtype == jnp.bfloat16
        ref = _ref(x.astype(jnp.float32), w.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(ref), rtol=0.1, atol=0.1)


def test_rejects_bad_shapes():
    x = jnp.zeros((2, 4, 4, 3))
    with pytest.raises(ValueError):
        conv3x3_taps(x, jnp.zeros((5, 5, 3, 4)))
    with pytest.raises(ValueError):
        conv3x3_im2col(x, jnp.zeros((3, 3, 7, 4)))
