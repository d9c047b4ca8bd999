"""Parity tests for the fused SE-ResNet stage kernel (interpret mode).

The kernel is a measured NEGATIVE result for serving (see its module
docstring / BASELINE.md): XLA's conv emitter beats it at stage-3 shape,
so the model does not use it. These tests keep the kernel's math honest
so the measurement stays reproducible.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emotiongestures_tpu.nn.resnet_se import SEBasicBlock
from emotiongestures_tpu.ops.pallas_se_block import (
    fold_bn, fused_se_stage, stage_params_from_flax)


def _tail(n_blocks, planes):
    class Tail(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            for i in range(n_blocks):
                x = SEBasicBlock(planes, stride=1, has_downsample=False,
                                 train=train, name=f"layer3_block{i+1}")(x)
            return x

    return Tail()


@pytest.mark.parametrize("batch_tile", [1, 2])
def test_fused_se_stage_matches_flax(batch_tile):
    B, H, W, C, NB = 4, 8, 9, 128, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    m = _tail(NB, C)
    v = m.init(jax.random.PRNGKey(0), x)
    # one train-mode pass makes the running stats non-trivial, so the
    # eval-mode BN folding is actually exercised
    _, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    v = {"params": v["params"], "batch_stats": mut["batch_stats"]}

    ref = m.apply(v, x, train=False)
    names = [f"layer3_block{i+1}" for i in range(NB)]
    stacked = stage_params_from_flax(v["params"], v["batch_stats"], names)
    out = fused_se_stage(x, *stacked, batch_tile=batch_tile, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fold_bn_matches_batchnorm_eval():
    rng = np.random.RandomState(1)
    C = 16
    params = {"scale": jnp.asarray(rng.rand(C) + 0.5, jnp.float32),
              "bias": jnp.asarray(rng.randn(C), jnp.float32)}
    stats = {"mean": jnp.asarray(rng.randn(C), jnp.float32),
             "var": jnp.asarray(rng.rand(C) + 0.1, jnp.float32)}
    x = jnp.asarray(rng.randn(32, C), jnp.float32)
    scale, shift = fold_bn(params, stats)
    folded = x * scale + shift
    direct = (x - stats["mean"]) / jnp.sqrt(stats["var"] + 1e-5) * \
        params["scale"] + params["bias"]
    np.testing.assert_allclose(np.asarray(folded), np.asarray(direct),
                               atol=1e-5, rtol=1e-5)
