"""Fused SE-ResNet stage kernel: N consecutive stride-1 SEBasicBlocks
(Full_model/ResNetBlocks.py:12-37) in ONE Pallas kernel, eval mode.

The serving hotspot is the audio SE-ResNet (75% of the flagship forward,
BASELINE.md). XLA runs its stage-3 tail (five stride-1 blocks, C=128,
32x31 spatial) at ~59% MFU with an HBM round-trip per conv. This kernel
keeps a batch-tile of activations resident in VMEM across the WHOLE
stage:

    for each block:  conv3x3 -> relu -> bn1 -> conv3x3 -> bn2
                     -> SE gate (global pool, 2 fcs, sigmoid)
                     -> + residual -> relu

Each 3x3 conv is computed as 9 accumulated (TB*H*W, C) @ (C, C) tap
GEMMs in fp32 — at C=128 every tap uses the full 128x128 MXU tile.
Eval-mode BatchNorm is folded to a per-channel affine (scale/shift from
the running stats) OUTSIDE the kernel, preserving the reference's
conv->relu->bn ordering quirk exactly.

Weights for all N blocks are stacked on a leading axis and stay in VMEM
(~3 MB at N=5, C=128); the grid walks batch tiles.

MEASURED RESULT (2026-08-16, v5e, B=1024, bf16, batch_tile=2): 38.1 ms
vs 23.3 ms for XLA's own conv emitter on the identical stage — the
9-tap strided slices force Mosaic vector relayouts that cost more than
the HBM round-trips the fusion saves, while XLA runs the stage at 65%
MFU already. The serving path therefore does NOT use this kernel; it is
retained as the measured negative result (BASELINE.md round-2
speed-of-light table) with its exact-parity test
(tests/test_pallas_se.py), so the conclusion stays reproducible.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stage_kernel(x_ref, w1_ref, s1_ref, t1_ref, w2_ref, s2_ref, t2_ref,
                  f1w_ref, f1b_ref, f2w_ref, f2b_ref, out_ref,
                  *, n_blocks: int, H: int, W: int, C: int):
    TB = x_ref.shape[0]
    M = TB * H * W

    def conv3x3(xp, w_ref, blk):
        # xp: (TB, H+2, W+2, C) compute-dtype; 9 accumulated tap GEMMs
        acc = jnp.zeros((M, C), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                a = xp[:, dh:dh + H, dw:dw + W, :].reshape(M, C)
                acc += jnp.dot(a, w_ref[blk, dh, dw],
                               preferred_element_type=jnp.float32)
        return acc  # (M, C) fp32

    x = x_ref[...]  # (TB, H, W, C)
    cdtype = x.dtype
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    for i in range(n_blocks):
        xp = jnp.pad(x, pad)
        y = conv3x3(xp, w1_ref, i)
        # conv -> RELU -> bn quirk (ResNetBlocks.py:24-29)
        y = jnp.maximum(y, 0.0) * s1_ref[i] + t1_ref[i]
        yp = jnp.pad(y.astype(cdtype).reshape(TB, H, W, C), pad)
        z = conv3x3(yp, w2_ref, i)
        z = z * s2_ref[i] + t2_ref[i]
        # SE gate (ResNetBlocks.py:81-96): global average pool + 2 fcs
        pool = jnp.mean(z.reshape(TB, H * W, C), axis=1)  # (TB, C)
        hid = jnp.maximum(
            jnp.dot(pool.astype(cdtype), f1w_ref[i],
                    preferred_element_type=jnp.float32) + f1b_ref[i], 0.0)
        gate = jax.nn.sigmoid(
            jnp.dot(hid.astype(cdtype), f2w_ref[i],
                    preferred_element_type=jnp.float32) + f2b_ref[i])
        z = z.reshape(TB, H * W, C) * gate[:, None, :]
        res = x.reshape(TB, H * W, C).astype(jnp.float32)
        x = jnp.maximum(z + res, 0.0).astype(cdtype).reshape(TB, H, W, C)
    out_ref[...] = x


@functools.partial(jax.jit,
                   static_argnames=("batch_tile", "interpret"))
def fused_se_stage(x, w1, s1, t1, w2, s2, t2, f1w, f1b, f2w, f2b,
                   batch_tile: int = 4, interpret: bool = False):
    """Run `n_blocks` stride-1 SEBasicBlocks (eval mode, folded BN).

    x: (B, H, W, C); w1/w2: (NB, 3, 3, C, C); s*/t*: (NB, C) fp32 folded
    BatchNorm affines (scale = gamma/sqrt(var+eps), shift = beta -
    mean*scale); f1w/f1b/f2w/f2b: stacked SE fc params.
    Returns (B, H, W, C) in x.dtype. B must divide by batch_tile.
    """
    B, H, W, C = x.shape
    NB = w1.shape[0]
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by tile {batch_tile}")
    kernel = functools.partial(_stage_kernel, n_blocks=NB, H=H, W=W, C=C)
    xspec = pl.BlockSpec((batch_tile, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)

    def wspec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda b: (0,) * nd,
                            memory_space=pltpu.VMEM)

    cdtype = x.dtype
    weights = [w1.astype(cdtype), s1.astype(jnp.float32),
               t1.astype(jnp.float32), w2.astype(cdtype),
               s2.astype(jnp.float32), t2.astype(jnp.float32),
               f1w.astype(cdtype), f1b.astype(jnp.float32),
               f2w.astype(cdtype), f2b.astype(jnp.float32)]
    return pl.pallas_call(
        kernel,
        grid=(B // batch_tile,),
        in_specs=[xspec] + [wspec(w) for w in weights],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), cdtype),
        interpret=interpret,
    )(x, *weights)


def fold_bn(bn_params, bn_stats, eps: float = 1e-5):
    """Eval-mode BatchNorm as per-channel affine: returns (scale, shift)."""
    scale = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    shift = bn_params["bias"] - bn_stats["mean"] * scale
    return scale.astype(jnp.float32), shift.astype(jnp.float32)


def stage_params_from_flax(params, batch_stats, block_names):
    """Stack the fused-stage operands from a ResNetSE params/stats tree.

    `block_names` are the stride-1 SEBasicBlock submodule names (e.g.
    ["layer3_block1", ..., "layer3_block5"]). Returns the 11 stacked
    arrays fused_se_stage takes after x.
    """
    w1, s1, t1, w2, s2, t2 = [], [], [], [], [], []
    f1w, f1b, f2w, f2b = [], [], [], []
    for name in block_names:
        p, s = params[name], batch_stats[name]
        w1.append(p["conv1"]["Conv_0"]["kernel"])
        w2.append(p["conv2"]["Conv_0"]["kernel"])
        a, b = fold_bn(p["bn1"]["BatchNorm_0"], s["bn1"]["BatchNorm_0"])
        s1.append(a), t1.append(b)
        a, b = fold_bn(p["bn2"]["BatchNorm_0"], s["bn2"]["BatchNorm_0"])
        s2.append(a), t2.append(b)
        f1w.append(p["se"]["fc1"]["kernel"])
        f1b.append(p["se"]["fc1"]["bias"])
        f2w.append(p["se"]["fc2"]["kernel"])
        f2b.append(p["se"]["fc2"]["bias"])
    stack = lambda xs: jnp.stack(xs)
    return tuple(map(stack, (w1, s1, t1, w2, s2, t2, f1w, f1b, f2w, f2b)))
