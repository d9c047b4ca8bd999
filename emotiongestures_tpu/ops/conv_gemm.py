"""GEMM formulations of the stride-1 SAME 3x3 convolution.

VERDICT r4 item 5(a): the serving SoL audit pins the audio SE-ResNet's
stage 3 (6 blocks, C=128, 32x31 spatial — /root/reference/
Full_model/ResNetSE34V2.py:13-74, 75% of serving time overall) at 59%
MFU under XLA's TPU conv emitter, while the same math expressed as
output-stationary GEMMs should map onto the MXU with all 128 lanes
live. These rewrites keep the exact conv semantics (same HWIO kernel
parameter, zero-padded SAME borders) so they can be swapped under any
block without touching checkpoints:

  * ``conv3x3_taps``  — 9 accumulated (B*H*W, C) @ (C, K) GEMMs, one per
    filter tap, operands read as shifted slices of the padded input.
    The XLA-level cousin of the rejected Pallas tap-GEMM kernel
    (ops/pallas_se_block.py) — here Mosaic relayouts don't apply; XLA
    fuses the slice into the GEMM operand load.
  * ``conv3x3_im2col`` — materialise the (B*H*W, 9C) patch matrix and
    run ONE GEMM with reduction dim 9C.

Both are exact-parity-tested against ``lax.conv_general_dilated``
(tests/test_conv_gemm.py) and raced in ``bench.py --stage3`` on the
real chip; the measured verdict lives in BASELINE.md.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _check(x, w):
    if x.ndim != 4 or w.shape[:2] != (3, 3) or w.shape[2] != x.shape[-1]:
        raise ValueError(
            f"expected NHWC x and (3,3,C,K) w, got {x.shape} / {w.shape}"
        )


def conv3x3_taps(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv as 9 accumulated tap GEMMs.

    x: (B, H, W, C) channel-last; w: (3, 3, C, K) HWIO (the layout
    flax.linen.Conv stores). Returns (B, H, W, K).
    """
    _check(x, w)
    B, H, W, C = x.shape
    K = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = lax.slice(xp, (0, dy, dx, 0), (B, dy + H, dx + W, C))
            y = lax.dot_general(
                tap.reshape(B * H * W, C), w[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc.astype(x.dtype).reshape(B, H, W, K)


def conv3x3_im2col(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME 3x3 conv as one (B*H*W, 9C) @ (9C, K) GEMM."""
    _check(x, w)
    B, H, W, C = x.shape
    K = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        lax.slice(xp, (0, dy, dx, 0), (B, dy + H, dx + W, C))
        for dy in range(3) for dx in range(3)
    ]
    patches = jnp.concatenate(taps, axis=-1).reshape(B * H * W, 9 * C)
    y = lax.dot_general(
        patches, w.reshape(9 * C, K),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype).reshape(B, H, W, K)


CONV3X3_IMPLS = {"taps": conv3x3_taps, "im2col": conv3x3_im2col}
