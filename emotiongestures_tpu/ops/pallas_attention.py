"""Fused post-LN multi-head attention Pallas kernel for the generator's
(60-token, d_model=512, 8x64-head) shape.

One kernel per batch block fuses the ENTIRE reference attention sublayer
(Full_model/SubLayers.py:30-59) in VMEM:

    q/k/v projections (three 512x512 GEMMs)
    per-head scores QK^T/sqrt(d), key-padding mask, softmax
    context @ V, head concat
    output projection, residual add, LayerNorm(eps=1e-6)

Sequence rows are padded 60 -> 64 (sublane multiple); padded KEY columns
are masked to -1e9 before softmax so the math is exact; padded QUERY rows
are garbage that the caller slices off.

This is the self-attention case (q = k = v = x). XLA's fusion of the
unfused path is already strong at this size — the kernel exists to keep
the whole sublayer resident in VMEM (one HBM round-trip for x instead of
several) and as the template for wider-model serving; `bench_attention`
below measures both.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEQ_PAD = 64  # 60 query/key rows padded to a sublane multiple


def _mha_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, scale_ref, bias_ref,
                out_ref, *, n_head: int, d_k: int, seq_len: int):
    x = x_ref[0]  # (SEQ_PAD, d_model)
    q = jnp.dot(x, wq_ref[:], preferred_element_type=jnp.float32)
    k = jnp.dot(x, wk_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32)

    inv_temp = 1.0 / math.sqrt(d_k)
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (SEQ_PAD, SEQ_PAD), 1)
    key_mask = key_ids < seq_len  # mask padded KEY columns

    ctx_heads = []
    for h in range(n_head):
        sl = slice(h * d_k, (h + 1) * d_k)
        scores = jnp.dot(q[:, sl] * inv_temp, k[:, sl].T,
                         preferred_element_type=jnp.float32)
        scores = jnp.where(key_mask, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx_heads.append(jnp.dot(probs, v[:, sl],
                                 preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(ctx_heads, axis=-1)  # (SEQ_PAD, n_head*d_k)

    o = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32) + x
    mean = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean((o - mean) ** 2, axis=-1, keepdims=True)
    normed = (o - mean) * jax.lax.rsqrt(var + 1e-6)
    out_ref[0] = normed * scale_ref[:] + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("n_head", "d_k", "interpret"))
def fused_self_attention(x, wq, wk, wv, wo, ln_scale, ln_bias,
                         n_head: int = 8, d_k: int = 64,
                         interpret: bool = False):
    """x: (B, L, d_model) with L <= 64; weights (d_model, n_head*d_k) /
    (n_head*d_k, d_model); returns the post-LN attention sublayer output
    (B, L, d_model), eval mode (no dropout)."""
    B, L, D = x.shape
    xp = jnp.pad(x, ((0, 0), (0, SEQ_PAD - L), (0, 0)))
    kernel = functools.partial(_mha_kernel, n_head=n_head, d_k=d_k,
                               seq_len=L)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, SEQ_PAD, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, n_head * d_k), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, n_head * d_k), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, n_head * d_k), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_head * d_k, D), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SEQ_PAD, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SEQ_PAD, D), jnp.float32),
        interpret=interpret,
    )(xp, wq, wk, wv, wo, ln_scale[None, :], ln_bias[None, :])
    return out[:, :L, :]


def attention_params_from_flax(mha_params):
    """Extract (wq, wk, wv, wo, ln_scale, ln_bias) from a
    nn.transformer.MultiHeadAttention params subtree."""
    return (mha_params["w_qs"]["kernel"], mha_params["w_ks"]["kernel"],
            mha_params["w_vs"]["kernel"], mha_params["fc"]["kernel"],
            mha_params["layer_norm"]["scale"],
            mha_params["layer_norm"]["bias"])
