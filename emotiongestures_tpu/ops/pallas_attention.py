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


def _mha_kernel(q_ref, kv_ref, wq_ref, wk_ref, wv_ref, wo_ref, scale_ref,
                bias_ref, out_ref, *, n_head: int, d_k: int, kv_len: int):
    x = q_ref[0]  # (SEQ_PAD, d_model) — queries; also the residual
    kv = kv_ref[0]
    q = jnp.dot(x, wq_ref[:], preferred_element_type=jnp.float32)
    k = jnp.dot(kv, wk_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(kv, wv_ref[:], preferred_element_type=jnp.float32)

    inv_temp = 1.0 / math.sqrt(d_k)
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (SEQ_PAD, SEQ_PAD), 1)
    key_mask = key_ids < kv_len  # mask padded KEY columns

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
def fused_attention(q_in, kv_in, wq, wk, wv, wo, ln_scale, ln_bias,
                    n_head: int = 8, d_k: int = 64,
                    interpret: bool | None = None):
    """Fused post-LN attention sublayer, self- OR cross-attention.
    q_in: (B, Lq, d_model) (also the residual), kv_in: (B, Lk, d_model),
    Lq, Lk <= 64; weights (d_model, n_head*d_k) / (n_head*d_k, d_model).
    Eval mode (no dropout). `interpret=None` auto-selects the Pallas
    interpreter off-TPU so `fused_attention=True` models stay runnable
    on the CPU test backend.

    Limitation (documented, ADVICE r2): `interpret=None` resolves from
    `jax.default_backend()` at TRACE time, i.e. the process-wide default
    platform — not from the devices this lowering actually targets. In a
    mixed-platform process (explicit CPU `device_put` while TPU is the
    default, or vice versa) pass `interpret` explicitly: the auto value
    would select the compiled Mosaic kernel for a CPU execution (fails to
    lower) or silently run the slow interpreter on TPU. Single-platform
    processes — every CLI/test/bench in this repo — are unaffected."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Lq, D = q_in.shape
    Lk = kv_in.shape[1]
    qp = jnp.pad(q_in, ((0, 0), (0, SEQ_PAD - Lq), (0, 0)))
    kvp = jnp.pad(kv_in, ((0, 0), (0, SEQ_PAD - Lk), (0, 0)))
    kernel = functools.partial(_mha_kernel, n_head=n_head, d_k=d_k,
                               kv_len=Lk)
    full = pl.BlockSpec((1, SEQ_PAD, D), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(shape, lambda b: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            full, full,
            wspec((D, n_head * d_k)),
            wspec((D, n_head * d_k)),
            wspec((D, n_head * d_k)),
            wspec((n_head * d_k, D)),
            wspec((1, D)),
            wspec((1, D)),
        ],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((B, SEQ_PAD, D), jnp.float32),
        interpret=interpret,
    )(qp, kvp, wq, wk, wv, wo, ln_scale[None, :], ln_bias[None, :])
    return out[:, :Lq, :]


def fused_self_attention(x, wq, wk, wv, wo, ln_scale, ln_bias,
                         n_head: int = 8, d_k: int = 64,
                         interpret: bool | None = None):
    """Self-attention convenience wrapper (q = k = v = x)."""
    return fused_attention(x, x, wq, wk, wv, wo, ln_scale, ln_bias,
                           n_head=n_head, d_k=d_k, interpret=interpret)


def attention_params_from_flax(mha_params):
    """Extract (wq, wk, wv, wo, ln_scale, ln_bias) from a
    nn.transformer.MultiHeadAttention params subtree."""
    return (mha_params["w_qs"]["kernel"], mha_params["w_ks"]["kernel"],
            mha_params["w_vs"]["kernel"], mha_params["fc"]["kernel"],
            mha_params["layer_norm"]["scale"],
            mha_params["layer_norm"]["bias"])
