"""Transformer blocks, TPU-first.

Semantics follow the reference exactly (SURVEY.md §2.1) but the
implementation is one fused einsum path per attention (no per-head python
loops, no reshuffling through torch-style (B, H, L, D) transposes beyond
what dot_general needs — XLA maps these straight onto the MXU):

  * post-LN residual blocks           (Full_model/SubLayers.py:55-57, 80-83)
  * bias-free Q/K/V/out projections   (Full_model/SubLayers.py:19-22)
  * attention-prob dropout 0.1        (Full_model/Modules.py:8-20)
  * decoder = cross-attention + FFN only, the self-attention branch is
    disabled in the used path         (Full_model/Layers.py:53-58)
  * decoder applies NO positional encoding in forward
                                      (Full_model/Models_memory.py:410-424)
  * the final encoder/decoder LayerNorm is constructed but never applied
                                      (Full_model/Models_memory.py:366-391)
  * all masks are None in the used path; masking supported for parity tests
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import init as winit
from ..core.layers import Linear, sinusoid_position_table


class _RawKernel(nn.Module):
    """Bias-free projection kernel exposed as a raw matrix so the fused
    Pallas path and the einsum path share the same parameter
    (`<name>/kernel`, identical tree to a bias-free Linear)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", winit.xavier_uniform,
                          (self.in_features, self.out_features))


class _RawLayerNorm(nn.Module):
    """LayerNorm with raw scale/bias params (tree-identical to
    nn.LayerNorm) usable from both the einsum and fused paths."""

    features: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x=None):
        scale = self.param("scale", winit.ones, (self.features,))
        bias = self.param("bias", winit.zeros, (self.features,))
        if x is None:
            return scale, bias
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class MultiHeadAttention(nn.Module):
    """Post-LN MHA. `fused=True` routes eval-mode unmasked calls with
    d_v == d_k and sequences <= 64 through the fused Pallas sublayer
    kernel (ops/pallas_attention.py) — same params, same math, one VMEM
    round-trip; all other calls use the einsum path."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    attn_dropout: float = 0.1
    fused: bool = False

    @nn.compact
    def __call__(self, q, k, v, mask=None, train: bool = False):
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        H, dk, dv = self.n_head, self.d_k, self.d_v
        residual = q

        wq = _RawKernel(q.shape[-1], H * dk, name="w_qs")()
        wk = _RawKernel(k.shape[-1], H * dk, name="w_ks")()
        wv = _RawKernel(v.shape[-1], H * dv, name="w_vs")()
        wo = _RawKernel(H * dv, self.d_model, name="fc")()
        ln = _RawLayerNorm(self.d_model, name="layer_norm")

        can_fuse = (self.fused and not train and mask is None
                    and dk == dv and Lq <= 64 and Lk <= 64
                    and q.shape[-1] == k.shape[-1] == self.d_model)
        if can_fuse:
            from ..ops.pallas_attention import fused_attention

            ln_scale, ln_bias = ln()
            out = fused_attention(q, k, wq, wk, wv, wo, ln_scale, ln_bias,
                                  n_head=H, d_k=dk)
            return out, None

        qh = (q @ wq).reshape(B, Lq, H, dk)
        kh = (k @ wk).reshape(B, Lk, H, dk)
        vh = (v @ wv).reshape(B, Lk, H, dv)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dk, dtype=qh.dtype))
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh)
        if mask is not None:
            attn = jnp.where(mask == 0, jnp.asarray(-1e9, attn.dtype), attn)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, Lq, H * dv)
        out = out @ wo
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return ln(out + residual), attn


class PositionwiseFeedForward(nn.Module):
    d_in: int
    d_hid: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        x = Linear(self.d_hid, kernel_init=winit.xavier_uniform, name="w_1")(x)
        x = nn.relu(x)
        x = Linear(self.d_in, kernel_init=winit.xavier_uniform, name="w_2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = x + residual
        return nn.LayerNorm(epsilon=1e-6, name="layer_norm")(x)


class EncoderLayer(nn.Module):
    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    fused: bool = False

    @nn.compact
    def __call__(self, x, slf_attn_mask=None, train: bool = False):
        x, attn = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v,
            dropout=self.dropout, fused=self.fused, name="slf_attn",
        )(x, x, x, mask=slf_attn_mask, train=train)
        x = PositionwiseFeedForward(
            self.d_model, self.d_inner, dropout=self.dropout, name="pos_ffn"
        )(x, train=train)
        return x, attn


class DecoderLayer(nn.Module):
    """Cross-attention + FFN only (Full_model/Layers.py:50-58: the decoder
    self-attention is commented out in the reference's used path)."""

    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    fused: bool = False

    @nn.compact
    def __call__(self, dec_input, enc_output, dec_enc_attn_mask=None,
                 train: bool = False):
        x, attn = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v,
            dropout=self.dropout, fused=self.fused, name="enc_attn",
        )(dec_input, enc_output, enc_output, mask=dec_enc_attn_mask,
          train=train)
        x = PositionwiseFeedForward(
            self.d_model, self.d_inner, dropout=self.dropout, name="pos_ffn"
        )(x, train=train)
        return x, attn


class PositionalEncoding(nn.Module):
    """Fixed sinusoid table added to the input
    (Full_model/Models_memory.py:25-48)."""

    d_hid: int
    n_position: int = 200

    @nn.compact
    def __call__(self, x):
        table = sinusoid_position_table(self.n_position, self.d_hid)
        return x + table[None, : x.shape[1]].astype(x.dtype)


class TransformerEncoder(nn.Module):
    """pos-enc -> dropout -> N x EncoderLayer
    (Full_model/Models_memory.py:350-391)."""

    n_layers: int
    n_head: int
    d_k: int
    d_v: int
    d_model: int
    d_inner: int
    dropout: float = 0.1
    n_position: int = 200
    fused: bool = False

    @nn.compact
    def __call__(self, src_seq, src_mask=None, train: bool = False):
        x = PositionalEncoding(self.d_model, self.n_position,
                               name="position_enc")(src_seq)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.n_layers):
            x, _ = EncoderLayer(
                self.d_model, self.d_inner, self.n_head, self.d_k, self.d_v,
                dropout=self.dropout, fused=self.fused, name=f"layer_{i}",
            )(x, slf_attn_mask=src_mask, train=train)
        # NOTE: the reference constructs a final LayerNorm but never applies
        # it in forward (Models_memory.py:366, 368-391); we match.
        return x


class TransformerDecoder(nn.Module):
    """N x DecoderLayer cross-attending enc_output; no positional encoding
    applied (Full_model/Models_memory.py:393-424)."""

    n_layers: int
    n_head: int
    d_k: int
    d_v: int
    d_model: int
    d_inner: int
    dropout: float = 0.1
    n_position: int = 200
    fused: bool = False

    @nn.compact
    def __call__(self, trg_seq, enc_output, dec_enc_attn_mask=None,
                 train: bool = False):
        x = trg_seq
        for i in range(self.n_layers):
            x, _ = DecoderLayer(
                self.d_model, self.d_inner, self.n_head, self.d_k, self.d_v,
                dropout=self.dropout, fused=self.fused, name=f"layer_{i}",
            )(x, enc_output, dec_enc_attn_mask=dec_enc_attn_mask, train=train)
        return x


def get_pad_mask(seq: jnp.ndarray, pad_idx: int) -> jnp.ndarray:
    """(Full_model/Models_memory.py:13-14) — unused in the main path."""
    return (seq != pad_idx)[:, None, :]


def get_subsequent_mask(seq: jnp.ndarray) -> jnp.ndarray:
    """(Full_model/Models_memory.py:17-22) — unused in the main path."""
    len_s = seq.shape[1]
    return jnp.tril(jnp.ones((1, len_s, len_s), dtype=bool))
