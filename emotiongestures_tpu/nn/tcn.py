"""Temporal Convolutional Network (dilated causal convs) with explicit
weight normalisation (SURVEY.md §2.6: torch weight_norm -> explicit
g * v/||v|| split in our module system).

Semantics match Full_model/tcn.py:7-64:
  * per-level dilation 2^i, kernel 2, padding (k-1)*dilation then
    trailing chomp — equivalent to a causal left-pad, which is how we
    implement it (no wasted compute on chopped positions);
  * two conv+relu+dropout legs per block, 1x1-conv residual when channel
    counts differ, relu on the summed output;
  * all conv weights init N(0, 0.01^2) (tcn.py:37-41); weight-norm g is
    initialised to ||v|| so the initial effective weight equals v.

Layout is channel-last (B, L, C) — the TPU-friendly layout; callers who
hold (B, C, L) torch-layout data transpose at the boundary.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import init as winit


class WNCausalConv1d(nn.Module):
    """Causal 1-D conv with explicit weight norm: W = g * v / ||v||,
    norm taken per output channel (torch weight_norm dim=0 default)."""

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):  # x: (B, L, Cin)
        cin = x.shape[-1]
        k = self.kernel_size
        v = self.param("v", winit.normal_(0.01), (k, cin, self.features))
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                v.reshape(-1, self.features), axis=0
            ),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        kernel = v * (g / jnp.maximum(norm, 1e-12))[None, None, :]
        bias = self.param("bias", winit.torch_bias_init(cin * k),
                          (self.features,))
        pad = (k - 1) * self.dilation
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(pad, 0)],  # causal: left-pad == pad-both + chomp
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + bias


class TemporalBlock(nn.Module):
    n_outputs: int
    kernel_size: int
    dilation: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = WNCausalConv1d(self.n_outputs, self.kernel_size,
                             self.dilation, name="conv1")(x)
        out = nn.relu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = WNCausalConv1d(self.n_outputs, self.kernel_size,
                             self.dilation, name="conv2")(out)
        out = nn.relu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        if x.shape[-1] != self.n_outputs:
            res = nn.Dense(
                self.n_outputs,
                kernel_init=winit.normal_(0.01),
                bias_init=winit.torch_bias_init(x.shape[-1]),
                name="downsample",
            )(x)  # 1x1 conv == pointwise dense
        else:
            res = x
        return nn.relu(out + res)


class TemporalConvNet(nn.Module):
    num_channels: Sequence[int]
    kernel_size: int = 2
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, L, C)
        for i, ch in enumerate(self.num_channels):
            x = TemporalBlock(
                ch, self.kernel_size, dilation=2**i, dropout=self.dropout,
                name=f"block{i}",
            )(x, train=train)
        return x
