"""Thin flax.linen wrappers that default to torch's initialisation
semantics so training dynamics track the reference implementation.

All convolutions use channel-LAST layouts internally (NHWC / NLC), the
layout XLA prefers on TPU; model-level code converts at the boundary.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from . import init as winit


class Linear(nn.Module):
    """Dense layer with torch-default init unless overridden."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None  # None -> torch default
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kinit = self.kernel_init or winit.torch_kernel_init(in_features)
        kernel = self.param("kernel", kinit, (in_features, self.features))
        dtype = self.dtype or x.dtype
        y = jnp.matmul(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param(
                "bias", winit.torch_bias_init(in_features), (self.features,)
            )
            y = y + bias.astype(dtype)
        return y


class Conv(nn.Module):
    """N-D convolution over channel-last inputs with torch-default init.

    kernel_size/strides are tuples; `transpose=True` gives the
    ConvTranspose used by the CVAE decoder (CAVE/BEAT_CVAE.py:355-369).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    feature_group_count: int = 1
    transpose: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        receptive = 1
        for k in self.kernel_size:
            receptive *= k
        fan_in = in_features * receptive
        kinit = self.kernel_init or winit.torch_kernel_init(fan_in)
        binit = winit.torch_bias_init(fan_in)
        strides = self.strides
        if isinstance(strides, int):
            strides = (strides,) * len(self.kernel_size)
        padding = self.padding
        if isinstance(padding, int):
            padding = [(padding, padding)] * len(self.kernel_size)
        cls = nn.ConvTranspose if self.transpose else nn.Conv
        kwargs = {}
        if not self.transpose:
            kwargs["feature_group_count"] = self.feature_group_count
        return cls(
            features=self.features,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(strides),
            padding=padding,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            **kwargs,
        )(x)


class MLP(nn.Module):
    """Sequential Linear stack with optional per-layer activation/dropout,
    mirroring the reference's nn.Sequential MLPs.

    spec: sequence of ("linear", features) / ("relu",) / ("leaky_relu", slope)
          / ("dropout", rate) / ("sigmoid",) tuples.
    """

    spec: Tuple[tuple, ...]
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, op in enumerate(self.spec):
            kind = op[0]
            if kind == "linear":
                x = Linear(op[1], kernel_init=self.kernel_init, name=f"fc{i}")(x)
            elif kind == "relu":
                x = nn.relu(x)
            elif kind == "leaky_relu":
                x = nn.leaky_relu(x, negative_slope=op[1])
            elif kind == "sigmoid":
                x = nn.sigmoid(x)
            elif kind == "tanh":
                x = jnp.tanh(x)
            elif kind == "dropout":
                x = nn.Dropout(op[1], deterministic=not train)(x)
            else:
                raise ValueError(f"unknown MLP op {kind}")
        return x


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (eps=1e-5, momentum=0.1 i.e.
    flax momentum 0.9; running stats NOT synced across data-parallel
    replicas, matching reference DataParallel — SURVEY.md §7 hard part 6)."""

    use_running_average: bool = True
    axis_name: Optional[str] = None  # set to sync across a mesh axis

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
        )(x)


def sinusoid_position_table(n_position: int, d_hid: int) -> jnp.ndarray:
    """Fixed sinusoid positional table (Full_model/Models_memory.py:34-44):
    angle[pos, j] = pos / 10000^(2*(j//2)/d); sin on even, cos on odd."""
    import numpy as np

    pos = np.arange(n_position)[:, None].astype(np.float64)
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table, dtype=jnp.float32)
