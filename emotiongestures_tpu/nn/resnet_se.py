"""Squeeze-Excitation ResNet feature extractors (NHWC, TPU layout).

Faithful to the reference's quirks (SURVEY.md §7 hard part 7):
  * SEBasicBlock uses conv -> relu -> bn ordering in its FIRST branch leg
    (Full_model/ResNetBlocks.py:24-29), unlike standard conv-bn-relu.
  * stem is conv3x3 -> relu -> bn (Full_model/ResNetSE34V2.py:62-66).
  * 3-stage variant (layers [3,4,6], filters [32,64,128], strides 1,2,2)
    feeds the generator's audio encoder (Full_model/Models_memory.py:98-100);
    4-stage variant (layers [3,4,6,3], filters [...,256]) is the audio
    emotion classifier backbone (model/audio_emotion_classifer.py:20-22).
  * conv weights: kaiming-normal(fan_out); BN gamma=1 beta=0
    (Full_model/ResNetSE34V2.py:33-38).
"""
from __future__ import annotations

from typing import Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

from ..core import init as winit
from ..core.layers import BatchNorm, Conv, Linear


class SELayer(nn.Module):
    """Squeeze-excitation gate (Full_model/ResNetBlocks.py:81-96)."""

    channel: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        y = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)
        y = Linear(self.channel // self.reduction, name="fc1")(y)
        y = nn.relu(y)
        y = Linear(self.channel, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    expansion = 1

    planes: int
    stride: int = 1
    has_downsample: bool = False
    reduction: int = 8
    train: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        out = Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                   use_bias=False,
                   kernel_init=winit.kaiming_normal_fan_out, name="conv1")(x)
        out = nn.relu(out)  # conv->relu->bn quirk (ResNetBlocks.py:24-29)
        out = BatchNorm(use_running_average=not self.train, name="bn1")(out)
        out = Conv(self.planes, (3, 3), padding=1, use_bias=False,
                   kernel_init=winit.kaiming_normal_fan_out, name="conv2")(out)
        out = BatchNorm(use_running_average=not self.train, name="bn2")(out)
        out = SELayer(self.planes, self.reduction, name="se")(out)
        if self.has_downsample:
            residual = Conv(self.planes * self.expansion, (1, 1),
                            strides=self.stride, padding=0, use_bias=False,
                            kernel_init=winit.kaiming_normal_fan_out,
                            name="downsample_conv")(x)
            residual = BatchNorm(use_running_average=not self.train,
                                 name="downsample_bn")(residual)
        out = out + residual
        return nn.relu(out)


class SEBottleneck(nn.Module):
    """(Full_model/ResNetBlocks.py:40-78) — standard conv-bn-relu ordering."""

    expansion = 4

    planes: int
    stride: int = 1
    has_downsample: bool = False
    reduction: int = 8
    train: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        out = Conv(self.planes, (1, 1), padding=0, use_bias=False,
                   kernel_init=winit.kaiming_normal_fan_out, name="conv1")(x)
        out = BatchNorm(use_running_average=not self.train, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                   use_bias=False,
                   kernel_init=winit.kaiming_normal_fan_out, name="conv2")(out)
        out = BatchNorm(use_running_average=not self.train, name="bn2")(out)
        out = nn.relu(out)
        out = Conv(self.planes * 4, (1, 1), padding=0, use_bias=False,
                   kernel_init=winit.kaiming_normal_fan_out, name="conv3")(out)
        out = BatchNorm(use_running_average=not self.train, name="bn3")(out)
        out = SELayer(self.planes * 4, self.reduction, name="se")(out)
        if self.has_downsample:
            residual = Conv(self.planes * self.expansion, (1, 1),
                            strides=self.stride, padding=0, use_bias=False,
                            kernel_init=winit.kaiming_normal_fan_out,
                            name="downsample_conv")(x)
            residual = BatchNorm(use_running_average=not self.train,
                                 name="downsample_bn")(residual)
        out = out + residual
        return nn.relu(out)


class _BlockScanStep(nn.Module):
    """One stride-1 residual block as a scan step (carry = activations)."""

    planes: int
    reduction: int
    train: bool
    block: Type[nn.Module]

    @nn.compact
    def __call__(self, carry, _):
        y = self.block(self.planes, stride=1, has_downsample=False,
                       reduction=self.reduction, train=self.train,
                       name="block")(carry)
        return y, None


class ResNetSE(nn.Module):
    """Multi-stage SE-ResNet over (B, H, W, 1) spectrogram images.

    layers/num_filters as in the reference; stage 1 stride 1, later stages
    stride 2 (Full_model/ResNetSE34V2.py:26-29).

    `scan_blocks=True` runs each stage's identical stride-1 blocks as ONE
    lax.scan over stacked parameters, shrinking the traced graph. Measured
    on this stack it does NOT pay: XLA compiles the scanned graph ~2.7x
    SLOWER than the unrolled one (the conv autotuner dominates compile
    time, not graph size), so unrolled stays the default; the option
    remains for much deeper future stacks.

    `remat_blocks=True` wraps every residual block in `nn.remat`
    (jax.checkpoint): the backward pass recomputes each block's
    intra-block activations instead of keeping them live, cutting the
    training peak-memory contribution of the early high-resolution stages
    (stage 1 holds (B, 128, 124, 32) fp32/bf16 tensors per conv — the
    batch-2048 OOM driver, BASELINE.md). Measured cost/benefit in
    BASELINE.md round 3; off by default.
    """

    layers: Sequence[int]
    num_filters: Sequence[int]
    block: Type[nn.Module] = SEBasicBlock
    reduction: int = 8
    scan_blocks: bool = False
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):  # x: (B, H, W, 1)
        block_cls = nn.remat(self.block) if self.remat_blocks else self.block
        x = Conv(self.num_filters[0], (3, 3), padding=1,
                 kernel_init=winit.kaiming_normal_fan_out, name="conv1")(x)
        x = nn.relu(x)
        x = BatchNorm(use_running_average=not train, name="bn1")(x)

        inplanes = self.num_filters[0]
        for stage, (planes, blocks) in enumerate(
            zip(self.num_filters, self.layers)
        ):
            stride = 1 if stage == 0 else 2
            needs_down = stride != 1 or \
                inplanes != planes * self.block.expansion
            x = block_cls(
                planes, stride=stride, has_downsample=needs_down,
                reduction=self.reduction, train=train,
                name=f"layer{stage + 1}_block0",
            )(x)
            inplanes = planes * self.block.expansion
            if blocks > 1:
                if self.scan_blocks:
                    scanned = nn.scan(
                        _BlockScanStep,
                        variable_axes={"params": 0, "batch_stats": 0},
                        split_rngs={"params": True},
                        length=blocks - 1,
                    )(planes, self.reduction, train, self.block,
                      name=f"layer{stage + 1}_rest")
                    x, _ = scanned(x, None)
                else:
                    for b in range(1, blocks):
                        x = block_cls(
                            planes, stride=1, has_downsample=False,
                            reduction=self.reduction, train=train,
                            name=f"layer{stage + 1}_block{b}",
                        )(x)
        return x
