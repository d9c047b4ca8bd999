"""Speech2Gesture baseline (model/speech2gesture.py:106-259):
spectrogram conv downstack -> bilinear resize to n_frames -> 1-D U-Net;
patch discriminator on pose differences. The reference's Conv1d_tf /
Conv2d_tf TF-"SAME" shims (speech2gesture.py:9-103) are native jax
padding="SAME" semantics — no shim needed on TPU.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.layers import BatchNorm, Conv


class ConvNormRelu(nn.Module):
    """conv -> BN -> LeakyReLU(0.2) (speech2gesture.py:106-128);
    downsample = k4 s2, else k3 s1. Works for 1d and 2d by kernel rank."""

    out_channels: int
    ndim: int = 1
    downsample: bool = False
    k: int | None = None
    s: int | None = None
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.k if self.k is not None else (4 if self.downsample else 3)
        s = self.s if self.s is not None else (2 if self.downsample else 1)
        x = Conv(self.out_channels, (k,) * self.ndim, strides=s,
                 padding=self.padding, name="conv")(x)
        x = BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class UnetUp(nn.Module):
    """(speech2gesture.py:131-141): repeat-interleave x2 then add skip."""

    out_channels: int

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = jnp.repeat(x1, 2, axis=1)[:, : x2.shape[1], :]
        return ConvNormRelu(self.out_channels, ndim=1, name="conv")(
            x1 + x2, train=train)


class S2GAudioEncoder(nn.Module):
    """(speech2gesture.py:144-199)."""

    n_frames: int

    @nn.compact
    def __call__(self, spectrogram, train: bool = False):  # (B, n_mels, T)
        x = spectrogram[..., None].astype(jnp.float32)  # NHWC
        chans = [(64, False), (64, True), (128, False), (128, True),
                 (256, False), (256, True), (256, False)]
        for i, (c, down) in enumerate(chans):
            x = ConvNormRelu(c, ndim=2, downsample=down,
                             name=f"first_{i}")(x, train=train)
        x = ConvNormRelu(256, ndim=2, padding="VALID",
                         name="first_7")(x, train=train)
        # bilinear make_1d to (n_frames, 1) over the (H, W) grid
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, self.n_frames, 1, C), method="bilinear")
        x1 = x[:, :, 0, :]  # (B, n_frames, 256)

        x2 = ConvNormRelu(256, name="down1_0")(x1, train=train)
        x2 = ConvNormRelu(256, name="down1_1")(x2, train=train)
        x3 = ConvNormRelu(256, downsample=True, name="down2")(x2, train=train)
        x4 = ConvNormRelu(256, downsample=True, name="down3")(x3, train=train)
        x5 = ConvNormRelu(256, downsample=True, name="down4")(x4, train=train)
        x6 = ConvNormRelu(256, downsample=True, name="down5")(x5, train=train)
        x7 = ConvNormRelu(256, downsample=True, name="down6")(x6, train=train)
        x = UnetUp(256, name="up1")(x7, x6, train=train)
        x = UnetUp(256, name="up2")(x, x5, train=train)
        x = UnetUp(256, name="up3")(x, x4, train=train)
        x = UnetUp(256, name="up4")(x, x3, train=train)
        x = UnetUp(256, name="up5")(x, x2, train=train)
        return x  # (B, n_frames, 256)


class S2GGenerator(nn.Module):
    """(speech2gesture.py:202-240)."""

    n_poses: int = 34
    pose_dim: int = 282
    n_pre_poses: int = 4

    @nn.compact
    def __call__(self, in_spec, pre_poses, train: bool = False):
        audio_feat = S2GAudioEncoder(self.n_poses, name="audio_encoder")(
            in_spec, train=train)  # (B, T, 256)
        B = pre_poses.shape[0]
        from ...core.layers import Linear

        p = Linear(32, name="pre_fc1")(pre_poses.reshape(B, -1))
        p = BatchNorm(use_running_average=not train, name="pre_bn")(p)
        p = nn.relu(p)
        p = Linear(16, name="pre_fc2")(p)
        p = jnp.repeat(p[:, None, :], self.n_poses, axis=1)  # (B, T, 16)
        feat = jnp.concatenate([audio_feat, p], axis=2)
        for i in range(4):
            feat = ConvNormRelu(256, name=f"dec_{i}")(feat, train=train)
        out = Conv(self.pose_dim, (1,), name="final_out")(feat)
        return out  # (B, n_poses, pose_dim)


class S2GDiscriminator(nn.Module):
    """Patch discriminator on pose diffs (speech2gesture.py:243-259)."""

    pose_dim: int = 282

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, T, D)
        x = x[:, 1:] - x[:, :-1]
        x = Conv(64, (4,), strides=2, padding="SAME", name="conv1")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = ConvNormRelu(128, downsample=True, name="cnr1")(x, train=train)
        x = ConvNormRelu(256, k=4, s=1, name="cnr2")(x, train=train)
        return Conv(1, (4,), strides=1, padding="SAME", name="out")(x)
