"""TED-expressive FGD feature net (model/motion_ae.py:118-130): conv pose
autoencoder over 34-frame / 126-d windows with a configurable latent.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...core.layers import BatchNorm, Conv, Linear
from .quirks import leaky_relu_true


class _Enc(nn.Module):
    latent_dim: int

    @nn.compact
    def __call__(self, poses, train: bool = False):  # (B, T, D)
        x = poses
        for i, (c, down) in enumerate([(32, False), (64, False), (64, True)]):
            k, s = (4, 2) if down else (3, 1)
            x = Conv(c, (k,), strides=s, padding="VALID", name=f"c{i}")(x)
            x = BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = Conv(32, (3,), padding="VALID", name="c3")(x)
        # torch flattens (B, C, L) channel-major (motion_ae.py:62) —
        # transpose from NLC before flattening so fc fan-in order matches
        x = jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)
        x = Linear(256, name="fc1")(x)
        x = BatchNorm(use_running_average=not train, name="fbn1")(x)
        x = leaky_relu_true(x)  # ref :48 LeakyReLU(True) quirk
        x = Linear(128, name="fc2")(x)
        x = BatchNorm(use_running_average=not train, name="fbn2")(x)
        x = leaky_relu_true(x)  # ref :51 LeakyReLU(True) quirk
        return Linear(self.latent_dim, name="fc3")(x)


class _Dec(nn.Module):
    pose_dim: int
    length: int = 34

    @nn.compact
    def __call__(self, z, train: bool = False):
        x = Linear(64, name="pre1")(z)
        x = BatchNorm(use_running_average=not train, name="pbn")(x)
        x = leaky_relu_true(x)  # ref :83/:90 LeakyReLU(True) quirk
        x = Linear(136, name="pre2")(x)
        x = x.reshape(z.shape[0], 4, -1)
        x = jnp.swapaxes(x, 1, 2)
        x = Conv(32, (3,), padding="VALID", transpose=True, name="d1")(x)
        x = BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = Conv(32, (3,), padding="VALID", transpose=True, name="d2")(x)
        x = BatchNorm(use_running_average=not train, name="bn2")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = Conv(32, (3,), padding="VALID", name="c1")(x)
        x = Conv(self.pose_dim, (3,), padding="VALID", name="c2")(x)
        return x  # already (B, T, D) in NLC


class MotionAE(nn.Module):
    pose_dim: int = 126
    latent_dim: int = 128

    @nn.compact
    def __call__(self, pose, train: bool = False):
        pose = pose.reshape(pose.shape[0], pose.shape[1], -1)
        z = _Enc(self.latent_dim, name="encoder")(pose, train=train)
        pred = _Dec(self.pose_dim, name="decoder")(z, train=train)
        return pred, z
