"""Trimodal FGD feature net (model/embedding_net.py; Full_model copy is a
dim-retune covered by the same modules since our Linears infer fan-in):
ContextEncoder (text+audio -> GRU -> z), PoseEncoderConv VAE, and
FC/GRU/Conv decoders.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.layers import BatchNorm, Conv, Linear
from ...nn.gru import GRU, sum_bidirectional
from .trimodal import TextEncoderTCN32, WavEncoder
from .quirks import leaky_relu_true


class _ConvNormRelu1d(nn.Module):
    out_channels: int
    downsample: bool = False
    batchnorm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = (4, 2) if self.downsample else (3, 1)
        x = Conv(self.out_channels, (k,), strides=s, padding="VALID",
                 name="conv")(x)
        if self.batchnorm:
            x = BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class PoseEncoderConv(nn.Module):
    """(embedding_net.py:42-83): conv stack -> MLP -> (z, mu, logvar)."""

    latent_dim: int = 32

    @nn.compact
    def __call__(self, poses, variational_encoding: bool = False,
                 train: bool = False):  # (B, T, D)
        x = poses
        x = _ConvNormRelu1d(32, name="c1")(x, train=train)
        x = _ConvNormRelu1d(64, name="c2")(x, train=train)
        x = _ConvNormRelu1d(64, downsample=True, name="c3")(x, train=train)
        x = Conv(32, (3,), padding="VALID", name="c4")(x)
        # torch flattens (B, C, L) channel-major (embedding_net.py:72) —
        # transpose from NLC before flattening so fc fan-in order matches
        x = jnp.swapaxes(x, 1, 2).reshape(x.shape[0], -1)
        x = Linear(256, name="out1")(x)
        x = BatchNorm(use_running_average=not train, name="bn1")(x)
        x = leaky_relu_true(x)  # ref :57 LeakyReLU(True) quirk
        x = Linear(128, name="out2")(x)
        x = BatchNorm(use_running_average=not train, name="bn2")(x)
        x = leaky_relu_true(x)  # ref :60 LeakyReLU(True) quirk
        x = Linear(self.latent_dim, name="out3")(x)
        mu = Linear(self.latent_dim, name="fc_mu")(x)
        logvar = Linear(self.latent_dim, name="fc_logvar")(x)
        if variational_encoding:
            eps = jax.random.normal(self.make_rng("sample"), mu.shape)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z = mu
        return z, mu, logvar


class PoseDecoderFC(nn.Module):
    """(embedding_net.py:86-128)."""

    gen_length: int
    pose_dim: int
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, latent_code, pre_poses=None, train: bool = False):
        feat = latent_code
        if self.use_pre_poses:
            p = Linear(32, name="pre1")(
                pre_poses.reshape(pre_poses.shape[0], -1))
            p = BatchNorm(use_running_average=not train, name="pre_bn")(p)
            p = nn.relu(p)
            p = Linear(32, name="pre2")(p)
            feat = jnp.concatenate([p, feat], axis=1)
        for i, f in enumerate([128, 128, 256, 512]):
            feat = Linear(f, name=f"fc{i}")(feat)
            feat = BatchNorm(use_running_average=not train,
                             name=f"bn{i}")(feat)
            feat = nn.relu(feat)
        feat = Linear(self.gen_length * self.pose_dim, name="fc_out")(feat)
        return feat.reshape(-1, self.gen_length, self.pose_dim)


class PoseDecoderGRU(nn.Module):
    """(embedding_net.py:131-163)."""

    gen_length: int
    pose_dim: int
    hidden_size: int = 300

    @nn.compact
    def __call__(self, latent_code, pre_poses, train: bool = False):
        B = pre_poses.shape[0]
        p = Linear(32, name="pre1")(pre_poses.reshape(B, -1))
        p = BatchNorm(use_running_average=not train, name="pre_bn")(p)
        p = nn.relu(p)
        p = Linear(32, name="pre2")(p)
        feat = jnp.concatenate([p, latent_code], axis=1)
        feat = jnp.repeat(feat[:, None, :], self.gen_length, axis=1)
        out, _ = GRU(self.hidden_size, 4, bidirectional=True, dropout=0.3,
                     name="gru")(feat, train=train)
        out = sum_bidirectional(out, self.hidden_size)
        out = Linear(self.hidden_size // 2, name="out1")(out)
        out = leaky_relu_true(out)  # ref :149 LeakyReLU(True) quirk
        out = Linear(self.pose_dim, name="out2")(out)
        return out


class PoseDecoderConv(nn.Module):
    """(embedding_net.py:166-218)."""

    length: int
    pose_dim: int
    use_pre_poses: bool = False

    @nn.compact
    def __call__(self, feat, pre_poses=None, train: bool = False):
        if self.use_pre_poses:
            p = Linear(32, name="pre1")(
                pre_poses.reshape(pre_poses.shape[0], -1))
            p = BatchNorm(use_running_average=not train, name="pre_bn")(p)
            p = nn.relu(p)
            p = Linear(32, name="pre2")(p)
            feat = jnp.concatenate([p, feat], axis=1)
        if self.length == 64:
            hidden = 128, 256
        elif self.length == 34:
            hidden = 64, 136
        else:  # generalisation: keep 4 x k channel grid
            hidden = 64, 4 * ((self.length + 6) if self.length > 8 else 8)
        x = Linear(hidden[0], name="pre_fc1")(feat)
        x = BatchNorm(use_running_average=not train, name="pre_bn2")(x)
        x = leaky_relu_true(x)  # ref :185/:192 LeakyReLU(True) quirk
        x = Linear(hidden[1], name="pre_fc2")(x)
        x = x.reshape(feat.shape[0], 4, -1)
        # ConvTranspose/Conv over time with 'frame' channels — NLC layout
        x = jnp.swapaxes(x, 1, 2)  # (B, L, 4)
        x = Conv(32, (3,), padding="VALID", transpose=True, name="d1")(x)
        x = BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = Conv(32, (3,), padding="VALID", transpose=True, name="d2")(x)
        x = BatchNorm(use_running_average=not train, name="bn2")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = Conv(32, (3,), padding="VALID", name="c1")(x)
        x = Conv(self.pose_dim, (3,), padding="VALID", name="c2")(x)
        return x  # already (B, T, D) in NLC — torch transposes from (B, D, T)


class ContextEncoder(nn.Module):
    """(embedding_net.py:221-260)."""

    n_words: int
    n_frames: int = 34

    @nn.compact
    def __call__(self, in_text, in_audio, train: bool = False):
        text_feat, _ = TextEncoderTCN32(self.n_words, frames=self.n_frames,
                                        name="text_encoder")(
            in_text, train=train)
        audio_feat = WavEncoder(name="audio_encoder")(in_audio, train=train)
        x = jnp.concatenate([audio_feat, text_feat], axis=2)
        out, _ = GRU(256, 2, bidirectional=False, name="gru")(x, train=train)
        last = out[:, -1]
        last = Linear(128, name="out1")(last)
        last = BatchNorm(use_running_average=not train, name="bn")(last)
        last = nn.relu(last)
        last = Linear(32, name="out2")(last)
        mu = Linear(32, name="fc_mu")(last)
        logvar = Linear(32, name="fc_logvar")(last)
        eps = jax.random.normal(self.make_rng("sample"), mu.shape)
        return mu + eps * jnp.exp(0.5 * logvar), mu, logvar


class EmbeddingNet(nn.Module):
    """(embedding_net.py:263-316). mode='pose' uses the conv decoder and no
    context encoder; otherwise context + GRU decoder."""

    n_words: int
    pose_dim: int
    n_frames: int
    mode: str = "pose"

    def setup(self):
        if self.mode != "pose":
            self.context_encoder = ContextEncoder(
                self.n_words, self.n_frames, name="context_encoder")
            self.decoder = PoseDecoderGRU(self.n_frames, self.pose_dim,
                                          name="decoder")
        else:
            self.context_encoder = None
            self.decoder = PoseDecoderConv(self.n_frames, self.pose_dim,
                                           name="decoder")
        self.pose_encoder = PoseEncoderConv(name="pose_encoder")

    def __call__(self, in_text, in_audio, pre_poses, poses,
                 input_mode: Optional[str] = None,
                 variational_encoding: bool = False, train: bool = False):
        input_mode = input_mode or self.mode
        if self.context_encoder is not None and in_text is not None \
                and in_audio is not None:
            context_feat, context_mu, context_logvar = self.context_encoder(
                in_text, in_audio, train=train)
        else:
            context_feat = context_mu = context_logvar = None
        poses_feat, pose_mu, pose_logvar = self.pose_encoder(
            poses, variational_encoding, train=train)
        latent = context_feat if input_mode == "speech" else poses_feat
        if self.mode != "pose":
            out_poses = self.decoder(latent, pre_poses, train=train)
        else:
            out_poses = self.decoder(latent, pre_poses, train=train)
        return (context_feat, context_mu, context_logvar,
                poses_feat, pose_mu, pose_logvar, out_poses)
