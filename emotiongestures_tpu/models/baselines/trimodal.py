"""Trimodal baseline (model/multimodal_context_net.py): raw-wave encoder +
TCN text encoder + speaker latent -> bi-GRU pose generator; GRU and conv
discriminators.
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import init as winit
from ...core.layers import BatchNorm, Conv, Linear
from ...nn.gru import GRU, sum_bidirectional
from ...nn.tcn import TemporalConvNet
from .quirks import leaky_relu_true


class WavEncoder(nn.Module):
    """Strided conv1d stack over the raw waveform
    (multimodal_context_net.py:13-40): (B, 64000) -> (B, 60, 32).
    Note the reference's fc1 Linear(60, 60) acts on the TIME axis."""

    @nn.compact
    def __call__(self, wav, train: bool = False):
        x = wav[..., None]  # (B, n, 1) NLC
        specs = [(16, 15, 5, 1600), (32, 15, 6, 0), (64, 15, 6, 0),
                 (32, 15, 6, 0)]
        for i, (c, k, s, p) in enumerate(specs):
            x = Conv(c, (k,), strides=s,
                     padding=p if p else "VALID", name=f"conv{i}")(x)
            if i < 3:
                x = BatchNorm(use_running_average=not train,
                              name=f"bn{i}")(x)
                x = nn.leaky_relu(x, negative_slope=0.3)
        # (B, 60, 32); time-mix fc over the 60 axis
        x = jnp.swapaxes(x, 1, 2)
        x = Linear(x.shape[-1], name="fc1")(x)
        return jnp.swapaxes(x, 1, 2)  # (B, seq, dim)


class TextEncoderTCN32(nn.Module):
    """TCN text encoder, 32-d output variant
    (multimodal_context_net.py:43-77). Returns (feat, 0) like the ref."""

    n_words: int
    embed_size: int = 300
    hidden_size: int = 300
    n_layers: int = 3
    frames: int = 60
    dropout: float = 0.3
    emb_dropout: float = 0.1

    @nn.compact
    def __call__(self, tokens, train: bool = False):
        table = self.param("embedding", winit.normal_(1.0),
                           (self.n_words, self.embed_size))
        emb = jnp.take(table, tokens, axis=0)
        emb = nn.Dropout(self.emb_dropout, deterministic=not train)(emb)
        y = TemporalConvNet([self.hidden_size] * self.n_layers,
                            kernel_size=2, dropout=self.dropout,
                            name="tcn")(emb, train=train)
        y = jnp.swapaxes(y, 1, 2)
        y = Linear(self.frames, name="fc1")(y)
        y = jnp.swapaxes(y, 1, 2)
        y = Linear(32, kernel_init=winit.normal_(0.01), name="decoder")(y)
        return y, 0


class PoseGenerator(nn.Module):
    """(multimodal_context_net.py:80-179)."""

    n_words: int
    pose_dim: int = 282
    n_poses: int = 60
    n_pre_poses: int = 10
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3
    input_context: str = "both"  # both | audio | text | none
    n_speakers: int = 0  # >0 enables the speaker z path
    z_size: int = 16

    @nn.compact
    def __call__(self, pre_seq, in_text, in_audio, vid_indices=None,
                 train: bool = False):
        """pre_seq: (B, n_poses, pose_dim + 1) — poses with the constraint
        bit appended (1 for the seeded pre-pose frames)."""
        feats = [pre_seq]
        if self.input_context in ("both", "audio"):
            feats.append(WavEncoder(name="audio_encoder")(
                in_audio, train=train))
        if self.input_context in ("both", "text"):
            # the reference couples args.hidden_size/args.n_layers into
            # BOTH the TCN channel stack and the GRU
            # (multimodal_context_net.py:57,114) — keep that coupling
            text_feat, _ = TextEncoderTCN32(
                self.n_words, hidden_size=self.hidden_size,
                n_layers=self.n_layers, frames=self.n_poses,
                dropout=self.dropout, name="text_encoder")(
                in_text, train=train)
            feats.append(text_feat)

        z_mu = z_logvar = z_context = None
        if self.n_speakers:
            table = self.param("speaker_embedding", winit.normal_(1.0),
                               (self.n_speakers, self.z_size))
            z = jnp.take(table, vid_indices, axis=0)
            z = Linear(self.z_size, name="speaker_fc")(z)
            z_mu = Linear(self.z_size, name="speaker_mu")(z)
            z_logvar = Linear(self.z_size, name="speaker_logvar")(z)
            eps = jax.random.normal(self.make_rng("sample"), z_mu.shape)
            z_context = z_mu + eps * jnp.exp(0.5 * z_logvar)
            feats.append(jnp.repeat(z_context[:, None, :],
                                    pre_seq.shape[1], axis=1))

        in_data = jnp.concatenate(feats, axis=2)
        out, _ = GRU(self.hidden_size, self.n_layers, bidirectional=True,
                     dropout=self.dropout, name="gru")(in_data, train=train)
        out = sum_bidirectional(out, self.hidden_size)
        out = Linear(self.hidden_size // 2, name="out_fc1")(out)
        out = leaky_relu_true(out)  # ref :118 LeakyReLU(True) quirk
        out = Linear(self.pose_dim, name="out_fc2")(out)
        return out, z_context, z_mu, z_logvar


class TrimodalDiscriminator(nn.Module):
    """GRU discriminator (multimodal_context_net.py:182-223)."""

    n_poses: int = 60
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(self, poses, train: bool = False):
        out, _ = GRU(self.hidden_size, self.n_layers, bidirectional=True,
                     dropout=self.dropout, name="gru")(poses, train=train)
        out = sum_bidirectional(out, self.hidden_size)
        out = Linear(1, name="out")(out)[..., 0]  # (B, T)
        out = Linear(1, name="out2")(out)
        return nn.sigmoid(out)


class ConvDiscriminator(nn.Module):
    """Conv+GRU discriminator (multimodal_context_net.py:226-272)."""

    hidden_size: int = 64

    @nn.compact
    def __call__(self, poses, train: bool = False):  # (B, T, D)
        x = poses
        for i, c in enumerate([16, 8]):
            x = Conv(c, (3,), padding="VALID", name=f"conv{i}")(x)
            x = BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            x = leaky_relu_true(x)  # ref :235,238 LeakyReLU(True) quirk
        x = Conv(8, (3,), padding="VALID", name="conv2")(x)
        out, _ = GRU(self.hidden_size, 4, bidirectional=True, dropout=0.3,
                     name="gru")(x, train=train)
        out = sum_bidirectional(out, self.hidden_size)
        out = Linear(1, name="out")(out)[..., 0]
        out = Linear(1, name="out2")(out)
        return nn.sigmoid(out)
