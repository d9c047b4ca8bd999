"""Emotion-prior CVAEs (CAVE/BEAT_CVAE.py). Three generations; v3 is the
one the eval entry point uses for diversity sampling
(test_...py:26,167-174,203).

All take (features (B, 60, 512), y one-hot (B, 8)) and expose:
  __call__  -> (reconstruction, mu, logvar)   [posterior + decode]
  sample(y) -> (B, 60, 512)                   [prior z ~ N(0, I)]

Sampling threads explicit PRNG keys (flax rng collection "sample"):
    model.apply(vars, y, method="sample", rngs={"sample": key})
and is trivially vmappable over a num_samples axis — the reference's
"iterative" diversity loop becomes one batched call (SURVEY.md §7).

Reference bug NOT carried over: v1/v2 `sample` crashes on an undefined
`Input` (CAVE/BEAT_CVAE.py:139) — we implement what it obviously meant.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.layers import BatchNorm, Conv, Linear


class _YEmbed(nn.Module):
    """Posterior_Y_embedding: 8 -> 16 -> dropout -> 32 (BEAT_CVAE.py:334-343)."""

    @nn.compact
    def __call__(self, y, train: bool = False):
        y = Linear(16, name="fc1")(y)
        y = nn.Dropout(0.2, deterministic=not train)(y)
        return Linear(32, name="fc2")(y)


class _MLPStack(nn.Module):
    """Linear stack with dropout between layers, matching the reference's
    nn.Sequential(Linear, Dropout, Linear, ...) pattern."""

    features: Tuple[int, ...]
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.features):
            if i > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = Linear(f, name=f"fc{i}")(x)
        return x


def _reparameterize(rng, mu, logvar):
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, std.shape, std.dtype)
    return eps * std + mu


class _MLPCVAEBase(nn.Module):
    """Shared skeleton for v1/v2: per-frame MLP encoder/decoder over
    (B, 60, 512) emotion features; z=32 concat y-embedding(32)."""

    latent_dim: int = 32
    frames: int = 60
    enc_features: Sequence[int] = (512, 256, 128, 64, 32)
    dec_features: Sequence[int] = (64, 128, 256, 512, 512)

    def setup(self):
        self.encoder = _MLPStack(tuple(self.enc_features), name="encoder")
        self.decoder = _MLPStack(tuple(self.dec_features), name="decoder")
        self.y_embed = _YEmbed(name="y_embed")
        self._setup_heads()

    def _fuse_decode(self, z, post_y, n, train):
        z = jnp.concatenate([z, post_y], axis=1)
        z = self.fusion(z, train=train)
        z = z.reshape(n, self.frames, 32)
        return self.decoder(z, train=train)

    def __call__(self, x, y, train: bool = False):
        B = x.shape[0]
        enc = self.encoder(x, train=train).reshape(B, -1)
        mu = self.fc_mu(enc, train=train)
        logvar = self.fc_var(enc, train=train)
        z = _reparameterize(self.make_rng("sample"), mu, logvar)
        post_y = self.y_embed(y, train=train)
        return self._fuse_decode(z, post_y, B, train), mu, logvar

    def sample(self, y, train: bool = False):
        n = y.shape[0]
        post_y = self.y_embed(y, train=train)
        z = jax.random.normal(self.make_rng("sample"), (n, self.latent_dim))
        return self._fuse_decode(z, post_y, n, train)


class EmotionCVAEv1(_MLPCVAEBase):
    """MLP CVAE (CAVE/BEAT_CVAE.py:30-154): plain fc_mu/fc_var."""

    def _setup_heads(self):
        self.fc_mu = _MLPStack((self.latent_dim,), name="fc_mu")
        self.fc_var = _MLPStack((self.latent_dim,), name="fc_var")
        self.fusion = _MLPStack(
            (self.frames * 32, self.frames * 32), name="fusion")


class EmotionCVAEv2(_MLPCVAEBase):
    """Deeper fc_mu/fc_var/fusion variant (CAVE/BEAT_CVAE.py:157-308)."""

    def _setup_heads(self):
        self.fc_mu = _MLPStack((1024, 512, 256, 64, 32), name="fc_mu")
        self.fc_var = _MLPStack((1024, 512, 256, 64, 32), name="fc_var")
        self.fusion = _MLPStack(
            (256, 512, 1024, self.frames * 32), name="fusion")


class _ConvEncoderV3(nn.Module):
    """Frame-channel conv stack 60->32->16->8->4 with strided length
    halving 512->256->128 (CAVE/BEAT_CVAE.py:318-332)."""

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, 60, 512)
        h = jnp.swapaxes(x, 1, 2)  # NLC: (B, 512, 60)
        for i, (ch, k, s) in enumerate(
            [(32, 3, 1), (16, 3, 1), (8, 5, 2), (4, 5, 2)]
        ):
            h = Conv(ch, (k,), strides=s, padding=k // 2,
                     name=f"conv{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            h = BatchNorm(use_running_average=not train, name=f"bn{i}")(h)
        return h  # (B, 128, 4) NLC


class _ConvDecoderV3(nn.Module):
    """ConvTranspose 128->256->512 then conv back to 60 frame-channels
    (CAVE/BEAT_CVAE.py:355-369)."""

    @nn.compact
    def __call__(self, z, train: bool = False):  # (B, 4, 128)
        h = jnp.swapaxes(z, 1, 2)  # NLC: (B, 128, 4)
        for i, ch in enumerate([8, 16]):
            # torch ConvTranspose1d(k=3, s=2, p=1, output_padding=1)
            # == dilate-by-2 then pad (1, 2); lax's "SAME" distributes
            # (2, 1) instead, so the padding must be explicit
            # (verified in tests/test_torch_parity_aux.py)
            h = Conv(ch, (3,), strides=2, padding=((1, 2),), transpose=True,
                     name=f"deconv{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            h = BatchNorm(use_running_average=not train, name=f"bn{i}")(h)
        for i, ch in enumerate([32, 60]):
            h = Conv(ch, (3,), padding=1, name=f"conv{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            h = BatchNorm(use_running_average=not train,
                          name=f"bn{i + 2}")(h)
        h = Conv(60, (3,), padding=1, name="conv_out")(h)
        return jnp.swapaxes(h, 1, 2)  # (B, 60, 512)


class HandCVAE(nn.Module):
    """Legacy per-frame 90-d hand CVAE (Full_model/BEAT_CVAE.py:30-149):
    x (B, 90) hand pose, y (B, 90) condition pose; z=32 ⊕ y-embed(32) ->
    fusion(64 -> 512) -> decoder -> 90."""

    latent_dim: int = 32
    hand_dim: int = 90

    def setup(self):
        self.encoder = _MLPStack((128, 128, 256, 256, 512), name="encoder")
        self.decoder = _MLPStack((256, 256, 128, 128, self.hand_dim),
                                 name="decoder")
        self.y_embed = _MLPStack((64, 32), name="y_embed")
        self.fc_mu = _MLPStack((self.latent_dim,), name="fc_mu")
        self.fc_var = _MLPStack((self.latent_dim,), name="fc_var")
        self.fusion = _MLPStack((256, 512), name="fusion")

    def _fuse_decode(self, z, post_y, train):
        z = jnp.concatenate([z, post_y], axis=1)
        z = self.fusion(z, train=train)
        return self.decoder(z, train=train)

    def __call__(self, x, y, train: bool = False):
        enc = self.encoder(x, train=train)
        mu = self.fc_mu(enc, train=train)
        logvar = self.fc_var(enc, train=train)
        z = _reparameterize(self.make_rng("sample"), mu, logvar)
        post_y = self.y_embed(y, train=train)
        return self._fuse_decode(z, post_y, train), mu, logvar

    def sample(self, y, train: bool = False):
        post_y = self.y_embed(y, train=train)
        z = jax.random.normal(self.make_rng("sample"),
                              (y.shape[0], self.latent_dim))
        return self._fuse_decode(z, post_y, train)


class EmotionCVAEv3(nn.Module):
    """Conv CVAE, the production prior (CAVE/BEAT_CVAE.py:312-460)."""

    latent_dim: int = 32
    frames: int = 60
    feat_dim: int = 512

    def setup(self):
        self.encoder = _ConvEncoderV3(name="encoder")
        self.decoder = _ConvDecoderV3(name="decoder")
        self.y_embed = _YEmbed(name="y_embed")
        self.fc_mu = _MLPStack((128, self.latent_dim), name="fc_mu")
        self.fc_var = _MLPStack((128, self.latent_dim), name="fc_var")
        # 4 latent frame-channels over feat_dim/4 length (512 -> 4x128 in
        # the reference; parametric so d_model != 512 generators work)
        self.fusion = _MLPStack((128, 4 * (self.feat_dim // 4)),
                                name="fusion")

    def _fuse_decode(self, z, post_y, n, train):
        z = jnp.concatenate([z, post_y], axis=1)
        z = self.fusion(z, train=train)
        z = z.reshape(n, 4, self.feat_dim // 4)
        return self.decoder(z, train=train)

    def __call__(self, x, y, train: bool = False):
        B = x.shape[0]
        enc = self.encoder(x, train=train)  # (B, 128, 4) NLC
        flat = jnp.swapaxes(enc, 1, 2).reshape(B, -1)  # torch (B, 4*128)
        mu = self.fc_mu(flat, train=train)
        logvar = self.fc_var(flat, train=train)
        z = _reparameterize(self.make_rng("sample"), mu, logvar)
        post_y = self.y_embed(y, train=train)
        return self._fuse_decode(z, post_y, B, train), mu, logvar

    def sample(self, y, train: bool = False):
        """Prior sampling (CAVE/BEAT_CVAE.py:427-447)."""
        n = y.shape[0]
        post_y = self.y_embed(y, train=train)
        z = jax.random.normal(self.make_rng("sample"), (n, self.latent_dim))
        return self._fuse_decode(z, post_y, n, train)
