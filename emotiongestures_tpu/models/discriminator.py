"""Adversarial discriminators (Full_model/Models_memory.py:569-618,
Full_model/Models.py:482-510).

MotionDiscriminator consumes 59-frame motion OFFSETS
(motion[1:] - motion[:-1], test_...py:41-44) and emits raw scores
(no sigmoid). Its reference defaults (d_model=128 with a pose_dim-wide
encoder) are internally inconsistent — the encoder only typechecks when
d_model == input dim — so we default d_model=pose_dim, the only
configuration the missing train loop could have used.

PoseDiscriminator scores each frame with a sigmoid head.
"""
from __future__ import annotations

import flax.linen as nn

from ..core.layers import Linear
from ..nn.transformer import TransformerEncoder


class MotionDiscriminator(nn.Module):
    frames: int = 59
    pose_dim: int = 282
    d_model: int = 282
    d_inner: int = 1024
    n_layers: int = 2
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, frames, pose_dim)
        B = x.shape[0]
        x = TransformerEncoder(
            n_layers=self.n_layers, n_head=self.n_head, d_k=self.d_k,
            d_v=self.d_v, d_model=self.d_model, d_inner=self.d_inner,
            dropout=self.dropout, n_position=self.frames, name="encoder",
        )(x, train=train)
        x = Linear(64, name="fc1")(x)
        x = nn.relu(x)
        x = x.reshape(B, -1)
        for i, feats in enumerate([2048, 1024, 256, 64, 16]):
            x = Linear(feats, name=f"fc2_{i}")(x)
            x = nn.relu(x)
        return Linear(1, name="fc2_out")(x)  # raw logits


class PoseDiscriminator(nn.Module):
    frames: int = 60
    pose_dim: int = 282
    d_model: int = 282
    d_inner: int = 1024
    n_layers: int = 3
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TransformerEncoder(
            n_layers=self.n_layers, n_head=self.n_head, d_k=self.d_k,
            d_v=self.d_v, d_model=self.d_model, d_inner=self.d_inner,
            dropout=self.dropout, n_position=self.frames, name="encoder",
        )(x, train=train)
        x = Linear(64, name="fc1")(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = Linear(1, name="fc2")(x)
        return nn.sigmoid(x)  # per-frame probs (Models.py:506-510)


def calc_motion(motion):
    """Frame-difference offsets (test_...py:41-44): (B, T, D) -> (B, T-1, D)."""
    return motion[:, 1:, :] - motion[:, :-1, :]
