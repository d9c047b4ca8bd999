"""Skeleton emotion classifier (skeleton_classifer/Models.py:199-283):
pose sequence (B, 60, 282) -> per-frame fc encoder -> 3-layer transformer
encoder -> flatten -> MLP head -> 8 logits; also returns the encoder
output as `mid_feature` (used as the emotion feature space in eval,
test_...py:217-221).
"""
from __future__ import annotations

import flax.linen as nn

from ..core.layers import Linear
from ..nn.transformer import TransformerEncoder


class SkeletonTransformer(nn.Module):
    class_dim: int = 8
    pose_dim: int = 282
    d_model: int = 512
    d_inner: int = 2048
    n_layers: int = 3
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.2
    n_position: int = 60

    @nn.compact
    def __call__(self, pose_seq, train: bool = False):
        B = pose_seq.shape[0]
        # Prior_Encoder (skeleton_classifer/Models.py:88-116)
        x = Linear(self.d_model, name="prior_fc1")(pose_seq)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = Linear(self.d_model, name="prior_fc2")(x)

        mid_feature = TransformerEncoder(
            n_layers=self.n_layers, n_head=self.n_head, d_k=self.d_k,
            d_v=self.d_v, d_model=self.d_model, d_inner=self.d_inner,
            dropout=self.dropout, n_position=self.n_position, name="encoder",
        )(x, train=train)

        # post projector MLP head (skeleton_classifer/Models.py:217-227)
        h = mid_feature.reshape(B, -1)
        h = Linear(self.d_model * 4, name="post_fc1")(h)
        h = nn.relu(h)
        h = Linear(self.d_model, name="post_fc2")(h)
        h = nn.relu(h)
        h = Linear(128, name="post_fc3")(h)
        h = nn.relu(h)
        h = Linear(64, name="post_fc4")(h)
        h = nn.relu(h)
        logits = Linear(self.class_dim, name="post_fc5")(h)
        return logits, mid_feature
