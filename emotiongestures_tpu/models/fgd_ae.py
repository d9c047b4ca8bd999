"""FGD feature autoencoder (model/FGD.py:26-82): per-frame MLP AE over
282-d poses; the 512-d latent is the FGD feature space
(test_...py:226-232).
"""
from __future__ import annotations

import flax.linen as nn

from ..core.layers import Linear


class FGDAutoEncoder(nn.Module):
    pose_dim: int = 282
    latent_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Linear(self.latent_dim, name="enc_fc1")(x)
        h = nn.Dropout(0.2, deterministic=not train)(h)
        h = Linear(self.latent_dim, name="enc_fc2")(h)
        h = nn.Dropout(0.2, deterministic=not train)(h)
        latent = Linear(self.latent_dim, name="enc_fc3")(h)

        d = Linear(self.latent_dim, name="dec_fc1")(latent)
        d = nn.Dropout(0.2, deterministic=not train)(d)
        d = Linear(self.latent_dim, name="dec_fc2")(d)
        d = nn.Dropout(0.2, deterministic=not train)(d)
        recon = Linear(self.pose_dim, name="dec_fc3")(d)
        return recon, latent
