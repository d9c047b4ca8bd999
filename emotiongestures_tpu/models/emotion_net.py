"""Audio emotion classifier (model/audio_emotion_classifer.py:17-49):
4-stage SE-ResNet over (B, 128, 124) log-mel windows -> flatten
(B, 16*16*256) -> MLP -> 8 emotion logits.

The reference exposes a latent bug (`model.num_classes` referenced by the
trainer but never defined — train_audio_classifier_K_fold.py:151); we
define num_classes properly.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..core.layers import Linear
from ..nn.resnet_se import ResNetSE


class EmotionNet(nn.Module):
    num_classes: int = 8

    @nn.compact
    def __call__(self, spec, train: bool = False):  # (B, 128, T)
        x = spec[..., None]  # NHWC
        x = ResNetSE(layers=[3, 4, 6, 3], num_filters=[32, 64, 128, 256],
                     name="emotion_encoder")(x, train=train)
        B = x.shape[0]
        # torch flattens (C, H, W); we hold NHWC -> transpose for weight
        # layout parity with (B, 256*16*16) checkpoints
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, -1)
        for i, feats in enumerate([4096, 2048, 512, 128, 64]):
            x = Linear(feats, name=f"fc{i}")(x)
            x = nn.relu(x)
        return Linear(self.num_classes, name="last_fc")(x)


class DisNet(nn.Module):
    """Tiny MLP discriminator head (model/audio_emotion_classifer.py:51-70);
    unused by the entry points but part of the inventory."""

    @nn.compact
    def __call__(self, feature):
        x = Linear(64, name="fc1")(feature)
        x = nn.relu(x)
        x = Linear(16, name="fc2")(x)
        x = nn.relu(x)
        x = Linear(1, name="fc3")(x)
        return nn.relu(x)
