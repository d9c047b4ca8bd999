"""HA2G hierarchy baseline (model/hierarchy_net.py + the multi-resolution
audio encoder model/ResNetSE34V2.py:13-181): 4-stage SE-ResNet whose
low/mid/high stage features are PixelShuffle-upsampled, projected to 60
frames, and blended per pose level with speaker-conditioned softmax
weights.
"""
from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp

from ...core import init as winit
from ...core.layers import BatchNorm, Conv, Linear
from ...nn.gru import GRU, sum_bidirectional
from ...nn.resnet_se import SEBasicBlock
from .trimodal import TextEncoderTCN32


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch nn.PixelShuffle in NHWC: (B, H, W, C*r^2) -> (B, H*r, W*r, C);
    channel decomposition (c, i, j) with c slowest, matching torch."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # B, H, r, W, r, c
    return x.reshape(B, H * r, W * r, c)


class HierarchicalWavEncoder(nn.Module):
    """model/ResNetSE34V2.py:13-181 wrapped per hierarchy_net.py:17-26.

    Input (B, 128, T) mel spectrogram; returns
    (weight (B, 3, pose_level) or None, feat_low/mid/high (B, 60, nOut),
     linear_blend_feat list of pose_level blended (B, 60, nOut))."""

    n_out: int = 32
    pose_level: int = 3
    n_speakers: int = 0  # >0 enables the speaker-weighted blend

    @nn.compact
    def __call__(self, spec, vid_indices=None, train: bool = False):
        x = spec[..., None]
        x = Conv(32, (3, 3), padding=1,
                 kernel_init=winit.kaiming_normal_fan_out, name="conv1")(x)
        x = nn.relu(x)
        x = BatchNorm(use_running_average=not train, name="bn1")(x)

        inplanes = 32
        feats = []
        for stage, (planes, blocks) in enumerate(
            zip([32, 64, 128, 256], [3, 4, 6, 3])
        ):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_down = b == 0 and (s != 1 or inplanes != planes)
                x = SEBasicBlock(planes, stride=s, has_downsample=needs_down,
                                 train=train,
                                 name=f"layer{stage + 1}_block{b}")(x)
                inplanes = planes
            if stage >= 1:
                feats.append(x)
        feat1, feat2, feat3 = feats  # layer2/3/4 outputs

        def head(f, shuffle, k, name):
            if shuffle > 1:
                f = pixel_shuffle(f, shuffle)
            f = Conv(60, (k, k), padding=0, name=f"conv_{name}")(f)
            f = nn.relu(f)
            f = BatchNorm(use_running_average=not train,
                          name=f"bn_{name}")(f)
            B = f.shape[0]
            f = jnp.transpose(f, (0, 3, 1, 2)).reshape(B, 60, -1)
            return Linear(self.n_out, name=f"fc_{name}")(f)

        feat_low = head(feat1, 1, 2, "low")
        feat_mid = head(feat2, 2, 3, "mid")
        feat_high = head(feat3, 4, 3, "high")

        weight = None
        blended = []
        if self.n_speakers:
            table = self.param("speaker_embedding", winit.normal_(1.0),
                               (self.n_speakers, 16))
            z = jnp.take(table, vid_indices, axis=0)
            z = Linear(16, name="speaker_fc")(z)
            z = nn.elu(z)
            z = nn.elu(Linear(32, name="fc1")(z))
            B = z.shape[0]
            w = Linear(self.pose_level * 3, name="fc2")(z).reshape(
                B, 3, self.pose_level)
            weight = nn.softmax(w, axis=1)
            for i in range(self.pose_level):
                blended.append(
                    feat_low * weight[:, 0, i][:, None, None]
                    + feat_mid * weight[:, 1, i][:, None, None]
                    + feat_high * weight[:, 2, i][:, None, None])
        return weight, feat_low, feat_mid, feat_high, blended


class HierarchicalPoseGenerator(nn.Module):
    """(hierarchy_net.py:68-163): pre_seq + blended audio feature + TCN
    text feature (+ speaker z) -> bi-GRU -> poses."""

    n_words: int
    pose_dim: int = 282
    n_poses: int = 60
    n_pre_poses: int = 10
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3
    input_context: str = "both"
    n_speakers: int = 0
    z_size: int = 16
    word_embed_size: int = 300

    @nn.compact
    def __call__(self, pre_seq, in_text, audio_feat_seq, vid_indices=None,
                 train: bool = False):
        import jax

        feats = [pre_seq]
        # args.hidden_size/args.n_layers feed BOTH the TCN channel stack
        # and the GRU (hierarchy_net.py:43,103) — keep that coupling
        text_feat, _ = TextEncoderTCN32(
            self.n_words, embed_size=self.word_embed_size,
            hidden_size=self.hidden_size, n_layers=self.n_layers,
            frames=self.n_poses, dropout=self.dropout,
            name="text_encoder")(in_text, train=train)
        if self.input_context == "both":
            feats += [audio_feat_seq, text_feat]
        elif self.input_context == "audio":
            feats += [audio_feat_seq]
        elif self.input_context == "text":
            feats += [text_feat]

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
        # hierarchy_net.py:104 writes LeakyReLU(inplace=True) — a REAL
        # 0.01-slope leaky relu, unlike the trimodal family's
        # LeakyReLU(True) identity quirk (see quirks.leaky_relu_true)
        out = nn.leaky_relu(out)
        out = Linear(self.pose_dim, name="out_fc2")(out)
        return out, z_context, z_mu, z_logvar


class HierarchicalDiscriminator(nn.Module):
    """GRU pose discriminator (hierarchy_net.py:166-208). The reference's
    optional text branch is dead code: it calls TextEncoderTCN with
    shifted positional args (hierarchy_net.py:172 — `args` receives
    n_words) and would crash, so only the no-text configuration is real.
    """

    hidden_size: int = 300
    n_layers: int = 4
    n_poses: int = 60
    dropout: float = 0.3

    @nn.compact
    def __call__(self, poses, train: bool = False):
        out, _ = GRU(self.hidden_size, self.n_layers, bidirectional=True,
                     dropout=self.dropout, name="gru")(poses, train=train)
        out = sum_bidirectional(out, self.hidden_size)
        out = Linear(1, name="out")(out)[..., 0]  # (B, T)
        out = Linear(1, name="out2")(out)
        return nn.sigmoid(out)


class HierarchicalConvDiscriminator(nn.Module):
    """Conv pose discriminator (hierarchy_net.py:211-255): 3 VALID convs
    (60 -> 54 frames, hence out2's Linear(54, 1)) -> 4-layer bi-GRU ->
    per-frame fc -> frame-mix fc -> sigmoid. Unlike the trimodal
    ConvDiscriminator this one uses REAL LeakyReLU(inplace=True)
    (hierarchy_net.py:222,225)."""

    hidden_size: int = 64

    @nn.compact
    def __call__(self, poses, train: bool = False):
        x = poses
        for i, c in enumerate([16, 8]):
            x = Conv(c, (3,), padding="VALID", name=f"conv{i}")(x)
            x = BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            x = nn.leaky_relu(x)  # slope 0.01, matching inplace=True kwarg
        x = Conv(8, (3,), padding="VALID", name="conv2")(x)
        out, _ = GRU(self.hidden_size, 4, bidirectional=True, dropout=0.3,
                     name="gru")(x, train=train)
        out = sum_bidirectional(out, self.hidden_size)
        out = Linear(1, name="out")(out)[..., 0]
        out = Linear(1, name="out2")(out)
        return nn.sigmoid(out)
