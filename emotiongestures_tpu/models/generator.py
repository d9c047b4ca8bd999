"""The co-speech gesture generator — the flagship model.

TPU-first redesign of the reference's Full_model/ generator family
(Models.py, Models_memory.py, Models_spatial_memory.py,
Models_padding_initial.py). One parametric `GestureTransformer` with a
`prior_encoder` variant switch replaces the reference's four near-copies:

  variant="memory"          == Models_memory.Transformer   (eval flagship:
                               SP_v1 + TM memory, diversity sampling hook)
  variant="base"            == Models.Transformer           (conv prior enc)
  variant="spatial_memory"  == Models_spatial_memory        (SP_v2 only)
  variant="padding_initial" == Models_padding_initial       (SP_v2 + TM)

All reference python loops are vectorised:
  * SP memory's per-(batch, frame) sigmoid gating
    (Models_memory.py:239-249) is one einsum + broadcast blend;
  * TM memory's cross-batch softmax rescale (Models_memory.py:282-293)
    is two small GEMMs. It genuinely couples the batch — a reference
    quirk we keep and document. Under our data parallelism (GSPMD jit
    over a mesh, parallel/mesh.py) the coupling is computed GLOBALLY:
    XLA all-gathers the small (B, D) operands, so the sharded step
    matches single-device execution to fp32 tolerance
    (tests/test_parallel.py::test_dp_gan_train_step_matches_single_device).
    A per-shard deviation would only arise under shard_map, which the
    DP path does not use.

Faithful quirks kept (SURVEY.md §7 hard part 7): unmasked attention,
decoder without self-attention/pos-enc, post-LN, xavier-uniform re-init
of every ndim>1 param (including pretrained word embeddings —
Models_memory.py:512-514 really does clobber them; disable with
init_xavier_all=False at construction of the params, see
`xavier_reinit_all`).
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import init as winit
from ..core.layers import BatchNorm, Conv, Linear
from ..nn.resnet_se import ResNetSE
from ..nn.tcn import TemporalConvNet
from ..nn.transformer import TransformerDecoder, TransformerEncoder


class AudioResNetEncoder(nn.Module):
    """Mel-spectrogram (B, n_mels, T) -> (B, frames, d_model)
    (Full_model/Models_memory.py:92-133): 3-stage SE-ResNet, conv to
    `frames` channels, flatten freq*time per frame, two fcs."""

    frames: int = 60
    d_model: int = 512
    remat_blocks: bool = False  # jax.checkpoint per residual block

    @nn.compact
    def __call__(self, spec, train: bool = False):
        B = spec.shape[0]
        x = spec[..., None]  # NHWC, channel dim = 1
        x = ResNetSE(layers=[3, 4, 6], num_filters=[32, 64, 128],
                     remat_blocks=self.remat_blocks,
                     name="feat_extractor")(x, train=train)
        x = Conv(self.frames, (3, 3), padding=1, name="final_conv1")(x)
        x = BatchNorm(use_running_average=not train, name="bn1")(x)
        # torch layout flattens (H, W) per frame-channel: (B, frames, H*W)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, self.frames, -1)
        x = Linear(self.d_model, name="fc1")(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = Linear(self.d_model, name="fc2")(x)
        return x


class AudioConvEncoder(nn.Module):
    """Lighter 2-conv alternative (Full_model/Models_memory.py:59-89);
    unused by the flagship but part of the model zoo."""

    frames: int = 60
    d_model: int = 512

    @nn.compact
    def __call__(self, spec, train: bool = False):
        B = spec.shape[0]
        x = spec[..., None]
        x = Conv(self.frames, (3, 3), padding=1, name="conv1")(x)
        x = nn.relu(x)
        x = BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = Conv(self.frames, (3, 3), padding=1, name="conv2")(x)
        x = nn.relu(x)
        x = BatchNorm(use_running_average=not train, name="bn2")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, self.frames, -1)
        x = Linear(self.d_model, name="fc1")(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = Linear(self.d_model, name="fc2")(x)
        return x


class TextEncoderTCN(nn.Module):
    """Word indices (B, frames) -> (B, frames, 512)
    (Full_model/Models_memory.py:143-179): fasttext-initialisable
    embedding -> TCN -> fc over the TIME axis -> linear to 512."""

    n_words: int
    embed_size: int = 300
    hidden_size: int = 300
    n_layers: int = 3
    frames: int = 60
    kernel_size: int = 2
    dropout: float = 0.1
    emb_dropout: float = 0.1
    freeze_wordembed: bool = False

    @nn.compact
    def __call__(self, tokens, train: bool = False):
        emb_table = self.param(
            "embedding", winit.normal_(1.0), (self.n_words, self.embed_size)
        )
        if self.freeze_wordembed:
            emb_table = jax.lax.stop_gradient(emb_table)
        emb = jnp.take(emb_table, tokens, axis=0)  # (B, L, E)
        emb = nn.Dropout(self.emb_dropout, deterministic=not train)(emb)
        y = TemporalConvNet(
            num_channels=[self.hidden_size] * self.n_layers,
            kernel_size=self.kernel_size,
            dropout=self.dropout,
            name="tcn",
        )(emb, train=train)  # (B, L, hidden)
        # reference fc1 mixes over the time axis in (B, C, L) layout
        # (Models_memory.py:164-176)
        y = jnp.swapaxes(y, 1, 2)  # (B, hidden, L)
        y = Linear(self.frames, name="fc1")(y)
        y = jnp.swapaxes(y, 1, 2)  # (B, L, hidden)
        y = Linear(512, kernel_init=winit.normal_(0.01),
                   name="decoder")(y)
        return y


class PriorConvEncoder(nn.Module):
    """Seed poses (B, prior_frames, pose_dim) -> (B, frames, d_model)
    via frame-axis convs (Full_model/Models.py:184-212)."""

    prior_frames: int = 10
    frames: int = 60
    d_model: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch Conv1d treats frames as channels: (B, F, D) convolves over D
        def frame_conv(x, out_frames, name):
            # (B, F, D) -> (B, D, F) NLC w/ channels=frames -> conv -> back
            h = jnp.swapaxes(x, 1, 2)
            h = Conv(out_frames, (3,), padding=1, name=name)(h)
            return jnp.swapaxes(h, 1, 2)

        x = frame_conv(x, self.frames, "conv1")
        x = nn.relu(x)
        x = BatchNorm(use_running_average=not train, name="bn1")(
            jnp.swapaxes(x, 1, 2))
        x = jnp.swapaxes(x, 1, 2)
        x = frame_conv(x, self.frames, "conv2")
        x = nn.relu(x)
        x = BatchNorm(use_running_average=not train, name="bn2")(
            jnp.swapaxes(x, 1, 2))
        x = jnp.swapaxes(x, 1, 2)
        x = Linear(self.d_model, name="fc1")(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = Linear(self.d_model, name="fc2")(x)
        return x


class SPMemoryV1(nn.Module):
    """Spatial memory v1 (Full_model/Models_memory.py:215-251), vectorised.

    The reference's double python loop computes, for the first
    `chunk_length` predicted frames only:
        score = <mem_b, pred_bc>;  gate = sigmoid(score)
        pred[b, c] = gate * pred[b, c] + (1 - gate) * mem_b
    reading from a clone (original values). One einsum + blend here.
    """

    prior_frames: int
    pose_dim: int
    chunk_length: int = 10

    @nn.compact
    def __call__(self, initial_feature, pred_feature, train: bool = False):
        B = initial_feature.shape[0]
        last_chunk = initial_feature[
            :, self.prior_frames - self.chunk_length :, :
        ].reshape(B, -1)
        mem = Linear(self.pose_dim, name="enc_fc1")(last_chunk)
        mem = nn.Dropout(0.2, deterministic=not train)(mem)
        mem = Linear(self.pose_dim, name="enc_fc2")(mem)  # (B, D)

        head = pred_feature[:, : self.chunk_length, :]  # (B, C, D)
        score = jnp.einsum("bd,bcd->bc", mem, head)
        gate = nn.sigmoid(score)[..., None]
        blended = gate * head + (1.0 - gate) * mem[:, None, :]
        return jnp.concatenate(
            [blended, pred_feature[:, self.chunk_length :, :]], axis=1
        )


class SPMemoryV2(nn.Module):
    """Spatial memory v2 (Full_model/Models_spatial_memory.py:255-295).

    NOTE the reference writes its blended frames into a CLONE and returns
    the ORIGINAL pred_feature (line 292-295) — v2 is a behavioral no-op
    whose encoder params receive no gradient. We reproduce that exactly
    (the conv encoder still runs so parameter trees match)."""

    prior_frames: int
    pose_dim: int
    chunk_length: int = 10

    @nn.compact
    def __call__(self, initial_feature, pred_feature, train: bool = False):
        last_chunk = initial_feature[
            :, self.prior_frames - self.chunk_length :, :
        ]
        # conv over pose_dim with frame-channels chunk->1->1
        h = jnp.swapaxes(last_chunk, 1, 2)  # (B, D, C)
        h = Conv(1, (3,), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = BatchNorm(use_running_average=not train, name="bn1")(h)
        h = Conv(1, (3,), padding=1, name="conv2")(h)
        h = nn.relu(h)
        h = BatchNorm(use_running_average=not train, name="bn2")(h)
        # the blend below is discarded by the reference; keep its compute
        # out of the graph entirely (XLA would DCE it anyway).
        return pred_feature


class TMMemory(nn.Module):
    """Temporal memory (Full_model/Models_memory.py:263-293), vectorised.

    score = mem @ (mem^T @ pred_enc): genuinely couples the batch — kept
    verbatim. Under a data-parallel GSPMD mesh the coupling is computed
    over the GLOBAL batch (XLA all-gathers the small (B, D) operands),
    identical to single-device execution — verified by
    tests/test_parallel.py::test_dp_gan_train_step_matches_single_device;
    see also the module docstring above."""

    prior_frames: int
    pose_dim: int
    chunk_length: int = 10

    @nn.compact
    def __call__(self, initial_feature, pred_feature, train: bool = False):
        B = initial_feature.shape[0]
        last_chunk = initial_feature[
            :, self.prior_frames - self.chunk_length :, :
        ].reshape(B, -1)
        mem = Linear(self.pose_dim, name="chunk_fc1")(last_chunk)
        mem = nn.Dropout(0.2, deterministic=not train)(mem)
        mem = Linear(self.pose_dim, name="chunk_fc2")(mem)  # (B, D)

        head = pred_feature[:, : self.chunk_length, :]
        pe = Linear(self.chunk_length, name="mem_fc1")(head.reshape(B, -1))
        pe = nn.Dropout(0.2, deterministic=not train)(pe)
        pe = Linear(self.chunk_length, name="mem_fc2")(pe)  # (B, C)

        score = mem @ (mem.T @ pe)  # (B, C) — cross-batch by design
        soft = nn.softmax(score, axis=1)
        rescaled = head + head * soft[..., None]
        return jnp.concatenate(
            [rescaled, pred_feature[:, self.chunk_length :, :]], axis=1
        )


class PriorMemoryEncoder(nn.Module):
    """Seed frames -> extrapolated frames -> memory blending -> d_model
    (Full_model/Models_memory.py:299-345)."""

    prior_frames: int = 10
    frames: int = 60
    pose_dim: int = 282
    d_model: int = 512
    chunk_length: int = 10
    use_spatial_v2: bool = False
    use_temporal: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        pred_length = self.frames - self.prior_frames
        initial_feature = x  # raw seed poses (B, prior, pose_dim)

        # pred_conv: frame-channel convs extrapolating prior->pred frames
        h = jnp.swapaxes(x, 1, 2)  # (B, pose_dim, prior) as NLC w/ C=frames
        h = Conv(pred_length, (3,), padding=1, name="pred_conv1")(h)
        h = nn.relu(h)
        h = BatchNorm(use_running_average=not train, name="pred_bn1")(h)
        h = Conv(pred_length, (3,), padding=1, name="pred_conv2")(h)
        h = nn.relu(h)
        h = BatchNorm(use_running_average=not train, name="pred_bn2")(h)
        pred_feature = jnp.swapaxes(h, 1, 2)  # (B, pred_length, pose_dim)

        if self.use_spatial_v2:
            pred_feature = SPMemoryV2(
                self.prior_frames, self.pose_dim, self.chunk_length,
                name="spatial_memory",
            )(initial_feature, pred_feature, train=train)
        else:
            pred_feature = SPMemoryV1(
                self.prior_frames, self.pose_dim, self.chunk_length,
                name="spatial_memory",
            )(initial_feature, pred_feature, train=train)
        if self.use_temporal:
            pred_feature = TMMemory(
                self.prior_frames, self.pose_dim, self.chunk_length,
                name="temporal_memory",
            )(initial_feature, pred_feature, train=train)

        out = jnp.concatenate([initial_feature, pred_feature], axis=1)
        out = Linear(self.d_model, name="post_fc1")(out)
        out = nn.Dropout(0.2, deterministic=not train)(out)
        out = Linear(self.d_model, name="post_fc2")(out)
        return out


class _ProjMLP(nn.Module):
    """Linear->Dropout->Linear (emotion/semantic proj,
    Models_memory.py:443-451, 464-472)."""

    d_model: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Linear(self.d_model, name="fc1")(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = Linear(self.d_model, name="fc2")(x)
        return x


class _FusionMLP(nn.Module):
    """Linear->ReLU->Linear (fusion proj, Models_memory.py:473-481)."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        x = Linear(self.d_model, name="fc1")(x)
        x = nn.relu(x)
        x = Linear(self.d_model, name="fc2")(x)
        return x


class GestureTransformer(nn.Module):
    """The full generator (Full_model/Models_memory.py:426-565).

    forward(spec (B,128,T), text (B,frames) int, prior (B,prior,pose_dim),
            sampled_emotion_feature (B,frames,d_model) or None)
      -> (poses (B,frames,pose_dim), emotion_feature, semantic_feature,
          emotion_logits (B,8), text_embedding)
    """

    n_words: int
    frames: int = 60
    pose_dim: int = 282
    prior_frames: int = 10
    d_model: int = 512
    d_inner: int = 2048
    n_layers: int = 3
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.2
    n_position: int = 60
    chunk_length: int = 10
    wordembed_dim: int = 300
    text_dropout: float = 0.1
    n_emotions: int = 8
    variant: str = "memory"  # memory | base | spatial_memory | padding_initial
    # route eval-mode attention sublayers through the fused Pallas kernel
    # (ops/pallas_attention.py); identical params & math, serving-only win
    fused_attention: bool = False
    # jax.checkpoint each SE-ResNet block of the audio encoder: backward
    # recomputes intra-block activations instead of keeping the stage-1
    # (B, 128, 124, 32) tensors live — trades FLOPs for train-batch
    # headroom (measured accept/reject in BASELINE.md round 3)
    remat_audio: bool = False

    @nn.compact
    def __call__(self, spec, text, prior_seq, sampled_emotion_feature=None,
                 train: bool = False):
        B = spec.shape[0]
        text_embedding = TextEncoderTCN(
            n_words=self.n_words,
            embed_size=self.wordembed_dim,
            frames=self.frames,
            dropout=self.text_dropout,
            name="text_encoder",
        )(text, train=train)

        spectrum_feature = AudioResNetEncoder(
            self.frames, self.d_model, remat_blocks=self.remat_audio,
            name="audio_encoder"
        )(spec, train=train)

        if self.variant == "base":
            prior = PriorConvEncoder(
                self.prior_frames, self.frames, self.d_model,
                name="prior_seq_encoder",
            )(prior_seq, train=train)
        else:
            prior = PriorMemoryEncoder(
                self.prior_frames, self.frames, self.pose_dim, self.d_model,
                chunk_length=self.chunk_length,
                use_spatial_v2=self.variant in (
                    "spatial_memory", "padding_initial"),
                use_temporal=self.variant in ("memory", "padding_initial"),
                name="prior_seq_encoder",
            )(prior_seq, train=train)

        emotion_feature = _ProjMLP(self.d_model, name="emotion_proj")(
            spectrum_feature, train=train)
        semantic_feature = _ProjMLP(self.d_model, name="semantic_proj")(
            spectrum_feature, train=train)

        h = emotion_feature.reshape(B, -1)
        h = Linear(self.d_model, name="emotion_clf_fc1")(h)
        h = nn.relu(h)
        h = Linear(256, name="emotion_clf_fc2")(h)
        h = nn.relu(h)
        h = Linear(64, name="emotion_clf_fc3")(h)
        h = nn.relu(h)
        emotion_prediction = Linear(self.n_emotions,
                                    name="emotion_clf_fc4")(h)

        # diversity hook (Models_memory.py:551-555)
        if sampled_emotion_feature is not None:
            fusion = sampled_emotion_feature + semantic_feature
        else:
            fusion = emotion_feature + semantic_feature
        fusion = _FusionMLP(self.d_model, name="fusion_proj")(fusion)

        enc_output = TransformerEncoder(
            n_layers=self.n_layers, n_head=self.n_head,
            d_k=self.d_k, d_v=self.d_v, d_model=self.d_model,
            d_inner=self.d_inner, dropout=self.dropout,
            n_position=self.n_position, fused=self.fused_attention,
            name="encoder",
        )(fusion, train=train)
        dec_output = TransformerDecoder(
            n_layers=self.n_layers, n_head=self.n_head,
            d_k=self.d_k, d_v=self.d_v, d_model=self.d_model,
            d_inner=self.d_inner, dropout=self.dropout,
            n_position=self.n_position, fused=self.fused_attention,
            name="decoder",
        )(prior, enc_output, train=train)

        # post projector (Models_memory.py:483-491)
        x = Linear(self.d_model * 4, name="post_fc1")(dec_output)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = Linear(self.d_model, name="post_fc2")(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = Linear(self.pose_dim, name="post_fc3")(x)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = Linear(self.pose_dim, name="post_fc4")(x)

        return (x, emotion_feature, semantic_feature, emotion_prediction,
                text_embedding)


def xavier_reinit_all(params, key, keep_embedding: bool = False):
    """Mirror the reference's constructor loop (Models_memory.py:512-514):
    re-init every ndim>1 param with xavier-uniform. `keep_embedding=True`
    spares pretrained word embeddings (a deliberate deviation — the
    reference clobbers them)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    paths = [p for p, _ in flat[0]]
    keys = jax.random.split(key, len(leaves))
    new_leaves = []
    for path, leaf, k in zip(paths, leaves, keys):
        name = "/".join(str(p) for p in path)
        if leaf.ndim > 1 and not (keep_embedding and "embedding" in name):
            new_leaves.append(
                winit.xavier_uniform(k, leaf.shape, leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def set_pretrained_embedding(params, weights):
    """Install fasttext-exported embedding weights
    (TextEncoderTCN, Models_memory.py:149-153)."""
    import numpy as np

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    params["text_encoder"]["embedding"] = jnp.asarray(
        np.asarray(weights), dtype=jnp.float32
    )
    return params
