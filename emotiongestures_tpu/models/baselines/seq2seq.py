"""Seq2Seq baseline (model/seq2seq_net.py): bi-GRU text encoder, Bahdanau
attention, autoregressive GRU decoder with teacher forcing for the first
n_pre_poses frames.

TPU notes: the encoder GRU is one lax.scan; the decode loop stays an
unrolled trace (n_frames is small and static) so the per-step BatchNorm
updates its running stats each step exactly like the reference
(seq2seq_net.py:121-125, 244-252). Packed-sequence masking is replaced by
running the full padded sequence (padding tokens are index 0 embeddings);
`input_lengths` is accepted for API parity.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import init as winit
from ...core.layers import BatchNorm, Linear
from ...nn.gru import GRU, GRUCellStack, sum_bidirectional


class EncoderRNN(nn.Module):
    """(seq2seq_net.py:14-56): embedding -> bi-GRU, summed directions."""

    n_words: int
    embed_size: int = 300
    hidden_size: int = 200
    n_layers: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tokens, input_lengths=None, train: bool = False):
        emb_table = self.param("embedding", winit.normal_(1.0),
                               (self.n_words, self.embed_size))
        emb = jnp.take(emb_table, tokens, axis=0)  # (B, T, E)
        outputs, hidden = GRU(self.hidden_size, self.n_layers,
                              bidirectional=True, dropout=self.dropout,
                              name="gru")(emb, train=train)
        outputs = sum_bidirectional(outputs, self.hidden_size)
        return outputs, hidden


class Attn(nn.Module):
    """Bahdanau additive attention (seq2seq_net.py:59-89)."""

    hidden_size: int

    @nn.compact
    def __call__(self, hidden, encoder_outputs):
        """hidden: (B, H); encoder_outputs: (B, T, H) -> (B, 1, T)."""
        T = encoder_outputs.shape[1]
        H = jnp.repeat(hidden[:, None, :], T, axis=1)
        energy = jnp.tanh(Linear(self.hidden_size, name="attn")(
            jnp.concatenate([H, encoder_outputs], axis=2)))
        v = self.param("v", winit.normal_(1.0 / self.hidden_size**0.5),
                       (self.hidden_size,))
        scores = jnp.einsum("h,bth->bt", v, energy)
        return nn.softmax(scores, axis=1)[:, None, :]


class BahdanauAttnDecoderRNN(nn.Module):
    """One-step attention decoder (seq2seq_net.py:92-187)."""

    input_size: int
    hidden_size: int
    output_size: int
    n_layers: int = 2
    dropout_p: float = 0.1
    speaker_embed_size: Optional[int] = None  # 8 when speaker model used
    n_speakers: int = 0

    @nn.compact
    def __call__(self, motion_input, last_hidden, encoder_outputs,
                 vid_indices=None, train: bool = False):
        attn_weights = Attn(self.hidden_size, name="attn")(
            last_hidden[-1], encoder_outputs)  # (B, 1, T)
        context = jnp.einsum("bot,bth->boh", attn_weights,
                             encoder_outputs)[:, 0, :]  # (B, H)
        rnn_input = jnp.concatenate([motion_input, context], axis=1)
        if self.speaker_embed_size:
            table = self.param("speaker_embedding", winit.normal_(1.0),
                               (self.n_speakers, self.speaker_embed_size))
            rnn_input = jnp.concatenate(
                [rnn_input, jnp.take(table, vid_indices, axis=0)], axis=1)
        x = Linear(self.hidden_size, name="pre_linear")(rnn_input)
        x = BatchNorm(use_running_average=not train, name="pre_bn")(x)
        x = nn.relu(x)
        new_hidden, out = GRUCellStack(self.hidden_size, self.n_layers,
                                       name="gru")(last_hidden, x)
        output = Linear(self.output_size, name="out")(out)
        return output, new_hidden, attn_weights


class Seq2SeqNet(nn.Module):
    """(seq2seq_net.py:217-254)."""

    n_words: int
    pose_dim: int = 282
    n_frames: int = 60
    n_pre_poses: int = 10
    hidden_size: int = 200
    n_layers: int = 2
    dropout: float = 0.1
    word_embed_size: int = 300
    gan_noise_size: int = 0

    @nn.compact
    def __call__(self, in_text, in_lengths, poses, vid_indices=None,
                 train: bool = False):
        """in_text (B, T) int; poses (B, n_frames, pose_dim) — frames
        beyond n_pre_poses are used only as teacher-forcing targets."""
        encoder_outputs, encoder_hidden = EncoderRNN(
            self.n_words, self.word_embed_size, self.hidden_size,
            self.n_layers, dropout=self.dropout, name="encoder",
        )(in_text, in_lengths, train=train)
        decoder_hidden = encoder_hidden[: self.n_layers]

        decoder = BahdanauAttnDecoderRNN(
            input_size=self.pose_dim + self.gan_noise_size,
            hidden_size=self.hidden_size, output_size=self.pose_dim,
            n_layers=self.n_layers, dropout_p=self.dropout, name="decoder")

        outputs = [poses[:, 0]]
        decoder_input = poses[:, 0]
        for t in range(1, self.n_frames):
            out, decoder_hidden, _ = decoder(
                decoder_input, decoder_hidden, encoder_outputs,
                vid_indices, train=train)
            outputs.append(out)
            # teacher forcing for the first n_pre_poses (seq2seq_net.py:249-252)
            decoder_input = poses[:, t] if t < self.n_pre_poses else out
        return jnp.stack(outputs, axis=1)
