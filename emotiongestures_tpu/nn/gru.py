"""GRU layers for the baseline models (seq2seq, trimodal, hierarchy).

torch nn.GRU semantics: multi-layer, optional bidirectional with
interleaved [l0_fwd, l0_bwd, l1_fwd, ...] final-hidden layout, dropout
between layers. Built on flax's scanned nn.RNN/GRUCell (an XLA
lax.scan — no python loop over time).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class GRU(nn.Module):
    hidden_size: int
    n_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0  # between layers, like torch

    @nn.compact
    def __call__(self, x, initial_state=None, train: bool = False):
        """x: (B, T, C). Returns (outputs (B, T, H*dirs),
        final_hidden (layers*dirs, B, H)) in torch's layout."""
        finals = []
        h = x
        for layer in range(self.n_layers):
            init_f = None
            init_b = None
            if initial_state is not None:
                stride = 2 if self.bidirectional else 1
                init_f = initial_state[layer * stride]
                if self.bidirectional:
                    init_b = initial_state[layer * stride + 1]
            cf = nn.GRUCell(features=self.hidden_size,
                            name=f"l{layer}_fwd")
            rnn_f = nn.RNN(cf, return_carry=True)
            carry_f, out_f = rnn_f(
                h, initial_carry=init_f) if init_f is not None else rnn_f(h)
            finals.append(carry_f)
            if self.bidirectional:
                cb = nn.GRUCell(features=self.hidden_size,
                                name=f"l{layer}_bwd")
                rnn_b = nn.RNN(cb, return_carry=True, reverse=True,
                               keep_order=True)
                carry_b, out_b = rnn_b(
                    h, initial_carry=init_b) if init_b is not None \
                    else rnn_b(h)
                finals.append(carry_b)
                h = jnp.concatenate([out_f, out_b], axis=-1)
            else:
                h = out_f
            if layer < self.n_layers - 1 and self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h, jnp.stack(finals, axis=0)


def sum_bidirectional(outputs: jnp.ndarray, hidden_size: int) -> jnp.ndarray:
    """The reference's recurring `out[..., :H] + out[..., H:]` pattern."""
    return outputs[..., :hidden_size] + outputs[..., hidden_size:]


class GRUCellStack(nn.Module):
    """Multi-layer GRU advanced one step at a time (the seq2seq decoder's
    usage, model/seq2seq_net.py:181)."""

    hidden_size: int
    n_layers: int = 1

    @nn.compact
    def __call__(self, carry, x):
        """carry: (n_layers, B, H); x: (B, C). Returns (new_carry, out)."""
        new_carry = []
        h = x
        for layer in range(self.n_layers):
            cell = nn.GRUCell(features=self.hidden_size, name=f"l{layer}")
            c, h = cell(carry[layer], h)
            new_carry.append(c)
        return jnp.stack(new_carry, axis=0), h
