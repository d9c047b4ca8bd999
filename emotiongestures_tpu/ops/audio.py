"""Misc audio/metric ops from model/utils.py."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pre_emphasis(x: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """PreEmphasis filter (model/utils.py:22-38): y[t] = x[t] - coef *
    x[t-1] with reflect padding on the left. x: (B, n) or (n,)."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    padded = jnp.concatenate([x[:, 1:2], x], axis=1)  # reflect pad 1
    y = padded[:, 1:] - coef * padded[:, :-1]
    return y[0] if squeeze else y


def topk_accuracy(logits: np.ndarray, targets: np.ndarray,
                  topk=(1,)) -> list:
    """precision@k (model/utils.py:7-20), values in percent."""
    order = np.argsort(-np.asarray(logits), axis=1)
    targets = np.asarray(targets)
    out = []
    for k in topk:
        hit = (order[:, :k] == targets[:, None]).any(axis=1)
        out.append(100.0 * float(hit.mean()))
    return out
