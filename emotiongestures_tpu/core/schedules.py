"""Optimizers and LR schedules matching the reference.

  * Adam(lr, betas=(0.5, 0.999), weight_decay=1e-5)
      — train_audio_classifier_K_fold.py:132
  * staged LR ladder (adjust_lr)
      — test_emotion_gesture_diversity_iterative.py:64-78
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def staged_lr(init_lr: float):
    """The reference's epoch-indexed LR ladder (test_...py:64-78):
    <=15: 1x; 16-50: 0.2x; 51-80: 0.01x; 81-100: 0.005x; 101-150: 0.001x.
    Returns a fn epoch -> lr usable both host-side and under jit."""

    def lr_for_epoch(epoch):
        epoch = jnp.asarray(epoch)
        scale = jnp.where(
            epoch <= 15,
            1.0,
            jnp.where(
                epoch <= 50,
                0.2,
                jnp.where(
                    epoch <= 80, 0.01, jnp.where(epoch <= 100, 0.005, 0.001)
                ),
            ),
        )
        return init_lr * scale

    return lr_for_epoch


def adam(
    lr=3e-4,
    b1: float = 0.5,
    b2: float = 0.999,
    weight_decay: float = 1e-5,
    eps: float = 1e-8,
):
    """Adam with decoupled-ish weight decay matching torch.optim.Adam's
    coupled L2 (torch adds wd*param to the gradient before the moment
    update). `lr` may be a float or an optax schedule."""
    tx = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    tx.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if callable(lr):
        tx.append(optax.scale_by_learning_rate(lr))
    else:
        tx.append(optax.scale(-lr))
    return optax.chain(*tx)


def adam_staged(init_lr: float, steps_per_epoch: int, **kw):
    """Adam driven by the reference's epoch-staged ladder, expressed as a
    step schedule so it lives inside the jitted update."""
    ladder = staged_lr(init_lr)

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return ladder(epoch)

    return adam(lr=schedule, **kw)
