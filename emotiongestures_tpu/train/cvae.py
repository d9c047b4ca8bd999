"""Emotion-prior CVAE training (SURVEY.md §3.5 — the script is absent from
the reference; the interface dictates the loss):

  recon, mu, logvar = VAE(emotion_features, y_onehot)
  loss = recon_l1 + beta * KL(mu, logvar)

Features are the FROZEN generator's emotion_proj branch outputs
(Full_model/Models_memory.py:538).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import losses, schedules
from ..models import EmotionCVAEv3
from .state import TrainState, create_train_state, model_variables


def create_state(key, lr: float = 2e-4, version: int = 3,
                 feat_dim: int = 512) -> TrainState:
    """`feat_dim` must match the generator's d_model (the features are its
    emotion_proj outputs); v1/v2 are feat_dim-agnostic MLPs, v3's conv
    stack is built for the given width."""
    from ..models import EmotionCVAEv1, EmotionCVAEv2

    if version == 3:
        model = EmotionCVAEv3(feat_dim=feat_dim)
    else:
        model = {1: EmotionCVAEv1, 2: EmotionCVAEv2}[version]()
    kp, ks = jax.random.split(key)
    variables = model.init(
        {"params": kp, "sample": ks},
        jnp.zeros((1, 60, feat_dim), jnp.float32),
        jnp.zeros((1, 8), jnp.float32),
    )
    tx = schedules.adam(lr=lr, b1=0.5, b2=0.999, weight_decay=0.0)
    return create_train_state(model, variables, tx)


@functools.partial(jax.jit, static_argnames=("beta",), donate_argnums=0)
def train_step(state: TrainState, features, y_onehot, rng,
               beta: float = 0.1):
    sample_rng, drop_rng = jax.random.split(rng)

    def loss_fn(params):
        v = {"params": params, "batch_stats": state.batch_stats}
        (recon, mu, logvar), mutated = state.apply_fn(
            v, features, y_onehot, train=True,
            rngs={"sample": sample_rng, "dropout": drop_rng},
            mutable=["batch_stats"],
        )
        rec = losses.l1_loss(recon, features)
        kl = losses.kl_divergence(mu, logvar)
        return rec + beta * kl, (mutated["batch_stats"], rec, kl)

    (loss, (new_bs, rec, kl)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
    return new_state, {"loss": loss, "recon": rec, "kl": kl}


def sample(state: TrainState, y_onehot, rng):
    """Batched prior sampling for eval/diversity."""
    return state.apply_fn(
        model_variables(state), y_onehot, method="sample",
        rngs={"sample": rng},
    )
