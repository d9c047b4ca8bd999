"""FGD feature-autoencoder training (model/FGD.py) — plain reconstruction
on pose windows; the 512-d latent becomes the FGD feature space.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import losses, schedules
from ..models import FGDAutoEncoder
from .state import TrainState, create_train_state, model_variables


def create_state(key, lr: float = 3e-4, pose_dim: int = 282) -> TrainState:
    model = FGDAutoEncoder(pose_dim=pose_dim)
    variables = model.init(key, jnp.zeros((1, 60, pose_dim), jnp.float32))
    tx = schedules.adam(lr=lr, b1=0.5, b2=0.999, weight_decay=1e-5)
    return create_train_state(model, variables, tx)


@jax.jit
def train_step(state: TrainState, poses, rng):
    def loss_fn(params):
        recon, _ = state.apply_fn(
            {"params": params}, poses, train=True, rngs={"dropout": rng})
        return losses.l1_loss(recon, poses)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads), {"loss": loss}


@jax.jit
def extract_features(state: TrainState, poses):
    """Frozen-eval features (test_...py:226-232): (B, T, D) -> (B*T, 512)."""
    _, latent = state.apply_fn(model_variables(state), poses, train=False)
    return latent.reshape(-1, latent.shape[-1])
