"""Train state: params + BatchNorm running stats + optimizer state.

The reference threads BN running stats implicitly through torch modules;
here they are an explicit `batch_stats` collection in the state pytree
(SURVEY.md §7 hard part 6 — not synced across data-parallel replicas,
matching DataParallel semantics).
"""
from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                self.batch_stats if new_batch_stats is None else
                new_batch_stats
            ),
        )


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState(
        step=0,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )


def model_variables(state: TrainState):
    v = {"params": state.params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


def global_norm(tree):
    return optax.global_norm(tree)


def finite_check(tree) -> bool:
    """NaN/inf guard (SURVEY.md §5 race-detection row)."""
    leaves = jax.tree_util.tree_leaves(tree)
    import jax.numpy as jnp

    ok = jnp.array(True)
    for leaf in leaves:
        ok = ok & jnp.isfinite(leaf).all()
    return ok
