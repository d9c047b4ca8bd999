"""Precision policy (SURVEY.md §2.6 mixed-precision row): bf16 is native
on the MXU; the reference's apex import was never invoked, so fp32 is
the parity default and bf16 an opt-in speedup for inference/serving.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_tree(tree, dtype):
    """Cast every floating leaf of a pytree to `dtype` (ints untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def bf16_variables(variables):
    """Model variables (params + batch_stats) cast to bfloat16 for
    inference. BatchNorm running stats stay fp32 for stability."""
    out = dict(variables)
    out["params"] = cast_tree(variables["params"], jnp.bfloat16)
    return out


def bf16_inputs(*arrays):
    return tuple(
        a.astype(jnp.bfloat16)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a
        for a in arrays
    )
