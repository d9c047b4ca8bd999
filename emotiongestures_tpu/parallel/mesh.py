"""Device-mesh parallelism (SURVEY.md §2.6).

The reference's only parallelism is single-process DataParallel
(train_...py:129-130); here the equivalent is GSPMD: place the batch on
the mesh's `data` axis, params replicated (or tensor-sharded on `model`),
and jit the SAME train step — XLA inserts the psum/all-gather collectives
over ICI. No NCCL analog exists or is needed.

Notes on semantics vs. the reference:
  * BatchNorm under GSPMD normalises over the GLOBAL batch — identical to
    single-device execution (DataParallel's per-replica stats are the
    deviation, not ours).
  * TMMemory's cross-batch coupling is computed globally (XLA all-gathers
    the small (B, D) operands automatically).

Tensor parallel: the transformer FFN (d_inner=2048) and the big flatten
MLPs dominate the parameter count; `tp_param_shardings` shards their
kernels on the `model` axis (w_1 column-parallel, w_2 row-parallel — the
Megatron layout, one psum per FFN inserted by XLA).
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """1-D data mesh by default; pass n_model>1 for a 2-D (data, model)
    mesh. Uses all visible devices when n_data is None."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def replicate_state(state, mesh: Mesh):
    """Replicate a TrainState's array fields over the mesh (the GSPMD
    equivalent of DataParallel's model replication,
    train_audio_classifier_K_fold.py:129-130)."""
    return state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )


def resolve_num_devices(num_devices: int) -> int:
    """CLI `--num_devices` semantics: 0 = auto (all visible devices —
    the reference's automatic `if torch.cuda.device_count() > 1` wrap),
    N>0 = exactly N (error if unavailable)."""
    avail = len(jax.devices())
    if num_devices == 0:
        return avail
    if num_devices > avail:
        raise SystemExit(
            f"--num_devices {num_devices} requested but only {avail} "
            f"device(s) visible ({jax.devices()}); for CPU-mesh testing "
            "set XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "before python starts")
    return num_devices


def dp_setup(num_devices: int, batch_size: int):
    """Build the data-parallel mesh for a train CLI (None when the run is
    single-device).

    Auto mode (num_devices=0) degrades gracefully like the reference's
    DataParallel: if the global batch does not divide across all visible
    devices, the largest device count that DOES divide it is used (worst
    case 1). An EXPLICIT device count that can't shard the batch is an
    error — the user asked for exactly that mesh."""
    n = resolve_num_devices(num_devices)
    if num_devices == 0:
        while n > 1 and batch_size % n:
            n -= 1
    elif n > 1 and batch_size % n:
        raise SystemExit(
            f"--batch_size {batch_size} must be divisible by the "
            f"{n}-device data mesh")
    if n <= 1:
        return None
    return make_mesh(n_data=n)


def tp_setup(num_devices: int, model_parallel: int, batch_size: int):
    """Build the 2-D (data, model) mesh for `--model_parallel` runs.

    `num_devices` keeps the CLI semantics of resolve_num_devices (0 =
    all visible). The device count must factor as n_data x model_parallel
    and the global batch must divide over n_data. Returns None when the
    result would be a trivial 1x1 mesh."""
    n = resolve_num_devices(num_devices)
    if n % model_parallel:
        raise SystemExit(
            f"--model_parallel {model_parallel} must divide the "
            f"{n}-device mesh")
    n_data = n // model_parallel
    if n_data > 1 and batch_size % n_data:
        raise SystemExit(
            f"--batch_size {batch_size} must be divisible by the "
            f"data axis ({n_data} = {n} devices / "
            f"{model_parallel}-way model parallel)")
    if n_data == 1 and model_parallel == 1:
        return None
    return make_mesh(n_data=n_data, n_model=model_parallel)


def shard_state_tp(state, mesh: Mesh):
    """Tensor-parallel placement for a TrainState: FFN/MHA kernels sharded
    on `model` (tp_param_shardings), everything else replicated. The
    optimizer state's Adam moments mirror the param tree paths (plain
    Adam: ScaleByAdamState.mu/nu are param-shaped pytrees), so the SAME
    path rules place each moment beside its param shard — sharded
    optimizer state comes for free (a ZeRO-style memory win on the TP'd
    kernels; the reference has no model parallelism at all, SURVEY §2.6).

    ADVICE r3 guard: an optax wrapper that restructures state paths
    (masked / multi_transform / inject_hyperparams) breaks the
    path-mirroring assumption, so each matched opt_state leaf is
    shape-checked against the param the same rule shards; a mismatch
    falls back to replication instead of silently mis-sharding."""
    param_shardings = tp_param_shardings(state.params, mesh)
    # shapes the TP rules are allowed to shard, keyed by trailing
    # param path (e.g. "pos_ffn/w_1/kernel"), collected from the params
    sharded_shapes = {}
    for (path, leaf), (_, sh) in zip(
            jax.tree_util.tree_leaves_with_path(state.params),
            jax.tree_util.tree_leaves_with_path(param_shardings)):
        if sh.spec != P():
            name = "/".join(getattr(p, "key", getattr(p, "name", str(p)))
                            for p in path)
            sharded_shapes[name] = np.shape(leaf)

    def opt_spec_for(path, leaf):
        name = "/".join(getattr(p, "key", getattr(p, "name", str(p)))
                        for p in path)
        for pattern, spec_fn in _TP_RULES:
            if pattern.match(name):
                matches = [s for p, s in sharded_shapes.items()
                           if name.endswith(p)]
                if np.shape(leaf) in matches:
                    return NamedSharding(mesh, spec_fn(np.ndim(leaf)))
                return NamedSharding(mesh, P())  # restructured state
        return NamedSharding(mesh, P())

    return state.replace(
        params=apply_shardings(state.params, param_shardings),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=apply_shardings(
            state.opt_state,
            jax.tree_util.tree_map_with_path(opt_spec_for, state.opt_state)),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Rank-agnostic leading-axis sharding for host->device batch
    placement (PartitionSpec shorter than the rank leaves trailing dims
    replicated)."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of (B, ...) arrays with B sharded over `data`."""
    def put(x):
        spec = P("data", *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        if np.ndim(x) == 0 and not isinstance(x, jax.Array):
            return x
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


# FFN kernels: w_1 column-parallel, w_2 row-parallel (Megatron layout)
_TP_RULES = [
    (re.compile(r".*pos_ffn/w_1/kernel$"), lambda nd: P(None, "model")),
    (re.compile(r".*pos_ffn/w_1/bias$"), lambda nd: P("model")),
    (re.compile(r".*pos_ffn/w_2/kernel$"), lambda nd: P("model", None)),
    # MHA projections: heads are columns of w_{q,k,v} and rows of fc
    (re.compile(r".*w_[qkv]s/kernel$"), lambda nd: P(None, "model")),
    (re.compile(r".*(slf|enc)_attn/fc/kernel$"), lambda nd: P("model", None)),
]


def tp_param_shardings(params, mesh: Mesh):
    """PartitionSpec tree for tensor-parallel placement of the FFN/MHA
    weights; everything else replicated."""

    def spec_for(path, leaf):
        name = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        for pattern, spec_fn in _TP_RULES:
            if pattern.match(name):
                return NamedSharding(mesh, spec_fn(leaf.ndim))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_shardings(tree, shardings):
    """device_put a pytree according to a matching sharding tree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )
