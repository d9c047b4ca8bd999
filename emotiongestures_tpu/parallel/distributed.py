"""Multi-host distributed scaffolding (SURVEY.md §2.6: "multi-host via
jax.distributed over DCN").

The reference's largest scale axis is single-process DataParallel
(train_audio_classifier_K_fold.py:129-130); a TPU pod spans processes
(one per host, 4 local chips each on v5e), so the TPU-native equivalent
adds one initialization layer on top of the GSPMD data-parallel path in
parallel/mesh.py:

  1. every host calls `initialize(coordinator, num_processes, process_id)`
     — the JAX distributed runtime handshakes over DCN and `jax.devices()`
     becomes the GLOBAL device list;
  2. `global_mesh()` builds the (data[, model]) mesh over those global
     devices;
  3. each host loads only ITS slice of the global batch and wraps it with
     `host_local_batch(...)` (`jax.make_array_from_process_local_data`) —
     the global jax.Array is assembled without any host ever holding the
     full batch;
  4. the SAME jitted train_step runs on every process (SPMD); XLA routes
     the gradient all-reduce over ICI within a host and DCN across hosts.

Nothing else in the framework changes: train steps, checkpointing of
replicated params (process 0 saves), and eval are mesh-agnostic.

On CPU (tests; no TPU pod here) cross-process collectives use the gloo
transport — `tests/test_distributed.py` spawns 2 real processes and
checks a data-parallel FGD train step matches single-process execution.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None,
               cpu_collectives: str = "gloo"):
    """Join (or form) the multi-process JAX cluster.

    On TPU pods the three arguments are normally auto-detected from the
    environment (pass nothing); on CPU/manual clusters pass them
    explicitly. `cpu_collectives` selects the cross-process collective
    transport for the CPU backend (gloo ships with jaxlib; "mpi" when
    running under mpirun). Returns (process_index, process_count).
    """
    # _platform_is_cpu reads config without initializing the backend
    # (calling jax.default_backend() here would lock the platform before
    # the distributed client registers)
    if _platform_is_cpu():
        try:
            jax.config.update("jax_cpu_collectives_implementation",
                              cpu_collectives)
        except Exception:  # older jaxlib without the option
            pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def _platform_is_cpu() -> bool:
    """True when the configured platform is cpu WITHOUT initializing the
    backend (jax.default_backend() would lock in the platform)."""
    platforms = jax.config.jax_platforms
    return bool(platforms) and platforms.split(",")[0] == "cpu"


def shutdown():
    jax.distributed.shutdown()


def global_mesh(n_data: int | None = None, n_model: int = 1):
    """Mesh over the cluster-global device list. Axis sizes follow
    mesh.make_mesh semantics; devices are ordered process-major (JAX's
    global ordering), so the `data` axis stripes hosts first — host-local
    batch slices land on host-local chips and gradient all-reduce
    segments ride ICI before crossing DCN."""
    return make_mesh(n_data=n_data, n_model=n_model, devices=jax.devices())


def process_batch_slice(n_global: int) -> slice:
    """The half-open row range of the global batch this process loads.
    Requires the global batch to divide evenly across processes."""
    n_proc = jax.process_count()
    if n_global % n_proc:
        raise ValueError(
            f"global batch {n_global} must divide across {n_proc} "
            "processes")
    per = n_global // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def host_local_batch(batch, mesh, axis: str = "data"):
    """Assemble a GLOBAL data-sharded jax.Array pytree from each
    process's LOCAL slice (`jax.make_array_from_process_local_data`).
    Every process passes arrays covering only its `process_batch_slice`
    rows; no host materialises the global batch.
    """
    def put(x):
        x = np.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x)

    return jax.tree_util.tree_map(put, batch)


def replicate_to_global(tree, mesh):
    """Replicate identical host-local values (e.g. a freshly-initialised
    TrainState — every process seeds the same PRNGKey) onto ALL mesh
    devices across processes. The single-process equivalent is
    mesh.replicate; multi-process device_put cannot target
    non-addressable devices, so this goes through
    multihost_utils.host_local_array_to_global_array."""
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        jax.tree_util.tree_map(np.asarray, tree), mesh, P())


def coordination_barrier(name: str, timeout_s: float = 1800.0):
    """Block until EVERY process reaches this barrier — served by the
    jax.distributed coordination service over gRPC, so it involves NO
    device collectives. Use it to align processes before the first
    executed collective: cross-process clique initialization (gloo on
    CPU, ICI/DCN on TPU) has a bounded peer-wait (~30 s), which
    compile-time divergence between hosts easily exceeds.
    (Internal-API note: goes through jax._src.distributed.global_state —
    the only process-level barrier JAX exposes without a collective.)"""
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None:
        raise RuntimeError("coordination_barrier() requires "
                           "jax.distributed to be initialized")
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
