"""Checkpoint roundtrip, profiling guards, precision casting, loggers."""
import jax
import jax.numpy as jnp
import numpy as np

from emotiongestures_tpu.train import fgd
from emotiongestures_tpu.utils import (
    latest_step,
    load_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path, rng):
    state = fgd.create_state(jax.random.PRNGKey(0))
    poses = jnp.asarray(rng.randn(4, 60, 282), jnp.float32)
    for i in range(3):
        state, _ = fgd.train_step(state, poses, jax.random.PRNGKey(i))
    path = save_checkpoint(state, tmp_path / "ckpt")
    assert path.name == "checkpoint_iteration3"
    assert latest_step(tmp_path / "ckpt") == 3

    fresh = fgd.create_state(jax.random.PRNGKey(42))
    restored, ok = load_checkpoint(fresh, tmp_path / "ckpt")
    assert ok
    assert int(restored.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state trains on
    restored, metrics = fgd.train_step(restored, poses,
                                       jax.random.PRNGKey(9))
    assert np.isfinite(float(metrics["loss"]))


def test_load_checkpoint_missing(tmp_path):
    state = fgd.create_state(jax.random.PRNGKey(0))
    restored, ok = load_checkpoint(state, tmp_path / "nope")
    assert not ok and restored is state


def test_async_saver_roundtrip_and_pruning(tmp_path, rng):
    """AsyncSaver (SURVEY §5 failure recovery): background writes commit
    the same loadable layout as save_checkpoint; max_to_keep prunes; the
    final close() is the durability barrier."""
    from emotiongestures_tpu.utils import AsyncSaver

    state = fgd.create_state(jax.random.PRNGKey(0))
    poses = jnp.asarray(rng.randn(4, 60, 282), jnp.float32)
    with AsyncSaver() as saver:
        for i in range(4):
            state, _ = fgd.train_step(state, poses, jax.random.PRNGKey(i))
            saver.save(state, tmp_path / "ckpt", max_to_keep=2)
    assert latest_step(tmp_path / "ckpt") == 4
    kept = sorted(p.name for p in (tmp_path / "ckpt").iterdir()
                  if p.name.startswith("checkpoint_iteration"))
    assert kept == ["checkpoint_iteration3", "checkpoint_iteration4"]
    fresh = fgd.create_state(jax.random.PRNGKey(42))
    restored, ok = load_checkpoint(fresh, tmp_path / "ckpt")
    assert ok and int(restored.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_writer_lock_rejects_live_foreign_writer(tmp_path):
    """One writer per checkpoint dir: a lock held by a LIVE foreign pid
    refuses the save (concurrent trainers prune each other's checkpoints
    via max_to_keep — the round-4 rehearsal lost a converged skeleton
    checkpoint to exactly this); a STALE lock (dead pid, crash/preempt)
    is reclaimed so resume-after-kill keeps working."""
    import subprocess

    import pytest

    from emotiongestures_tpu.utils import checkpoint as ckpt

    state = fgd.create_state(jax.random.PRNGKey(0))

    live = tmp_path / "live"
    live.mkdir()
    (live / ".egtp_writer.lock").write_bytes(b"1")  # pid 1: always alive
    with pytest.raises(RuntimeError, match="another live trainer"):
        save_checkpoint(state, live)

    # stale lock: pid of an already-reaped child is dead
    dead = subprocess.Popen(["true"])
    dead.wait()
    stale = tmp_path / "stale"
    stale.mkdir()
    (stale / ".egtp_writer.lock").write_bytes(str(dead.pid).encode())
    path = save_checkpoint(state, stale)
    assert path.exists()
    import os

    # reclaimed lock records pid + /proc start-time token (ADVICE r4)
    pid_s, _, token = (
        (stale / ".egtp_writer.lock").read_bytes().decode().partition(":"))
    assert int(pid_s) == os.getpid()
    assert token == ckpt._proc_start_token(os.getpid())
    # same process re-saves freely (lock is re-entrant per process)
    save_checkpoint(state, stale, step=7)
    assert latest_step(stale) == 7
    ckpt._release_writer_lock(stale.absolute())
    assert not (stale / ".egtp_writer.lock").exists()
    ckpt._release_writer_lock(live.absolute())  # no-op: never acquired
    assert (live / ".egtp_writer.lock").exists()

    # pid recycling (ADVICE r4): a lock whose pid is alive but whose
    # start-time token belongs to a DIFFERENT (dead) incarnation is
    # stale — resume-after-crash must not be blocked by pid reuse
    recycled = tmp_path / "recycled"
    recycled.mkdir()
    (recycled / ".egtp_writer.lock").write_bytes(b"1:999999999")  # pid 1
    # is alive, but its real start token is ~0-ish, never 999999999
    assert ckpt._proc_start_token(1) != "999999999"
    path = save_checkpoint(state, recycled)
    assert path.exists()
    ckpt._release_writer_lock(recycled.absolute())


def test_async_saver_surfaces_worker_errors(tmp_path):
    """A failed background write raises at the next save/wait/close, not
    silently."""
    import pytest

    from emotiongestures_tpu.utils import AsyncSaver
    from emotiongestures_tpu.utils import checkpoint as ckpt_mod

    state = fgd.create_state(jax.random.PRNGKey(0))
    saver = AsyncSaver()
    orig = ckpt_mod._write_tree
    try:
        def boom(*a, **k):
            raise OSError("disk full")

        ckpt_mod._write_tree = boom
        saver._pending = saver._executor.submit(boom)
        with pytest.raises(OSError, match="disk full"):
            saver.wait()
    finally:
        ckpt_mod._write_tree = orig
        saver.close()


def test_graceful_shutdown_flag():
    """SIGTERM sets the flag; the handler restores the previous handler
    so a second signal hard-kills."""
    import os
    import signal

    from emotiongestures_tpu.utils import GracefulShutdown

    with GracefulShutdown(signals=(signal.SIGUSR1,)) as stop:
        assert not stop.requested
        os.kill(os.getpid(), signal.SIGUSR1)
        assert stop.requested
        # handler restored to the pre-context one after the first signal
        assert signal.getsignal(signal.SIGUSR1) != stop._handler


def test_guard_finite():
    import pytest

    from emotiongestures_tpu.utils.profiling import guard_finite

    assert guard_finite({"a": jnp.ones(3)}, enabled=True)
    with pytest.raises(FloatingPointError):
        guard_finite({"a": jnp.array([1.0, np.nan])}, enabled=True)
    # disabled -> no-op
    assert guard_finite({"a": jnp.array([np.nan])}, enabled=False)


def test_bf16_cast(rng):
    from emotiongestures_tpu.core.precision import bf16_variables, cast_tree

    tree = {"w": jnp.ones((4, 4)), "idx": jnp.arange(3)}
    out = cast_tree(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["idx"].dtype == tree["idx"].dtype
    variables = {"params": {"k": jnp.ones(2)},
                 "batch_stats": {"m": jnp.zeros(2)}}
    cast = bf16_variables(variables)
    assert cast["params"]["k"].dtype == jnp.bfloat16
    assert cast["batch_stats"]["m"].dtype == jnp.float32


def test_metric_logger(tmp_path):
    import json

    from emotiongestures_tpu.utils.logging import MetricLogger

    log = MetricLogger(tmp_path / "m.jsonl")
    log.log(1, loss=0.5)
    log.log(2, loss=0.25, acc=90.0)
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert lines[0]["step"] == 1 and lines[1]["acc"] == 90.0


def test_average_meter():
    from emotiongestures_tpu.eval.metrics import AverageMeter

    m = AverageMeter("loss", ":.2f")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    assert "loss" in str(m)


def test_persistent_cache_put_is_atomic(tmp_path, monkeypatch):
    """The package patches jax's LRUCache.put to temp-write + os.replace:
    a reader can never observe a torn entry (bare write_bytes raced with
    concurrent readers and segfaulted XLA's executable deserializer —
    see emotiongestures_tpu/__init__.py)."""
    import os

    import emotiongestures_tpu  # noqa: F401 — installs the patch
    from jax._src import lru_cache as lru

    assert getattr(lru.LRUCache.put, "_egtp_atomic", False)

    cache = lru.LRUCache(str(tmp_path), max_size=-1)  # eviction disabled
    cache.put("k1", b"payload")
    # same-process read-back is suppressed (returns None): re-deserializing
    # an executable this process already holds crashes XLA's CPU AOT
    # loader at deep process state — the compiled object is in the
    # in-memory jit cache anyway, so a miss only costs a rare recompile
    assert cache.get("k1") is None
    # the entry IS complete on disk for OTHER processes
    assert (tmp_path / "k1-cache").read_bytes() == b"payload"
    # keys written by another process read normally
    (tmp_path / "other-cache").write_bytes(b"from elsewhere")
    assert cache.get("other") == b"from elsewhere"
    assert not list(tmp_path.glob("*.tmp"))  # temp cleaned up

    # If the process dies before the rename, no partial entry is visible.
    real_replace = os.replace

    def boom(src, dst):
        raise RuntimeError("simulated crash before rename")

    monkeypatch.setattr(os, "replace", boom)
    try:
        cache.put("k2", b"half")
    except RuntimeError:
        pass
    monkeypatch.setattr(os, "replace", real_replace)
    # nothing torn became visible ON DISK (the same-process get guard
    # would mask this, so assert on the filesystem directly)
    assert not (tmp_path / "k2-cache").exists()
    assert not list(tmp_path.glob("*.tmp"))  # temp removed on failure

    # idempotent: existing entries are never rewritten
    cache.put("k1", b"different")
    assert (tmp_path / "k1-cache").read_bytes() == b"payload"


def test_suspend_compilation_cache(tmp_path):
    """profiling._suspend_compilation_cache must fully bypass the
    persistent cache (an under-trace compile's cache READ CHECK-aborts
    XLA's deserializer on this jax — see CLAUDE.md) and restore caching
    afterwards. reset_cache() is required: the cache object and the
    is_cache_used decision are memoized once per process."""
    import jax
    import jax.numpy as jnp
    from jax._src import compilation_cache as cc

    from emotiongestures_tpu.utils.profiling import (
        _suspend_compilation_cache)

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_enabled = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    # conftest disables the cache suite-wide (XLA:CPU deep-process
    # crashes); this test owns its own enable/disable lifecycle
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    cc.reset_cache()
    try:
        restore = _suspend_compilation_cache()
        jax.jit(lambda x: x * 3.5 + jnp.sin(x))(
            jnp.ones(7)).block_until_ready()
        assert not list(tmp_path.glob("*-cache"))  # no writes while off
        restore()
        cc.reset_cache()  # pick up the tmp_path dir for the check below
        jax.jit(lambda x: x - 1.25 + jnp.cos(x))(
            jnp.ones(9)).block_until_ready()
        assert list(tmp_path.glob("*-cache"))  # caching works again
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_enable_compilation_cache", prev_enabled)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        cc.reset_cache()  # leave pristine for the rest of the suite


def test_put_executable_skips_serialize_when_entry_exists(tmp_path):
    """put_executable_and_time must not call executable.serialize() when
    the entry file already exists — XLA:CPU (de)serialization segfaults
    at deep process state, and jax serializes BEFORE the existence check
    (see emotiongestures_tpu/__init__.py)."""
    import emotiongestures_tpu  # noqa: F401 — installs the patch
    import jax
    from jax._src import compilation_cache as cc

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_enabled = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    jax.config.update("jax_enable_compilation_cache", True)
    cc.reset_cache()
    try:
        backend = jax.devices()[0].client
        cache = cc._get_cache(backend)
        assert cache is not None
        # pre-existing entry (as if written by an earlier test/process)
        (cache.path / "deadbeef-cache").write_bytes(b"entry")

        class Boom:
            def serialize(self):
                raise AssertionError("serialize() must not run")

        # existing key: returns without touching the executable
        cc.put_executable_and_time("deadbeef", "m", Boom(), backend, 3)
        # fresh key: reaches serialize (our Boom proves the passthrough)
        import pytest as _pytest
        with _pytest.raises(Exception):
            cc.put_executable_and_time("cafef00d", "m", Boom(), backend, 3)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_enable_compilation_cache", prev_enabled)
        cc.reset_cache()
