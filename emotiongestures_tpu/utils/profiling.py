"""Tracing / profiling hooks (SURVEY.md §5: the reference has only
wall-clock timers; we provide jax.profiler traces, named scopes, per-step
timing, and NaN/inf guards behind a flag).
"""
from __future__ import annotations

import contextlib
import logging
import os
import time

import jax


def _suspend_compilation_cache():
    """Disable the persistent XLA compilation cache and return a restore
    callback. A jit compile that happens while a profiler trace is ACTIVE
    and whose persistent-cache key matches an existing entry CHECK-aborts
    inside XLA's executable deserializer (jax 0.9.0; reproduced three
    times on full-suite runs, including against a freshly rebuilt cache —
    see CLAUDE.md). Compiles inside a trace window are rare and small;
    losing cache reuse there is the safe trade.

    Implementation note: flipping `jax_compilation_cache_dir` alone is NOT
    enough — compilation_cache memoizes its cache object and its
    `_cache_used` decision once per process, so the config change is
    ignored. `reset_cache()` returns it to the pristine state in which
    `jax_enable_compilation_cache=False` is honored (compiler._get_cache_key
    then yields no key and the read/write paths are skipped entirely)."""
    try:
        from jax._src import compilation_cache as _cc

        prev = jax.config.jax_enable_compilation_cache
        jax.config.update("jax_enable_compilation_cache", False)
        _cc.reset_cache()

        def restore():
            jax.config.update("jax_enable_compilation_cache", prev)
            _cc.reset_cache()  # pristine again; re-memoizes enabled on use

        return restore
    except Exception:  # pragma: no cover — internal API moved; best-effort
        return lambda: None


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto:
        with profiling.trace("/tmp/egtp_trace"):
            train_step(...)

    The persistent compilation cache is suspended for the duration (see
    _suspend_compilation_cache)."""
    log_dir = log_dir or os.environ.get("EGTP_TRACE_DIR", "/tmp/egtp_trace")
    restore = _suspend_compilation_cache()
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        restore()
        logging.info("profiler trace written to %s", log_dir)


def named_scope(name: str):
    """Alias of jax.named_scope for per-layer region annotation."""
    return jax.named_scope(name)


class StepTimer:
    """Per-step wall-clock timing with an EMA, the replacement for the
    reference's time_since helpers (utils/train_utils_BEAT.py:45-71)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema)

    @property
    def ms(self):
        return None if self.ema is None else self.ema * 1e3


def guard_finite(tree, name: str = "tree", enabled: bool | None = None):
    """NaN/inf guard: raises on non-finite leaves when enabled (env
    EGTP_DEBUG_NANS=1 or explicit flag). Host-side check — call on
    already-materialised metrics/params, not inside jit."""
    if enabled is None:
        enabled = os.environ.get("EGTP_DEBUG_NANS", "0") == "1"
    if not enabled:
        return True
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")
    return True


def enable_nan_debugging():
    """Turn on jax's global NaN checker (slows execution; debug only)."""
    jax.config.update("jax_debug_nans", True)
