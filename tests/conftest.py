"""Test configuration: force CPU backend with 8 virtual devices so that
multi-chip sharding tests run without TPU hardware
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=8).

Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Disable the persistent XLA compilation cache INSIDE the suite process.
# XLA:CPU executable work segfaults after enough compile activity in one
# process — seven deterministic full-suite crashes (2026-08-17/18) in
# deserialize_executable, executable.serialize(), and (under an active
# profiler trace) the compile itself, always ~38+ tests deep while every
# shallower run passes. The suite is the pathological many-big-compiles
# process; with the cache off, no (de)serialization happens here at all.
# Subprocess-driven tests (test_distributed, the profile CLI test) import
# the package fresh and still use the shared cache at shallow depth, and
# production trainers (few distinct compiles per process) keep it too.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """Run test_parallel.py first: its DP/TP-GAN compiles are the
    heaviest — fronting them keeps the deep-process tail of the suite
    light (and historically sidestepped the cache-write segfault that is
    now fully avoided by disabling the persistent cache above)."""
    items.sort(key=lambda it: 0 if "test_parallel" in it.nodeid else 1)


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
