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

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """Run test_parallel.py first. Its DP-GAN compiles are the largest
    executables the suite caches; writing them ~120 tests deep in one
    process SEGFAULTS inside jax's compilation_cache.put_executable_and_
    time on a cold cache (reproduced twice 2026-08-17), while the same
    file passes standalone. Fronting it makes cold-cache full-suite runs
    survive and warms the big entries for everything after."""
    items.sort(key=lambda it: 0 if "test_parallel" in it.nodeid else 1)


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
