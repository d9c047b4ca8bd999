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


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
