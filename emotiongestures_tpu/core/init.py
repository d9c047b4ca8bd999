"""Weight-initialisation schemes matching the reference's torch semantics.

The reference uses three schemes (SURVEY.md §7 step 1):
  * xavier-uniform for every parameter with ndim > 1 in the generator /
    discriminators / skeleton classifier
    (reference: Full_model/Models_memory.py:512-514),
  * torch nn.Linear / nn.Conv defaults (kaiming-uniform with a=sqrt(5),
    i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)), bias likewise) everywhere no
    explicit init is applied (e.g. model/audio_emotion_classifer.py),
  * kaiming-normal(fan_out, relu) for convs inside ResNetSE
    (reference: Full_model/ResNetSE34V2.py:33-38), BN weight=1 bias=0.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import random
from jax.nn import initializers as jinit

xavier_uniform = jinit.xavier_uniform()
kaiming_normal_fan_out = jinit.variance_scaling(2.0, "fan_out", "normal")
normal_002 = jinit.normal(0.02)


def normal_(stddev: float):
    return jinit.normal(stddev)


def torch_kernel_init(fan_in: int):
    """torch Linear/Conv default kernel init: kaiming_uniform(a=sqrt(5)),
    whose bound collapses to 1/sqrt(fan_in)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int):
    """torch Linear/Conv default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return torch_kernel_init(fan_in)


def constant(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


zeros = jinit.zeros
ones = jinit.ones
