"""Parameter initializers matching torch layer defaults.

torch nn.Conv1d / nn.Linear default to kaiming_uniform(a=sqrt(5)), i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the kernel and the same bound for the
bias. Matching the init distribution keeps early-training dynamics comparable
with the reference even though this is not a port.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random


def torch_kernel_init(fan_in_axes=(0, 1)):
    """Uniform(-b, b) with b = 1/sqrt(fan_in); fan_in = prod of kernel dims."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = 1
        for ax in fan_in_axes:
            fan_in *= shape[ax]
        bound = 1.0 / (fan_in**0.5)
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in**0.5)
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def dense_kernel_init(key, shape, dtype=jnp.float32):
    """For Dense kernels of shape (fan_in, fan_out)."""
    fan_in = shape[0]
    bound = 1.0 / (fan_in**0.5)
    return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
