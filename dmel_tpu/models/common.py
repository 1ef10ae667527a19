"""Shared initializers matching the reference's PyTorch defaults.

The probe classifiers use torch's default ``nn.Linear``/``nn.Conv2d``
init (Kaiming-uniform weights, uniform-(+-1/sqrt(fan_in)) bias); the
PANNs backbone uses Xavier-uniform weights + zero bias
(/root/reference/panns.py:7-19).  Exact init parity keeps training
dynamics comparable; it does not affect converged parity.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random
from jax.nn.initializers import xavier_uniform, zeros  # noqa: F401


def kaiming_uniform_torch(key, shape, dtype=jnp.float32):
    """torch default weight init: U(-b, b), b = sqrt(6/fan_in) / sqrt(... )

    torch uses kaiming_uniform(a=sqrt(5)) => bound = sqrt(6 / ((1+5) *
    fan_in)) = 1/sqrt(fan_in) ... for Dense kernels of shape (in, out),
    fan_in = shape[0]; for HWIO conv kernels fan_in = prod(shape[:-1]).
    """
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(fan_in)))
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / float(fan_in) ** 0.5
        return random.uniform(key, shape, dtype, -bound, bound)
    return init
