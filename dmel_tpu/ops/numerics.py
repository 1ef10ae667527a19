"""Numerical accuracy helpers for TPU transcendentals.

Measured on v5e (scripts/diag2.py): the hardware ``log`` approximation
contributes ~1.1e-4 absolute error to log-mel features whose mel stage
is accurate to ~1e-5 relative — i.e. the device log, not the GEMMs, set
the round-1 parity floor.  One Newton step on ``exp`` (itself ~1e-7
relative on TPU) collapses the log error quadratically to the 1e-6
class for the cost of one extra elementwise exp — microseconds at
feature-map sizes.
"""

from __future__ import annotations

import jax.numpy as jnp


def accurate_log(x: jnp.ndarray) -> jnp.ndarray:
    """``log(x)`` with one Newton refinement step.

    Solves ``exp(y) = x`` by Newton from the hardware log:
    ``y' = y + x * exp(-y) - 1``.  Initial error eps maps to O(eps^2)
    plus exp's own rounding.  Exact-zero and inf/nan inputs fall back to
    the hardware result (refinement would produce nan * 0 artifacts).
    """
    y = jnp.log(x)
    refined = y + x * jnp.exp(-y) - 1.0
    return jnp.where(jnp.isfinite(y), refined, y)
