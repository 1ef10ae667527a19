"""Differentiable Gaussian windows.

Parity targets (formulas, not code, from the reference):
- ``differentiable_gaussian_window``  /root/reference/time_frequency.py:21-30
- ``gauss_whole``                     /root/reference/time_frequency.py:5-19
"""

from __future__ import annotations

import jax.numpy as jnp

#: Numerical guard added to lambd in the denominator, matching the
#: reference's ``(lambd + 1e-15)`` (time_frequency.py:12,24).
LAMBD_EPS = 1e-15


def gaussian_window(lambd, window_length: int, norm: bool = False,
                    dtype=jnp.float32):
    """Gaussian window ``w[m] = exp(-0.5*((m - L/2) / (lambd+eps))^2)``.

    Differentiable in ``lambd`` (a scalar, possibly traced).  Note the
    center is ``L/2`` — *not* ``(L-1)/2`` — to match the reference
    (time_frequency.py:24).

    Args:
      lambd: scalar window-length parameter (sigma), in samples.
      window_length: static window length L.
      norm: if True, energy-normalize: ``w / sqrt(sum(w^2))``
        (time_frequency.py:25-28).
      dtype: output dtype.

    Returns:
      ``(window_length,)`` array.
    """
    from dmel_tpu.ops.numerics import accurate_exp
    lambd = jnp.asarray(lambd, dtype=dtype)
    m = jnp.arange(window_length, dtype=dtype)
    z = (m - window_length / 2) / (lambd + LAMBD_EPS)
    # accurate_exp, not jnp.exp: the device exp's |arg|-scaled relative
    # error (~2e-6 at the window tails) is an absolute-class error
    # across spectrogram bins that deep mel fades amplify past the
    # 1e-4 gate (ops/numerics.py).  The f32 argument computation here
    # is op-identical to the reference's, so the exp implementation is
    # the only window-value divergence from torch.
    window = accurate_exp(-0.5 * jnp.square(z))
    if norm:
        window = window / jnp.sqrt(jnp.sum(jnp.square(window)))
    return window


def translated_gaussian_window(sigma, tc, signal_length: int,
                               norm: str = "amplitude", dtype=jnp.float32):
    """Gaussian window centered at an arbitrary time ``tc``.

    Used for *data synthesis* (Gauss-pulse dataset), not the transform.
    Parity: ``gauss_whole`` (time_frequency.py:5-19): amplitude norm
    divides by max; energy norm divides by sum of squares (note: the
    reference's 'energy' divides by the *sum*, not its sqrt).
    """
    sigma = jnp.asarray(sigma, dtype=dtype)
    tc = jnp.asarray(tc, dtype=dtype)
    ts = jnp.arange(signal_length, dtype=dtype)
    window = jnp.exp(-0.5 * jnp.square((ts - tc) / (sigma + LAMBD_EPS)))
    if norm == "energy":
        return window / jnp.sum(jnp.square(window))
    elif norm == "amplitude":
        return window / jnp.max(window)
    raise ValueError(f"unknown norm: {norm!r}")
