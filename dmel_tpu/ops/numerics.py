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

import jax
import jax.numpy as jnp

#: Cody-Waite two-part split of ln(2).  LN2_HI carries only 12
#: significant bits, so n * LN2_HI is EXACT in f32 for |n| < 2^12 —
#: covering exp arguments down to about -2800 (well past f32
#: underflow at ~ -87 and the window builder's masked range).
_LOG2E = 1.4426950408889634
_LN2_HI = 0.693359375
_LN2_LO = -2.121944400546905e-04


@jax.custom_jvp
def accurate_exp(z: jnp.ndarray) -> jnp.ndarray:
    """``exp(z)`` to ~1-2 ulp relative error at ANY argument magnitude.

    The hardware exp's range reduction leaves a relative error that
    GROWS with |z| (~|z| * 2^-24-class): harmless for typical
    activations, but the Gaussian window evaluates exp at arguments
    down to -30s and beyond, and the resulting few-1e-6 relative
    window errors are an ABSOLUTE error floor across spectrogram bins
    — which the deep low-mel-band fades amplify past the 1e-4 parity
    gate at small lambda/n_fft (see stft.lowbin_fix_needed; the torch
    oracle's CPU expf is correctly rounded, so the device exp is pure
    framework-side error).  This version does the Cody-Waite two-part
    reduction explicitly (exact n*LN2_HI product, |n| < 2^12) and a
    degree-7 Taylor on |r| <= ln2/2 (truncation ~5e-9 relative), so
    the remaining error is Horner rounding.  ~10 elementwise ops —
    negligible at window-build sizes.
    """
    z = jnp.asarray(z)
    n = jnp.round(z * _LOG2E)
    r = (z - n * _LN2_HI) - n * _LN2_LO
    # degree-7 Taylor via Horner; |r| <= 0.3466 so the r^8/8! tail is
    # ~5e-9 relative
    p = 1.0 + r * (1.0 + r * (0.5 + r * (
        1.0 / 6 + r * (1.0 / 24 + r * (
            1.0 / 120 + r * (1.0 / 720 + r * (1.0 / 5040)))))))
    # exact power-of-two scaling; clamp n so the int cast and ldexp
    # stay defined at +/-inf arguments (masked out below)
    out = jnp.ldexp(p, jnp.clip(n, -200.0, 200.0).astype(jnp.int32))
    # fall back to the hardware exp outside the reduced range's useful
    # domain (NaN/inf propagation, and exact exp(0) = 1 either way)
    return jnp.where(jnp.isfinite(z), out, jnp.exp(z))


@accurate_exp.defjvp
def _accurate_exp_jvp(primals, tangents):
    (z,), (dz,) = primals, tangents
    w = accurate_exp(z)
    return w, w * dz


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
