"""Differentiable Gaussian-windowed power spectrogram.

Parity target: ``differentiable_spectrogram`` at
/root/reference/time_frequency.py:32-58.  Two modes:

- ``optimized=False`` ("faithful"): ``win_length = signal_length``,
  ``n_fft = 2 * signal_length`` — maximally redundant quadratic TF image
  (time_frequency.py:41,51).  Output ``(T+1, T//hop + 1)``.
- ``optimized=True``: ``win_length = n_fft =
  next_power_of_2(int(lambd * n_stds))`` (time_frequency.py:39,48).  The
  window length depends on the *detached current value* of lambd — i.e.
  window-length selection is non-differentiable by design, only window
  *values* carry gradient.

XLA requires static shapes, so in optimized mode the window length is a
Python int chosen *outside* jit from the current lambd value
(:func:`optimized_window_length`) and passed in.  The training loop
re-selects the power-of-2 bucket each step; jit re-compiles only when the
bucket actually changes (a handful of times per run), exactly preserving
the reference's semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dmel_tpu.ops.stft import stft_power
from dmel_tpu.ops.window import gaussian_window


def next_power_of_2(x) -> int:
    """Smallest power of two >= int(x) (time_frequency.py:60-65)."""
    x = int(x)
    return 1 << (x - 1).bit_length()


def optimized_window_length(lambd_value: float, n_stds: int = 6) -> int:
    """Static window length for optimized mode from the current lambd.

    Mirrors ``next_power_of_2((lambd * n_stds).detach())``
    (time_frequency.py:39).  Call with a concrete (host) lambd value.
    """
    return next_power_of_2(abs(float(lambd_value)) * n_stds)


def bucketed_window_length(lambd_value: float, n_points: int,
                           n_stds: int = 6) -> int:
    """`optimized_window_length` clamped to the signal-length pow2
    bucket: a window longer than the (center-padded) signal adds
    nothing — the reference's executed configs always analyze with
    win = len(x) (time_frequency.py:41).  Training, eval and predict
    must all use THIS so a checkpoint whose lambda drifted past
    n_points/n_stds is evaluated at the same geometry it trained at."""
    return min(optimized_window_length(lambd_value, n_stds),
               next_power_of_2(int(n_points)))


def spectrogram(x: jnp.ndarray, lambd, *, optimized: bool = False,
                hop_length: int = 1, norm: bool = False,
                window_length: int | None = None,
                return_window: bool = False, method: str = "auto",
                precision=jax.lax.Precision.HIGHEST, x_precision=None):
    """Gaussian-windowed power spectrogram, batched over leading axes.

    Args:
      x: ``(..., T)`` signal(s).
      lambd: scalar window-length parameter (traced OK); gradient flows
        through the window values.
      optimized: reference's two n_fft conventions (see module doc).
      hop_length: hop between frames.
      norm: energy-normalize the window (time_frequency.py:25).
      window_length: static window length, *required* in optimized mode
        (compute with :func:`optimized_window_length` outside jit).
        Ignored in faithful mode (where it is the signal length).
      return_window: also return the (unpadded) window.
      method: "fft" or "matmul" (see :func:`dmel_tpu.ops.stft.stft_power`).

    Returns:
      ``(..., n_bins, n_frames)`` power spectrogram where
      ``n_bins = n_fft//2 + 1``, ``n_frames = T//hop_length + 1``;
      optionally ``(s, window)``.
    """
    t = x.shape[-1]
    if optimized:
        if window_length is None:
            raise ValueError(
                "optimized mode needs a static window_length; compute it "
                "with optimized_window_length(lambd) outside jit")
        win_length = int(window_length)
        n_fft = win_length
    else:
        win_length = t
        n_fft = 2 * t

    window = gaussian_window(lambd, win_length, norm=norm, dtype=x.dtype)
    s = stft_power(x, window, n_fft, hop_length, method=method,
                   precision=precision, x_precision=x_precision)
    if return_window:
        return s, window
    return s
