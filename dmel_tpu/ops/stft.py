"""Batched short-time Fourier transform with torch.stft-compatible semantics.

The reference delegates to ``torch.stft(x, n_fft, hop_length, win_length,
window, return_complex=True, pad_mode='constant')``
(/root/reference/time_frequency.py:48-51) with torch defaults
``center=True, onesided=True, normalized=False``.  This module
re-implements those exact semantics TPU-first:

- fully batched over leading axes (the reference loops over the batch in
  Python — SURVEY.md §2 "batch parallelism actively defeated"; here a
  single XLA program handles the whole batch),
- static shapes (frame count and FFT size are Python ints at trace time),
- two compute paths: ``jnp.fft.rfft`` and a DFT-as-matmul path that maps
  onto the TPU MXU (used by the fused Pallas kernel and profitable for
  small n_fft).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def num_frames(signal_length: int, hop_length: int) -> int:
    """Frame count of a centered STFT with even n_fft.

    torch.stft with center=True pads by n_fft//2 on both sides, giving
    ``1 + signal_length // hop_length`` frames for even n_fft.
    """
    return 1 + signal_length // hop_length


def pad_window(window: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Center-pad a window of length ``win_length <= n_fft`` to ``n_fft``.

    torch.stft places a short window in the middle of the FFT buffer with
    ``(n_fft - win_length) // 2`` zeros on the left.
    """
    win_length = window.shape[-1]
    if win_length == n_fft:
        return window
    if win_length > n_fft:
        raise ValueError(f"win_length {win_length} > n_fft {n_fft}")
    left = (n_fft - win_length) // 2
    return jnp.pad(window, (left, n_fft - win_length - left))


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True) -> jnp.ndarray:
    """Slice ``x`` (..., T) into overlapping frames (..., n_frames, n_fft).

    With ``center=True``, zero-pads by ``n_fft // 2`` on both sides first
    (torch.stft ``pad_mode='constant'`` parity).
    """
    t = x.shape[-1]
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
        n = num_frames(t, hop_length)
    else:
        n = 1 + (t - n_fft) // hop_length
    starts = jnp.arange(n) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[..., idx]


@functools.lru_cache(maxsize=32)
def _dft_matrices_np(n_fft: int):
    import numpy as np
    # Computed in float64 then cast, so the f32 matmul path stays within
    # the 1e-4 parity budget even for large n_fft.
    m = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * m * k / n_fft
    return np.cos(ang), np.sin(ang)


def dft_matrices(n_fft: int, dtype=jnp.float32):
    """Real-DFT basis matrices ``C, S`` of shape (n_fft, n_fft//2+1).

    ``rfft(v) = v @ C + 1j * (v @ S)`` — two MXU GEMMs instead of an FFT.
    """
    c, s = _dft_matrices_np(n_fft)
    return jnp.asarray(c, dtype=dtype), jnp.asarray(s, dtype=dtype)


def stft_power(x: jnp.ndarray, window: jnp.ndarray, n_fft: int,
               hop_length: int, *, method: str = "fft",
               precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Power spectrogram ``|STFT(x)|^2`` with torch.stft conventions.

    Args:
      x: ``(..., T)`` real signal(s).
      window: ``(win_length,)`` analysis window (win_length <= n_fft);
        center-padded to n_fft like torch.stft.
      n_fft: FFT size (static).
      hop_length: hop between frames (static).
      method: ``"fft"`` (jnp.fft.rfft) or ``"matmul"`` (DFT-as-GEMM on
        the MXU; exact same math).
      precision: matmul precision for the matmul path.

    Returns:
      ``(..., n_fft//2 + 1, num_frames)`` power spectrogram — freq-major,
      matching the reference layout (time_frequency.py:48-53).
    """
    w = pad_window(window, n_fft)
    frames = frame_signal(x, n_fft, hop_length) * w
    if method == "fft":
        spec = jnp.fft.rfft(frames, axis=-1)
        p = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    elif method == "matmul":
        c, s = dft_matrices(n_fft, dtype=frames.dtype)
        re = jnp.matmul(frames, c, precision=precision)
        im = jnp.matmul(frames, s, precision=precision)
        p = re * re + im * im
    else:
        raise ValueError(f"unknown stft method: {method!r}")
    return jnp.swapaxes(p, -1, -2)
