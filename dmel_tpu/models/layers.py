"""Trainable time-frequency front-end layers (flax).

TPU-first re-designs of the reference layers:
- :class:`MelSpectrogramLayer` — DMEL (/root/reference/models.py:14-56)
- :class:`SpectrogramLayer`    — DSPEC (/root/reference/models.py:171-200)

Key departures from the reference (SURVEY.md §2 C4/C5 defects, fixed):
the whole batch is processed by one XLA program instead of a per-sample
Python loop, and the mel filterbank is a cached constant instead of
being rebuilt per sample per step.  Numerics are identical (tested to
the 1e-4 feature gate).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from dmel_tpu import ops


class MelSpectrogramLayer(nn.Module):
    """DMEL: differentiable log-less mel spectrogram with trainable lambd.

    Output shape ``(B, 1, n_mels, n_points // hop_length + 1)`` — static
    even in optimized mode (only internal FFT sizes change with the
    window-length bucket).

    Attributes:
      init_lambd: initial window-length parameter (samples).
      window_length: static window length for optimized mode.  The
        training loop recomputes the power-of-2 bucket from the current
        lambd each step (``ops.optimized_window_length``) and rebuilds
        the module when the bucket changes (cheap; params live outside
        the module), mirroring /root/reference/time_frequency.py:39.
      impl: "xla" | "pallas" compute path.
    """

    init_lambd: float
    n_mels: int
    n_points: int
    sample_rate: int
    f_min: float = 0.0
    f_max: Optional[float] = None
    hop_length: int = 1
    optimized: bool = False
    window_length: Optional[int] = None
    normalize_window: bool = False
    impl: str = "xla"
    method: str = "auto"
    precision: str = "highest"   # "highest" (parity) | "default" (bf16 MXU)
    #: static lambda-magnitude hint for the impl="pallas" specband gate
    #: (see ops.mel_spectrogram); the training loop refreshes it at the
    #: same host-side boundaries as the window bucket.
    lambd_hint: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        import jax
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[self.precision]
        lambd = self.param(
            "lambd", lambda _: jnp.asarray(self.init_lambd, jnp.float32))
        mel = ops.mel_spectrogram(
            x, lambd, n_mels=self.n_mels, sample_rate=self.sample_rate,
            hop_length=self.hop_length, f_min=self.f_min, f_max=self.f_max,
            optimized=self.optimized, window_length=self.window_length,
            normalize_window=self.normalize_window, impl=self.impl,
            method=self.method, precision=prec,
            lambd_hint=self.lambd_hint)
        return mel[:, None, :, :]


class MultiSigmaMelSpectrogramLayer(nn.Module):
    """Multi-sigma DMEL: a vector of per-mel-band trainable window
    lengths (BASELINE.json configs[4] extension; see
    :func:`dmel_tpu.ops.multi_sigma_mel_spectrogram`).

    The parameter keeps the name ``lambd`` so optimizer grouping
    (lr_tf), freezing, and trajectory logging work unchanged.
    """

    init_lambd: float
    n_sigma: int
    n_mels: int
    n_points: int
    sample_rate: int
    f_min: float = 0.0
    f_max: Optional[float] = None
    hop_length: int = 1
    optimized: bool = False
    window_length: Optional[int] = None
    normalize_window: bool = False
    method: str = "auto"
    impl: str = "xla"
    lambd_hint: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        lambd = self.param(
            "lambd",
            lambda _: jnp.full((self.n_sigma,), self.init_lambd,
                               jnp.float32))
        mel = ops.multi_sigma_mel_spectrogram(
            x, lambd, n_mels=self.n_mels, sample_rate=self.sample_rate,
            hop_length=self.hop_length, f_min=self.f_min, f_max=self.f_max,
            optimized=self.optimized, window_length=self.window_length,
            normalize_window=self.normalize_window, method=self.method,
            impl=self.impl, lambd_hint=self.lambd_hint)
        return mel[:, None, :, :]


class SpectrogramLayer(nn.Module):
    """DSPEC: differentiable power spectrogram with trainable lambd.

    Output ``(B, 1, n_points + 1, n_points // hop_length + 1)`` in
    faithful mode (reference models.py:189).
    """

    init_lambd: float
    hop_length: int = 1
    optimized: bool = False
    window_length: Optional[int] = None
    normalize_window: bool = False
    method: str = "auto"

    @nn.compact
    def __call__(self, x):
        lambd = self.param(
            "lambd", lambda _: jnp.asarray(self.init_lambd, jnp.float32))
        x = x - jnp.mean(x, axis=-1, keepdims=True)
        s = ops.spectrogram(
            x, jnp.abs(lambd), optimized=self.optimized,
            hop_length=self.hop_length, window_length=self.window_length,
            norm=self.normalize_window, method=self.method)
        return s[:, None, :, :]
