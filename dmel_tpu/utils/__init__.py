"""Shared plotting/misc utilities."""

from dmel_tpu.utils.plot import plot_spectrogram  # noqa: F401
