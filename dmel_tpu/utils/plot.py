"""Spectrogram plotting (utils.py:328-340 parity)."""

from __future__ import annotations

import numpy as np


def plot_spectrogram(s, ax, decorate_axes: bool = True):
    """Render a (freq, time) spectrogram with frequency increasing
    upward and normalized-frequency ticks."""
    s = np.asarray(s)
    ax.imshow(np.flip(s, axis=0), aspect="auto")
    if decorate_axes:
        ax.set_xlabel("time")
        ax.set_ylabel("normalized frequency")
    fbins, _ = s.shape
    yticks = list(np.linspace(0, fbins - 1, 5))
    ax.set_yticks(yticks)
    ax.set_yticklabels([str(v) for v in np.linspace(0.5, 0, 5)])
