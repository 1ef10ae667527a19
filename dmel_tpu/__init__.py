"""dmel_tpu — TPU-native differentiable log-Mel spectrogram framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
johnmartinsson/differentiable-mel-spectrogram (DMEL: the differentiable
log-Mel spectrogram as a trainable layer, Martinsson & Sandsten, ICASSP
2024).  The scientific core is a Gaussian-windowed STFT whose window
length parameter ``lambd`` (sigma) is trainable end-to-end through the
task loss.

Layer map (mirrors SURVEY.md of the reference):

- :mod:`dmel_tpu.ops`        — L0 differentiable time-frequency transforms
  (window / STFT / mel filterbank / DMEL), batched + jit-friendly, with a
  fused Pallas TPU kernel in :mod:`dmel_tpu.ops.pallas`.
- :mod:`dmel_tpu.data`       — L1 datasets (synthetic Gauss-pulse,
  AudioMNIST, ESC-50) and split logic.
- :mod:`dmel_tpu.models`     — L2 flax models (DMEL/DSPEC layers,
  linear/MLP/conv probes, PANNs CNN6).
- :mod:`dmel_tpu.training`   — L3 jitted train/eval steps, optimizers with
  per-parameter-group learning rates, early stopping, checkpointing.
- :mod:`dmel_tpu.parallel`   — device meshes, data-parallel sharding,
  vmapped trial packing.
- :mod:`dmel_tpu.experiments`— L4 config grids + experiment runner (the
  TPU analog of the reference's Ray Tune orchestration).
- :mod:`dmel_tpu.eval`       — L5 test predictions, tables, figures,
  complexity analysis.
"""

__version__ = "0.1.0"

from dmel_tpu.ops import (  # noqa: F401
    gaussian_window,
    translated_gaussian_window,
    melscale_fbanks,
    spectrogram,
    mel_spectrogram,
    log_mel_spectrogram,
    multi_sigma_mel_spectrogram,
    next_power_of_2,
    optimized_window_length,
)
