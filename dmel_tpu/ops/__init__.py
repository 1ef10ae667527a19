"""L0 — differentiable time-frequency transforms (the scientific core).

All functions are pure, batched over leading axes, shape-static, and
differentiable w.r.t. the window-length parameter ``lambd`` — the
TPU-native equivalent of the reference's ``time_frequency.py`` +
``MelSpectrogramLayer`` math (see SURVEY.md §2 C1–C5).
"""

from dmel_tpu.ops.window import (  # noqa: F401
    gaussian_window,
    translated_gaussian_window,
)
from dmel_tpu.ops.stft import (  # noqa: F401
    frame_signal,
    pad_window,
    stft_power,
    stft_power_folded,
    stft_power_conv,
    stft_power_specgemm,
    stft_power_matmul_ext_mp,
    specgemm_ok,
    dft_matrices,
    num_frames,
)
from dmel_tpu.ops.numerics import accurate_log  # noqa: F401
from dmel_tpu.ops.mel import (  # noqa: F401
    hz_to_mel,
    mel_to_hz,
    melscale_fbanks,
)
from dmel_tpu.ops.spectrogram import (  # noqa: F401
    spectrogram,
    next_power_of_2,
    optimized_window_length,
    bucketed_window_length,
)
from dmel_tpu.ops.dmel import (  # noqa: F401
    mel_spectrogram,
    log_mel_spectrogram,
    multi_sigma_mel_spectrogram,
    default_band_map,
)
