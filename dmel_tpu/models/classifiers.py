"""Downstream classifiers over the trainable TF front-ends (flax).

Parity targets in /root/reference/models.py: ``MelLinearNet`` (:58),
``MelMlpNet`` (:80), ``MelConvNet`` (:105), ``MelPANNsNet`` (:138),
``MlpNet`` (:203), ``LinearNet`` (:222), ``BatchNormLinearNet`` (:240),
``ConvNet`` (:264).  Every ``__call__`` returns ``(logits, s)`` where
``s`` is the (possibly log-compressed) spectrogram, matching the
reference's forward contract.

Reference quirk, consciously parameterized: the reference calls
``F.dropout`` without a training flag in MelLinearNet/MelMlpNet
(models.py:76,101), so dropout stays active at eval time there.  Here
dropout follows the ``train`` flag by default; set ``eval_dropout=True``
for bug-compatible behavior.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dmel_tpu.models.common import kaiming_uniform_torch, torch_bias_init
from dmel_tpu.models.layers import (
    MelSpectrogramLayer,
    MultiSigmaMelSpectrogramLayer,
    SpectrogramLayer,
)
from dmel_tpu.models.panns import Cnn6

LOG_EPS = 1e-10


def _dense(features: int, fan_in: int, name: str):
    return nn.Dense(features, kernel_init=kaiming_uniform_torch,
                    bias_init=torch_bias_init(fan_in), name=name)


class _MelFrontEnd(nn.Module):
    """Mixin-style holder for the shared DMEL front-end attributes."""

    n_classes: int
    init_lambd: float
    n_mels: int
    sample_rate: int
    n_points: int
    hop_length: int = 1
    optimized: bool = False
    window_length: Optional[int] = None
    energy_normalize: bool = False
    normalize_window: bool = False
    eval_dropout: bool = False
    impl: str = "xla"
    n_sigma: int = 1
    precision: str = "highest"
    method: str = "auto"
    lambd_hint: Optional[float] = None

    @property
    def size(self) -> Tuple[int, int]:
        return (self.n_mels, self.n_points // self.hop_length + 1)

    def _spectrogram_layer(self):
        if self.n_sigma > 1:
            return MultiSigmaMelSpectrogramLayer(
                init_lambd=self.init_lambd, n_sigma=self.n_sigma,
                n_mels=self.n_mels, n_points=self.n_points,
                sample_rate=self.sample_rate, hop_length=self.hop_length,
                optimized=self.optimized,
                window_length=self.window_length,
                normalize_window=self.normalize_window,
                method=self.method, impl=self.impl,
                lambd_hint=self.lambd_hint, name="spectrogram_layer")
        return MelSpectrogramLayer(
            init_lambd=self.init_lambd, n_mels=self.n_mels,
            n_points=self.n_points, sample_rate=self.sample_rate,
            hop_length=self.hop_length, optimized=self.optimized,
            window_length=self.window_length,
            normalize_window=self.normalize_window, impl=self.impl,
            precision=self.precision, method=self.method,
            lambd_hint=self.lambd_hint, name="spectrogram_layer")

    def _features(self, x):
        s = self._spectrogram_layer()(x)
        if self.energy_normalize:
            from dmel_tpu.ops.numerics import accurate_log
            s = accurate_log(s + LOG_EPS)   # TPU log alone costs ~1e-4
        return s


class MelLinearNet(_MelFrontEnd):
    """DMEL + dropout(0.2) + linear probe (models.py:58-78)."""

    @nn.compact
    def __call__(self, x, train=False):
        s = self._features(x)
        f, t = self.size
        h = s.reshape((-1, f * t))
        h = nn.Dropout(0.2)(h, deterministic=not (train or self.eval_dropout))
        logits = _dense(self.n_classes, f * t, "fc")(h)
        return logits, s


class MelMlpNet(_MelFrontEnd):
    """DMEL + fc32-relu-dropout-fc (models.py:80-103)."""

    @nn.compact
    def __call__(self, x, train=False):
        s = self._features(x)
        f, t = self.size
        h = _dense(32, f * t, "fc1")(s.reshape((-1, f * t)))
        h = nn.relu(h)
        h = nn.Dropout(0.2)(h, deterministic=not (train or self.eval_dropout))
        logits = _dense(self.n_classes, 32, "fc2")(h)
        return logits, s


class MelConvNet(_MelFrontEnd):
    """DMEL + conv32@5x5 + fc32 + fc (models.py:105-136)."""

    hidden_state: int = 32

    @nn.compact
    def __call__(self, x, train=False):
        s = self._features(x)
        f, t = self.size
        # (B, 1, F, T) -> NHWC (B, F, T, 1)
        h = jnp.transpose(s, (0, 2, 3, 1))
        h = nn.Conv(self.hidden_state, (5, 5), padding="SAME",
                    kernel_init=kaiming_uniform_torch,
                    bias_init=torch_bias_init(25), name="conv1")(h)
        h = nn.relu(h)
        h = h.reshape((-1, self.hidden_state * f * t))
        h = nn.relu(_dense(self.hidden_state, self.hidden_state * f * t,
                           "fc1")(h))
        logits = _dense(self.n_classes, self.hidden_state, "fc2")(h)
        return logits, s


class MelPANNsNet(_MelFrontEnd):
    """DMEL front-end + PANNs CNN6 backbone (models.py:138-166).

    Returns ``(clipwise_sigmoid_output, s)``; train with BCE + one-hot
    labels (main.py:57-63).

    ``model_dtype="bfloat16"`` runs the CNN6 conv stack in bf16
    (params, BN statistics, the DMEL front-end and the classifier head
    stay f32) — a measured 1.27x step lever at the esc50 geometry
    (results/diag_cnn6_r5.txt); training equivalence validated on the
    esc50_synth task (results/esc50_synth/).
    """

    augment: bool = False
    model_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train=False):
        s = self._features(x)
        # (B, 1, M, T) -> (B, T, M, 1): the reference transposes to
        # (B, 1, T, M) NCHW (models.py:162); NHWC adds the channel move.
        h = jnp.transpose(s, (0, 3, 2, 1))
        dtype = (jnp.bfloat16 if self.model_dtype == "bfloat16"
                 else None)
        out = Cnn6(self.n_classes, self.n_mels, augment=self.augment,
                   dtype=dtype,
                   name="spectrogram_model")(h, train=train)
        return out, s


class _SpecFrontEnd(nn.Module):
    """Shared DSPEC front-end attributes (size = (F, T) image dims)."""

    n_classes: int
    init_lambd: float
    size: Tuple[int, int] = (512, 1024)
    hop_length: int = 1
    optimized: bool = False
    window_length: Optional[int] = None
    normalize_window: bool = False

    def _spectrogram_layer(self):
        return SpectrogramLayer(
            init_lambd=self.init_lambd, hop_length=self.hop_length,
            optimized=self.optimized, window_length=self.window_length,
            normalize_window=self.normalize_window, name="spectrogram_layer")


class LinearNet(_SpecFrontEnd):
    """DSPEC + linear probe (models.py:222-238)."""

    @nn.compact
    def __call__(self, x, train=False):
        s = self._spectrogram_layer()(x)
        f, t = self.size
        logits = _dense(self.n_classes, f * t, "fc")(s.reshape((-1, f * t)))
        return logits, s


class MlpNet(_SpecFrontEnd):
    """DSPEC + fc128-relu-fc (models.py:203-220)."""

    @nn.compact
    def __call__(self, x, train=False):
        s = self._spectrogram_layer()(x)
        f, t = self.size
        h = nn.relu(_dense(128, f * t, "fc1")(s.reshape((-1, f * t))))
        logits = _dense(self.n_classes, 128, "fc2")(h)
        return logits, s


class BatchNormLinearNet(_SpecFrontEnd):
    """DSPEC + BN over freq bins + linear probe (models.py:240-261)."""

    @nn.compact
    def __call__(self, x, train=False):
        s = self._spectrogram_layer()(x)
        # reference: transpose (B,1,F,T)->(B,F,1,T), BatchNorm2d(F), i.e.
        # per-freq statistics over (batch, time); here BN on axis 2 of
        # (B,1,F,T).
        sb = nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis=2, name="bn")(
            s, use_running_average=not train)
        f, t = self.size
        logits = _dense(self.n_classes, f * t, "fc")(sb.reshape((-1, f * t)))
        return logits, sb


class ConvNet(_SpecFrontEnd):
    """DSPEC + conv32@5x5 + fc32 + fc (models.py:264-293)."""

    hidden_state: int = 32

    @nn.compact
    def __call__(self, x, train=False):
        s = self._spectrogram_layer()(x)
        f, t = self.size
        h = jnp.transpose(s, (0, 2, 3, 1))
        h = nn.Conv(self.hidden_state, (5, 5), padding="SAME",
                    kernel_init=kaiming_uniform_torch,
                    bias_init=torch_bias_init(25), name="conv1")(h)
        h = nn.relu(h)
        h = h.reshape((-1, self.hidden_state * f * t))
        h = nn.relu(_dense(self.hidden_state, self.hidden_state * f * t,
                           "fc1")(h))
        logits = _dense(self.n_classes, self.hidden_state, "fc2")(h)
        return logits, s
