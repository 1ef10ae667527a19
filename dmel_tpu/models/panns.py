"""PANNs CNN backbones (flax, NHWC/TPU layout).

Parity targets: /root/reference/panns.py — ``ConvBlock`` (:22-65),
``ConvBlock5x5`` (:68-102), ``AttBlock`` (:105-133), ``Cnn6``
(:135-202), ``Cnn14`` (:205-291, dead code upstream, revived here with
our own fixed log-mel extractor).  Layout is NHWC (XLA-TPU native):
``Cnn6`` takes ``(B, time, mel, 1)`` where the reference takes
``(B, 1, time, mel)``.

Batch-norm uses torch semantics: momentum 0.1 (flax ``momentum=0.9``),
eps 1e-5.  Weight init is Xavier-uniform with zero bias, BN scale 1 /
bias 0 (panns.py:7-19).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dmel_tpu.models.common import xavier_uniform, zeros


def _bn(name=None, axis=-1, dtype=None):
    """torch-semantics BatchNorm.  ``dtype`` is the flax compute dtype:
    None keeps f32; bfloat16 casts the normalized OUTPUT to bf16 while
    flax still computes mean/var in f32 (normalization promotes
    internally), so running statistics stay full-precision."""
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis=axis, name=name,
                        dtype=dtype)


def time_mask(key, x, mask_param: int):
    """SpecAugment time masking, iid per batch element.

    torchaudio.transforms.TimeMasking(time_mask_param, iid_masks=True)
    distribution (used at /root/reference/panns.py:141): width ~
    U[0, mask_param), start ~ U[0, T - width); masked region set to 0.
    ``x``: (B, T, M, 1).
    """
    b, t = x.shape[0], x.shape[1]
    k1, k2 = jax.random.split(key)
    value = jax.random.uniform(k1, (b,)) * mask_param
    min_value = jax.random.uniform(k2, (b,)) * (t - value)
    idx = jnp.arange(t)[None, :]
    mask = (idx >= min_value[:, None]) & (idx < (min_value + value)[:, None])
    return jnp.where(mask[:, :, None, None], 0.0, x)


def freq_mask(key, x, mask_param: int):
    """SpecAugment frequency masking over the mel axis of (B, T, M, 1)."""
    b, m = x.shape[0], x.shape[2]
    k1, k2 = jax.random.split(key)
    value = jax.random.uniform(k1, (b,)) * mask_param
    min_value = jax.random.uniform(k2, (b,)) * (m - value)
    idx = jnp.arange(m)[None, :]
    mask = (idx >= min_value[:, None]) & (idx < (min_value + value)[:, None])
    return jnp.where(mask[:, None, :, None], 0.0, x)


def _pool(x, pool_size: Tuple[int, int], pool_type: str):
    if pool_type == "max":
        return nn.max_pool(x, pool_size, strides=pool_size)
    if pool_type == "avg":
        return nn.avg_pool(x, pool_size, strides=pool_size)
    if pool_type == "avg+max":
        return (nn.avg_pool(x, pool_size, strides=pool_size)
                + nn.max_pool(x, pool_size, strides=pool_size))
    raise ValueError(f"Incorrect pool_type: {pool_type!r}")


class Patches5x5Conv(nn.Conv):
    """``nn.Conv`` drop-in that computes a single-input-channel odd-
    kernel SAME convolution as an im2col GEMM:
    ``(B,H,W,kh*kw) @ (kh*kw,Cout)``.

    Why: the MXU contracts in 128-deep tiles, so a C_in=1 conv
    (contraction depth kh*kw, and XLA's chosen convolution algorithm
    pads the channel axis) executes orders of magnitude more MACs than
    the logical count — measured as the dominant share of CNN6's
    block1 wall (blocks<=1 = 7.9 ms at 1% MFU,
    results/diag_cnn6_r5.txt; the rewrite took the full esc50
    production step 12.12 -> 7.90 ms, bench_train_r5c.txt).  The
    patches GEMM has the same math (SAME zero padding, identical tap
    order up to f32 reduction order).  Parameter name/shape/init are
    inherited from nn.Conv ("kernel", (kh,kw,1,Cout)) so checkpoints
    and the PANNs pretrained import are unaffected; inputs with
    C_in != 1 (or non-odd kernels / non-SAME padding) fall back to
    the stock conv path.  (Named for its original CNN6 block1 use;
    Cnn14's 3x3 first block rides the same path.)
    """

    @nn.compact
    def __call__(self, inputs):
        kh, kw = (self.kernel_size if isinstance(self.kernel_size, tuple)
                  else (self.kernel_size, self.kernel_size))
        if (inputs.shape[-1] != 1 or self.use_bias
                or self.padding != "SAME"
                or kh % 2 != 1 or kw % 2 != 1):
            return super().__call__(inputs)
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, 1, self.features), self.param_dtype)
        dtype = self.dtype or inputs.dtype
        x = inputs[..., 0].astype(dtype)
        b, h, w = x.shape
        ph, pw = kh // 2, kw // 2
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw)))
        patches = jnp.stack(
            [xp[:, i:i + h, j:j + w]
             for i in range(kh) for j in range(kw)],
            axis=-1)                               # (B, H, W, kh*kw)
        k = kernel.reshape(kh * kw, self.features).astype(dtype)
        return jnp.dot(patches, k)


class ConvBlock5x5(nn.Module):
    """conv5x5 (no bias) + BN + ReLU + pool (panns.py:68-102).

    ``dtype=bfloat16`` runs the conv + the elementwise chain in bf16
    (params stay f32, BN statistics stay f32 — flax upcasts for
    mean/var): the conv MXU passes are bf16 either way under DEFAULT
    precision, so this lever is about HALVING the activation HBM
    traffic, which dominates the step at these shapes."""

    out_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, pool_size=(2, 2), pool_type="avg", train=False):
        x = Patches5x5Conv(self.out_channels, (5, 5), padding="SAME",
                           use_bias=False,
                           kernel_init=xavier_uniform(), dtype=self.dtype,
                           name="conv1")(x)
        x = _bn(name="bn1", dtype=self.dtype)(
            x, use_running_average=not train)
        x = nn.relu(x)
        return _pool(x, pool_size, pool_type)


class ConvBlock(nn.Module):
    """double conv3x3 + BN + ReLU + pool (panns.py:22-65)."""

    out_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, pool_size=(2, 2), pool_type="avg", train=False):
        x = Patches5x5Conv(self.out_channels, (3, 3), padding="SAME",
                           use_bias=False,
                           kernel_init=xavier_uniform(), dtype=self.dtype,
                           name="conv1")(x)
        x = nn.relu(_bn(name="bn1", dtype=self.dtype)(
            x, use_running_average=not train))
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=xavier_uniform(), dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(_bn(name="bn2", dtype=self.dtype)(
            x, use_running_average=not train))
        return _pool(x, pool_size, pool_type)


class AttBlock(nn.Module):
    """Attention pooling head over (B, T, C) (panns.py:105-133; unused by
    the experiments, provided for capability parity)."""

    n_out: int
    activation: str = "linear"
    temperature: float = 1.0

    @nn.compact
    def __call__(self, x, train=False):
        att = nn.Conv(self.n_out, (1,), kernel_init=xavier_uniform(),
                      bias_init=zeros, name="att")(x)
        # bn_att exists in the reference module (panns.py:114) but is
        # never applied in its forward either — parameter-set parity
        # only (state-dict imports see the same key set)
        nn.BatchNorm(use_running_average=True, momentum=0.9,
                     epsilon=1e-5, name="bn_att")(
            jnp.zeros((1, 1, self.n_out), x.dtype))
        norm_att = jax.nn.softmax(jnp.clip(att, -10, 10), axis=1)
        cla = nn.Conv(self.n_out, (1,), kernel_init=xavier_uniform(),
                      bias_init=zeros, name="cla")(x)
        if self.activation == "sigmoid":
            cla = jax.nn.sigmoid(cla)
        out = jnp.sum(norm_att * cla, axis=1)
        return out, norm_att, cla


class Cnn6(nn.Module):
    """PANNs CNN6 backbone (panns.py:135-202).

    Input ``(B, time, mel, 1)`` (NHWC; the reference's
    ``(B, 1, time, mel)`` transposed).  Returns sigmoid clipwise output
    ``(B, classes_num)`` — trained with BCE + one-hot labels
    (/root/reference/main.py:57-63).
    """

    classes_num: int
    n_mels: int
    augment: bool = False
    #: conv-stack compute dtype (None = f32).  bfloat16 halves the
    #: activation HBM traffic through the conv stack; the head (global
    #: pooling, fc, sigmoid) always runs f32, and BN stats stay f32.
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train=False):
        # BN over mel bins: reference transposes to put mel in the channel
        # slot (panns.py:169-172); here mel is axis 2 of NHWC.
        x = _bn(name="bn1", axis=2)(x, use_running_average=not train)

        if train and self.augment:
            rng = self.make_rng("augment")
            k1, k2 = jax.random.split(rng)
            x = time_mask(k1, x, 64)
            x = freq_mask(k2, x, 8)

        drop = lambda x, r: nn.Dropout(r)(x, deterministic=not train)  # noqa: E731
        x = ConvBlock5x5(64, dtype=self.dtype, name="conv_block1")(
            x, train=train)
        x = drop(x, 0.2)
        x = ConvBlock5x5(128, dtype=self.dtype, name="conv_block2")(
            x, train=train)
        x = drop(x, 0.2)
        x = ConvBlock5x5(256, dtype=self.dtype, name="conv_block3")(
            x, train=train)
        x = drop(x, 0.2)
        x = ConvBlock5x5(512, dtype=self.dtype, name="conv_block4")(
            x, train=train)
        x = drop(x, 0.2)

        x = x.astype(jnp.float32)          # head always f32
        x = jnp.mean(x, axis=2)            # mean over mel -> (B, T', 512)
        x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)   # (B, 512)
        x = drop(x, 0.5)
        x = nn.relu(nn.Dense(512, kernel_init=xavier_uniform(),
                             bias_init=zeros, name="fc1")(x))
        x = drop(x, 0.5)
        x = nn.Dense(self.classes_num, kernel_init=xavier_uniform(),
                     bias_init=zeros, name="fc_esc50")(x)
        return jax.nn.sigmoid(x)


class Cnn14(nn.Module):
    """PANNs CNN14 (panns.py:205-291 — dead code upstream; revived).

    Takes pre-computed log-mel input ``(B, time, mel, 1)`` like Cnn6 so
    it composes with any spectrogram front-end in this framework.
    """

    classes_num: int
    n_mels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train=False):
        x = _bn(name="bn0", axis=2)(x, use_running_average=not train)
        drop = lambda x, r: nn.Dropout(r)(x, deterministic=not train)  # noqa: E731
        for i, ch in enumerate([64, 128, 256, 512, 1024, 2048], start=1):
            pool = (1, 1) if i == 6 else (2, 2)
            x = ConvBlock(ch, dtype=self.dtype,
                          name=f"conv_block{i}")(x, pool_size=pool,
                                                 train=train)
            x = drop(x, 0.2)
        x = x.astype(jnp.float32)
        x = jnp.mean(x, axis=2)
        x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)
        x = drop(x, 0.5)
        x = nn.relu(nn.Dense(2048, kernel_init=xavier_uniform(),
                             bias_init=zeros, name="fc1")(x))
        x = drop(x, 0.5)
        x = nn.Dense(self.classes_num, kernel_init=xavier_uniform(),
                     bias_init=zeros, name="fc_audioset")(x)
        return jax.nn.sigmoid(x)
