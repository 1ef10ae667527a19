"""Fused Pallas DMEL kernel tests (interpret mode on CPU).

Gate: the kernel must match the XLA composition to the 1e-4 feature
level and its custom VJP must match autodiff of the composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmel_tpu import ops
from dmel_tpu.ops.pallas import fused_dmel


def rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.max(np.abs(a - b)) / max(1.0, np.max(np.abs(b))))


CASES = [
    # (T, win_length, n_fft, hop, n_mels)  — bench case + small cases
    (4000, 1024, 1024, 80, 64),
    (128, 128, 256, 1, 32),      # faithful mode shape (n_fft = 2T)
    (1000, 128, 128, 20, 16),    # optimized bucket
]


class TestFusedForward:
    @pytest.mark.parametrize("t,wl,n_fft,hop,n_mels", CASES)
    def test_matches_xla_composition(self, rng, t, wl, n_fft, hop, n_mels):
        x = jnp.asarray(rng.standard_normal((3, t)).astype(np.float32))
        lambd = wl / 8.0
        ours = fused_dmel.dmel_power(
            x, lambd, win_length=wl, n_fft=n_fft, hop_length=hop,
            n_mels=n_mels, sample_rate=8000, interpret=True)
        window = ops.gaussian_window(lambd, wl)
        s = ops.stft_power(x, window, n_fft, hop)
        fb = ops.melscale_fbanks(n_fft // 2 + 1, 0, 4000, n_mels, 8000)
        ref = jnp.swapaxes(jnp.matmul(jnp.swapaxes(s, -1, -2), fb,
                                      precision=jax.lax.Precision.HIGHEST),
                           -1, -2)
        assert ours.shape == ref.shape == (3, n_mels, t // hop + 1)
        assert rel_err(ours, ref) < 1e-5
        # feature-level (log) gate
        assert np.max(np.abs(np.log(np.asarray(ours) + 1e-10)
                             - np.log(np.asarray(ref) + 1e-10))) < 1e-4

    def test_via_public_mel_spectrogram(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
        wl = ops.optimized_window_length(20.0)
        a = ops.mel_spectrogram(x, 20.0, n_mels=16, sample_rate=8000,
                                hop_length=20, optimized=True,
                                window_length=wl, impl="pallas")
        b = ops.mel_spectrogram(x, 20.0, n_mels=16, sample_rate=8000,
                                hop_length=20, optimized=True,
                                window_length=wl, impl="xla")
        assert rel_err(a, b) < 1e-5


class TestFusedVJP:
    def test_lambd_grad_matches_xla(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
        wl = 128

        def loss(lam, impl):
            m = ops.mel_spectrogram(x, lam, n_mels=16, sample_rate=8000,
                                    hop_length=20, optimized=True,
                                    window_length=wl, impl=impl)
            return jnp.log(m + 1e-10).sum()

        g_pal = float(jax.grad(lambda l: loss(l, "pallas"))(20.0))
        g_xla = float(jax.grad(lambda l: loss(l, "xla"))(20.0))
        assert abs(g_pal - g_xla) < 1e-3 * max(1.0, abs(g_xla))

    def test_x_grad_matches_xla(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32))

        def loss(x, impl):
            m = ops.mel_spectrogram(x, 10.0, n_mels=8, sample_rate=8000,
                                    hop_length=8, optimized=True,
                                    window_length=64, impl=impl)
            return (m * m).sum()

        g_pal = jax.grad(lambda v: loss(v, "pallas"))(x)
        g_xla = jax.grad(lambda v: loss(v, "xla"))(x)
        assert rel_err(g_pal, g_xla) < 1e-5

    def test_jit_train_like_step(self, rng):
        """lambda SGD through the fused op under jit."""
        x = jnp.asarray(rng.standard_normal((4, 1000)).astype(np.float32))

        @jax.jit
        def step(lam):
            def loss(l):
                m = ops.mel_spectrogram(x, l, n_mels=16, sample_rate=8000,
                                        hop_length=20, optimized=True,
                                        window_length=128, impl="pallas")
                return -jnp.var(jnp.log(m + 1e-10))
            g = jax.grad(loss)(lam)
            return lam - 0.5 * g

        lam = jnp.float32(15.0)
        for _ in range(3):
            lam = step(lam)
        assert np.isfinite(float(lam)) and float(lam) != 15.0


class TestPlan:
    def test_freq_tiling_covers_all_pads(self):
        for n_fft in [128, 256, 512, 1024, 2048, 4096, 8192]:
            plan = fused_dmel._plan(4000, n_fft, 80, 64)
            assert plan["ft"] * plan["n_f"] == plan["f_pad"]
            assert plan["f_pad"] >= n_fft // 2 + 1
            assert plan["tb"] * plan["n_tb"] == plan["nfr_pad"]
            assert plan["nfr_pad"] >= plan["nfr"]


class TestPallasInFit:
    def test_fit_with_pallas_impl(self, rng):
        """Train-loop integration: config impl='pallas' end-to-end."""
        import numpy as np
        from dmel_tpu import data, training
        xs = rng.standard_normal((32, 512)).astype(np.float32)
        ys = rng.integers(0, 10, 32).astype(np.int32)
        ds = data.ArrayDataset(xs, ys, 8000)
        cfg = dict(model_name="mel_linear_net", dataset_name="audio_mnist",
                   init_lambd=20.0, n_points=512, hop_length=32,
                   optimized=True, normalize_window=False, n_mels=16,
                   resample_rate=8000, energy_normalize=True, impl="pallas",
                   optimizer_name="sgd", lr_model=1e-3, lr_tf=1.0,
                   batch_size=16, trainable=True, max_epochs=1, patience=10)
        state, hist = training.fit(cfg, ds, ds, seed=0)
        assert np.isfinite(hist["records"][0]["loss"])
        assert hist["est_lambd"] != 20.0


class TestFusedBwdKernel:
    def test_fused_dw_matches_xla_adjoint(self, rng):
        from dmel_tpu.ops.pallas import fused_dmel as fd
        x = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))

        def lam_grad(lam):
            m = ops.mel_spectrogram(x, lam, n_mels=16, sample_rate=8000,
                                    hop_length=20, optimized=True,
                                    window_length=128, impl="pallas")
            return jnp.log(m + 1e-10).sum()

        g_default = float(jax.grad(lam_grad)(20.0))
        old = fd.USE_FUSED_BWD
        fd.USE_FUSED_BWD = True
        try:
            g_fused = float(jax.grad(lam_grad)(20.0))
        finally:
            fd.USE_FUSED_BWD = old
        assert abs(g_fused - g_default) < 1e-4 * max(1.0, abs(g_default))
