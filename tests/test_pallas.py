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


@pytest.fixture(autouse=True)
def _kernel_geometries(monkeypatch):
    """This module tests the KERNELS, at tiny interpret-mode
    geometries; production auto dispatch floors them at
    stft.PALLAS_AUTO_MIN_NFFT (small n_fft fails the 1e-4 gate on
    hardware — certify_ladder round-2 find).  Lower the floor so
    impl="pallas" still resolves to the kernels here; the floor's own
    behavior is covered by TestAutoParityFloor."""
    from dmel_tpu.ops import stft as stft_mod
    monkeypatch.setattr(stft_mod, "PALLAS_AUTO_MIN_NFFT", 64)


class TestAutoParityFloor:
    def test_small_nfft_routes_to_xla(self, rng, monkeypatch):
        """AUTO impl="pallas" below the certified floor must take the
        exact XLA path (kernels would break the 1e-4 contract there);
        explicit impls stay honored."""
        from dmel_tpu.ops import stft as stft_mod
        from dmel_tpu.ops.pallas import framed_dmel as fr
        from dmel_tpu.ops.pallas import specband_dmel as sb
        monkeypatch.setattr(stft_mod, "PALLAS_AUTO_MIN_NFFT", 1024)

        def boom(*a, **k):
            raise AssertionError("kernel dispatched below the floor")

        monkeypatch.setattr(sb, "specband_mel_power", boom)
        monkeypatch.setattr(fr, "framed_mel_power", boom)
        monkeypatch.setattr(fused_dmel, "dmel_power", boom)
        x = jnp.asarray(rng.standard_normal((2, 1200)).astype(np.float32))
        kw = dict(n_mels=32, sample_rate=8000, hop_length=16,
                  optimized=True, window_length=256)
        got = ops.mel_spectrogram(x, 24.0, impl="pallas",
                                  lambd_hint=24.0, **kw)
        want = ops.mel_spectrogram(x, 24.0, impl="xla", **kw)
        assert rel_err(got, want) == 0.0
        # multi-sigma auto dispatch floors too
        from dmel_tpu.ops import dmel
        monkeypatch.setattr(sb, "specband_mel_power_multi", boom)
        lams = jnp.asarray([20.0, 26.0])
        gm = dmel.multi_sigma_mel_spectrogram(
            x, lams, impl="pallas", lambd_hint=[20.0, 26.0], **kw)
        wm = dmel.multi_sigma_mel_spectrogram(x, lams, impl="xla", **kw)
        assert rel_err(gm, wm) == 0.0
        # explicit impl bypasses the floor (kernel actually called)
        with pytest.raises(AssertionError, match="below the floor"):
            ops.mel_spectrogram(x, 24.0, impl="pallas_framed", **kw)


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

    def test_x_grad_matches_xla(self, rng, monkeypatch):
        x = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32))
        # n_fft=64 sits below even the lowered fixture floor's framed
        # guard, so this exercises the fused kernel's input gradient —
        # assert the kernel really dispatched (round-2 advisor find:
        # a higher floor silently made this XLA-vs-XLA)
        calls = {"n": 0}
        real = fused_dmel.dmel_power

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(fused_dmel, "dmel_power", counting)

        def loss(x, impl):
            m = ops.mel_spectrogram(x, 10.0, n_mels=8, sample_rate=8000,
                                    hop_length=8, optimized=True,
                                    window_length=64, impl=impl)
            return (m * m).sum()

        g_pal = jax.grad(lambda v: loss(v, "pallas"))(x)
        assert calls["n"] > 0, "fused kernel did not dispatch"
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


class TestFramedKernel:
    """In-kernel-framing fused kernels (ops/pallas/framed_dmel.py),
    interpret mode: forward parity vs the exact GEMM path across hop
    phase classes, lambda gradient (bf16-adjoint class), dx adjoint."""

    @pytest.mark.parametrize("hop,n_fft", [(16, 256), (48, 256),
                                           (8, 128), (32, 384)])
    def test_forward_matches_exact(self, rng, hop, n_fft):
        from dmel_tpu.ops.pallas import framed_dmel
        x = jnp.asarray(rng.standard_normal((2, 1500)).astype(np.float32))
        lam = n_fft / 8.0
        w = ops.gaussian_window(lam, n_fft)
        mel = framed_dmel.framed_mel_power(
            x, w, n_fft=n_fft, hop_length=hop, n_mels=32,
            sample_rate=8000, interpret=True)
        ref = ops.mel_spectrogram(
            x, lam, n_mels=32, sample_rate=8000, hop_length=hop,
            optimized=True, window_length=n_fft, method="matmul",
            subtract_mean=False)
        assert mel.shape == ref.shape
        err = float(jnp.max(jnp.abs(mel - ref)) / jnp.max(ref))
        assert err < 1e-4, (hop, n_fft, err)

    def test_grads(self, rng):
        from dmel_tpu.ops.pallas import framed_dmel
        x = jnp.asarray(rng.standard_normal((2, 1500)).astype(np.float32))

        def loss(l, xx, kernel):
            if kernel:
                mel = framed_dmel.framed_mel_power(
                    xx, ops.gaussian_window(l, 256), n_fft=256,
                    hop_length=16, n_mels=32, sample_rate=8000,
                    interpret=True)
            else:
                mel = ops.mel_spectrogram(
                    xx, l, n_mels=32, sample_rate=8000, hop_length=16,
                    optimized=True, window_length=256, method="matmul",
                    subtract_mean=False, abs_lambd=False)
            return jnp.log(mel + 1e-10).sum()

        g_ref = float(jax.grad(loss)(jnp.float32(32.0), x, False))
        g_k = float(jax.grad(loss)(jnp.float32(32.0), x, True))
        # bf16 adjoint GEMMs: gradient-only noise in the 1e-4 band
        assert abs(g_k - g_ref) < 5e-4 * abs(g_ref)
        gx_ref = jax.grad(loss, argnums=1)(jnp.float32(32.0), x, False)
        gx_k = jax.grad(loss, argnums=1)(jnp.float32(32.0), x, True)
        assert float(jnp.max(jnp.abs(gx_k - gx_ref))
                     / jnp.max(jnp.abs(gx_ref))) < 1e-4

    def test_supported_guard(self):
        from dmel_tpu.ops.pallas import framed_dmel
        assert framed_dmel.supported(1024, 80, 64)
        assert not framed_dmel.supported(1000, 80, 64)   # non-lane n_fft
        assert not framed_dmel.supported(1024, 7, 64)    # G = 128 > 16
        assert not framed_dmel.supported(4096, 80, 64)   # too large

    def test_dispatch_impl_pallas(self, rng):
        """mel_spectrogram(impl="pallas") resolves to the framed kernel
        on supported geometry and matches the XLA path (incl. the
        default subtract_mean + |lambda| handling)."""
        x = jnp.asarray(rng.standard_normal((2, 1200)).astype(np.float32))
        kw = dict(n_mels=32, sample_rate=8000, hop_length=16,
                  optimized=True, window_length=256)
        got = ops.mel_spectrogram(x, -32.0, impl="pallas", **kw)
        want = ops.mel_spectrogram(x, -32.0, method="matmul", **kw)
        err = float(jnp.max(jnp.abs(got - want)) / jnp.max(want))
        assert err < 1e-4, err
        with pytest.raises(ValueError):
            ops.mel_spectrogram(x, 32.0, impl="pallas_framed", n_mels=32,
                                sample_rate=8000, hop_length=7,
                                optimized=True, window_length=256)


class TestSpecbandKernel:
    """Sliding-DFT + banded-window fused kernel
    (ops/pallas/specband_dmel.py), interpret mode: forward parity vs
    the exact GEMM path inside the specgemm truncation window, lambda
    gradient (all-bf16 adjoint class, see module docstring), dx
    adjoint, dispatch gating."""

    @pytest.mark.parametrize("hop,n_fft,lam", [(16, 256, 24.0),
                                               (40, 256, 32.0),
                                               (32, 384, 40.0)])
    def test_forward_matches_exact(self, rng, hop, n_fft, lam):
        from dmel_tpu.ops.pallas import specband_dmel
        from dmel_tpu.ops.stft import specgemm_ok
        assert specgemm_ok(lam, n_fft, n_fft, hop)
        x = jnp.asarray(rng.standard_normal((2, 1500)).astype(np.float32))
        w = ops.gaussian_window(lam, n_fft)
        mel = specband_dmel.specband_mel_power(
            x, w, n_fft=n_fft, hop_length=hop, n_mels=32,
            sample_rate=8000, interpret=True)
        ref = ops.mel_spectrogram(
            x, lam, n_mels=32, sample_rate=8000, hop_length=hop,
            optimized=True, window_length=n_fft, method="matmul",
            subtract_mean=False)
        assert mel.shape == ref.shape
        err = float(jnp.max(jnp.abs(jnp.log(mel + 1e-10)
                                    - jnp.log(ref + 1e-10))))
        assert err < 1e-4, (hop, n_fft, err)

    @pytest.mark.parametrize("lowbin", [False, True])
    def test_log_epilogue_matches_xla_log(self, rng, lowbin):
        """Round-5 fused in-kernel log (VERDICT r4 next #4): forward
        bitwise vs accurate_log(power + eps) in interpret mode, lambda
        and x grads within float tolerance (bwd reconstructs the power
        cotangent as dlog * exp(-logmel))."""
        from dmel_tpu.ops.numerics import accurate_log
        from dmel_tpu.ops.pallas import specband_dmel
        x = jnp.asarray(rng.standard_normal((2, 1500)).astype(np.float32))
        lam = jnp.float32(24.0)

        def f_pow(l, xx):
            w = ops.gaussian_window(l, 256)
            m = specband_dmel.specband_mel_power(
                x=xx, window=w, n_fft=256, hop_length=16, n_mels=32,
                sample_rate=8000, lowbin_fix=lowbin, interpret=True)
            return accurate_log(m + 1e-10)

        def f_log(l, xx):
            w = ops.gaussian_window(l, 256)
            return specband_dmel.specband_mel_power(
                x=xx, window=w, n_fft=256, hop_length=16, n_mels=32,
                sample_rate=8000, lowbin_fix=lowbin, interpret=True,
                log_epilogue=True)

        a = jax.jit(f_pow)(lam, x)
        b = jax.jit(f_log)(lam, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ga = jax.jit(jax.grad(lambda l, xx: f_pow(l, xx).sum()))(lam, x)
        gb = jax.jit(jax.grad(lambda l, xx: f_log(l, xx).sum()))(lam, x)
        assert abs(float(ga - gb)) / abs(float(ga)) < 1e-5
        gxa = jax.jit(jax.grad(
            lambda l, xx: f_pow(l, xx).sum(), argnums=1))(lam, x)
        gxb = jax.jit(jax.grad(
            lambda l, xx: f_log(l, xx).sum(), argnums=1))(lam, x)
        denom = float(jnp.max(jnp.abs(gxa)))
        assert float(jnp.max(jnp.abs(gxa - gxb))) / denom < 1e-5

    def test_log_mel_spectrogram_routes_fused(self, rng, monkeypatch):
        """ops.log_mel_spectrogram reaches the kernel with
        log_epilogue=True on the specband route (the benched path)."""
        from dmel_tpu.ops import stft as stft_mod
        from dmel_tpu.ops.pallas import specband_dmel as sb
        monkeypatch.setattr(stft_mod, "PALLAS_AUTO_MIN_NFFT", 64)
        seen = {}
        real = sb.specband_mel_power

        def spy(*a, **k):
            seen["log_epilogue"] = k.get("log_epilogue")
            return real(*a, **k)

        monkeypatch.setattr(sb, "specband_mel_power", spy)
        x = jnp.asarray(rng.standard_normal((2, 1500)).astype(np.float32))
        ops.log_mel_spectrogram(
            x, 24.0, n_mels=32, sample_rate=8000, hop_length=16,
            optimized=True, window_length=256, impl="pallas",
            lambd_hint=24.0)
        assert seen.get("log_epilogue") is True

    def test_grads(self, rng):
        from dmel_tpu.ops.pallas import specband_dmel
        x = jnp.asarray(rng.standard_normal((2, 1500)).astype(np.float32))

        def loss(l, xx, kernel):
            if kernel:
                mel = specband_dmel.specband_mel_power(
                    xx, ops.gaussian_window(l, 256), n_fft=256,
                    hop_length=16, n_mels=32, sample_rate=8000,
                    interpret=True)
            else:
                mel = ops.mel_spectrogram(
                    xx, l, n_mels=32, sample_rate=8000, hop_length=16,
                    optimized=True, window_length=256, method="matmul",
                    subtract_mean=False, abs_lambd=False)
            return jnp.log(mel + 1e-10).sum()

        g_ref = float(jax.grad(loss)(jnp.float32(24.0), x, False))
        g_k = float(jax.grad(loss)(jnp.float32(24.0), x, True))
        # all-bf16 adjoint GEMMs: systematic quantization bias through
        # the quadratic |S|^2 chain lands in the 1e-3 band (measured;
        # the tight-gradient alternative is the framed kernel)
        assert abs(g_k - g_ref) < 2e-2 * abs(g_ref)
        gx_ref = jax.grad(loss, argnums=1)(jnp.float32(24.0), x, False)
        gx_k = jax.grad(loss, argnums=1)(jnp.float32(24.0), x, True)
        # dx goes through the f32 XLA rebuild: tight
        assert float(jnp.max(jnp.abs(gx_k - gx_ref))
                     / jnp.max(jnp.abs(gx_ref))) < 1e-4

    def test_supported_guard(self):
        from dmel_tpu.ops.pallas import specband_dmel
        assert specband_dmel.supported(1024, 80, 64)
        assert not specband_dmel.supported(1000, 80, 64)  # non-lane n_fft
        assert not specband_dmel.supported(1024, 7, 64)   # G = 128 > 16
        assert specband_dmel.supported(4096, 80, 64)      # streamed bases
        assert not specband_dmel.supported(8192, 80, 64)  # too large
        assert not specband_dmel.supported(256, 160, 64)  # hop > n_fft/2

    @pytest.mark.parametrize("n_fft,lam", [(2048, 200.0), (4096, 400.0)])
    def test_large_nfft_streamed_bases(self, rng, n_fft, lam, monkeypatch):
        """n_fft 2048/4096 run the chunk-streamed base GEMM + chained
        recurrence (round 3: the reference's 300 ms-init bucket,
        search_spaces.py:29,61 -> optimized_window_length(400)=4096).
        Forward parity vs the exact XLA path and the dlambda adjoint
        class must match the certified <=1024 behavior."""
        from dmel_tpu.ops import stft
        from dmel_tpu.ops.pallas import framed_dmel as fr
        assert stft.specband_ok(lam, n_fft, n_fft, 80)

        def boom(*a, **k):
            raise AssertionError("expected the specband kernel")

        monkeypatch.setattr(fr, "framed_mel_power", boom)
        monkeypatch.setattr(fused_dmel, "dmel_power", boom)
        x = jnp.asarray(
            rng.standard_normal((2, n_fft + 600)).astype(np.float32))
        kw = dict(n_mels=64, sample_rate=8000, hop_length=80,
                  optimized=True, window_length=n_fft)

        def logmel(l, impl, hint=None):
            return jnp.log(ops.mel_spectrogram(
                x, l, impl=impl, lambd_hint=hint, **kw) + 1e-10)

        got = logmel(lam, "pallas", lam)
        want = logmel(lam, "xla")
        assert float(jnp.max(jnp.abs(got - want))) < 1e-4
        g_k = float(jax.grad(lambda l: logmel(l, "pallas", lam).sum())(lam))
        g_r = float(jax.grad(lambda l: logmel(l, "xla").sum())(lam))
        assert abs(g_k - g_r) < 1e-2 * max(1.0, abs(g_r))

    def test_multi_sigma_large_nfft(self, rng):
        """K=3 sigmas share one resident-basis spectra pass at the
        round-3 n_fft=2048 geometry (VERDICT r2 next #7)."""
        from dmel_tpu.ops import dmel
        x = jnp.asarray(rng.standard_normal((1, 2600)).astype(np.float32))
        lams = jnp.asarray([180.0, 204.8, 240.0])
        hints = [180.0, 204.8, 240.0]
        kw = dict(n_mels=64, sample_rate=8000, hop_length=80,
                  optimized=True, window_length=2048)
        ref = dmel.multi_sigma_mel_spectrogram(x, lams, **kw)
        got = dmel.multi_sigma_mel_spectrogram(
            x, lams, impl="pallas", lambd_hint=hints, **kw)
        err = float(jnp.max(jnp.abs(jnp.log(got + 1e-10)
                                    - jnp.log(ref + 1e-10))))
        assert err < 1e-4, err

    @pytest.mark.parametrize("lam,n_fft", [(150.0, 2048), (250.0, 4096)])
    def test_large_bucket_lowbin_routes_away_from_specband(
            self, rng, monkeypatch, lam, n_fft):
        """Deep-fade (lowbin) lambdas at n_fft > 1024 must NOT take the
        specband kernel: that chain/lowbin combination is uncertified
        (chain=1 does not even compile at 4096), and production buckets
        never land there — auto dispatch falls through to the fused
        device-basis kernel (round-3 review find), which must hold the
        1e-4 log-mel contract vs the exact XLA path."""
        from dmel_tpu.ops import stft
        from dmel_tpu.ops.pallas import specband_dmel as sb
        assert stft.specband_ok(lam, n_fft, n_fft, 80)
        assert stft.lowbin_fix_needed(lam, n_fft)

        def boom(*a, **k):
            raise AssertionError("specband must not serve lowbin@large")

        monkeypatch.setattr(sb, "specband_mel_power", boom)
        x = jnp.asarray(
            rng.standard_normal((1, n_fft + 400)).astype(np.float32))
        kw = dict(n_mels=64, sample_rate=8000, hop_length=80,
                  optimized=True, window_length=n_fft)
        m = ops.mel_spectrogram(x, lam, impl="pallas", lambd_hint=lam,
                                **kw)
        ref = ops.mel_spectrogram(x, lam, **kw)
        err = float(jnp.max(jnp.abs(jnp.log(m + 1e-10)
                                    - jnp.log(ref + 1e-10))))
        assert err < 1e-4, err

    def test_geom_adopted_and_lowbin_gated(self):
        """Block geometries are the hardware-A/B'd picks: chain=2 with
        rows=512 at every production bucket for K=1 — EXCEPT deep-fade
        (lowbin) 1024 compilations, where the longer rotation chain
        costs ~2e-4 of parity (hardware ladder: lambda=36 went 8.8e-5
        -> 2.7e-4 with chain=2), so they must keep chain=1."""
        from dmel_tpu.ops.pallas import specband_dmel as sb
        assert sb._geom(1024, 80, 1) == (512, 2, 1024)
        assert sb._geom(2048, 80, 1) == (512, 2, 2048)
        assert sb._geom(4096, 80, 1) == (512, 2, 4096)
        assert sb._geom(1024, 80, 1, True) == (512, 1, 1024)
        # multi-sigma keeps smaller rows; the gr >= 8 Mosaic rule
        # reduces its chain automatically
        rows, chain, chunk = sb._geom(4096, 80, 3)
        g0 = 128 // np.gcd(80, 128)
        assert rows % (g0 * chain) == 0 and rows // (g0 * chain) >= 8

    def test_chunk_streamed_bases_fallback(self, rng, monkeypatch):
        """The chunk-streaming path (n_chunks > 1) is the VMEM fallback
        when resident bases don't fit; production geometries keep them
        resident (chunk = n_fft), so force streaming here and check it
        is numerically identical-class to the resident path."""
        from dmel_tpu.ops.pallas import specband_dmel as sb
        n_fft, lam, hop = 2048, 200.0, 80
        x = jnp.asarray(
            rng.standard_normal((2, 2600)).astype(np.float32))
        kw = dict(n_mels=64, sample_rate=8000, hop_length=hop,
                  optimized=True, window_length=n_fft)
        want = ops.mel_spectrogram(x, lam, impl="pallas",
                                   lambd_hint=lam, **kw)
        monkeypatch.setattr(sb, "_geom",
                            lambda n, h, k, *a, **kw: (256, 2, 256))
        got = ops.mel_spectrogram(x, lam, impl="pallas",
                                  lambd_hint=lam, **kw)
        # chunked accumulation reorders the f32 partial sums: ~2e-6
        assert rel_err(got, want) < 1e-5

    def test_multi_sigma_shared_spectra(self, rng):
        """K sigmas through one kernel pass match the XLA multi-sigma
        path (features to 1e-4, per-sigma grads to the bf16-adjoint
        band), driven through the public multi_sigma dispatch."""
        from dmel_tpu.ops import dmel
        x = jnp.asarray(rng.standard_normal((2, 1200)).astype(np.float32))
        lams = jnp.asarray([20.0, 26.0, 32.0])
        kw = dict(n_mels=32, sample_rate=8000, hop_length=16,
                  optimized=True, window_length=256, subtract_mean=False,
                  abs_lambd=False)
        ref = dmel.multi_sigma_mel_spectrogram(x, lams, method="matmul",
                                               **kw)
        got = dmel.multi_sigma_mel_spectrogram(
            x, lams, impl="pallas", lambd_hint=[20.0, 26.0, 32.0], **kw)
        err = float(jnp.max(jnp.abs(jnp.log(got + 1e-10)
                                    - jnp.log(ref + 1e-10))))
        # bf16x3-class quantization at this tiny geometry lands just
        # over the 1e-4 line (1.3e-4 measured); the production-geometry
        # 1e-4 gate is enforced in-run by bench.py's torch oracle.
        assert err < 2e-4, err

        def loss(ls, impl, hint):
            m = dmel.multi_sigma_mel_spectrogram(x, ls, impl=impl,
                                                 lambd_hint=hint,
                                                 method="matmul", **kw)
            return jnp.log(m + 1e-10).sum()

        g_k = jax.grad(loss)(lams, "pallas", [20.0, 26.0, 32.0])
        g_r = jax.grad(loss)(lams, "xla", None)
        rel = jnp.abs(g_k - g_r) / jnp.maximum(jnp.abs(g_r), 1e-6)
        assert float(jnp.max(rel)) < 5e-2, (g_k, g_r)

    def test_dispatch_lambd_hint(self, rng):
        """impl="pallas" + in-window lambd_hint resolves to the
        specband kernel; out-of-window hints fall back to framed; the
        explicit impl raises on bad geometry."""
        x = jnp.asarray(rng.standard_normal((2, 1200)).astype(np.float32))
        kw = dict(n_mels=32, sample_rate=8000, hop_length=16,
                  optimized=True, window_length=256)
        want = ops.mel_spectrogram(x, -24.0, method="matmul", **kw)
        got = ops.mel_spectrogram(x, -24.0, impl="pallas",
                                  lambd_hint=-24.0, **kw)
        err = float(jnp.max(jnp.abs(jnp.log(got + 1e-10)
                                    - jnp.log(want + 1e-10))))
        assert err < 1e-4, err
        # lambda outside the truncation window: framed fallback stays
        # parity-exact where specband's truncated taps would not be
        got_small = ops.mel_spectrogram(x, 6.0, impl="pallas",
                                        lambd_hint=6.0, **kw)
        want_small = ops.mel_spectrogram(x, 6.0, method="matmul", **kw)
        err = float(jnp.max(jnp.abs(jnp.log(got_small + 1e-10)
                                    - jnp.log(want_small + 1e-10))))
        assert err < 1e-4, err
        with pytest.raises(ValueError):
            ops.mel_spectrogram(x, 24.0, impl="pallas_specband",
                                n_mels=32, sample_rate=8000, hop_length=7,
                                optimized=True, window_length=256)

    def test_lowbin_fix_small_lambda_parity(self, rng):
        """Small lambda/n_fft ratios amplify the bf16 2-way-split
        representation floor at the deep-fade lowest mel bands past the
        1e-4 gate (round-2 certify_ladder find: 1.2-2.5e-4 on hardware
        at lambda <= n_fft/16 vs 7e-5 at the bench point n_fft/8).  The
        dispatch enables the 3-way-split correction passes from the
        same static hint that picks J (stft.lowbin_fix_needed); parity
        must hold at the previously-failing lambdas on both routes."""
        from dmel_tpu.ops.stft import lowbin_fix_needed
        assert lowbin_fix_needed(36.0, 1024)
        assert lowbin_fix_needed(64.0, 1024)
        assert not lowbin_fix_needed(128.0, 1024)   # bench point: off
        assert not lowbin_fix_needed(85.4, 1024)
        x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
        kw = dict(n_mels=64, sample_rate=8000, hop_length=80,
                  optimized=True, window_length=1024)
        for lam in (36.0,      # specband route, ratio ~1/28
                    64.0,      # specband route, bucket edge ratio 1/16
                    13.3):     # framed fallback, deep ratio ~1/77
            want = ops.mel_spectrogram(x, lam, method="matmul", **kw)
            got = ops.mel_spectrogram(x, lam, impl="pallas",
                                      lambd_hint=lam, **kw)
            err = float(jnp.max(jnp.abs(jnp.log(got + 1e-10)
                                        - jnp.log(want + 1e-10))))
            assert err < 1e-4, (lam, err)

    def test_hiprec_512_route_reverted(self, rng, monkeypatch):
        """The hiprec (lowbin_fix level 2) reclaim of n_fft=512 is NOT
        shipped: SPECBAND_HIPREC_NFFTS is empty, so auto impl="pallas"
        at 512 takes the exact XLA path.  Hardware evidence
        (results/diag_hiprec_512_r4.txt): the level-2 kernel diverges
        from the exact XLA path by 1.15-2.53e-4 ON HARDWARE — breaking
        the 1e-4 contract — identically eager and jitted, while CPU
        INTERPRET passes at 3.9-4.7e-5.  Interpret-mode parity is
        therefore known NOT to bound the hardware number at this
        geometry; this test pins the dispatch decision, and the level-2
        machinery itself stays covered below via an explicit
        monkeypatched opt-in (interpret gates only the machinery, not
        the contract)."""
        from dmel_tpu.ops import stft as stft_mod
        from dmel_tpu.ops.pallas import specband_dmel as sb
        monkeypatch.setattr(stft_mod, "PALLAS_AUTO_MIN_NFFT", 1024)
        assert stft_mod.SPECBAND_HIPREC_NFFTS == ()
        real = sb.specband_mel_power
        x = jnp.asarray(rng.standard_normal((2, 2500)).astype(np.float32))
        kw = dict(n_mels=64, sample_rate=8000, hop_length=80,
                  optimized=True, window_length=512)

        # shipped dispatch: 512 deep fade never reaches SPECBAND (the
        # reverted hiprec-512 route); since round 5 it rides the
        # full-f32 FRAMED variant instead of the bare XLA floor, so
        # the comparison is within the parity gate, not bitwise
        def boom(*a, **k):
            raise AssertionError("specband kernel below the floor")
        monkeypatch.setattr(sb, "specband_mel_power", boom)
        got = ops.mel_spectrogram(x, 33.0, impl="pallas",
                                  lambd_hint=33.0, **kw)
        want = ops.mel_spectrogram(x, 33.0, impl="xla", **kw)
        err = float(jnp.max(jnp.abs(jnp.log(got + 1e-10)
                                    - jnp.log(want + 1e-10))))
        assert err < 1e-4

        # level-2 machinery stays covered behind an explicit opt-in
        # (future reclaim attempts); interpret-mode parity only — this
        # does NOT certify the hardware contract (see docstring)
        calls = []

        def spy(*a, **k):
            calls.append(k.get("lowbin_fix"))
            return real(*a, **k)

        monkeypatch.setattr(sb, "specband_mel_power", spy)
        monkeypatch.setattr(stft_mod, "SPECBAND_HIPREC_NFFTS", (512,))
        for lam in (33.0, 52.0):
            want = ops.mel_spectrogram(x, lam, method="matmul", **kw)
            got = ops.mel_spectrogram(x, lam, impl="pallas",
                                      lambd_hint=lam, **kw)
            err = float(jnp.max(jnp.abs(jnp.log(got + 1e-10)
                                        - jnp.log(want + 1e-10))))
            assert err < 1e-4, (lam, err)
        assert calls == [2, 2]      # full ladder engaged, via the kernel

    def test_multi_sigma_under_jit(self, rng):
        """The static lambd_hint/band_map plumbing must survive a jit
        trace (regression: jnp constants become tracers under jit, so
        hints/band_map have to stay numpy until the kernel call)."""
        from dmel_tpu.ops import dmel
        x = jnp.asarray(rng.standard_normal((2, 1200)).astype(np.float32))
        lams = jnp.asarray([20.0, 26.0, 32.0])
        kw = dict(n_mels=32, sample_rate=8000, hop_length=16,
                  optimized=True, window_length=256, subtract_mean=False,
                  abs_lambd=False)

        @jax.jit
        def jitted(ls, xx):
            return jax.grad(lambda l: jnp.log(
                dmel.multi_sigma_mel_spectrogram(
                    xx, l, impl="pallas", lambd_hint=[20.0, 26.0, 32.0],
                    **kw) + 1e-10).sum())(ls)

        g = jitted(lams, x)
        assert g.shape == (3,) and bool(jnp.all(jnp.isfinite(g)))

    def test_adaptive_taps(self, rng):
        """Large lambdas (narrow window spectra) run with fewer band
        taps — J is chosen statically from the hint, parity holds at
        the smallest ladder rung."""
        from dmel_tpu.ops.stft import specband_j_taps
        # endpoint-sidelobe regime (lambda > n_fft/9.6): full J only
        assert specband_j_taps(128.0, 1024) == 24
        assert specband_j_taps(110.0, 1024) == 24
        # Gaussian regime: smallest rung with >= ~5 sigma_f coverage
        assert specband_j_taps(90.0, 1024) == 12
        assert specband_j_taps(64.0, 1024) == 16
        assert specband_j_taps(40.0, 1024) == 24
        assert specband_j_taps(30.0, 1024) is None  # below specgemm_ok
        x = jnp.asarray(rng.standard_normal((2, 1200)).astype(np.float32))
        lam = 28.0                       # sidelobe regime at n_fft=256
        assert specband_j_taps(lam, 256) == 24
        kw = dict(n_mels=32, sample_rate=8000, hop_length=16,
                  optimized=True, window_length=256)
        want = ops.mel_spectrogram(x, lam, method="matmul", **kw)
        got = ops.mel_spectrogram(x, lam, impl="pallas", lambd_hint=lam,
                                  **kw)
        err = float(jnp.max(jnp.abs(jnp.log(got + 1e-10)
                                    - jnp.log(want + 1e-10))))
        assert err < 1.5e-4, err


class TestFoldedBase:
    """Round-4 folded (even/odd) base DFT: e/o planes against half-size
    bases (FOLDED_BASE_NFFTS, adopted at 2048/4096 on hardware —
    results/ab_folded_r4.txt).  CI drives the path at a tiny interpret
    geometry; hardware parity is gated by the certify ladder."""

    def _logmel(self, x, lam, n_fft, hop, lb=False):
        from dmel_tpu.ops.pallas import specband_dmel as sb
        from dmel_tpu.ops.window import gaussian_window
        w = gaussian_window(lam, n_fft)
        m = sb.specband_mel_power(x, w, n_fft=n_fft, hop_length=hop,
                                  n_mels=64, sample_rate=8000,
                                  lowbin_fix=lb, interpret=True)
        return jnp.log(m + 1e-10)

    def test_folded_matches_unfolded(self, rng, monkeypatch):
        from dmel_tpu.ops.pallas import specband_dmel as sb
        x = jnp.asarray(rng.standard_normal((2, 2500)).astype(np.float32))
        a = self._logmel(x, 25.0, 256, 64)
        monkeypatch.setattr(sb, "FOLDED_BASE_NFFTS", (256,))
        b = self._logmel(x, 25.0, 256, 64)
        # same quantization class (the fold changes rounding pairing;
        # tiny geometries sit at the known small-n_fft floor)
        assert float(jnp.max(jnp.abs(a - b))) < 5e-4
        # gradient flows and matches
        ga = jax.grad(lambda l: self._logmel(x, l, 256, 64).sum())(
            jnp.float32(25.0))
        monkeypatch.setattr(sb, "FOLDED_BASE_NFFTS", ())
        gb = jax.grad(lambda l: self._logmel(x, l, 256, 64).sum())(
            jnp.float32(25.0))
        assert abs(float(ga - gb)) / abs(float(gb)) < 1e-4

    def test_folded_lowbin_and_multisigma(self, rng, monkeypatch):
        from dmel_tpu.ops import dmel as dmel_mod
        from dmel_tpu.ops import stft as stft_mod
        from dmel_tpu.ops.pallas import specband_dmel as sb
        x = jnp.asarray(rng.standard_normal((2, 2500)).astype(np.float32))
        # lowbin correction on the folded operands
        a = self._logmel(x, 18.0, 256, 64, lb=True)
        monkeypatch.setattr(sb, "FOLDED_BASE_NFFTS", (256,))
        b = self._logmel(x, 18.0, 256, 64, lb=True)
        assert float(jnp.max(jnp.abs(a - b))) < 5e-4
        # multi-sigma shares the folded spectra pass
        monkeypatch.setattr(stft_mod, "PALLAS_AUTO_MIN_NFFT", 64)
        lams = [20.0, 24.0, 26.0]
        m = dmel_mod.multi_sigma_mel_spectrogram(
            x, jnp.asarray(lams), n_mels=64, sample_rate=8000,
            hop_length=64, optimized=True, window_length=256,
            impl="pallas", lambd_hint=lams)
        assert m.shape == (2, 64, x.shape[-1] // 64 + 1)
        assert bool(jnp.all(jnp.isfinite(m)))


class TestFramedAutoSmall:
    """Round-4 512 reclaim via the FRAMED kernel + round-5 deep-fade
    extension: auto impl='pallas' at n_fft in FRAMED_AUTO_NFFTS rides
    framed(lowbin) for bucket-range hints, and lambdas <= win/12 at
    n_fft in FRAMED_HIPREC_NFFTS ride the full-f32 hiprec variant
    (hardware: 5-14e-6 at every 512 deep-fade rung, +17% over the
    parity-compliant floor — results/probe_framed_hiprec_r5.txt).
    Hintless calls keep the exact XLA floor."""

    def test_dispatch_decisions(self, rng, monkeypatch):
        from dmel_tpu.ops import stft as stft_mod
        from dmel_tpu.ops.pallas import framed_dmel as fr
        from dmel_tpu.ops.pallas import specband_dmel as sb
        monkeypatch.setattr(stft_mod, "PALLAS_AUTO_MIN_NFFT", 1024)
        assert 512 in stft_mod.FRAMED_AUTO_NFFTS
        assert 512 in stft_mod.FRAMED_HIPREC_NFFTS
        calls = []
        real = fr.framed_mel_power

        def spy(*a, **k):
            calls.append((k.get("lowbin_fix"), k.get("hiprec", False)))
            return real(*a, **k)

        monkeypatch.setattr(fr, "framed_mel_power", spy)

        def boom(*a, **k):
            raise AssertionError("specband below the floor")
        monkeypatch.setattr(sb, "specband_mel_power", boom)

        x = jnp.asarray(rng.standard_normal((2, 2500)).astype(np.float32))
        kw = dict(n_mels=64, sample_rate=8000, hop_length=80,
                  optimized=True, window_length=512)
        # non-deep-fade hint -> framed with the fix FORCED on
        ops.mel_spectrogram(x, 46.7, impl="pallas", lambd_hint=46.7, **kw)
        assert calls == [(True, False)]
        # deep-fade hint -> full-f32 hiprec framed (round 5)
        calls.clear()
        ops.mel_spectrogram(x, 33.0, impl="pallas", lambd_hint=33.0, **kw)
        assert calls == [(True, True)]   # lb arg inert under hiprec
        # hintless -> exact XLA floor (no kernel)
        calls.clear()
        got = ops.mel_spectrogram(x, 46.7, impl="pallas", **kw)
        assert calls == []
        assert float(jnp.max(jnp.abs(
            got - ops.mel_spectrogram(x, 46.7, impl="xla", **kw)))) == 0.0
        # 256 (not in the tuples): deep-fade hint stays on the floor
        kw256 = dict(kw, window_length=256)
        got = ops.mel_spectrogram(x, 16.5, impl="pallas",
                                  lambd_hint=16.5, **kw256)
        assert calls == []
        assert float(jnp.max(jnp.abs(
            got - ops.mel_spectrogram(x, 16.5, impl="xla", **kw256)))) == 0.0

    @pytest.mark.parametrize("n_fft,lam", [(256, 12.0), (256, 24.0),
                                           (512, 20.0)])
    def test_hiprec_full_f32_parity(self, rng, n_fft, lam):
        """Round-5 full-f32 framed variant (VERDICT r4 next #3): no
        operand splits, Mosaic-native f32 HIGHEST GEMMs — closes the
        split-quantization floor at deep fades (hardware: every 512
        deep-fade lambda at 5-14e-6 and +17% over the gate-passing
        floor, results/probe_framed_hiprec_r5.txt; ADOPTED for
        lambda <= win/12 at 512, no-go at 256)."""
        from dmel_tpu.ops.pallas import framed_dmel as fr
        x = jnp.asarray(rng.standard_normal((2, 1500)).astype(np.float32))
        w = ops.gaussian_window(lam, n_fft)
        mel = fr.framed_mel_power(
            x, w, n_fft=n_fft, hop_length=16, n_mels=32,
            sample_rate=8000, interpret=True, hiprec=True)
        ref = ops.mel_spectrogram(
            x, float(lam), n_mels=32, sample_rate=8000, hop_length=16,
            optimized=True, window_length=n_fft, method="matmul",
            subtract_mean=False)
        err = float(jnp.max(jnp.abs(jnp.log(mel + 1e-10)
                                    - jnp.log(ref + 1e-10))))
        assert err < 2e-5, (n_fft, lam, err)

        def loss(l, xx):
            ww = ops.gaussian_window(l, n_fft)
            return fr.framed_mel_power(
                xx, ww, n_fft=n_fft, hop_length=16, n_mels=32,
                sample_rate=8000, interpret=True, hiprec=True).sum()

        def loss_ref(l, xx):
            return ops.mel_spectrogram(
                xx, l, n_mels=32, sample_rate=8000, hop_length=16,
                optimized=True, window_length=n_fft, method="matmul",
                subtract_mean=False).sum()

        g = float(jax.grad(loss)(jnp.float32(lam), x))
        gr_ = float(jax.grad(loss_ref)(jnp.float32(lam), x))
        assert abs(g - gr_) / abs(gr_) < 1e-3   # bf16 adjoint class
