"""Golden parity tests for the L0 ops vs torch.stft / float64 numpy.

Parity gate (BASELINE.md): feature max-abs-err <= 1e-4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmel_tpu import ops
from tests import reference_impl as ref

jax.config.update("jax_enable_x64", False)


def max_abs_err(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def rel_err(a, b):
    """Max abs error scaled by the reference magnitude (>=1)."""
    b = np.asarray(b)
    return max_abs_err(a, b) / max(1.0, float(np.max(np.abs(b))))


class TestGaussianWindow:
    @pytest.mark.parametrize("lambd", [1.276, 6.38, 31.9, 400.0])
    @pytest.mark.parametrize("norm", [False, True])
    def test_matches_torch(self, lambd, norm):
        for length in [128, 129, 1024]:
            ours = ops.gaussian_window(lambd, length, norm=norm)
            theirs = ref.torch_gaussian_window(lambd, length, norm=norm)
            assert max_abs_err(ours, theirs.numpy()) < 5e-6

    def test_grad_matches_torch(self):
        import torch
        lam = torch.tensor(6.38, requires_grad=True)
        m = torch.arange(128).float()
        w = torch.exp(-0.5 * ((m - 64.0) / (lam + 1e-15)) ** 2)
        w.sum().backward()
        g = jax.grad(lambda l: ops.gaussian_window(l, 128).sum())(6.38)
        assert abs(float(g) - float(lam.grad)) < 1e-3 * abs(float(lam.grad))

    def test_translated_window(self):
        import torch
        ours = ops.translated_gaussian_window(6.38, 40.0, 128)
        ts = torch.arange(128).float()
        theirs = torch.exp(-0.5 * ((ts - 40.0) / (6.38 + 1e-15)) ** 2)
        theirs = theirs / theirs.max()
        assert max_abs_err(ours, theirs.numpy()) < 5e-6


class TestMelFbanks:
    @pytest.mark.parametrize("n_freqs,n_mels,sr", [
        (65, 64, 8000), (257, 64, 8000), (2049, 64, 8000), (513, 128, 16000),
    ])
    def test_matches_float64_spec(self, n_freqs, n_mels, sr):
        ours = ops.melscale_fbanks(n_freqs, 0.0, sr // 2, n_mels, sr)
        theirs = ref.np_melscale_fbanks(n_freqs, 0.0, sr // 2, n_mels, sr)
        assert max_abs_err(ours, theirs) < 1e-6
        if n_freqs >= 4 * n_mels:  # wide fbanks: all triangles populated
            assert float(np.asarray(ours).sum(axis=0).min()) > 0


class TestSpectrogram:
    @pytest.mark.parametrize("method", ["fft", "matmul"])
    def test_faithful_mode_matches_torch(self, rng, method):
        x = rng.standard_normal(128).astype(np.float32)
        for lambd in [1.276, 6.38, 31.9]:
            ours = ops.spectrogram(jnp.asarray(x), lambd, optimized=False,
                                   hop_length=1, method=method)
            theirs = ref.torch_spectrogram(x, lambd, optimized=False,
                                           hop_length=1)
            assert ours.shape == (129, 129) == theirs.shape
            assert rel_err(ours, theirs) < 1e-5

    @pytest.mark.parametrize("method", ["fft", "matmul"])
    def test_optimized_mode_matches_torch(self, rng, method):
        x = rng.standard_normal(4000).astype(np.float32)
        for lambd in [13.33, 46.67, 400.0]:
            wl = ops.optimized_window_length(lambd)
            ours = ops.spectrogram(jnp.asarray(x), lambd, optimized=True,
                                   window_length=wl, hop_length=80,
                                   method=method)
            theirs = ref.torch_spectrogram(x, lambd, optimized=True,
                                           hop_length=80)
            assert ours.shape == theirs.shape == (wl // 2 + 1, 51)
            assert rel_err(ours, theirs) < 1e-5

    def test_normalized_window_mode(self, rng):
        x = rng.standard_normal(128).astype(np.float32)
        ours = ops.spectrogram(jnp.asarray(x), 6.38, norm=True)
        theirs = ref.torch_spectrogram(x, 6.38, norm=True)
        assert rel_err(ours, theirs) < 1e-5

    def test_batched_equals_per_sample(self, rng):
        xb = rng.standard_normal((4, 128)).astype(np.float32)
        batch = ops.spectrogram(jnp.asarray(xb), 6.38)
        for i in range(4):
            single = ops.spectrogram(jnp.asarray(xb[i]), 6.38)
            assert rel_err(batch[i], single) < 1e-6

    def test_next_power_of_2(self):
        assert ops.next_power_of_2(80) == 128
        assert ops.next_power_of_2(128) == 128
        assert ops.next_power_of_2(129) == 256
        assert ops.optimized_window_length(400.0) == 4096
        assert ops.optimized_window_length(8000 * 0.01 / 6) == 128


class TestMelSpectrogram:
    def test_faithful_matches_reference_composition(self, rng):
        xb = rng.standard_normal((3, 128)).astype(np.float32)
        ours = ops.mel_spectrogram(jnp.asarray(xb), 6.38, n_mels=32,
                                   sample_rate=8000, hop_length=1)
        theirs = ref.torch_mel_spectrogram(xb, 6.38, n_mels=32,
                                           sample_rate=8000, hop_length=1)
        assert ours.shape == theirs.shape == (3, 32, 129)
        assert rel_err(ours, theirs) < 1e-5
        # the BASELINE.md feature-parity gate: log-mel max-abs-err <= 1e-4
        ours_log = np.log(np.asarray(ours) + 1e-10)
        theirs_log = np.log(theirs + 1e-10)
        assert max_abs_err(ours_log, theirs_log) < 1e-4

    def test_optimized_matches_reference_composition(self, rng):
        xb = rng.standard_normal((2, 8000)).astype(np.float32)
        lambd = 8000 * 0.035 / 6
        wl = ops.optimized_window_length(lambd)
        ours = ops.mel_spectrogram(jnp.asarray(xb), lambd, n_mels=64,
                                   sample_rate=8000, hop_length=80,
                                   optimized=True, window_length=wl)
        theirs = ref.torch_mel_spectrogram(xb, lambd, n_mels=64,
                                           sample_rate=8000, hop_length=80,
                                           optimized=True)
        assert ours.shape == theirs.shape == (2, 64, 101)
        assert rel_err(ours, theirs) < 1e-5
        ours_log = np.log(np.asarray(ours) + 1e-10)
        theirs_log = np.log(theirs + 1e-10)
        assert max_abs_err(ours_log, theirs_log) < 1e-4

    def test_negative_lambd_uses_abs(self, rng):
        x = rng.standard_normal((1, 128)).astype(np.float32)
        a = ops.mel_spectrogram(jnp.asarray(x), 6.38, n_mels=16,
                                sample_rate=8000)
        b = ops.mel_spectrogram(jnp.asarray(x), -6.38, n_mels=16,
                                sample_rate=8000)
        assert max_abs_err(a, b) == 0.0

    def test_log_mel(self, rng):
        x = rng.standard_normal((1, 128)).astype(np.float32)
        mel = ops.mel_spectrogram(jnp.asarray(x), 6.38, n_mels=16,
                                  sample_rate=8000)
        logmel = ops.log_mel_spectrogram(jnp.asarray(x), 6.38, n_mels=16,
                                         sample_rate=8000)
        assert max_abs_err(logmel, np.log(np.asarray(mel) + 1e-10)) < 1e-3


class TestLambdGradient:
    """The contract of SURVEY.md §3.3: the custom VJP chain through the
    window parameter must match torch autograd and finite differences."""

    @pytest.mark.parametrize("optimized,hop,n", [(False, 1, 128),
                                                 (True, 20, 1000)])
    def test_matches_torch_autograd(self, rng, optimized, hop, n):
        xb = rng.standard_normal((2, n)).astype(np.float32)
        lambd = 20.0
        wl = ops.optimized_window_length(lambd) if optimized else None

        def loss(lam):
            return ops.log_mel_spectrogram(
                jnp.asarray(xb), lam, n_mels=16, sample_rate=8000,
                hop_length=hop, optimized=optimized, window_length=wl).sum()

        g = float(jax.grad(loss)(lambd))
        g_ref = ref.torch_dmel_lambd_grad(xb, lambd, n_mels=16,
                                          sample_rate=8000, hop_length=hop,
                                          optimized=optimized)
        assert abs(g - g_ref) < 1e-3 * max(1.0, abs(g_ref))

    def test_matches_finite_differences(self, rng):
        xb = rng.standard_normal((2, 128)).astype(np.float32)

        def loss(lam):
            return ops.log_mel_spectrogram(
                jnp.asarray(xb, dtype=jnp.float32), lam, n_mels=16,
                sample_rate=8000).sum()

        g = float(jax.grad(loss)(6.38))
        eps = 1e-2
        fd = (float(loss(6.38 + eps)) - float(loss(6.38 - eps))) / (2 * eps)
        assert abs(g - fd) < 2e-2 * max(1.0, abs(fd))


class TestDeviceBasis:
    """On-device DFT basis generation (n_fft >= 2048) must match the
    float64 bases, including the split-k exact-mod path at 8192."""

    @pytest.mark.parametrize("n_fft", [2048, 4096, 8192])
    def test_matches_f64(self, n_fft):
        from dmel_tpu.ops.stft import (_dft_matrices_np,
                                       _dft_matrices_device)
        c64, s64 = _dft_matrices_np(n_fft)
        c, s = _dft_matrices_device(n_fft, jnp.float32)
        assert float(np.max(np.abs(np.asarray(c) - c64))) < 3e-6
        assert float(np.max(np.abs(np.asarray(s) - s64))) < 3e-6


class TestEdgeCases:
    def test_f_min_nonzero(self, rng):
        x = rng.standard_normal((1, 256)).astype(np.float32)
        import torch
        ours = ops.mel_spectrogram(jnp.asarray(x), 10.0, n_mels=16,
                                   sample_rate=8000, hop_length=8,
                                   f_min=50.0, f_max=3500.0)
        theirs = ref.torch_mel_spectrogram(x, 10.0, n_mels=16,
                                           sample_rate=8000, hop_length=8,
                                           f_min=50.0, f_max=3500.0)
        assert rel_err(ours, theirs) < 1e-5
        del torch

    def test_odd_signal_length(self, rng):
        x = rng.standard_normal((2, 123)).astype(np.float32)
        s = ops.spectrogram(jnp.asarray(x), 6.38, hop_length=3)
        assert s.shape == (2, 124, 42)   # (T+1, T//hop + 1)
        theirs = ref.torch_spectrogram(x[0], 6.38, hop_length=3)
        assert rel_err(s[0], theirs) < 1e-5

    def test_all_methods_agree(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 1000)).astype(np.float32))
        w = ops.gaussian_window(20.0, 128)
        base = ops.stft_power(x, w, 128, 20, method="fft")
        for method in ("matmul", "matmul_ext", "folded", "conv"):
            other = ops.stft_power(x, w, 128, 20, method=method)
            assert rel_err(other, base) < 1e-5, method

    def test_normalized_window_all_methods(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))
        w = ops.gaussian_window(30.0, 256, norm=True)
        base = ops.stft_power(x, w, 256, 16, method="fft")
        for method in ("matmul", "matmul_ext", "folded"):
            assert rel_err(ops.stft_power(x, w, 256, 16, method=method),
                           base) < 1e-5


class TestSpecGemm:
    """Frequency-domain (banded) STFT — the derivative-window gradient
    identity path (stft.py:stft_power_specgemm).  Exactness contract:
    within its dispatch window (win == n_fft, 8|lambd| <= win) the
    J-truncated window spectrum must keep log-mel parity <= 1e-4 and
    lambda-gradient parity with the exact GEMM path."""

    @pytest.mark.parametrize("x_impl", ["conv", "gemm", "sliding"])
    def test_matches_torch_optimized_mode(self, rng, x_impl):
        from dmel_tpu.ops.stft import stft_power_specgemm
        x = rng.standard_normal(4000).astype(np.float32)
        lambd, wl, hop = 64.0, 512, 40       # wl = 8*lambd: dispatch edge
        w = ops.gaussian_window(lambd, wl)
        ours = stft_power_specgemm(jnp.asarray(x), w, wl, hop,
                                   x_impl=x_impl)
        theirs = ref.torch_spectrogram(x, lambd, optimized=True,
                                       hop_length=hop)
        assert ours.shape == theirs.shape
        assert rel_err(ours, theirs) < 1e-5

    def test_log_mel_gate(self, rng):
        xb = rng.standard_normal((2, 4000)).astype(np.float32)
        lambd, wl = 64.0, 512
        ours = ops.mel_spectrogram(jnp.asarray(xb), lambd, n_mels=64,
                                   sample_rate=8000, hop_length=40,
                                   optimized=True, window_length=wl,
                                   method="specgemm")
        theirs = ref.torch_mel_spectrogram(xb, lambd, n_mels=64,
                                           sample_rate=8000, hop_length=40,
                                           optimized=True)
        assert max_abs_err(np.log(np.asarray(ours) + 1e-10),
                           np.log(theirs + 1e-10)) < 1e-4

    def test_grad_matches_exact_path(self, rng):
        xb = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))

        def loss(lam, method):
            return ops.log_mel_spectrogram(
                xb, lam, n_mels=64, sample_rate=8000, hop_length=40,
                optimized=True, window_length=512, method=method).sum()

        for lam in [40.0, 64.0]:
            g_spec = float(jax.grad(loss)(lam, "specgemm"))
            g_ref = float(jax.grad(loss)(lam, "matmul"))
            assert abs(g_spec - g_ref) < 1e-4 * max(1.0, abs(g_ref)), lam

    def test_normalized_window(self, rng):
        from dmel_tpu.ops.stft import stft_power_specgemm
        x = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32))
        w = ops.gaussian_window(30.0, 256, norm=True)
        base = ops.stft_power(x, w, 256, 16, method="fft")
        assert rel_err(stft_power_specgemm(x, w, 256, 16), base) < 1e-5

    def test_dispatch_guard(self):
        from dmel_tpu.ops.stft import specgemm_ok
        assert specgemm_ok(64.0, 512, 512)           # 8*lambda == win
        assert specgemm_ok(-64.0, 512, 512)          # |lambda|
        assert not specgemm_ok(65.0, 512, 512)       # above the boundary
        assert not specgemm_ok(10.0, 128, 256)       # win != n_fft
        assert not specgemm_ok(200.0, 2048, 2048)    # long-FFT regime
        # lower bound: J taps must cover ~5 sigma_f of the window
        # spectrum (measured 1.07 log-mel err at lambda=16, n_fft=1024)
        assert not specgemm_ok(16.0, 1024, 1024)
        assert not specgemm_ok(30.0, 1024, 1024)     # 4.4 sigma_f: out
        assert specgemm_ok(40.0, 1024, 1024)         # 5.9 sigma_f: in

    def test_compile_hint_preserves_static_switches(self):
        """The training-loop hint must land in the SAME (J, lowbin)
        static-switch region as the actual lambda (round-3 review
        find: the J-bucket lower edge alone is always in the lowbin
        region, which silently forced every training compile onto the
        deep-fade ladder and chain=1), while producing a bounded
        number of distinct compilations per window bucket."""
        from dmel_tpu.ops.stft import (lowbin_fix_needed,
                                       specband_compile_hint,
                                       specband_j_taps, specband_ok)
        for wl in (1024, 2048, 4096):
            hints = set()
            for lam in np.linspace(wl / 24, wl / 8, 257):
                h = specband_compile_hint(float(lam), wl, 80)
                if h is None:
                    assert not specband_ok(lam, wl, wl, 80)
                    continue
                assert specband_j_taps(h, wl) == specband_j_taps(lam, wl)
                assert (lowbin_fix_needed(h, wl)
                        == lowbin_fix_needed(lam, wl))
                hints.add(round(h, 6))
            assert len(hints) <= 5, hints
        # bench point: lambda=128@1024 is top-of-bucket -> J=24, lowbin
        # OFF (the chain=2 geometry)
        h = specband_compile_hint(128.0, 1024, 80)
        assert specband_j_taps(h, 1024) == 24
        assert not lowbin_fix_needed(h, 1024)

    def test_win_mismatch_raises(self, rng):
        from dmel_tpu.ops.stft import stft_power_specgemm
        x = jnp.asarray(rng.standard_normal(500).astype(np.float32))
        w = ops.gaussian_window(10.0, 128)
        with pytest.raises(ValueError):
            stft_power_specgemm(x, w, 256, 10)


class TestMatmulExtMP:
    """Mixed-precision custom VJP (stft_power_matmul_ext_mp): forward
    features bit-match the plain path at equal precision; the adjoint's
    dlambda and dx match the autodiff chain."""

    def test_forward_matches_plain(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 4000)).astype(np.float32))
        w = ops.gaussian_window(64.0, 512)
        hi = jax.lax.Precision.HIGHEST
        a = ops.stft_power_matmul_ext_mp(x, w, 512, 40, fwd_precision=hi,
                                         bwd_precision=hi)
        b = ops.stft_power(x, w, 512, 40, method="matmul")
        assert a.shape == b.shape
        assert rel_err(a, b) < 1e-6

    def test_grads_match_autodiff(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
        fb = ops.melscale_fbanks(257, 0.0, 4000, 64, 8000)
        hi = jax.lax.Precision.HIGHEST

        def loss(l, xx, mp):
            w = ops.gaussian_window(l, 512)
            p = (ops.stft_power_matmul_ext_mp(xx, w, 512, 40,
                                              fwd_precision=hi,
                                              bwd_precision=hi)
                 if mp else ops.stft_power(xx, w, 512, 40,
                                           method="matmul"))
            return jnp.log(jnp.matmul(jnp.swapaxes(p, -1, -2), fb)
                           + 1e-10).sum()

        g_ref = float(jax.grad(loss)(jnp.float32(64.0), x, False))
        g_mp = float(jax.grad(loss)(jnp.float32(64.0), x, True))
        assert abs(g_mp - g_ref) < 1e-5 * abs(g_ref)
        gx_ref = jax.grad(loss, argnums=1)(jnp.float32(64.0), x, False)
        gx_mp = jax.grad(loss, argnums=1)(jnp.float32(64.0), x, True)
        assert rel_err(gx_mp, gx_ref) < 1e-5

    def test_dispatch_through_mel(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32))
        a = ops.mel_spectrogram(x, 40.0, n_mels=32, sample_rate=8000,
                                hop_length=20, optimized=True,
                                window_length=256, method="matmul_ext_mp")
        b = ops.mel_spectrogram(x, 40.0, n_mels=32, sample_rate=8000,
                                hop_length=20, optimized=True,
                                window_length=256, method="matmul")
        assert rel_err(a, b) < 1e-6

    def test_win_mismatch_raises(self, rng):
        x = jnp.asarray(rng.standard_normal(500).astype(np.float32))
        w = ops.gaussian_window(10.0, 128)
        with pytest.raises(ValueError):
            ops.stft_power_matmul_ext_mp(x, w, 256, 10)


class TestRandomizedParity:
    """Fuzz the (T, hop, win_length, mode) space against torch.stft."""

    @pytest.mark.parametrize("seed", range(6))
    def test_random_configs(self, seed):
        r = np.random.default_rng(seed)
        t = int(r.integers(64, 600))
        optimized = bool(r.integers(0, 2))
        hop = int(r.integers(1, max(2, t // 8)))
        lambd = float(r.uniform(2.0, t / 4))
        x = r.standard_normal(t).astype(np.float32)
        if optimized:
            wl = ops.optimized_window_length(lambd)
            if wl > 2 * t:   # degenerate: window longer than padded signal
                wl = ops.next_power_of_2(t)
            ours = ops.spectrogram(jnp.asarray(x), lambd, optimized=True,
                                   window_length=wl, hop_length=hop)
            import torch
            w = ref.torch_gaussian_window(lambd, wl)
            s = torch.stft(torch.tensor(x), n_fft=wl, hop_length=hop,
                           win_length=wl, window=w, return_complex=True,
                           pad_mode="constant")
            theirs = (torch.abs(s) ** 2).numpy()
        else:
            ours = ops.spectrogram(jnp.asarray(x), lambd, optimized=False,
                                   hop_length=hop)
            theirs = ref.torch_spectrogram(x, lambd, optimized=False,
                                           hop_length=hop)
        assert ours.shape == theirs.shape, (t, hop, lambd, optimized)
        assert rel_err(ours, theirs) < 1e-5, (t, hop, lambd, optimized)


def test_auto_method_short_window_on_tpu(monkeypatch):
    """Round-4 regression (code-review find): the TPU auto method
    switched to matmul_ext_mp, which requires win_length == n_fft —
    faithful-mode calls (win = T, n_fft = 2T) must keep a path that
    center-pads the window instead of raising."""
    import jax as _jax
    import numpy as _np
    from dmel_tpu.ops import stft as stft_mod
    from dmel_tpu.ops.window import gaussian_window

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    rng = _np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 500)).astype(_np.float32))
    w = gaussian_window(20.0, 500)                    # win 500 < n_fft 1000
    got = stft_mod.stft_power(x, w, 1000, 80, method="auto")
    want = stft_mod.stft_power(x, w, 1000, 80, method="fft")
    rel = float(jnp.max(jnp.abs(got - want))
                / jnp.maximum(jnp.max(jnp.abs(want)), 1.0))
    assert rel < 1e-5
    # full-window strided call still picks the mp path on "tpu"
    w2 = gaussian_window(20.0, 256)
    got2 = stft_mod.stft_power(x, w2, 256, 80, method="auto")
    want2 = stft_mod.stft_power(x, w2, 256, 80, method="matmul_ext_mp")
    assert float(jnp.max(jnp.abs(got2 - want2))) == 0.0
