"""DMEL — the differentiable log-Mel spectrogram (functional core).

The composition the reference performs per sample inside a Python loop
(/root/reference/models.py:33-56): mean-subtract → Gaussian-windowed
power STFT with |lambd| → mel filterbank GEMM → (optional) log
compression.  Here it is one batched, jit-friendly function; the heavy
path can be dispatched to the fused Pallas TPU kernel
(:mod:`dmel_tpu.ops.pallas`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dmel_tpu.ops.mel import melscale_fbanks
from dmel_tpu.ops.spectrogram import spectrogram

#: log-compression floor, matching ``torch.log(s + 1e-10)``
#: (reference models.py:73,97,126,157).
LOG_EPS = 1e-10


def mel_spectrogram(x: jnp.ndarray, lambd, *, n_mels: int, sample_rate: int,
                    hop_length: int = 1, f_min: float = 0.0,
                    f_max: float | None = None, optimized: bool = False,
                    window_length: int | None = None,
                    normalize_window: bool = False,
                    subtract_mean: bool = True, abs_lambd: bool = True,
                    method: str = "auto", impl: str = "xla",
                    precision=jax.lax.Precision.HIGHEST,
                    x_precision=None, lambd_hint: float | None = None,
                    log_output: bool = False) -> jnp.ndarray:
    """Batched differentiable mel power spectrogram.

    Args:
      x: ``(..., T)`` signals.
      lambd: scalar trainable window-length parameter.
      n_mels / sample_rate / f_min / f_max: mel filterbank parameters
        (f_max defaults to ``sample_rate // 2``, reference models.py:25).
      hop_length, optimized, window_length, normalize_window: see
        :func:`dmel_tpu.ops.spectrogram.spectrogram`.
      subtract_mean: per-sample mean subtraction before the STFT
        (reference models.py:38).
      abs_lambd: use ``|lambd|`` (reference models.py:38).
      method: "fft" | "matmul" STFT path (ignored for impl="pallas").
      impl: "xla" (pure jnp, autodiff), "pallas" (best fused TPU kernel
        *within the certified-parity domain*: the sliding-DFT specband
        kernel when the geometry supports it AND a static ``lambd_hint``
        passes the truncation guard, else the in-kernel-framing kernel,
        else the framed-by-XLA fused kernel; n_fft below
        ``stft.PALLAS_AUTO_MIN_NFFT`` routes to the exact XLA path —
        the kernels' bf16-split floor breaks the 1e-4 log-mel gate at
        small n_fft), or the explicit "pallas_specband" /
        "pallas_framed" / "pallas_fused" variants (honored regardless
        of the auto floor).
      lambd_hint: static float telling the "pallas" auto-dispatch the
        lambda magnitude this compilation will serve, so it can gate
        the J-truncated specband kernel with
        :func:`dmel_tpu.ops.stft.specgemm_ok` *outside* jit (the same
        host-side re-dispatch mechanism as the power-of-2 window
        bucket).  Ignored by the other impls; "pallas_specband" trusts
        the caller (no hint needed, guard is on the caller).

    Returns:
      ``(..., n_mels, n_frames)`` mel power spectrogram with
      ``n_frames = T // hop_length + 1`` — note the mel output shape is
      static even in optimized mode (only internal FFT shapes change).
    """
    if f_max is None:
        f_max = sample_rate // 2
    if subtract_mean:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
    if abs_lambd:
        lambd = jnp.abs(lambd)

    # log_output=True returns log(mel + LOG_EPS): the specband route
    # fuses the (Newton-refined) log into the kernel epilogue; every
    # other route applies ops.numerics.accurate_log at its return —
    # one contract, one epsilon (use log_mel_spectrogram, the public
    # wrapper)
    def _log(m):
        if not log_output:
            return m
        from dmel_tpu.ops.numerics import accurate_log
        return accurate_log(m + LOG_EPS)

    if impl in ("pallas", "pallas_specband", "pallas_framed",
                "pallas_fused"):
        from dmel_tpu.ops.pallas import framed_dmel, fused_dmel
        from dmel_tpu.ops import stft as _stft
        t = x.shape[-1]
        if optimized:
            if window_length is None:
                raise ValueError("optimized mode needs static window_length")
            win_length = int(window_length)
            n_fft = win_length
        else:
            win_length = t
            n_fft = 2 * t
        use_specband = False
        sb_taps = None
        # low-bin precision fix: needed when the (static) lambda is
        # small relative to n_fft (deep fades at the lowest mel bands
        # amplify the bf16-split floor — stft.lowbin_fix_needed);
        # correctness-first default ON when no hint is available
        from dmel_tpu.ops.stft import lowbin_fix_needed
        lb_fix = (lowbin_fix_needed(lambd_hint, n_fft)
                  if lambd_hint is not None else True)
        if impl in ("pallas", "pallas_specband"):
            from dmel_tpu.ops.pallas import specband_dmel
            from dmel_tpu.ops.stft import (SPECGEMM_J_TAPS, specband_ok,
                                           specband_j_taps)
            geom_ok = (win_length == n_fft and
                       specband_dmel.supported(n_fft, hop_length, n_mels))
            if impl == "pallas_specband":
                if not geom_ok:
                    raise ValueError(
                        "geometry unsupported by the specband kernel; "
                        "see specband_dmel.supported")
                use_specband = True
            else:
                # small-n_fft buckets certified under the FULL
                # precision ladder ride specband despite the floor
                hiprec_small = (n_fft < _stft.PALLAS_AUTO_MIN_NFFT
                                and n_fft in _stft.SPECBAND_HIPREC_NFFTS)
                use_specband = (geom_ok and lambd_hint is not None
                                and (n_fft >= _stft.PALLAS_AUTO_MIN_NFFT
                                     or hiprec_small)
                                and specband_ok(lambd_hint, win_length,
                                                n_fft, hop_length)
                                # deep-fade (lowbin) lambdas at the
                                # large buckets are NOT specband-
                                # certified: the 1024-lowbin rungs are
                                # certified at chain=1, but chain=1
                                # fails to compile at 4096 (VMEM) and
                                # has no 2048/4096 ladder rungs.
                                # Production traffic never lands here
                                # (the window buckets put lambda in
                                # (win/12, win/6], above the lowbin
                                # threshold win/12); manual deep-fade
                                # calls take the exact XLA path.
                                and not (n_fft > 1024 and lb_fix))
                if use_specband and hiprec_small:
                    lb_fix = 2          # full ladder (every column/tile)
            # adaptive tap count: large lambdas (narrow window spectra)
            # contract fewer band columns — J is static, derived from
            # the same hint that gated the dispatch
            sb_taps = (specband_j_taps(lambd_hint, n_fft)
                       if lambd_hint is not None else None)
            if sb_taps is None:
                sb_taps = SPECGEMM_J_TAPS
        if use_specband:
            from dmel_tpu.ops.pallas import specband_dmel
            from dmel_tpu.ops.window import gaussian_window
            w = gaussian_window(lambd, win_length, norm=normalize_window)
            return specband_dmel.specband_mel_power(
                x, w, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels,
                sample_rate=sample_rate, f_min=f_min, f_max=f_max,
                j_taps=sb_taps, lowbin_fix=lb_fix,
                interpret=not fused_dmel._on_tpu(),
                log_epilogue=log_output)   # fused in-kernel log
        # auto dispatch floors the fused kernels at the certified-parity
        # n_fft (stft.PALLAS_AUTO_MIN_NFFT — small n_fft fails the 1e-4
        # gate on quantization); explicit impls are honored as
        # requested.  Exception (round 4): buckets in FRAMED_AUTO_NFFTS
        # ride the FRAMED kernel for non-deep-fade static hints — the
        # direct windowed-DFT formulation has no banded-conv
        # cancellation floor and is hardware-certified there (see the
        # constant's doc); deep fades and hintless calls keep the
        # exact XLA floor.
        framed_small = (impl == "pallas"      # AUTO dispatch only —
                        # explicit impls keep their requested kernel
                        and n_fft < _stft.PALLAS_AUTO_MIN_NFFT
                        and n_fft in _stft.FRAMED_AUTO_NFFTS
                        and lambd_hint is not None
                        # certified range: (win/12, win/6] — the
                        # bucket's production lambdas; beyond it the
                        # exact XLA floor keeps the contract
                        and not _stft.lowbin_fix_needed(lambd_hint, n_fft)
                        and abs(float(lambd_hint)) <= n_fft / 6.0)
        # deep-fade small-bucket lambdas (lambda <= win/12) ride the
        # round-5 full-f32 framed variant where certified: 5-14e-6 at
        # every 512 deep-fade rung, +17% over the parity-compliant XLA
        # floor (results/probe_framed_hiprec_r5.txt; stft constant doc)
        framed_hiprec = (impl == "pallas"
                         and n_fft < _stft.PALLAS_AUTO_MIN_NFFT
                         and n_fft in _stft.FRAMED_HIPREC_NFFTS
                         and lambd_hint is not None
                         and _stft.lowbin_fix_needed(lambd_hint, n_fft))
        auto_ok = (impl != "pallas"
                   or n_fft >= _stft.PALLAS_AUTO_MIN_NFFT
                   or framed_small or framed_hiprec)
        use_framed = (impl not in ("pallas_fused",) and auto_ok
                      and win_length == n_fft
                      and framed_dmel.supported(n_fft, hop_length, n_mels))
        if impl == "pallas_framed" and not use_framed:
            raise ValueError("geometry unsupported by the framed kernel; "
                             "see framed_dmel.supported")
        if use_framed:
            from dmel_tpu.ops.window import gaussian_window
            if framed_small:
                # small-n_fft buckets run the framed kernel with the
                # lowbin precision fix ALWAYS ON: deep band fades are
                # generic across lambdas there (round-2 floor finding;
                # hardware: lambda=63.9@512 measures 1.52e-4 with the
                # fix off vs 5.8e-5 on — certify_ladder_r4_512framed)
                lb_fix = True
            w = gaussian_window(lambd, win_length, norm=normalize_window)
            return _log(framed_dmel.framed_mel_power(
                x, w, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels,
                sample_rate=sample_rate, f_min=f_min, f_max=f_max,
                lowbin_fix=lb_fix, hiprec=framed_hiprec,
                interpret=not fused_dmel._on_tpu()))
        if (n_fft > fused_dmel.MAX_N_FFT or not auto_ok
                # framed_small/hiprec only certify the FRAMED kernel at
                # the small bucket — if its geometry guard rejected,
                # fall to the exact XLA floor, never the fused kernel
                or ((framed_small or framed_hiprec)
                    and n_fft < _stft.PALLAS_AUTO_MIN_NFFT)):
            # Too large: DFT basis (2 x n_fft x n_fft/2 floats) would
            # blow VMEM budgets — the XLA FFT path handles long windows.
            # Too small (auto dispatch only): below the certified-parity
            # floor — the exact XLA path holds the 1e-4 contract there.
            impl = "xla"
        else:
            return _log(fused_dmel.dmel_power(
                x, lambd, win_length=win_length, n_fft=n_fft,
                hop_length=hop_length, n_mels=n_mels,
                sample_rate=sample_rate, f_min=f_min, f_max=f_max,
                normalize_window=normalize_window))

    s = spectrogram(x, lambd, optimized=optimized, hop_length=hop_length,
                    norm=normalize_window, window_length=window_length,
                    method=method, precision=precision,
                    x_precision=x_precision)
    n_freqs = s.shape[-2]
    fb = melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate,
                         dtype=s.dtype)
    # (.., n_freqs, n_frames)^T @ (n_freqs, n_mels) -> (.., n_mels, n_frames)
    mel = jnp.swapaxes(
        jnp.matmul(jnp.swapaxes(s, -1, -2), fb, precision=precision), -1, -2)
    return _log(mel)


def log_mel_spectrogram(x: jnp.ndarray, lambd, **kwargs) -> jnp.ndarray:
    """``log(mel_spectrogram(x) + 1e-10)`` (reference models.py:73).

    Uses the Newton-refined log (the TPU hardware log alone costs
    ~1.1e-4 of the 1e-4 feature-parity budget, see ops/numerics.py) —
    fused into the kernel epilogue on the specband route, applied in
    XLA everywhere else.  This is the production log-mel entry point:
    bench.py and the hardware ladder certify THIS path.
    """
    return mel_spectrogram(x, lambd, log_output=True, **kwargs)


def default_band_map(n_mels: int, n_sigma: int):
    """Contiguous assignment of mel bands to sigma groups: band j uses
    sigma ``j * n_sigma // n_mels``.  Returned as a STATIC numpy array
    — the map parameterizes kernel/filterbank construction at trace
    time (a jnp array would become a tracer under jit and break the
    static specband dispatch)."""
    import numpy as _np
    return (_np.arange(n_mels) * n_sigma) // n_mels


def multi_sigma_mel_spectrogram(
        x: jnp.ndarray, lambds: jnp.ndarray, *, n_mels: int,
        sample_rate: int, hop_length: int = 1, f_min: float = 0.0,
        f_max: float | None = None, optimized: bool = False,
        window_length: int | None = None, normalize_window: bool = False,
        subtract_mean: bool = True, abs_lambd: bool = True,
        band_map: jnp.ndarray | None = None, method: str = "auto",
        precision=jax.lax.Precision.HIGHEST, impl: str = "xla",
        lambd_hint=None) -> jnp.ndarray:
    """Multi-sigma DMEL: each mel band gets its own trainable window.

    An extension beyond the reference (BASELINE.json configs[4]): a
    vector of K window-length parameters ``lambds``; mel band j is
    computed from the spectrogram analyzed with window
    ``lambds[band_map[j]]`` — low bands can learn long windows (fine
    frequency resolution) while high bands learn short ones (fine time
    resolution).  With K == 1 this reduces exactly to
    :func:`mel_spectrogram`.

    Cost is K power spectrograms on the XLA path; with ``impl="pallas"``
    and a static ``lambd_hint`` (scalar or length-K sequence) whose
    every value passes the specgemm truncation guard, the fused
    specband kernel computes all K sigmas from ONE shared sliding-DFT
    spectra pass (marginal cost per sigma: one banded GEMM per output
    tile).  Differentiable in every ``lambds[k]``.

    Returns ``(..., n_mels, n_frames)``.
    """
    if f_max is None:
        f_max = sample_rate // 2
    lambds = jnp.atleast_1d(jnp.asarray(lambds, jnp.float32))
    k = lambds.shape[0]
    if band_map is None:
        band_map = default_band_map(n_mels, k)
    if subtract_mean:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
    if abs_lambd:
        lambds = jnp.abs(lambds)

    if impl == "pallas" and optimized and window_length is not None:
        from dmel_tpu.ops.pallas import fused_dmel, specband_dmel
        from dmel_tpu.ops.stft import specband_ok, specband_j_taps
        from dmel_tpu.ops.window import gaussian_window
        wl = int(window_length)
        # the hint is STATIC by contract — keep it in numpy: jnp ops on
        # constants are staged under jit and float() would see tracers
        import numpy as _np
        hints = (None if lambd_hint is None
                 else [float(h) for h in _np.atleast_1d(
                     _np.asarray(lambd_hint, dtype=_np.float32))])
        from dmel_tpu.ops import stft as _stft
        if (hints is not None
                and wl >= _stft.PALLAS_AUTO_MIN_NFFT
                and specband_dmel.supported(wl, hop_length, n_mels)
                and all(specband_ok(h, wl, wl, hop_length)
                        for h in hints)):
            # all K sigma groups share one tmat width: J must cover the
            # widest (smallest-lambda) group's spectrum
            from dmel_tpu.ops.stft import lowbin_fix_needed
            sb_taps = max(specband_j_taps(h, wl) for h in hints)
            lb_fix = any(lowbin_fix_needed(h, wl) for h in hints)
            windows = jax.vmap(
                lambda l: gaussian_window(l, wl, norm=normalize_window)
            )(lambds)
            return specband_dmel.specband_mel_power_multi(
                x, windows, band_map, n_fft=wl, hop_length=hop_length,
                n_mels=n_mels, sample_rate=sample_rate, f_min=f_min,
                f_max=f_max, j_taps=sb_taps, lowbin_fix=lb_fix,
                interpret=not fused_dmel._on_tpu())

    def one_sigma(lambd):
        return spectrogram(x, lambd, optimized=optimized,
                           hop_length=hop_length, norm=normalize_window,
                           window_length=window_length, method=method,
                           precision=precision)

    # (K, ..., F, Tt) — K is small; frames/window work is shared by XLA
    ps = jax.vmap(one_sigma)(lambds)
    n_freqs = ps.shape[-2]
    fb = melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate,
                         dtype=ps.dtype)
    # select band j from sigma band_map[j]: mask fb columns per sigma
    sel = jax.nn.one_hot(band_map, k, dtype=ps.dtype)      # (n_mels, K)
    fb_k = fb[None, :, :] * sel.T[:, None, :]              # (K, F, n_mels)
    mel_k = jnp.einsum("k...ft,kfm->...mt", ps, fb_k, precision=precision)
    return mel_k
