"""Batched short-time Fourier transform with torch.stft-compatible semantics.

The reference delegates to ``torch.stft(x, n_fft, hop_length, win_length,
window, return_complex=True, pad_mode='constant')``
(/root/reference/time_frequency.py:48-51) with torch defaults
``center=True, onesided=True, normalized=False``.  This module
re-implements those exact semantics TPU-first:

- fully batched over leading axes (the reference loops over the batch in
  Python — SURVEY.md §2 "batch parallelism actively defeated"; here a
  single XLA program handles the whole batch),
- static shapes (frame count and FFT size are Python ints at trace time),
- two compute paths: ``jnp.fft.rfft`` and a DFT-as-matmul path that maps
  onto the TPU MXU (used by the fused Pallas kernel and profitable for
  small n_fft).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def num_frames(signal_length: int, hop_length: int) -> int:
    """Frame count of a centered STFT with even n_fft.

    torch.stft with center=True pads by n_fft//2 on both sides, giving
    ``1 + signal_length // hop_length`` frames for even n_fft.
    """
    return 1 + signal_length // hop_length


def pad_window(window: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Center-pad a window of length ``win_length <= n_fft`` to ``n_fft``.

    torch.stft places a short window in the middle of the FFT buffer with
    ``(n_fft - win_length) // 2`` zeros on the left.
    """
    win_length = window.shape[-1]
    if win_length == n_fft:
        return window
    if win_length > n_fft:
        raise ValueError(f"win_length {win_length} > n_fft {n_fft}")
    left = (n_fft - win_length) // 2
    return jnp.pad(window, (left, n_fft - win_length - left))


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True) -> jnp.ndarray:
    """Slice ``x`` (..., T) into overlapping frames (..., n_frames, n_fft).

    With ``center=True``, zero-pads by ``n_fft // 2`` on both sides first
    (torch.stft ``pad_mode='constant'`` parity).
    """
    t = x.shape[-1]
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
        n = num_frames(t, hop_length)
    else:
        n = 1 + (t - n_fft) // hop_length
    starts = jnp.arange(n) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def frame_signal_ext(x: jnp.ndarray, n_fft: int, hop_length: int):
    """Gather-free framing: ``(..., T) -> (..., nfr, k*hop)`` where
    ``k = ceil(n_fft/hop)``; row t is the *contiguous* slice
    ``xp[t*hop : t*hop + k*hop]`` (a superset of the frame).

    Built from k static row-shifted views of the ``(T/hop, hop)``
    reshape — dense copies at full HBM bandwidth, where an explicit
    ``xp[idx]`` gather measures ~8x off the memory roofline on TPU.
    Callers must use an n_fft-masked window / zero-extended DFT basis
    (the extra ``k*hop - n_fft`` columns are garbage until windowed).
    Worth it when k is small (hop >= n_fft/32 or so).
    """
    t = x.shape[-1]
    pad = n_fft // 2
    nfr = num_frames(t, hop_length)
    k = -(-n_fft // hop_length)
    n_ext = k * hop_length
    total = (nfr - 1 + k) * hop_length          # rows needed * hop
    right = total - t - pad
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, max(right, 0))])
    xp = xp[..., :total]
    resh = xp.reshape(x.shape[:-1] + (total // hop_length, hop_length))
    parts = [resh[..., j:j + nfr, :] for j in range(k)]
    frames_ext = jnp.concatenate(parts, axis=-1)    # (..., nfr, k*hop)
    return frames_ext, n_ext


@functools.lru_cache(maxsize=32)
def _dft_matrices_np(n_fft: int):
    import numpy as np
    # Computed in float64 then cast, so the f32 matmul path stays within
    # the 1e-4 parity budget even for large n_fft.
    m = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * m * k / n_fft
    return np.cos(ang), np.sin(ang)


#: above this size, DFT bases are generated on-device instead of being
#: embedded as program constants (2 x n_fft x (n_fft/2+1) floats — 268 MB
#: at n_fft=8192, which breaks program-upload limits and bloats caches).
DEVICE_BASIS_MIN_N_FFT = 2048


def _dft_matrices_device(n_fft: int, dtype):
    """Generate C/S on device with exact mod-N phase reduction.

    ``m*k`` is exact in float32 up to 2^24, and the mod-N reduction
    keeps angles in [0, 2pi) so cos/sin stay within ~1e-6 of the
    float64 bases (valid for n_fft*(n_fft/2) < 2^24, i.e. n_fft<=4096;
    larger sizes split k to stay exact).
    """
    n_bins = n_fft // 2 + 1
    m = jnp.arange(n_fft, dtype=jnp.float32)[:, None]
    k = jnp.arange(n_bins, dtype=jnp.float32)[None, :]
    if n_fft * (n_bins - 1) < 2 ** 24:
        mk = m * k
    else:
        # split k = k_hi*256 + k_lo; reduce each product mod n separately
        k_hi = jnp.floor(k / 256.0)
        k_lo = k - k_hi * 256.0
        mk1 = (m * 256.0) % n_fft * k_hi
        mk = mk1 % n_fft + m * k_lo
    mkmod = mk - n_fft * jnp.floor(mk / n_fft)
    ang = (-2.0 * jnp.pi / n_fft) * mkmod
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def dft_matrices(n_fft: int, dtype=jnp.float32):
    """Real-DFT basis matrices ``C, S`` of shape (n_fft, n_fft//2+1).

    ``rfft(v) = v @ C + 1j * (v @ S)`` — two MXU GEMMs instead of an FFT.
    Small sizes are float64-precomputed constants; large sizes are
    generated on device (see DEVICE_BASIS_MIN_N_FFT).
    """
    if n_fft >= DEVICE_BASIS_MIN_N_FFT:
        return _dft_matrices_device(n_fft, dtype)
    c, s = _dft_matrices_np(n_fft)
    return jnp.asarray(c, dtype=dtype), jnp.asarray(s, dtype=dtype)


@functools.lru_cache(maxsize=32)
def _folded_dft_matrices_np(n_fft: int):
    import numpy as np
    # half-size bases: Ce/Se are (n_fft/2, n_fft/2) over m, k = 0..h-1
    h = n_fft // 2
    m = np.arange(h)[:, None]
    k = np.arange(h)[None, :]
    ang = 2.0 * np.pi * m * k / n_fft
    return np.cos(ang), np.sin(ang)


def stft_power_folded(x: jnp.ndarray, window: jnp.ndarray, n_fft: int,
                      hop_length: int, *,
                      precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Power spectrogram via the *folded* real DFT — half-size GEMMs.

    Exploits cos/sin symmetry about the frame midpoint: with
    ``e[m] = fw[m] + fw[N-m]`` and ``o[m] = fw[m] - fw[N-m]``
    (m = 1..N/2-1),

        Re[k] = (E @ Ce)[k] + fw[N/2]*(-1)^k
        Im[k] = -(O @ Se)[k]

    where Ce/Se are (N/2 x N/2) — 2.3x fewer MXU flops than the naive
    (N x N/2+1) basis, exact to float32 rounding.  The Nyquist bin is a
    cheap separate reduction.  Identical output layout to
    :func:`stft_power`.
    """
    n = n_fft
    h = n // 2
    w = pad_window(window, n)
    fw = frame_signal(x, n, hop_length) * w          # (..., nfr, n)
    f0 = fw[..., 0:1]
    fn2 = fw[..., h:h + 1]
    pair = fw[..., 1:h]
    pair_rev = fw[..., :h:-1]                        # m = N-1 .. h+1
    e = jnp.concatenate([f0, pair + pair_rev], axis=-1)       # (..., h)
    o = jnp.concatenate([jnp.zeros_like(f0), pair - pair_rev], axis=-1)

    ce_np, se_np = _folded_dft_matrices_np(n)
    ce = jnp.asarray(ce_np, dtype=fw.dtype)
    se = jnp.asarray(se_np, dtype=fw.dtype)
    alt = jnp.asarray((-1.0) ** jnp.arange(h), dtype=fw.dtype)

    re = jnp.matmul(e, ce, precision=precision) + fn2 * alt   # bins 0..h-1
    im = -jnp.matmul(o, se, precision=precision)
    p = re * re + im * im
    # Nyquist bin k = h: Re = sum_m e[m]*(-1)^m + fw[N/2]*(-1)^h
    re_h = jnp.sum(e * alt, axis=-1, keepdims=True) + fn2 * ((-1.0) ** h)
    p = jnp.concatenate([p, re_h * re_h], axis=-1)   # (..., h+1)
    return jnp.swapaxes(p, -1, -2)


def stft_power_conv(x: jnp.ndarray, window: jnp.ndarray, n_fft: int,
                    hop_length: int, *,
                    precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Power spectrogram as a strided 1-D convolution (implicit GEMM).

    The windowed DFT basis becomes the conv filter bank:
    ``Re[k,t], Im[k,t] = conv1d(x, w*C_k, stride=hop)`` — XLA lowers
    strided convs straight onto the MXU *without materializing the
    (frames x n_fft) tensor*, which profiling shows costs ~40% of the
    forward as an XLA gather.  The input is read once (~n_fft/hop x less
    HBM traffic than explicit framing); the nnAudio-style formulation
    (PAPERS.md) re-designed for TPU.  Differentiable in the window via
    the filter bank (filters are rebuilt from ``window`` each call — a
    tiny elementwise op).
    """
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    w = pad_window(window, n_fft)
    c, s = dft_matrices(n_fft, dtype=x.dtype)
    filt = jnp.concatenate([w[:, None] * c, w[:, None] * s], axis=1)
    pad = n_fft // 2
    x3 = x.reshape((-1, 1, t))
    y = jax.lax.conv_general_dilated(
        x3, jnp.transpose(filt)[:, None, :],        # (out_ch, in_ch, W)
        window_strides=(hop_length,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"), precision=precision)
    n_bins = n_fft // 2 + 1
    re, im = y[:, :n_bins, :], y[:, n_bins:, :]
    p = re * re + im * im                            # (B, n_bins, nfr)
    return p.reshape(batch_shape + p.shape[1:])


@functools.lru_cache(maxsize=32)
def _dft_matrices_ext_np(n_fft: int, j_taps: int):
    """Extended-bin real-DFT bases for bins ``-J .. n_fft//2 + J``.

    Same float64 construction as :func:`_dft_matrices_np`; the extra
    columns let a frequency-domain window convolution read neighbours of
    every one-sided bin without modular gathers (DFT bins are N-periodic
    so bin ``-j`` *is* bin ``N-j``).
    """
    import numpy as np
    m = np.arange(n_fft)[:, None]
    k = np.arange(-j_taps, n_fft // 2 + 1 + j_taps)[None, :]
    ang = -2.0 * np.pi * m * k / n_fft
    return np.cos(ang), np.sin(ang)


@functools.lru_cache(maxsize=32)
def _tap_basis_np(n_fft: int, j_taps: int):
    """Window-spectrum tap basis: ``(n_fft, J+1)`` cos/sin matrices.

    ``What[d] = sum_m w[m] e^{-2 pi i m d / n_fft}`` for d = 0..J; the
    negative taps follow from conjugate symmetry of a real window.
    """
    import numpy as np
    m = np.arange(n_fft)[:, None]
    d = np.arange(j_taps + 1)[None, :]
    ang = -2.0 * np.pi * m * d / n_fft
    return np.cos(ang), np.sin(ang)


#: default half-support (in bins) of the truncated window spectrum used
#: by the specgemm path.  Measured (scripts/study_specgemm.py): at the
#: dispatch limit ``win = 8*lambda`` the J=24 truncation contributes
#: <= 1e-5 log-mel error on white noise (<= 1e-4 on adversarial tonal
#: signals); block granularity on the MXU makes larger J nearly free in
#: the XLA formulation, so accuracy is cheap here.
SPECGEMM_J_TAPS = 24

#: output bins are produced in blocks of this many columns (one MXU lane
#: tile) by the banded GEMM.
_SPECGEMM_BLOCK = 128


def specgemm_ok(lambd_value: float, window_length: int, n_fft: int,
                hop_length: int = 1,
                j_taps: int = SPECGEMM_J_TAPS) -> bool:
    """Static dispatch guard for the specgemm path.

    Two-sided lambda validity window (measured,
    scripts/study_specgemm.py + scripts/validate_specband.py):

    - **Upper bound** ``8 |lambd| <= win``: above it the Gaussian's
      endpoint value ``exp(-0.5*(win/(2 lambd))^2)`` is large, the
      truncated window's Dirichlet sidelobes leak, and the J-tap
      spectrum is no longer parity-exact.
    - **Lower bound** ``2 pi |lambd| J >= 5 n_fft``: the window
      spectrum's Gaussian width is ``sigma_f = n_fft / (2 pi lambd)``
      bins, and J taps must cover >= ~5 sigma_f (measured: 4.7 sigma_f
      gives 5.5e-5 log-mel err, 3.5 sigma_f gives 7e-3 — the
      truncation tail blows the 1e-4 budget below ~4.7).

    ``lambd`` is traced inside jit, so the caller decides *outside*
    jit — the same mechanism as the power-of-2 window bucket
    (spectrogram.py) — and recompiles when the boundary is crossed.
    """
    if window_length != n_fft or n_fft >= DEVICE_BASIS_MIN_N_FFT:
        return False  # padded-window / long-FFT cases keep other paths
    lam = abs(float(lambd_value))
    return (8.0 * lam <= window_length
            and 2.0 * math.pi * lam * j_taps >= 5.0 * n_fft)


def specband_ok(lambd_value: float, window_length: int, n_fft: int,
                hop_length: int = 1,
                j_taps: int = SPECGEMM_J_TAPS) -> bool:
    """Static lambda-validity guard for the fused specband PALLAS
    kernel: the same two-sided truncation window as
    :func:`specgemm_ok`, but WITHOUT the XLA path's device-basis
    cutoff — the kernel streams its host-built DFT bases from HBM
    in contraction chunks (round 3), so n_fft 2048/4096 (the
    reference's 300 ms-init production bucket,
    /root/reference/search_spaces.py:29,61 with
    optimized_window_length(400) = 4096) are in range.  The geometry
    side is specband_dmel.supported; this guard is the lambda side,
    decided outside jit from the static lambd_hint."""
    if window_length != n_fft:
        return False
    from dmel_tpu.ops.pallas.specband_dmel import SPECBAND_MAX_NFFT
    if n_fft > SPECBAND_MAX_NFFT:
        return False
    lam = abs(float(lambd_value))
    return (8.0 * lam <= window_length
            and 2.0 * math.pi * lam * j_taps >= 5.0 * n_fft)


#: adaptive tap-count ladder for the fused specband kernel: the banded
#: GEMMs contract LANE + 2J columns, so mid-range lambdas (narrow,
#: cleanly-decaying window spectra) can run with fewer taps.  A small
#: ladder (not a continuous J) keeps the compiled-variant count
#: bounded.
SPECBAND_J_LADDER = (12, 16, SPECGEMM_J_TAPS)

#: upper-lambda cutoff for the reduced-J rungs: the window spectrum is
#: a GAUSSIAN only while the N-sample truncation endpoint
#: ``exp(-0.5 (win / 2 lambda)^2)`` is negligible; above ~1e-5
#: (lambda > win/9.6) the endpoint's slowly-decaying Dirichlet
#: sidelobes dominate the tap tail and only the full J=24 stays inside
#: the parity budget (measured at lambda = win/8: J=12 -> 1.07e-4 even
#: with x4 GEMMs, J=24 -> 4.5e-5; J>24 buys nothing).
_SPECBAND_SIDELOBE_MAX_LAMBDA_FRAC = 1.0 / 9.6


#: lambda/n_fft threshold below which the fused kernels enable their
#: low-bin precision fix.  Mechanism (measured, scripts/certify_ladder
#: + numpy error decomposition): the lowest mel bands aggregate few
#: effective spectral degrees of freedom, and the window spectrum's
#: bin-to-bin smoothing (sigma_f = n_fft/(2 pi lambda) bins) correlates
#: them further as lambda shrinks — mel band 0 fades to ~1e-3 of the
#: median mel value.  The bf16 2-way operand split's ~2^-18
#: representation floor is ABSOLUTE across bins, so at those fades it
#: becomes >1e-4 relative (1.2-2.5e-4 measured on hardware at
#: lambda <= n_fft/16 vs 7e-5 at lambda = n_fft/8).  The fix lifts the
#: first output tile to a 3-way split (~2^-27): measured <=4e-5 across
#: seeds at lambda in [n_fft/28, n_fft/16].
LOWBIN_FIX_MAX_LAMBDA_FRAC = 1.0 / 12.0

#: Certified-parity floor for the AUTO ``impl="pallas"`` dispatch.
#: The fused kernels' bf16-split quantization is an ABSOLUTE floor
#: relative to the largest spectral values; at small n_fft each mel
#: band integrates very few bins, so band-power fades get deep enough
#: to push that floor past the 1e-4 log-mel gate in EVERY tile, not
#: just band 0 (hardware lambda sweep, scripts/certify_ladder.py:
#: specband 1.2-2.7e-4 at n_fft=512, 4e-4-2.5e-3 at n_fft=256; the
#: framed kernel fails too at 256, 4.6e-3 at lambda=31.9 — reproduced
#: in CPU interpret mode, so quantization, not a hardware defect; the
#: tile-0 precision ladder does not close it because the dominant term
#: is the bf16x3 spectra themselves).  Auto dispatch therefore hands
#: n_fft below this floor to the exact XLA path (~1e-5 at these
#: geometries, and the FLOP savings at stake are small).  Explicit
#: impl="pallas_*" requests are honored regardless (tests exercise the
#: kernels at tiny geometries with their own gates).
PALLAS_AUTO_MIN_NFFT = 1024

#: Small-n_fft buckets reclaimed from the certified-parity floor by
#: the specband kernel's FULL precision ladder (lowbin_fix level 2:
#: the 3-way-split correction passes run on every basis column and the
#: 6-pass band conv on every tile, lifting the whole pipeline to the
#: ~2^-27 quantization class — the round-2 floor finding was that the
#: deep fades are generic across tiles at small n_fft, so the tile-0
#: ladder could not close them).  Auto ``impl="pallas"`` routes these
#: buckets to specband with level 2 when the lambda hint passes
#: :func:`specband_ok`; everything else below PALLAS_AUTO_MIN_NFFT
#: stays on the exact XLA path.  Populated per bucket ONLY after a
#: hardware certify_ladder run at that geometry, citing the committed
#: artifact (results/ file + date) next to the entry.
#:
#: Currently EMPTY: the 512 reclaim attempt FAILED hardware
#: certification (results/diag_hiprec_512_r4.txt: 1.15-2.53e-4 vs the
#: 1e-4 gate, identical eager/jit).  ROOT CAUSE (round-4 follow-up,
#: results/diag_512_bisect_r4.txt): not a codegen bug — a Mosaic
#: minimal-kernel probe shows the compensated splits are materialized
#: bitwise — but the banded-conv FORMULATION's cancellation floor:
#: deep-fade band values form as differences of large extended-bin
#: spectra, so f32 ACCUMULATION noise (~2^-24 x |X|, untouched by any
#: operand-precision ladder — hence level 2 moved the number ~0) is
#: ~1e-4-relative there.  CPU interpret (4e-5) and the MXU (1.6e-4)
#: sit on either side of that floor by accumulation order alone; the
#: direct windowed-DFT XLA path has no such cancellation (5e-6).
#: Reclaiming 512 needs a different formulation (direct-DFT small-
#: bucket kernel or f64-class accumulation), not more splits.  The
#: level-2 machinery stays available behind explicit impls.
SPECBAND_HIPREC_NFFTS: tuple = ()


#: Small-n_fft buckets served by the FRAMED (direct windowed-DFT)
#: kernel for NON-deep-fade hints: the direct formulation has no
#: banded-conv cancellation floor, and measured 5.7-7.0e-5 at every
#: 512-bucket lambda >= the lowbin threshold (win/12 = 42.7) on
#: hardware at 353k audio-s/s — certified in
#: results/certify_ladder_r4_512framed.txt.  ROUND-5 METHODOLOGY NOTE
#: (results/bench_buckets_r5.txt + probe_512_routes_r5.txt): a faster
#: matmul_ext_mp timing (378k) briefly suggested flipping this back to
#: the XLA floor — but that probe ran the HIGH-precision forward,
#: which FAILS the 1e-4 parity gate at 512 (4.5e-4; 128: 1.8e-3).
#: The parity-compliant floor (HIGHEST fwd) runs 269k; framed keeps
#: the bucket.  Any future re-route must compare against a
#: GATE-PASSING floor in the same session.
FRAMED_AUTO_NFFTS: tuple = (512,)

#: Small-n_fft buckets whose DEEP-FADE lambdas (lambda <= win/12) ride
#: the round-5 full-f32 framed variant (`hiprec`: no operand splits,
#: Mosaic-native f32 HIGHEST GEMMs).  Hardware
#: (results/probe_framed_hiprec_r5.txt): every 512 deep-fade rung
#: 5-14e-6 / dlambda ~1.5e-4, at 316k audio-s/s vs the parity-
#: compliant XLA floor's 269k (+17%).  256 is NOT included: hiprec
#: measured 1.25e-4 at lambda=12 and 7.3e-4 at 21.3 there (non-
#: monotonic — the same Mosaic small-geometry numerics class as the
#: round-4 specband hiprec-512 finding), so that bucket stays floored.
FRAMED_HIPREC_NFFTS: tuple = (512,)


def lowbin_fix_needed(lambd_value: float, n_fft: int) -> bool:
    """Whether the fused kernels' low-bin precision fix is needed for
    this (static) lambda hint.  In production dispatch the hint comes
    from the same host boundary as the window bucket, so compilations
    at the bottom of a bucket (lambda/win in (1/16, 1/12)) get the
    extra correction passes and top-of-bucket ones (e.g. the bench
    point lambda = win/8) stay on the cheaper bf16x3 path."""
    return abs(float(lambd_value)) < LOWBIN_FIX_MAX_LAMBDA_FRAC * n_fft


def specband_j_taps(lambd_value: float, n_fft: int) -> int | None:
    """Smallest tap count on the ladder that keeps the J-truncated
    window spectrum inside the parity budget for ``lambd_value``, or
    None if even the largest J fails :func:`specgemm_ok`'s coverage
    rule.  Two regimes (both measured, see constants above): reduced J
    needs BOTH >= ~5 sigma_f Gaussian coverage AND a negligible
    truncation endpoint; near the upper dispatch boundary
    (win/9.6 < lambda <= win/8) only the full J qualifies.  Static —
    decided outside jit from the same ``lambd_hint`` that gates the
    specband dispatch; the training loop's hint buckets make J part of
    the step-cache key."""
    lam = abs(float(lambd_value))
    sidelobe_safe = lam <= _SPECBAND_SIDELOBE_MAX_LAMBDA_FRAC * n_fft
    for j in SPECBAND_J_LADDER[:-1]:
        if sidelobe_safe and 2.0 * math.pi * lam * j >= 5.0 * n_fft:
            return j
    j = SPECBAND_J_LADDER[-1]
    if 2.0 * math.pi * lam * j >= 5.0 * n_fft:
        return j
    return None


def specband_compile_hint(lambd_value: float, n_fft: int,
                          hop_length: int) -> float | None:
    """Canonical static ``lambd_hint`` for the specband dispatch:
    a representative lambda of the current STATIC-SWITCH region — same
    adaptive-tap J bucket (:func:`specband_j_taps`) AND same lowbin-fix
    flag (:func:`lowbin_fix_needed`) as the actual lambda — so training
    compiles one kernel per (window bucket, J, lowbin) region instead
    of per lambda value.  None when the lambda is outside the
    truncation window (callers keep the framed/XLA path).

    Preserving the lowbin flag matters (round-3 review find): the
    J-bucket LOWER edge alone is always below the lowbin threshold
    n_fft/12, which would force every training compile onto the
    deep-fade precision ladder — disabling the chain=2 block geometry
    at 1024 and paying ~+10% fwd flops for top-of-bucket lambdas that
    do not need it."""
    if not specband_ok(lambd_value, n_fft, n_fft, hop_length):
        return None
    j = specband_j_taps(lambd_value, n_fft)
    lb = lowbin_fix_needed(lambd_value, n_fft)
    if lb:
        # deep-fade region: the J-bucket lower edge lies inside it
        # (1.001: guard against float rounding at the bucket edge)
        hint = 1.001 * 5.0 * n_fft / (2.0 * math.pi * j)
    elif abs(float(lambd_value)) > _SPECBAND_SIDELOBE_MAX_LAMBDA_FRAC * n_fft:
        hint = 1.001 * _SPECBAND_SIDELOBE_MAX_LAMBDA_FRAC * n_fft
    else:
        # reduced-J band above the lowbin threshold
        hint = 1.001 * LOWBIN_FIX_MAX_LAMBDA_FRAC * n_fft
    # the representative must reproduce BOTH static switches; fall back
    # to the exact lambda (per-value compile, always correct)
    if (specband_j_taps(hint, n_fft) != j
            or lowbin_fix_needed(hint, n_fft) != lb
            or not specband_ok(hint, n_fft, n_fft, hop_length)):
        hint = abs(float(lambd_value))
    return hint


def pallas_compile_hint(lambd_value: float, n_fft: int,
                        hop_length: int) -> float | None:
    """Canonical static ``lambd_hint`` for the full auto-pallas
    dispatch: :func:`specband_compile_hint` where the specband window
    applies, else the FRAMED small-bucket representative for
    ``FRAMED_AUTO_NFFTS`` (round 4) — the framed kernel has NO
    truncation window, so the only static switches there are the
    bucket and the (always-on) lowbin fix: one representative serves
    the whole non-deep-fade bucket range lambda in (win/12, win/6]
    (certified across it, results/certify_ladder_r4_512framed.txt).
    None keeps the exact XLA path."""
    lam = abs(float(lambd_value))
    if (n_fft < PALLAS_AUTO_MIN_NFFT and n_fft in FRAMED_AUTO_NFFTS
            and n_fft not in SPECBAND_HIPREC_NFFTS):
        # framed buckets FIRST: the framed kernel has no J ladder, so
        # ONE representative serves the whole certified range — going
        # through specband_compile_hint here would fragment the bucket
        # into J regions the kernel ignores (spurious recompiles, and
        # packed sweeps straddling win/9.6 would lose the shared hint)
        if not lowbin_fix_needed(lam, n_fft) and lam <= n_fft / 6.0:
            return 1.001 * n_fft / 12.0
        if n_fft in FRAMED_HIPREC_NFFTS and lowbin_fix_needed(lam, n_fft):
            # deep-fade region: the full-f32 framed variant (one static
            # region for the whole range — hiprec has no J ladder)
            return 0.999 * n_fft / 12.0
        return None                      # out of range: floor
    return specband_compile_hint(lambd_value, n_fft, hop_length)


def _window_taps(window: jnp.ndarray, n_fft: int, j_taps: int, *,
                 precision=jax.lax.Precision.HIGHEST):
    """Truncated spectrum of the (padded) window: ``(WR, WI)`` for taps
    d = -J..J, stored as full-length vectors indexed by ``d + J``.

    Differentiable in the window — this is the *only* place the
    trainable ``lambd`` enters the specgemm path, so the whole adjoint
    chain of DMEL collapses onto these 2J+1 numbers (the
    derivative-window gradient identity, PERF.md round-1 notes).
    """
    w = pad_window(window, n_fft)
    cb, sb = _tap_basis_np(n_fft, j_taps)
    cb = jnp.asarray(cb, w.dtype)
    sb = jnp.asarray(sb, w.dtype)
    wr_pos = jnp.matmul(w[None, :], cb, precision=precision)[0]  # (J+1,)
    wi_pos = jnp.matmul(w[None, :], sb, precision=precision)[0]
    # real window: What[-d] = conj(What[d])
    wr = jnp.concatenate([wr_pos[:0:-1], wr_pos])            # (2J+1,)
    wi = jnp.concatenate([-wi_pos[:0:-1], wi_pos])
    return wr / n_fft, wi / n_fft


def _band_matrices(wr: jnp.ndarray, wi: jnp.ndarray, j_taps: int,
                   block: int):
    """Build the banded Toeplitz block ``T[u, v] = What[v - u + J]/N``
    of shape ``(block + 2J, block)`` from the 2J+1 taps.

    Identical for every output block, so one small pair of matrices
    serves the whole spectrum.  Differentiable (gather of a tiny
    vector).
    """
    u = jnp.arange(block + 2 * j_taps)[:, None]
    v = jnp.arange(block)[None, :]
    idx = v - u + 2 * j_taps
    valid = (idx >= 0) & (idx <= 2 * j_taps)
    idx = jnp.clip(idx, 0, 2 * j_taps)
    tr = jnp.where(valid, wr[idx], 0.0)
    ti = jnp.where(valid, wi[idx], 0.0)
    return tr, ti


@functools.lru_cache(maxsize=32)
def _delta_basis_np(hop: int, n_fft: int, j_taps: int):
    """(hop, K_ext) cos/sin bases for the sliding-DFT head/tail deltas:
    ``sum_{u<hop} x[u] e^{-2 pi i u k / n_fft}`` at extended bins."""
    import numpy as np
    u = np.arange(hop)[:, None]
    k = np.arange(-j_taps, n_fft // 2 + 1 + j_taps)[None, :]
    ang = -2.0 * np.pi * u * k / n_fft
    return np.cos(ang), np.sin(ang)


def sliding_group(hop_length: int, lane: int = 128) -> int:
    """Frames per sliding-DFT group: smallest G with G*hop % lane == 0
    (so the base-frame framing is lane-aligned and gather-free)."""
    import math
    return lane // math.gcd(hop_length, lane)


def _sliding_spectra(x: jnp.ndarray, n_fft: int, hop_length: int,
                     j_taps: int, precision):
    """Unwindowed extended-bin spectra via the sliding-DFT recurrence.

    Only every G-th frame pays a full DFT GEMM (over an *aligned*,
    gather-free framing with hop G*h); the G-1 frames in between follow
    from ``X_{t+1}[k] = e^{+2 pi i h k / N} (X_t[k] - H_t[k] + T_t[k])``
    where the head/tail deltas H, T are DFTs of hop-length segments
    obtained by plain reshapes (no gather) and a (hop x K_ext) GEMM.
    Exact for integer bins (``omega^{Nk} = 1``); cuts the dominant
    spectra cost by ~G/2 vs the full DFT GEMM.

    Returns ``(xr, xi)`` of shape ``(B, n_rows, K_ext)`` with
    ``n_rows = ceil(nfr/G)*G`` frames in time order (trailing rows are
    padding garbage — slice to nfr downstream).
    """
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    h = hop_length
    n_bins = n_fft // 2 + 1
    k_ext = n_bins + 2 * j_taps
    nfr = num_frames(t, h)
    g = sliding_group(h)
    ngrp = -(-nfr // g)
    n_rows = ngrp * g
    pad = n_fft // 2
    need = (n_rows - 1) * h + n_fft + h          # tails of the last frame
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, need - pad - t)])
    xp = xp.reshape((-1, need))
    b = xp.shape[0]

    dtype = x.dtype
    cb, sb = _dft_matrices_ext_np(n_fft, j_taps)
    hc, hs = _delta_basis_np(h, n_fft, j_taps)
    hc = jnp.asarray(hc, dtype)
    hs = jnp.asarray(hs, dtype)

    # head/tail delta spectra from contiguous reshapes
    heads = xp[:, :n_rows * h].reshape(b, n_rows, h)
    tails = xp[:, n_fft:n_fft + n_rows * h].reshape(b, n_rows, h)
    hr = jnp.matmul(heads, hc, precision=precision)
    hi = jnp.matmul(heads, hs, precision=precision)
    tr = jnp.matmul(tails, hc, precision=precision)
    ti = jnp.matmul(tails, hs, precision=precision)

    # base frames t = G*g via aligned gather-free framing (stride G*h
    # is a lane multiple by construction)
    stride = g * h
    kblk = -(-n_fft // stride)
    n_ext = kblk * stride
    total = (ngrp - 1 + kblk) * stride
    xpb = jnp.pad(xp, ((0, 0), (0, max(0, total - need))))[:, :total]
    resh = xpb.reshape(b, total // stride, stride)
    parts = [resh[:, j:j + ngrp, :] for j in range(kblk)]
    base_frames = jnp.concatenate(parts, axis=-1)        # (b, ngrp, n_ext)
    zpad = ((0, n_ext - n_fft), (0, 0))
    c_ext = jnp.asarray(jnp.pad(jnp.asarray(cb), zpad), dtype)
    s_ext = jnp.asarray(jnp.pad(jnp.asarray(sb), zpad), dtype)
    xr0 = jnp.matmul(base_frames, c_ext, precision=precision)
    xi0 = jnp.matmul(base_frames, s_ext, precision=precision)

    # rotation e^{+2 pi i h k / N} applied G-1 times
    import numpy as np
    kk = np.arange(-j_taps, n_bins + j_taps)
    ang = 2.0 * np.pi * h * kk / n_fft
    rr = jnp.asarray(np.cos(ang), dtype)
    ri = jnp.asarray(np.sin(ang), dtype)

    xs_r, xs_i = [xr0], [xi0]
    cr, ci = xr0, xi0
    for i in range(1, g):
        # frame index t = G*grp + i - 1 for every group
        ar = cr - hr[:, i - 1::g][:, :ngrp] + tr[:, i - 1::g][:, :ngrp]
        ai = ci - hi[:, i - 1::g][:, :ngrp] + ti[:, i - 1::g][:, :ngrp]
        cr = rr * ar - ri * ai
        ci = rr * ai + ri * ar
        xs_r.append(cr)
        xs_i.append(ci)
    xr = jnp.stack(xs_r, axis=2).reshape(b, n_rows, k_ext)
    xi = jnp.stack(xs_i, axis=2).reshape(b, n_rows, k_ext)
    return (xr.reshape(batch_shape + (n_rows, k_ext)),
            xi.reshape(batch_shape + (n_rows, k_ext)))


def stft_power_specgemm(x: jnp.ndarray, window: jnp.ndarray, n_fft: int,
                        hop_length: int, *, j_taps: int = SPECGEMM_J_TAPS,
                        x_impl: str = "auto",
                        precision=jax.lax.Precision.HIGHEST,
                        x_precision=None) -> jnp.ndarray:
    """Power spectrogram via frequency-domain window application.

    ``S = DFT(frame * w) = (1/N) X (*) What`` where ``X = DFT(frame)``
    is *independent of the window parameter* and ``What`` (the window
    spectrum) is truncated to ``|d| <= J`` taps — valid while the
    window's endpoint value is small (see :func:`specgemm_ok`).

    Why this wins on TPU: the two big MXU GEMMs that compute ``X``
    carry no ``lambd`` dependence, so JAX's selective autodiff never
    builds their adjoints — the entire fwd+bwd chain in ``lambd`` runs
    through the 2J+1 taps and a banded (block + 2J, block) GEMM that is
    ~20x smaller than the full DFT.  This is the derivative-window
    gradient identity of SURVEY.md §3.3 in concrete form: the backward
    pass costs one small banded-GEMM adjoint instead of two full DFT
    GEMMs.  Differentiating w.r.t. ``x`` still works (JAX builds the
    X-adjoint only when that cotangent is requested).

    Args:
      x: ``(..., T)`` signals.
      window: ``(win_length,)`` analysis window; for this path
        ``win_length == n_fft`` is required (optimized-mode convention).
      j_taps: half-support of the truncated window spectrum.
      x_impl: how to compute the unwindowed spectra —
        - "sliding": sliding-DFT recurrence (one aligned base GEMM per
          G frames + hop-length delta GEMMs; fastest measured on TPU);
        - "gemm": gather-free ext framing + full DFT GEMM;
        - "conv": strided conv1d straight from the signal (lowered
          poorly by XLA:TPU at this size — measured 2.3x slower);
        - "auto": "sliding" when the hop admits a small group
          (``sliding_group(hop) <= 16``) and the signal is long enough,
          else "gemm".
      precision: banded/mel-side matmul precision.
      x_precision: precision for the big X GEMMs (defaults to
        ``precision``); bf16x3 (``Precision.HIGH``) measured parity-safe.

    Returns:
      ``(..., n_fft//2 + 1, num_frames)`` — same layout as
      :func:`stft_power`.
    """
    if window.shape[-1] != n_fft:
        raise ValueError("specgemm requires win_length == n_fft")
    if x_precision is None:
        x_precision = precision
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    n_bins = n_fft // 2 + 1
    nfr = num_frames(t, hop_length)
    n_ext_bins = n_bins + 2 * j_taps

    cb, sb = _dft_matrices_ext_np(n_fft, j_taps)
    dtype = x.dtype

    if x_impl == "auto":
        g = sliding_group(hop_length)
        x_impl = "sliding" if (g <= 16 and nfr >= 2 * g) else "gemm"

    if x_impl == "sliding":
        xr, xi = _sliding_spectra(x, n_fft, hop_length, j_taps,
                                  x_precision)
        xr = xr.reshape((-1,) + xr.shape[-2:])
        xi = xi.reshape((-1,) + xi.shape[-2:])
    elif x_impl == "conv":
        # one pass over the signal; filters are constants (no grad path)
        filt = jnp.asarray(
            jnp.concatenate([jnp.asarray(cb), jnp.asarray(sb)], axis=1),
            dtype)                                   # (n_fft, 2*n_ext_bins)
        pad = n_fft // 2
        x3 = x.reshape((-1, 1, t))
        y = jax.lax.conv_general_dilated(
            x3, jnp.transpose(filt)[:, None, :],
            window_strides=(hop_length,), padding=[(pad, pad)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=x_precision)                   # (B, 2*ext, nfr)
        xr = jnp.swapaxes(y[:, :n_ext_bins, :], -1, -2)
        xi = jnp.swapaxes(y[:, n_ext_bins:, :], -1, -2)   # (B, nfr, ext)
    elif x_impl == "gemm":
        frames_ext, n_ext = frame_signal_ext(x, n_fft, hop_length)
        frames_ext = frames_ext.reshape((-1, nfr, n_ext))
        zpad = ((0, n_ext - n_fft), (0, 0))
        c_ext = jnp.asarray(jnp.pad(cb, zpad), dtype)
        s_ext = jnp.asarray(jnp.pad(sb, zpad), dtype)
        xr = jnp.matmul(frames_ext, c_ext, precision=x_precision)
        xi = jnp.matmul(frames_ext, s_ext, precision=x_precision)
    else:
        raise ValueError(f"unknown x_impl: {x_impl!r}")

    # banded frequency-domain convolution with the window spectrum
    wr, wi = _window_taps(window, n_fft, j_taps, precision=precision)
    block = _SPECGEMM_BLOCK
    n_blocks = -(-n_bins // block)
    k_pad = n_blocks * block
    # X_ext column u of block b holds bin (b*block + u - J); pad so the
    # last block's halo exists (padded bins multiply zero-padded fb
    # rows downstream, and we slice back to n_bins at the end).
    need = k_pad + 2 * j_taps
    xr = jnp.pad(xr, ((0, 0), (0, 0), (0, need - n_ext_bins)))
    xi = jnp.pad(xi, ((0, 0), (0, 0), (0, need - n_ext_bins)))
    width = block + 2 * j_taps
    xr_b = jnp.stack([xr[..., b * block:b * block + width]
                      for b in range(n_blocks)], axis=-2)
    xi_b = jnp.stack([xi[..., b * block:b * block + width]
                      for b in range(n_blocks)], axis=-2)
    tr, ti = _band_matrices(wr, wi, j_taps, block)
    s_re = (jnp.matmul(xr_b, tr, precision=precision)
            - jnp.matmul(xi_b, ti, precision=precision))
    s_im = (jnp.matmul(xr_b, ti, precision=precision)
            + jnp.matmul(xi_b, tr, precision=precision))
    p = s_re * s_re + s_im * s_im                 # (B, n_rows, nb, block)
    n_rows = p.shape[1]
    p = p.reshape((-1, n_rows, k_pad))[..., :nfr, :n_bins]
    p = p.reshape(batch_shape + (nfr, n_bins))
    return jnp.swapaxes(p, -1, -2)


def _cs_basis(n_fft, n_ext, dtype):
    """Zero-extended concatenated [C | S] basis ``(n_ext, 2*n_bins)`` —
    one GEMM computes Re and Im together (frames read once)."""
    c, s = dft_matrices(n_fft, dtype=dtype)
    zc = jnp.zeros((n_ext - n_fft, c.shape[1]), c.dtype)
    return jnp.concatenate([jnp.concatenate([c, zc]),
                            jnp.concatenate([s, zc])], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _matmul_ext_mp(x, window, n_fft, hop_length, fwd_precision,
                   bwd_precision):
    p, _ = _matmul_ext_mp_fwd(x, window, n_fft, hop_length, fwd_precision,
                              bwd_precision)
    return p


def _matmul_ext_mp_fwd(x, window, n_fft, hop_length, fwd_precision,
                       bwd_precision):
    # x arrives flattened to (B, T) by the wrapper so the bwd can
    # reconstruct dx's shape from the residuals alone
    batch_shape = x.shape[:-1]
    t = x.shape[-1]
    nfr = num_frames(t, hop_length)
    frames_ext, n_ext = frame_signal_ext(x, n_fft, hop_length)
    frames_ext = frames_ext.reshape((-1, nfr, n_ext))
    w_ext = jnp.pad(window, (0, n_ext - n_fft))
    cs = _cs_basis(n_fft, n_ext, x.dtype)
    fw = frames_ext * w_ext
    reim = jnp.matmul(fw, cs, precision=fwd_precision)
    n_bins = n_fft // 2 + 1
    re, im = reim[..., :n_bins], reim[..., n_bins:]
    p = re * re + im * im
    p = jnp.swapaxes(p, -1, -2).reshape(batch_shape + (n_bins, nfr))
    # sig_ref: tiny carrier of x's exact length for the dx crop
    return p, (frames_ext, w_ext, re, im, jnp.zeros(x.shape[-1:], x.dtype))


def _matmul_ext_mp_bwd(n_fft, hop_length, fwd_precision, bwd_precision,
                       residuals, dp):
    frames_ext, w_ext, re, im, sig_ref = residuals
    n_ext = frames_ext.shape[-1]
    nfr = frames_ext.shape[-2]
    n_bins = n_fft // 2 + 1
    batch_shape = dp.shape[:-2]
    dp = jnp.swapaxes(dp.reshape((-1, n_bins, nfr)), -1, -2)
    dreim = jnp.concatenate([2.0 * re * dp, 2.0 * im * dp], axis=-1)
    cs = _cs_basis(n_fft, n_ext, re.dtype)
    # the adjoint GEMM runs at bwd_precision: it shapes only the
    # lambda GRADIENT (plain bf16 => ~1e-5..1e-4 relative gradient
    # noise, far below SGD batch noise), never the features
    dfw = jnp.matmul(dreim, cs.T, precision=bwd_precision)
    dwindow = jnp.einsum("btm,btm->m", frames_ext, dfw,
                         precision=jax.lax.Precision.HIGHEST)[:n_fft]
    # dx path (the transpose of frame_signal_ext, an overlap-add) —
    # XLA dead-code-eliminates it unless a caller differentiates w.r.t.
    # the signal itself
    dframes = dfw * w_ext
    b = dframes.shape[0]
    k = n_ext // hop_length
    nrows = nfr - 1 + k
    acc = jnp.zeros((b, nrows, hop_length), dframes.dtype)
    parts = dframes.reshape(b, nfr, k, hop_length)
    for j in range(k):
        acc = acc.at[:, j:j + nfr, :].add(parts[:, :, j, :])
    flat = acc.reshape(b, nrows * hop_length)
    pad = n_fft // 2
    t = sig_ref.shape[-1]
    dx = flat[:, pad:pad + t].reshape(batch_shape + (t,))
    return dx, dwindow


_matmul_ext_mp.defvjp(_matmul_ext_mp_fwd, _matmul_ext_mp_bwd)


def stft_power_matmul_ext_mp(x, window, n_fft, hop_length, *,
                             fwd_precision=jax.lax.Precision.HIGH,
                             bwd_precision=jax.lax.Precision.DEFAULT):
    """matmul_ext power spectrogram with a mixed-precision custom VJP.

    Forward DFT GEMM at ``fwd_precision`` (bf16x3 'HIGH' passes the
    1e-4 feature gate); the backward adjoint GEMM at ``bwd_precision``
    (plain bf16 by default — one MXU pass instead of three).  The
    backward GEMM touches only the lambda gradient; measured dlambda
    relative error stays in the 1e-5..1e-4 band (printed by bench.py),
    orders below SGD batch noise.  Semantics match the autograd chain of
    /root/reference/time_frequency.py:48-53.

    Validity domain: like every bf16x3-class forward, the 'HIGH'
    default holds the 1e-4 gate for lambda >= ~n_fft/12; below that the
    deep low-mel-band fades amplify the 2-way-split floor (see
    :func:`lowbin_fix_needed`) — use the default HIGHEST path or the
    Pallas dispatch (which carries its own hint-gated fix) for small
    lambda/n_fft ratios.

    Requires ``win_length == n_fft`` (optimized-mode convention).
    """
    if window.shape[-1] != n_fft:
        raise ValueError("matmul_ext_mp requires win_length == n_fft")
    return _matmul_ext_mp(x, window, n_fft, hop_length, fwd_precision,
                          bwd_precision)


def stft_power(x: jnp.ndarray, window: jnp.ndarray, n_fft: int,
               hop_length: int, *, method: str = "auto",
               precision=jax.lax.Precision.HIGHEST,
               x_precision=None) -> jnp.ndarray:
    """Power spectrogram ``|STFT(x)|^2`` with torch.stft conventions.

    Args:
      x: ``(..., T)`` real signal(s).
      window: ``(win_length,)`` analysis window (win_length <= n_fft);
        center-padded to n_fft like torch.stft.
      n_fft: FFT size (static).
      hop_length: hop between frames (static).
      method: one of
        - "auto": backend-adaptive default — on TPU, "matmul_ext_mp"
          for full-window strided hops (fastest measured fwd+bwd;
          features identical to "matmul_ext", adjoint in bf16 at
          ~1.5e-4 dlambda), "matmul_ext"/"matmul" for short windows or
          dense hops, "fft" elsewhere;
        - "fft": jnp.fft.rfft;
        - "matmul": DFT-as-GEMM on the MXU (explicit frames);
        - "matmul_ext": DFT-as-GEMM with gather-free framing;
        - "folded": half-size GEMMs via DFT symmetry;
        - "conv": strided conv1d formulation;
        - "specgemm": frequency-domain window application over
          lambda-independent spectra (requires ``win_length == n_fft``
          and small window endpoint values — gate with
          :func:`specgemm_ok` outside jit);
        - "matmul_ext_mp": matmul_ext with a mixed-precision custom VJP
          (fwd at ``precision``, adjoint GEMM at ``x_precision`` or
          plain bf16) — fastest measured fwd+bwd on TPU at full
          feature parity.
        All methods are numerically equivalent to float32 rounding.
      precision: matmul precision for the matmul paths.
      x_precision: specgemm — precision for the lambda-independent
        spectra GEMMs (defaults to ``precision``; ``Precision.HIGH``
        measured parity-safe and ~2x faster than HIGHEST on TPU); for
        matmul_ext_mp (incl. via "auto" on TPU) it sets the adjoint
        GEMM precision instead (plain bf16 by default).

    Returns:
      ``(..., n_fft//2 + 1, num_frames)`` power spectrogram — freq-major,
      matching the reference layout (time_frequency.py:48-53).
    """
    if method == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        # Measured on v5e (PERF.md): the O(n^2) MXU DFT beats the FFT up
        # to n_fft ~2048; beyond that n log n wins.  The ext framing
        # only pays off for strided hops (k = ceil(n_fft/hop) small).
        if not on_tpu or n_fft > 2048:
            method = "fft"
        elif n_fft // hop_length <= 32:
            # mixed-precision custom VJP: fwd stays at `precision`
            # (HIGHEST default -> features identical to matmul_ext),
            # adjoint GEMM in plain bf16 (dlambda ~1.5e-4, gate 1e-3).
            # Round-4 hardware probe at the 512 certified-floor bucket:
            # 4.05 -> 2.52 ms/batch (+60%, results/probe_512_mp_r4.txt)
            # — this is the path auto impl="pallas" floors to below
            # PALLAS_AUTO_MIN_NFFT, so the floor buckets get it free.
            # matmul_ext_mp requires win_length == n_fft (true for
            # every optimized-mode bucket); short-window calls keep
            # matmul_ext, whose path center-pads the window.
            method = ("matmul_ext_mp" if window.shape[-1] == n_fft
                      else "matmul_ext")
        else:
            method = "matmul"
    if method == "specgemm":
        return stft_power_specgemm(x, window, n_fft, hop_length,
                                   precision=precision,
                                   x_precision=x_precision)
    if method == "matmul_ext_mp":
        # mixed-precision custom VJP: fwd at `precision`, adjoint GEMM
        # at `x_precision` (plain bf16 by default)
        return stft_power_matmul_ext_mp(
            x, window, n_fft, hop_length, fwd_precision=precision,
            bwd_precision=x_precision or jax.lax.Precision.DEFAULT)
    if method == "folded":
        return stft_power_folded(x, window, n_fft, hop_length,
                                 precision=precision)
    if method == "conv":
        return stft_power_conv(x, window, n_fft, hop_length,
                               precision=precision)
    if method == "matmul_ext":
        # gather-free framing + zero-extended basis (see frame_signal_ext)
        frames_ext, n_ext = frame_signal_ext(x, n_fft, hop_length)
        w_ext = jnp.pad(pad_window(window, n_fft), (0, n_ext - n_fft))
        c, s = dft_matrices(n_fft, dtype=frames_ext.dtype)
        zc = jnp.zeros((n_ext - n_fft, c.shape[1]), c.dtype)
        fw = frames_ext * w_ext
        re = jnp.matmul(fw, jnp.concatenate([c, zc]), precision=precision)
        im = jnp.matmul(fw, jnp.concatenate([s, zc]), precision=precision)
        p = re * re + im * im
        return jnp.swapaxes(p, -1, -2)
    w = pad_window(window, n_fft)
    frames = frame_signal(x, n_fft, hop_length) * w
    if method == "fft":
        spec = jnp.fft.rfft(frames, axis=-1)
        p = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    elif method == "matmul":
        c, s = dft_matrices(n_fft, dtype=frames.dtype)
        re = jnp.matmul(frames, c, precision=precision)
        im = jnp.matmul(frames, s, precision=precision)
        p = re * re + im * im
    else:
        raise ValueError(f"unknown stft method: {method!r}")
    return jnp.swapaxes(p, -1, -2)
