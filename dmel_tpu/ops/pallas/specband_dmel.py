"""Fused specgemm-family DMEL kernel: sliding-DFT spectra + real-tap
banded window conv + power + mel, all in one Pallas pass.

This is the derivative-window gradient identity (SURVEY.md §3.3,
reference /root/reference/time_frequency.py:48-53) taken to its TPU
speed-of-light form.  The XLA specgemm path (ops/stft.py:
stft_power_specgemm) is exact but loses on the MXU because (a) the
lambda-independent spectra X are computed with a full direct DFT GEMM
and (b) the banded frequency conv must be blocked to MXU granularity in
four complex GEMM passes.  This kernel fixes both:

1. **In-kernel sliding-DFT spectra.**  Frames overlap by n_fft - hop
   samples; only the phase-0 frame of each G-frame group pays a full
   (bf16x3) DFT GEMM.  The remaining G-1 phases follow from the exact
   integer-bin recurrence ``X_{t+1} = e^{+2 pi i h k/N} (X_t - H_t +
   T_t)`` where the head/tail correction ``D_t = DFT(tail_t - head_t)``
   is ONE hop-length GEMM per phase (head and tail segments subtracted
   *before* the DFT — they share the same relative basis).  At the
   bench geometry (n_fft 1024, hop 80) this cuts the spectra GEMM flops
   ~3.5x vs the direct DFT.  All rolls/slices happen on VMEM registers
   (pltpu.roll), the same trick as framed_dmel.py.
2. **Real-tap band conv.**  A window symmetric about N/2 (the Gaussian,
   window.py:17) has spectrum ``What[d] = (-1)^d rho_d`` with rho real,
   so with phase-flipped spectra ``X'[k] = (-1)^k X[k]`` the windowed
   spectrum is ``S[k] = (-1)^k (rho (*) X')[k] / N`` — a real-tap conv:
   TWO banded GEMMs instead of four, and the (-1)^k dies in |S|^2.
   The 128-col output tiles read lane-aligned (LANE + 2J)-wide slices
   of the VMEM-resident X', so the band GEMM contracts K = 176 instead
   of a full n_fft.
3. **lambda enters only through the 2J+1 taps.**  The band matrix T is
   built in XLA from the window (differentiable, tiny); the kernel's
   custom VJP returns dT accumulated by two transposed bf16 GEMMs per
   tile (gradient-only precision, cf. stft.py:stft_power_matmul_ext_mp)
   — the backward pass never touches a full DFT adjoint.  X' is saved
   as bf16 residuals.  d/dx (rarely needed — the signal is data) falls
   back to an XLA adjoint that is dead-code eliminated when unused.

Parity contract: same math as the reference's autograd chain, gated by
interpret-mode tests vs the exact GEMM path and by bench.py's in-run
torch-oracle check on hardware.  Truncation to J taps is governed by
the same two-sided lambda window as the XLA specgemm path but without
its long-FFT cutoff (stft.specband_ok — round 3 extends the kernel to
n_fft 2048/4096 with VMEM-resident bases under a raised scoped-vmem
budget), with an adaptive tap ladder (stft.specband_j_taps).

Measured accuracy class (log-mel max-abs vs the exact f32 GEMM path):
~1e-4 at the production geometries (n_fft >= 1024, g <= 8 recurrence
phases — 9.7e-5 in-run at the bench config), degrading past the gate
at small n_fft (hardware lambda sweep: 1.2-2.7e-4 at n_fft=512, up to
2.5e-3 at n_fft=256) where each mel band integrates few bins, so deep
band fades expose the bf16x3 spectra quantization in every tile.  The
AUTO dispatch therefore floors this kernel at
stft.PALLAS_AUTO_MIN_NFFT; below it the exact XLA path holds the
contract.  The tight-GRADIENT alternative at certified geometries is
the framed kernel (framed_dmel.py — same small-n_fft caveat).
"""

from __future__ import annotations

import functools
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmel_tpu.ops.stft import num_frames, SPECGEMM_J_TAPS

LANE = 128
MEL_PAD = 128
#: epsilon of the fused log epilogue — MUST match ops.dmel.LOG_EPS
#: (the reference's log(mel + 1e-10), models.py:73)
LOG_EPS = 1e-10
#: frames per kernel block.  512 doubles the phase-0 base-GEMM row
#: fill vs 256 (gr = ROWS/g rows feed the MXU; +5% end-to-end,
#: measured).  Round 4: rows=512 is the adopted block for K > 1 too —
#: the K-wide band intermediates only exceeded XLA's DEFAULT 16 MB
#: scoped-vmem *scheduling estimate* (round 2 "1.5 MB over"), and the
#: raised budget unlocks 7-43% at the K=3 buckets (ab_specband_geom
#: --multi, results/ab_multi_r4.txt).  ROWS_MULTI remains the
#: threshold above which a K>1 compilation needs the raised budget.
ROWS = 512
ROWS_MULTI = 256

#: Run all g-1 hop-length delta GEMMs as ONE ((g-1)*gr, LANE)-row
#: stacked GEMM instead of g-1 separate gr-row GEMMs (full MXU row
#: fill; the deltas are recurrence-independent, only the cheap VPU
#: rotation/accumulation is sequential).  Bitwise-identical results.
#: Hardware A/B (bench geometry, ROWS=512, median of 5): OFF 2.61 ms /
#: ON 2.60 ms per batch — a wash inside run-to-run spread, no OOM.
#: Default stays OFF: the stacked (rows, kpad) f32 dr/di intermediates
#: add ~2.3 MB of VMEM pressure for no measured win.
STACK_DELTAS = False

#: Stack the per-tile band-conv GEMMs (and the backward's recompute /
#: dT / dp GEMMs) into single large GEMMs across tiles and re/im.
#: Every tile shares the SAME RHS (tmat for the band conv, fbt for dp),
#: so the nt_g x {re,im} medium GEMMs concatenate along M (or the
#: contraction axis, for dT) into one MXU stream — fewer GEMM
#: boundaries, better pipelining.  Forward results are BITWISE
#: identical per row (GEMM rows are independent; same K order);
#: backward's dT changes accumulation order across tiles (same error
#: class, re-certified on hardware).  Gated off under the lowbin
#: precision ladder (per-tile precision differs at level 1).
#: Hardware A/B at the headline geometry: see
#: results/diag_1024_residual_r4.txt and PERF.md.
STACK_BAND = False          # fwd+bwd: measured regression; see PERF.md
#: independent gates (the concat cost differs: fwd concats f32 spectra
#: scratch — a measured REGRESSION everywhere; bwd concats bf16
#: residuals — a measured win at nt_g <= 8).  Hardware A/B (v5e,
#: B=128 x 5 s fwd+bwd, results/diag_1024_residual_r4.txt):
#:   1024: off 2.423 / bwd-on 2.375 ms (+2.0%) / fwd-on 2.602 (-7%)
#:   2048: off 4.607 / bwd-on 4.475 ms (+2.9%)
#:   4096: off 10.535 / bwd-on 10.653 ms (-1.1% — 16-tile concat too
#:         large; the in-kernel gate keeps 4096 on the per-tile loop)
#: grad deltas 0-4e-7 relative (cross-tile accumulation moves inside
#: one K contraction).  The bwd stacking runs for lowbin (deep-fade)
#: compilations too — certified by the r4 full ladder's specband(+lb)
#: rungs (only the FWD stacking is lowbin-gated, for its per-tile
#: precision split).  K>1 (multi-sigma): measured a wash -> per-tile.
STACK_BAND_FWD = False
STACK_BAND_BWD = True
#: Fold the phase-0 base DFT GEMM via the even/odd midpoint symmetry:
#: with e[m] = x[m] + x[N-m] and o[m] = x[m] - x[N-m] the real/imag
#: spectra are half-size GEMMs (K = N/2+1 instead of N), halving the
#: dominant base-GEMM MACs at the large buckets (43% of fwd MACs at
#: 4096).  The e/o planes are built in XLA (cheap elementwise + a lane
#: reversal) and the folded bases replace the full bases — VMEM halves
#: too.  Resident-basis geometries only (n_chunks == 1).  Per-bucket
#: adoption from hardware A/B (results/ab_folded_r4.txt, v5e, B=128 x
#: 5 s fwd+bwd at the bench lambdas, parity vs the exact XLA path in
#: the same run):
#:   4096: 10.511 -> 8.955 ms (+17.4%), err 2.3e-5 -> 2.6e-5
#:   2048:  4.653 -> 4.267 ms  (+9.0%), err 5.0e-5 -> 5.6e-5
#:   1024:  2.320 -> 2.304 ms  (+0.7% — inside spread, and the 1024
#:          bench-lambda parity margin is thin at ~9.5e-5: NOT adopted)
#: grad deltas 0.9-3.7e-7 relative.  Full 2048/4096 ladder + K=3 rungs
#: re-certified post-adoption (results/certify_ladder_r4_full.txt).
FOLDED_BASE_NFFTS: tuple = (2048, 4096)

#: extend the stacked adjoint to K>1 (multi-sigma) packs.  Measured a
#: WASH at the adopted K=3 geometries (v5e: 1024 5.300 -> 5.330 ms,
#: 2048 10.145 -> 10.114; inside run-to-run spread, grads bitwise) —
#: stays OFF (results/ab_multi_r4.txt).
STACK_BAND_BWD_MULTI = False


def _stacked_bwd_active(nt_g: int, k_sig: int) -> bool:
    """Single source of truth for whether the backward kernel takes the
    stacked-adjoint path (used by the kernel body AND the vmem-raise
    gate below, so the two cannot drift — ADVICE r4)."""
    return ((STACK_BAND or STACK_BAND_BWD) and 1 < nt_g <= 8
            and (k_sig == 1 or STACK_BAND_BWD_MULTI))


def _stacked_bwd_vmem_raise(nt_g: int, k_sig: int, n_fft: int) -> bool:
    """Scheduling-budget raise for the stacked adjoint.  The n_fft
    bound is budget-only: explicit small-n_fft (<1024) pallas_specband
    impls still stack, but their working set fits XLA's default 16 MB
    scoped-vmem estimate, so no raise is needed there."""
    return _stacked_bwd_active(nt_g, k_sig) and n_fft >= 1024

#: Emit the mel output (and read the bwd cotangent) in FRAME order by
#: permuting (g, gr) <-> (gr, g) in-kernel, so the XLA boundary is a
#: pure reshape instead of a materialized (b, nblk*rows, MEL_PAD)
#: transpose round-trip on both passes.  Hardware A/B (v5e, B=128 x
#: 5 s fwd+bwd, bitwise-identical outputs): 1024: 2.361 -> 2.312 ms
#: (+2.1%); 2048: 4.460 -> 4.500 (-0.9%) — adopted via
#: :func:`_frame_io` at n_fft <= 1024 only (the in-kernel sublane
#: permute costs the same per block while the XLA transpose saving
#: shrinks relative to the larger buckets' GEMM time).
FRAME_ORDER_IO = True


def _frame_io(n_fft: int, g: int) -> bool:
    """Whether this compilation uses in-kernel frame-order IO."""
    return FRAME_ORDER_IO and g > 1 and n_fft <= 1024

#: Diagnostic-only ablation switches (trace-time static; production is
#: ALWAYS the empty set).  scripts/diag_1024_residual.py monkeypatches
#: this to apportion the non-MXU residual at the headline geometry by
#: timing the kernel with single components no-op'd (results are
#: numerically WRONG by construction — timing only):
#:   "norot"   skip the recurrence rotation multiplies (VPU)
#:   "nodelta" skip the per-phase delta GEMMs + rotation entirely
#:   "nonyq"   skip the Nyquist VPU tap-reduction
#:   "nores"   skip the bf16 residual write (backward would be garbage)
#:   "nomel"   skip the band-conv + mel tile loop (spectra only)
_ABLATE: frozenset = frozenset()


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


#: largest n_fft the kernel serves (the reference's 300 ms-init
#: experiments live at bucket 4096, /root/reference/search_spaces.py:
#: 29,61).  Above 1024 the hi/lo-split DFT bases (~19 MB at 2048,
#: ~71 MB at 4096) exceed XLA's DEFAULT 16 MB scoped-vmem budget; the
#: production mechanism is RESIDENT bases under a raised
#: CompilerParams vmem limit (_geom returns chunk = n_fft; the budget
#: cap is scheduling-only, not physical VMEM).  A chunk-streaming
#: fallback (chunk < n_fft: basis tiles double-buffered from HBM into
#: a persistent spectra accumulator over a third grid dimension) is
#: kept for geometries that can't stay resident, but it re-reads the
#: bases per (batch, block) pair and measured DMA-bound at 4096
#: (29.4 ms vs 14.7 resident) — no production geometry uses it.
SPECBAND_MAX_NFFT = 4096


def supported(n_fft: int, hop_length: int, n_mels: int,
              j_taps: int = SPECGEMM_J_TAPS) -> bool:
    """Static geometry guard (the lambda-value guard is
    stft.specband_ok, decided by the caller outside jit).

    Above 1024, only the power-of-2 buckets {2048, 4096} are accepted:
    _geom's block geometry and VMEM budget are tuned and
    hardware-certified per bucket, and a non-pow2 size in between
    would silently ride an uncertified geometry."""
    g = LANE // gcd(hop_length, LANE)
    return (n_fft % LANE == 0 and g <= 16 and n_mels <= MEL_PAD
            and (n_fft <= 1024 or n_fft in (2048, 4096))
            and 2 * j_taps < LANE
            and 2 * hop_length <= n_fft)  # center-pad coverage bound


def _geom(n_fft: int, hop_length: int, k_sig: int,
          lowbin_fix: bool = False):
    """(rows, chain, chunk) block geometry per n_fft, VMEM-budget
    driven (~16 MB/core).

    - ``rows``: frames per kernel block (the spectra scratch is
      2 x rows x kpad f32, the residual block rows x 2*kpad bf16).
    - ``chain``: recurrence groups chained per base GEMM.  The sliding
      DFT only *needs* a full base GEMM when the lane-offset pattern
      restarts (every g = LANE/gcd(hop,LANE) frames), but nothing stops
      the recurrence running longer: chaining ``chain`` groups divides
      the dominant base-GEMM flops by ``chain`` at large n_fft, at the
      cost of a longer f32 rotation chain (measured ~4e-6 log-mel at 8
      phases; certified per-geometry on hardware via
      scripts/certify_ladder.py).
    - ``chunk``: contraction rows per streamed basis tile (n_fft/chunk
      grid steps; chunk = n_fft means the whole basis is VMEM-resident,
      the certified <=1024 layout).
    """
    g0 = LANE // gcd(hop_length, LANE)
    # Geometry choices are hardware-A/B'd (scripts/ab_specband_geom.py,
    # v5e, B=128 x 5 s fwd+bwd):
    # - 1024: chain=2 (g_eff=16) halves the base GEMM -> 2.61 -> 2.42
    #   ms (+8%); chain=4 regresses (row fill loses to flop savings).
    # - 2048/4096 keep the bases VMEM-RESIDENT (chunk = n_fft) under a
    #   RAISED scoped-vmem budget: a const-index-map block is fetched
    #   once for the whole grid, so resident bases cost one 19/71 MB
    #   HBM read per dispatch — chunk-streaming them (chunk < n_fft)
    #   re-reads every chunk per (batch, block) pair, measured
    #   DMA-BOUND at 4096 (29.4 ms vs ~22 ms of basis re-read).  The
    #   16 MB scoped-vmem "cap" round 2 designed against is only XLA's
    #   default scheduling budget, not physical VMEM.
    # - rows=512 at 2048/4096 (gr 32/16): 5.87 -> 4.62 ms at 2048,
    #   14.76 -> 11.40 ms at 4096 — base/delta GEMM row fill is the
    #   dominant lever (roofline: % of peak tracks gr).
    # - chain=2 everywhere for k_sig=1: at 4096 c2 (gr=32) beat c4
    #   (gr=16) 10.56 vs 11.46 ms even though the base GEMM count
    #   doubles — row fill dominates again; c1 and rows>512 fail to
    #   compile at 4096 (VMEM), r1024.c2 at 2048 thrashes (8.58 ms).
    # round-4 multi-sigma A/B (scripts/ab_specband_geom.py --multi,
    # K=3 on the certified ladder lambdas, results/ab_multi_r4.txt):
    # rows=512 + chain=2 wins at EVERY bucket for K>1 too once the
    # scoped-vmem budget is raised (the round-2 rows=256 default was a
    # default-budget estimate, not a measurement) — 1024: 5.69 -> 5.33
    # ms (+6.8%); 2048: 13.87 -> 10.08 (+37.6%); 4096: 29.30 -> 20.47
    # (+43.1%).  K=1 geometries unchanged from the round-3 A/B.
    if n_fft <= 1024:
        # chain=2 only at the certified 1024 bucket AND only for
        # shallow-fade compilations: the longer rotation chain costs
        # ~1-3e-5 of parity margin, which the deep-fade small-lambda
        # cases (lowbin_fix on, lambda < n_fft/12) cannot afford
        # (hardware ladder: lambda=36 went 8.8e-5 -> 2.7e-4 with
        # chain=2) and sub-1024 test geometries don't need
        chain2 = 2 if (n_fft == 1024 and not lowbin_fix) else 1
        rows, chain, chunk = ROWS, chain2, n_fft
    else:                                   # 2048 / 4096
        rows, chain, chunk = 512, 2, n_fft
    # Mosaic needs >= 8 sublanes per block (gr >= 8), and rows must
    # split evenly into g_eff = chain*g0 phases
    while chain > 1 and (rows % (g0 * chain) != 0
                         or rows // (g0 * chain) < 8):
        chain //= 2
    return rows, chain, chunk


@functools.lru_cache(maxsize=16)
def _plan(n_fft: int, hop_length: int, j_taps: int, rows: int = ROWS,
          chain: int = 1):
    g = chain * (LANE // gcd(hop_length, LANE))
    gr = rows // g
    hop_ext = g * hop_length
    need = max((g - 1) * hop_length + n_fft,
               n_fft + (hop_ext if g > 1 else 0))
    l_row = _round_up(need, hop_ext)
    n_bins = n_fft // 2 + 1
    k_ext = n_bins + 2 * j_taps            # bins -J .. n_bins-1+J
    nt = -(-n_bins // LANE)                # output bin tiles
    # Nyquist split: for pow-2 n_fft the last tile holds ONE valid bin
    # (n_bins % 128 == 1); that bin is a VPU tap-reduction instead of a
    # GEMM tile, and kpad shrinks with it (less spectra GEMM output +
    # residual traffic).  The nyq slice reads cols [nt_g*LANE,
    # nt_g*LANE + LANE) — lane-aligned because c0 = n_bins-1 = nt_g*128.
    nyq = (n_bins % LANE) == 1
    nt_g = nt - 1 if nyq else nt           # GEMM-covered bin tiles
    width = LANE + 2 * j_taps
    cols = [k_ext, (nt_g - 1) * LANE + width]
    if nyq:
        cols.append((nt_g + 1) * LANE)
    kpad = _round_up(max(cols), LANE)
    return g, gr, hop_ext, l_row, n_bins, k_ext, nt, kpad, nyq, nt_g


@functools.lru_cache(maxsize=16)
def _bases_np(n_fft: int, j_taps: int, kpad: int):
    """Phase-flipped extended-bin bases.

    Column j of the (n_fft, kpad) base pair holds bin k = j - J of
    ``(-1)^k DFT``; columns >= k_ext are zero.  The (LANE, kpad) delta
    pair is the same for rows u < hop... rows are zeroed by the caller
    (hop-dependent), here rows are the full LANE relative offsets.
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(kpad)[None, :] - j_taps          # bin index per col
    valid = (k >= -j_taps) & (k < n_bins + j_taps)
    flip = np.where(k % 2 == 0, 1.0, -1.0)
    m = np.arange(n_fft)[:, None]
    ang = -2.0 * np.pi * m * k / n_fft
    c = np.where(valid, np.cos(ang) * flip, 0.0)
    s = np.where(valid, np.sin(ang) * flip, 0.0)
    return c.astype(np.float32), s.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _folded_bases_np(n_fft: int, j_taps: int, kpad: int):
    """Half-size phase-flipped bases for the even/odd folded base DFT.

    Row m = 0..N/2 of the (khp, kpad) pair:
      ce[m, j] = cos(2 pi m k / N) * (-1)^k   (contracted against e)
      se[m, j] = -sin(2 pi m k / N) * (-1)^k  (contracted against o)
    with k = j - J as in :func:`_bases_np`; khp pads N/2+1 rows to a
    sublane multiple.  ``pr = e @ ce`` / ``pi = o @ se`` reproduce the
    full-basis spectra exactly (cos is m-symmetric, sin antisymmetric
    about N/2)."""
    n_bins = n_fft // 2 + 1
    kh = n_fft // 2 + 1
    khp = _round_up(kh, 8)
    k = np.arange(kpad)[None, :] - j_taps
    valid = (k >= -j_taps) & (k < n_bins + j_taps)
    flip = np.where(k % 2 == 0, 1.0, -1.0)
    m = np.arange(khp)[:, None]
    row_ok = m < kh
    ang = 2.0 * np.pi * m * k / n_fft
    ce = np.where(valid & row_ok, np.cos(ang) * flip, 0.0)
    se = np.where(valid & row_ok, -np.sin(ang) * flip, 0.0)
    return ce.astype(np.float32), se.astype(np.float32), khp


def _eo_layout(xg, n_fft: int, khp: int):
    """(b, ngrp, l_row) -> folded phase-0 operand (b, ngrp, 2*khp):
    cols [:khp] hold e = [x0, x[m]+x[N-m], x[N/2], 0-pad], cols [khp:]
    hold o = [0, x[m]-x[N-m], 0, 0-pad] for m = 1..N/2-1."""
    h = n_fft // 2
    fr = xg[..., :n_fft]
    x0 = fr[..., 0:1]
    mid = fr[..., h:h + 1]
    a = fr[..., 1:h]
    brev = fr[..., :h:-1]                     # m = N-1 .. N/2+1
    zpad = jnp.zeros(fr.shape[:-1] + (khp - h - 1,), fr.dtype)
    z1 = jnp.zeros_like(x0)
    e = jnp.concatenate([x0, a + brev, mid, zpad], axis=-1)
    o = jnp.concatenate([z1, a - brev, z1, zpad], axis=-1)
    return jnp.concatenate([e, o], axis=-1)


@functools.lru_cache(maxsize=16)
def _delta_bases_np(n_fft: int, hop_length: int, j_taps: int, kpad: int):
    c, s = _bases_np(n_fft, j_taps, kpad)
    dc = c[:LANE].copy()
    ds = s[:LANE].copy()
    dc[hop_length:, :] = 0.0               # rows >= hop: masked out
    ds[hop_length:, :] = 0.0
    return dc, ds


@functools.lru_cache(maxsize=16)
def _rot_np(n_fft: int, hop_length: int, j_taps: int, kpad: int):
    k = np.arange(kpad) - j_taps
    ang = 2.0 * np.pi * hop_length * k / n_fft
    return (np.cos(ang).astype(np.float32)[None, :],
            np.sin(ang).astype(np.float32)[None, :])


def _split_hi_lo(a32):
    hi = a32.astype(jnp.bfloat16)
    lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _np_split_hi_lo(a32):
    """Host-side bf16 hi/lo split for CONSTANT kernel operands.

    Inside a jit trace, jnp ops on constants are STAGED into the
    program, and XLA's --xla_allow_excess_precision can elide the bf16
    rounding of ``hi`` — zeroing the ``lo`` plane (measured round 3:
    the K>1 masked-filterbank split lost its lo under jit only, 2e-3
    log-mel error vs 6e-5 eager; the round-2 in-kernel tmat split was
    the same bug class on the traced operand).  numpy/ml_dtypes keeps
    the split outside any trace — bitwise identical to the honest XLA
    split, immune to the rewrite."""
    import ml_dtypes
    a32 = np.asarray(a32, np.float32)
    hi = a32.astype(ml_dtypes.bfloat16)
    lo = (a32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)


def _dot3(a32, bhi, blo, col=None):
    """bf16x3 GEMM of an f32 LHS against a hi/lo-split basis."""
    f32 = jnp.float32
    ahi, alo = _split_hi_lo(a32)
    bh = bhi if col is None else bhi[:, col]
    bl = blo if col is None else blo[:, col]
    return (jnp.dot(ahi, bh, preferred_element_type=f32)
            + jnp.dot(alo, bh, preferred_element_type=f32)
            + jnp.dot(ahi, bl, preferred_element_type=f32))


def _dot4(a32, bhi, blo):
    """bf16x4 GEMM (adds the lo*lo term): ~2^-24-class relative error
    at 4/6 of HIGHEST's MXU passes.  Used where bf16x3's ~2^-16 slot
    would eat too much of the 1e-4 parity budget (the mel GEMM:
    bf16x3 there measured 1.03e-4 total vs torch — just over the
    gate)."""
    f32 = jnp.float32
    ahi, alo = _split_hi_lo(a32)
    return (jnp.dot(ahi, bhi, preferred_element_type=f32)
            + jnp.dot(alo, bhi, preferred_element_type=f32)
            + jnp.dot(ahi, blo, preferred_element_type=f32)
            + jnp.dot(alo, blo, preferred_element_type=f32))


def _lo2(a32, ahi, alo):
    """Third piece of a 3-way bf16 split: what the standard hi/lo pair
    cannot represent (~2^-18 relative of ``a32``)."""
    f32 = jnp.float32
    return (a32 - ahi.astype(f32) - alo.astype(f32)).astype(jnp.bfloat16)


def _dot6(a32, bhi, blo, blo2):
    """~2^-27-class GEMM: 3-way split of BOTH operands, six bf16
    passes (drops only >=2^-27 cross terms).  Used on the lowest output
    tile when the lowbin fix is on — deep spectral fades at the first
    mel bands amplify the 2-way split's ~2^-18 representation floor
    past the 1e-4 log-mel gate at small lambda/n_fft ratios (measured:
    mel band 0 fades to ~1e-3 of the median mel value, turning the
    absolute quantization floor into >1e-4 relative error there)."""
    f32 = jnp.float32
    ahi, alo = _split_hi_lo(a32)
    alo2 = _lo2(a32, ahi, alo)
    return (jnp.dot(ahi, bhi, preferred_element_type=f32)
            + jnp.dot(alo, bhi, preferred_element_type=f32)
            + jnp.dot(ahi, blo, preferred_element_type=f32)
            + jnp.dot(alo2, bhi, preferred_element_type=f32)
            + jnp.dot(ahi, blo2, preferred_element_type=f32)
            + jnp.dot(alo, blo, preferred_element_type=f32))


def _fwd_kernel(xgc_ref, xg_ref, bchi_ref, bclo_ref, bshi_ref, bslo_ref,
                dchi_ref, dclo_ref, dshi_ref, dslo_ref, rotr_ref,
                roti_ref, tmat_ref, fbhi_ref, fblo_ref, tn_ref,
                fbn_ref, mel_ref, xres_ref, xr_scr, xi_scr, *, g, gr,
                hop_length, n_fft, hop_ext, nt_g, nyq, kpad, j_taps,
                k_sig, lowbin_fix, n_chunks, interpret, folded=False,
                khp=0, log_ep=False):
    f32 = jnp.float32
    width = LANE + 2 * j_taps
    # lowbin_fix level 2 (small-n_fft full ladder): the correction
    # passes cover ALL kpad basis columns, not just band tile 0's reads
    # — at n_fft < 1024 each mel band integrates few bins, so deep
    # fades expose the bf16x3 floor in EVERY tile (the round-2
    # PALLAS_AUTO_MIN_NFFT finding); level 2 lifts the whole spectra
    # to the ~2^-27 class so those buckets can ride the kernel.
    lad_cols = kpad if lowbin_fix >= 2 else width

    def dc_corr1(a32, hs, ls):
        """Extra bf16 passes of the 3-way-split residual (lo2*bhi) and
        the x4 cross term (lo*blo) against one basis plane's first
        `lad_cols` columns (level 1: band tile 0's X reads, bins
        -J..LANE-1+J; level 2: all columns): lifts the spectra feeding
        the deep-fade mel bands from the ~2^-18 absolute floor (input
        representation + missing cross term, both the same magnitude
        class) to ~2^-27.  The correction rides the recurrence
        rotation exactly (f32 elementwise), so applying it at the
        base/delta GEMMs covers every phase.  The folded base calls
        this per plane (e against ce, o against se)."""
        ahi, alo = _split_hi_lo(a32)
        alo2 = _lo2(a32, ahi, alo)
        c = (jnp.dot(alo2, hs[:, :lad_cols], preferred_element_type=f32)
             + jnp.dot(alo, ls[:, :lad_cols], preferred_element_type=f32))
        if lad_cols == kpad:
            return c
        return jnp.concatenate(
            [c, jnp.zeros((a32.shape[0], kpad - lad_cols), f32)], axis=1)

    def dc_corr(a32, rows_n, chs, cls, shs, sls):
        """Both planes of the correction (full bases: cos and sin)."""
        return dc_corr1(a32, chs, cls), dc_corr1(a32, shs, sls)

    # ---- phase-0 base DFT GEMM, chunked over the contraction ----
    # xgc_ref streams (gr, chunk) sample tiles and bchi/../bslo stream
    # the matching (chunk, kpad) basis tiles (grid dim 2); each grid
    # step accumulates its partial product into the persistent spectra
    # scratch.  dc_corr is linear in the chunk, so the low-bin
    # correction accumulates chunk-wise too.  n_chunks == 1 (n_fft <=
    # 1024, whole basis VMEM-resident) keeps the certified round-2
    # codegen: no predication, base value stays in registers.
    if folded:
        # even/odd folded base: e @ ce and o @ se at K = N/2+1
        # (FOLDED_BASE_NFFTS; bchi/bclo hold the folded ce planes and
        # bshi/bslo the folded se planes, xgc holds [e | o])
        eo = xgc_ref[0]
        e_blk = eo[:, :khp]
        o_blk = eo[:, khp:]
        pr = _dot3(e_blk, bchi_ref[:], bclo_ref[:])
        pi = _dot3(o_blk, bshi_ref[:], bslo_ref[:])
        if lowbin_fix:
            pr = pr + dc_corr1(e_blk, bchi_ref, bclo_ref)
            pi = pi + dc_corr1(o_blk, bshi_ref, bslo_ref)
    else:
        base = xgc_ref[0]
        pr = _dot3(base, bchi_ref[:], bclo_ref[:])
        pi = _dot3(base, bshi_ref[:], bslo_ref[:])
        if lowbin_fix:
            cr, ci = dc_corr(base, gr, bchi_ref, bclo_ref, bshi_ref,
                             bslo_ref)
            pr = pr + cr
            pi = pi + ci

    if n_chunks == 1:
        xr_scr[0:gr, :] = pr
        xi_scr[0:gr, :] = pi
        _fwd_rest(pr, pi, xg_ref, dchi_ref, dclo_ref, dshi_ref,
                  dslo_ref, rotr_ref, roti_ref, tmat_ref, fbhi_ref,
                  fblo_ref, tn_ref, fbn_ref, mel_ref, xres_ref, xr_scr,
                  xi_scr, g=g, gr=gr, hop_length=hop_length,
                  n_fft=n_fft, hop_ext=hop_ext, nt_g=nt_g, nyq=nyq,
                  kpad=kpad, j_taps=j_taps, k_sig=k_sig,
                  lowbin_fix=lowbin_fix, interpret=interpret,
                  dc_corr=dc_corr, log_ep=log_ep)
        return

    kc = pl.program_id(2)

    @pl.when(kc == 0)
    def _():
        xr_scr[0:gr, :] = pr
        xi_scr[0:gr, :] = pi

    @pl.when(kc > 0)
    def _():
        xr_scr[0:gr, :] = xr_scr[0:gr, :] + pr
        xi_scr[0:gr, :] = xi_scr[0:gr, :] + pi

    @pl.when(kc == n_chunks - 1)
    def _():
        _fwd_rest(xr_scr[0:gr, :], xi_scr[0:gr, :], xg_ref, dchi_ref,
                  dclo_ref, dshi_ref, dslo_ref, rotr_ref, roti_ref,
                  tmat_ref, fbhi_ref, fblo_ref, tn_ref, fbn_ref,
                  mel_ref, xres_ref, xr_scr, xi_scr, g=g, gr=gr,
                  hop_length=hop_length, n_fft=n_fft, hop_ext=hop_ext,
                  nt_g=nt_g, nyq=nyq, kpad=kpad, j_taps=j_taps,
                  k_sig=k_sig, lowbin_fix=lowbin_fix,
                  interpret=interpret, dc_corr=dc_corr, log_ep=log_ep)


def _fwd_rest(xr_c, xi_c, xg_ref, dchi_ref, dclo_ref, dshi_ref,
              dslo_ref, rotr_ref, roti_ref, tmat_ref, fbhi_ref,
              fblo_ref, tn_ref, fbn_ref, mel_ref, xres_ref, xr_scr,
              xi_scr, *, g, gr, hop_length, n_fft, hop_ext, nt_g, nyq,
              kpad, j_taps, k_sig, lowbin_fix, interpret, dc_corr,
              log_ep=False):
    """Everything after the (possibly chunk-accumulated) phase-0
    spectra: delta GEMMs + sliding-DFT recurrence, residual write,
    real-tap band conv, power, mel."""
    f32 = jnp.float32
    width = LANE + 2 * j_taps
    ab = _ABLATE                       # diagnostic-only, empty in prod
    xg = xg_ref[0]
    if g > 1 and "nodelta" in ab:
        # timing ablation: keep the scratch-row writes (traffic), drop
        # the delta GEMMs and rotation chain
        for c in range(g - 1):
            xr_scr[(c + 1) * gr:(c + 2) * gr, :] = xr_c
            xi_scr[(c + 1) * gr:(c + 2) * gr, :] = xi_c
    elif g > 1:
        dblk = xg[:, n_fft:n_fft + hop_ext] - xg[:, :hop_ext]
        rotr = rotr_ref[0, :]
        roti = roti_ref[0, :]

        def delta_slice(c):
            off = c * hop_length
            loff = off % LANE
            if loff == 0:
                return dblk[:, off:off + LANE]
            if interpret:
                shifted = jnp.roll(dblk, -loff, axis=1)
            else:
                shifted = pltpu.roll(dblk, hop_ext - loff, axis=1)
            return shifted[:, off - loff:off - loff + LANE]

        if STACK_DELTAS:
            # see the STACK_DELTAS note: one full-row-fill GEMM for all
            # g-1 deltas, bitwise-identical per-row results
            sl_all = jnp.concatenate(
                [delta_slice(c) for c in range(g - 1)], axis=0)
            dr_all = _dot3(sl_all, dchi_ref[:], dclo_ref[:])
            di_all = _dot3(sl_all, dshi_ref[:], dslo_ref[:])
            if lowbin_fix:
                cr, ci = dc_corr(sl_all, (g - 1) * gr, dchi_ref,
                                 dclo_ref, dshi_ref, dslo_ref)
                dr_all = dr_all + cr
                di_all = di_all + ci
        for c in range(g - 1):
            if STACK_DELTAS:
                dr = dr_all[c * gr:(c + 1) * gr, :]
                di = di_all[c * gr:(c + 1) * gr, :]
            else:
                sl = delta_slice(c)
                dr = _dot3(sl, dchi_ref[:], dclo_ref[:])
                di = _dot3(sl, dshi_ref[:], dslo_ref[:])
                if lowbin_fix:
                    cr, ci = dc_corr(sl, gr, dchi_ref, dclo_ref,
                                     dshi_ref, dslo_ref)
                    dr = dr + cr
                    di = di + ci
            ar = xr_c + dr
            ai = xi_c + di
            if "norot" in ab:          # timing ablation: drop the VPU
                xr_c, xi_c = ar, ai    # rotation multiplies only
            else:
                xr_c = rotr * ar - roti * ai
                xi_c = rotr * ai + roti * ar
            xr_scr[(c + 1) * gr:(c + 2) * gr, :] = xr_c
            xi_scr[(c + 1) * gr:(c + 2) * gr, :] = xi_c

    if "nores" not in ab:
        xres_ref[0, :, :kpad] = xr_scr[:].astype(jnp.bfloat16)
        xres_ref[0, :, kpad:] = xi_scr[:].astype(jnp.bfloat16)

    # ---- real-tap band conv + power + mel ----
    # K sigmas share the spectra above: tmat is the horizontal concat
    # of the K banded blocks, so one GEMM per tile produces all K
    # windowed spectra; the (nt*K*LANE, MEL_PAD) filterbank rows are
    # pre-masked per sigma group (rows ordered (tile, sigma, lane)).
    if "nomel" in ab:                  # timing ablation: spectra only
        mel_ref[0] = jnp.zeros((xr_scr.shape[0], MEL_PAD), f32)
        return
    mel_acc = None
    # hi/lo-split the lambda-dependent taps IN-KERNEL: split in XLA,
    # the terminal's --xla_allow_excess_precision=true lets the
    # compiler elide the bf16 rounding of `hi` and zero the `lo`
    # correction (measured: 9.7e-5 -> 1.3e-2 parity under jit with a
    # traced lambda); Mosaic lowers the casts faithfully
    thi, tlo = _split_hi_lo(tmat_ref[:])
    tlo2 = _lo2(tmat_ref[:], thi, tlo) if lowbin_fix else None
    rows_n = xr_scr.shape[0]
    if (STACK_BAND or STACK_BAND_FWD) and not lowbin_fix and nt_g > 1:
        # one band-conv GEMM for ALL tiles and both re/im (shared tmat
        # RHS): (2*nt_g*rows, width) @ (width, K*LANE).  Bitwise equal
        # to the per-tile loop (independent GEMM rows, same K order).
        xall = jnp.concatenate(
            [xr_scr[:, f * LANE:f * LANE + width] for f in range(nt_g)]
            + [xi_scr[:, f * LANE:f * LANE + width]
               for f in range(nt_g)], axis=0)
        s_all = _dot3(xall, thi, tlo)
        for f in range(nt_g):
            sre = s_all[f * rows_n:(f + 1) * rows_n]
            sim = s_all[(nt_g + f) * rows_n:(nt_g + f + 1) * rows_n]
            p = sre * sre + sim * sim
            mel_t = _dot4(p, fbhi_ref[pl.ds(f * k_sig * LANE,
                                            k_sig * LANE), :],
                          fblo_ref[pl.ds(f * k_sig * LANE,
                                         k_sig * LANE), :])
            mel_acc = mel_t if mel_acc is None else mel_acc + mel_t
    else:
        for f in range(nt_g):
            xrs = xr_scr[:, f * LANE:f * LANE + width]
            xis = xi_scr[:, f * LANE:f * LANE + width]
            if lowbin_fix and (f == 0 or lowbin_fix >= 2):
                # tile 0 holds the deep-fade mel bands (level 2: every
                # tile is deep-fade-prone at small n_fft): 6-pass conv
                sre = _dot6(xrs, thi, tlo, tlo2)
                sim = _dot6(xis, thi, tlo, tlo2)
            else:
                sre = _dot3(xrs, thi, tlo)
                sim = _dot3(xis, thi, tlo)
            p = sre * sre + sim * sim
            # explicit bf16x4 for the mel GEMM (Mosaic lowers only
            # DEFAULT/HIGHEST; HIGHEST costs 6 passes, bf16x4 is
            # ~2^-24-class — invisible under the bf16x3 spectra floor,
            # where bf16x3 here measured just over the 1e-4 torch gate)
            mel_t = _dot4(p, fbhi_ref[pl.ds(f * k_sig * LANE,
                                            k_sig * LANE), :],
                          fblo_ref[pl.ds(f * k_sig * LANE,
                                         k_sig * LANE), :])
            mel_acc = mel_t if mel_acc is None else mel_acc + mel_t
    if nyq and "nonyq" not in ab:
        # Nyquist bin via VPU tap-reduction (f32 — tighter than the
        # bf16x3 GEMM tiles): S[c0] = sum_u X'[:, c0+u] tn[u], where
        # tn[u] = rho[2J-u] (column 0 of the tile-(nt_g) band block)
        c0 = nt_g * LANE
        xr_sl = xr_scr[:, c0:c0 + LANE]
        xi_sl = xi_scr[:, c0:c0 + LANE]
        for k in range(k_sig):
            tn = tn_ref[k, :][None, :]
            sre = jnp.sum(xr_sl * tn, axis=1, keepdims=True)
            sim = jnp.sum(xi_sl * tn, axis=1, keepdims=True)
            p = sre * sre + sim * sim                       # (ROWS, 1)
            mel_acc = mel_acc + p * fbn_ref[k, :][None, :]
    if log_ep:
        # fused log epilogue (round 5, VERDICT r4 next #4): emit
        # log(mel + 1e-10) with the same Newton refinement as
        # ops.numerics.accurate_log — this kills the XLA-side log
        # read+write round trip on the forward and the dP
        # materialization chain on the backward (there dP =
        # dlog * exp(-logmel), computed in-kernel from the saved
        # output).  mel + eps > 0 always (power + positive eps), so
        # log is finite and accurate_log's isfinite guard is not
        # needed in-kernel.
        v = mel_acc + LOG_EPS
        y = jnp.log(v)
        mel_acc = y + v * jnp.exp(-y) - 1.0
    if _frame_io(n_fft, g):
        # kernel rows are phase-major (c*gr + r); emit frame order
        # (r*g + c) so the XLA side reshapes instead of transposing
        mel_acc = (mel_acc.reshape(g, gr, MEL_PAD).swapaxes(0, 1)
                   .reshape(g * gr, MEL_PAD))
    mel_ref[0] = mel_acc


def _bwd_kernel(xres_ref, dmel_ref, tbf_ref, fbt_ref, tn_ref, fbn_ref,
                *rest, nt_g, nyq, kpad, j_taps, k_sig, g=1, gr=1,
                frame_io=False, log_ep=False):
    # with log_ep an extra logmel input ref precedes the dt output ref
    if log_ep:
        logmel_ref, dt_ref = rest
    else:
        (dt_ref,) = rest
    f32 = jnp.float32
    bf = jnp.bfloat16
    width = LANE + 2 * j_taps
    dmel = dmel_ref[0]
    if log_ep:
        # convert the log-mel cotangent to the mel-power cotangent
        # in-VMEM: dP = dlog / (P + eps) = dlog * exp(-logmel) (the
        # kernel's forward emitted logmel = log(P + eps)).  Same
        # emitted layout for both operands, so convert before the
        # frame-order permute.  Padded lanes: logmel = log(eps) there
        # (~ -23), exp(+23) is finite and dlog is zero -> dP zero.
        dmel = dmel * jnp.exp(-logmel_ref[0])
    if frame_io:
        # cotangent arrives in frame order; xres rows are phase-major
        dmel = (dmel.reshape(gr, g, MEL_PAD).swapaxes(0, 1)
                .reshape(g * gr, MEL_PAD))
    dt_acc = jnp.zeros((width, k_sig * LANE), f32)
    dims = (((0,), (0,)), ((), ()))        # contract over the ROWS axis
    rows_n = xres_ref.shape[1]
    if _stacked_bwd_active(nt_g, k_sig):
        # stacked adjoint (see STACK_BAND): the nt_g x {re,im} per-tile
        # recompute GEMMs share tbf and the dp GEMMs share fbt, so the
        # 3*nt_g*2 medium GEMMs collapse to three large ones.  dp and
        # the recomputed s are bitwise equal to the per-tile loop
        # (independent rows/columns); dT's cross-tile accumulation
        # moves inside one K = 2*nt_g*rows contraction (f32 MXU
        # accumulate — same error class, hardware-recertified).
        xall = jnp.concatenate(
            [xres_ref[0, :, f * LANE:f * LANE + width]
             for f in range(nt_g)]
            + [xres_ref[0, :, kpad + f * LANE:kpad + f * LANE + width]
               for f in range(nt_g)], axis=0)
        s_all = jnp.dot(xall, tbf_ref[:], preferred_element_type=f32)
        dp_all = jnp.dot(dmel, fbt_ref[:, :nt_g * k_sig * LANE],
                         preferred_element_type=f32)
        dp_stack = jnp.concatenate(
            [dp_all[:, f * k_sig * LANE:(f + 1) * k_sig * LANE]
             for f in range(nt_g)] * 2, axis=0)
        ds_all = (2.0 * s_all * dp_stack).astype(bf)
        dt_acc = dt_acc + jax.lax.dot_general(
            xall, ds_all, dims, preferred_element_type=f32)
    else:
        for f in range(nt_g):
            xrs = xres_ref[0, :, f * LANE:f * LANE + width]
            xis = xres_ref[0, :, kpad + f * LANE:kpad + f * LANE + width]
            # dp feeds a bf16-cast product (dsre/dsim) — single-pass
            # bf16 is already below the adjoint's quantization class
            dp = jnp.dot(dmel, fbt_ref[:, pl.ds(f * k_sig * LANE,
                                                k_sig * LANE)],
                         preferred_element_type=f32)
            sre = jnp.dot(xrs, tbf_ref[:], preferred_element_type=f32)
            sim = jnp.dot(xis, tbf_ref[:], preferred_element_type=f32)
            dsre = (2.0 * sre * dp).astype(bf)
            dsim = (2.0 * sim * dp).astype(bf)
            dt_acc = dt_acc + jax.lax.dot_general(
                xrs, dsre, dims, preferred_element_type=f32)
            dt_acc = dt_acc + jax.lax.dot_general(
                xis, dsim, dims, preferred_element_type=f32)
    if nyq:
        # dT[u, k*LANE] += sum_r X'[r, c0+u] * 2 S_nyq[r] dp_nyq[r];
        # the contribution lands in ONE column per sigma block, written
        # via an iota mask (VPU outer product, no lane scatter)
        c0 = nt_g * LANE
        xr_sl = xres_ref[0, :, c0:c0 + LANE].astype(f32)
        xi_sl = xres_ref[0, :, kpad + c0:kpad + c0 + LANE].astype(f32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, k_sig * LANE), 1)
        for k in range(k_sig):
            tn = tn_ref[k, :][None, :]
            dp = jnp.sum(dmel * fbn_ref[k, :][None, :], axis=1,
                         keepdims=True)                     # (ROWS, 1)
            sre = jnp.sum(xr_sl * tn, axis=1, keepdims=True)
            sim = jnp.sum(xi_sl * tn, axis=1, keepdims=True)
            dvec = (jax.lax.dot_general(                    # (LANE, 1)
                        xr_sl, 2.0 * sre * dp, dims,
                        preferred_element_type=f32)
                    + jax.lax.dot_general(
                        xi_sl, 2.0 * sim * dp, dims,
                        preferred_element_type=f32))
            dvec = jnp.concatenate(
                [dvec, jnp.zeros((width - LANE, 1), f32)], axis=0)
            mask = (col == k * LANE).astype(f32)
            dt_acc = dt_acc + dvec * mask
    dt_ref[0, 0] = dt_acc


def _xg_layout(x, n_fft, hop_length, j_taps, rows=ROWS, chain=1):
    (g, gr, hop_ext, l_row, n_bins, k_ext, nt, kpad, nyq,
     nt_g) = _plan(n_fft, hop_length, j_taps, rows, chain)
    b, t = x.shape
    nfr = num_frames(t, hop_length)
    ngrp = -(-nfr // g)
    nblk = -(-ngrp // gr)
    ngrp_pad = nblk * gr
    pad = n_fft // 2
    k = l_row // hop_ext
    total = (ngrp_pad - 1 + k) * hop_ext
    xp = jnp.pad(x, ((0, 0), (pad, max(0, total - pad - t))))[:, :total]
    resh = xp.reshape(b, total // hop_ext, hop_ext)
    xg = jnp.concatenate([resh[:, j:j + ngrp_pad, :] for j in range(k)],
                         axis=-1)
    return xg, nfr, nblk


def window_taps_sym(window: jnp.ndarray, n_fft: int,
                    j_taps: int = SPECGEMM_J_TAPS):
    """Real taps rho_d of a window symmetric about N/2:
    ``What[d] = (-1)^d rho_d`` with ``rho_d = sum_m w[m] cos(2 pi
    (m - N/2) d / N)``.  Differentiable in the window (this is the only
    place lambda enters the specband path)."""
    m = np.arange(n_fft)[:, None] - n_fft / 2.0
    d = np.arange(j_taps + 1)[None, :]
    cb = jnp.asarray(np.cos(2.0 * np.pi * m * d / n_fft)
                     .astype(np.float32))
    rho_pos = jnp.matmul(window[None, :], cb,
                         precision=jax.lax.Precision.HIGHEST)[0]
    return jnp.concatenate([rho_pos[:0:-1], rho_pos]) / n_fft  # (2J+1,)


def band_matrix(rho: jnp.ndarray, j_taps: int):
    """(LANE + 2J, LANE) real banded Toeplitz block: T[u, v] =
    rho[v - u + 2J] on the band, 0 outside (cf. stft._band_matrices)."""
    width = LANE + 2 * j_taps
    u = jnp.arange(width)[:, None]
    v = jnp.arange(LANE)[None, :]
    idx = v - u + 2 * j_taps
    valid = (idx >= 0) & (idx <= 2 * j_taps)
    return jnp.where(valid, rho[jnp.clip(idx, 0, 2 * j_taps)], 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _specband_mel(x, tmat, n_fft, hop_length, j_taps, mel_key, interpret,
                  lowbin_fix, log_ep=False):
    mel, _ = _specband_fwd(x, tmat, n_fft, hop_length, j_taps, mel_key,
                           interpret, lowbin_fix, log_ep)
    return mel


def _fb_pad(n_fft, nt, n_mels, sample_rate, f_min, f_max,
            band_map=None, k_sig=1):
    """(nt*K*LANE, MEL_PAD) filterbank rows ordered (tile, sigma,
    lane); for K > 1 each sigma's copy is masked to its mel bands.

    Pure NUMPY by contract: this is a constant kernel operand, and its
    downstream hi/lo split must never be staged into a trace (see
    :func:`_np_split_hi_lo`)."""
    from dmel_tpu.ops.mel import melscale_fbanks_np
    fb = melscale_fbanks_np(n_fft // 2 + 1, f_min, f_max, n_mels,
                            sample_rate).astype(np.float32)
    # with the Nyquist split, nt counts GEMM-covered tiles only — the
    # truncated last row (bin nt*LANE) is handled by _fb_nyq instead
    fb = fb[:nt * LANE]
    fb = np.pad(fb, ((0, nt * LANE - fb.shape[0]),
                     (0, MEL_PAD - n_mels)))
    if k_sig == 1:
        return fb
    sel = np.zeros((n_mels, k_sig), np.float32)       # (n_mels, K)
    sel[np.arange(n_mels), np.asarray(band_map)] = 1.0
    sel = np.pad(sel, ((0, MEL_PAD - n_mels), (0, 0)))
    fb4 = fb.reshape(nt, 1, LANE, MEL_PAD) * sel.T[None, :, None, :]
    return np.ascontiguousarray(fb4.reshape(nt * k_sig * LANE, MEL_PAD))


def _fb_nyq(n_fft, n_mels, sample_rate, f_min, f_max,
            band_map=None, k_sig=1):
    """(k_sig, MEL_PAD) filterbank row of the Nyquist bin, per-sigma
    masked for K > 1 (cf. :func:`_fb_pad`).  Numpy by contract."""
    from dmel_tpu.ops.mel import melscale_fbanks_np
    fb = melscale_fbanks_np(n_fft // 2 + 1, f_min, f_max, n_mels,
                            sample_rate).astype(np.float32)
    row = np.pad(fb[-1], (0, MEL_PAD - n_mels))
    if k_sig == 1:
        return row[None, :]
    sel = np.zeros((n_mels, k_sig), np.float32)
    sel[np.arange(n_mels), np.asarray(band_map)] = 1.0
    sel = np.pad(sel, ((0, MEL_PAD - n_mels), (0, 0)))   # (MEL_PAD, K)
    return np.ascontiguousarray(sel.T * row[None, :])


def _taps_nyq(tmat, k_sig):
    """(k_sig, LANE) Nyquist tap rows tn[k, u] = rho_k[2J - u]: column
    0 of each sigma's band block (zero beyond u = 2J)."""
    return jnp.stack([tmat[:LANE, k * LANE] for k in range(k_sig)])


def _mel_key_parts(mel_key):
    n_mels, sample_rate, f_min, f_max = mel_key[:4]
    band_map = mel_key[4] if len(mel_key) > 4 else None
    return n_mels, sample_rate, f_min, f_max, band_map


def _specband_fwd(x, tmat, n_fft, hop_length, j_taps, mel_key, interpret,
                  lowbin_fix=False, log_ep=False):
    n_mels, sample_rate, f_min, f_max, band_map = _mel_key_parts(mel_key)
    k_sig = tmat.shape[-1] // LANE
    rows, chain, chunk = _geom(n_fft, hop_length, k_sig, lowbin_fix)
    n_chunks = n_fft // chunk
    (g, gr, hop_ext, l_row, n_bins, k_ext, nt, kpad, nyq,
     nt_g) = _plan(n_fft, hop_length, j_taps, rows, chain)
    b, t = x.shape
    xg, nfr, nblk = _xg_layout(x, n_fft, hop_length, j_taps, rows, chain)
    # ALL constant operands are built and hi/lo-split in NUMPY: jnp
    # ops on constants are staged under a jit trace, where XLA's
    # excess-precision rewrite can zero a split's lo plane (round-3
    # find on the K>1 filterbank; see _np_split_hi_lo)
    folded = n_fft in FOLDED_BASE_NFFTS and n_chunks == 1
    if folded:
        ce, se, khp = _folded_bases_np(n_fft, j_taps, kpad)
        bchi, bclo = _np_split_hi_lo(ce)
        bshi, bslo = _np_split_hi_lo(se)
    else:
        khp = 0
        bc, bs = _bases_np(n_fft, j_taps, kpad)
        bchi, bclo = _np_split_hi_lo(bc)
        bshi, bslo = _np_split_hi_lo(bs)
    dc, ds = _delta_bases_np(n_fft, hop_length, j_taps, kpad)
    dchi, dclo = _np_split_hi_lo(dc)
    dshi, dslo = _np_split_hi_lo(ds)
    rr, ri = _rot_np(n_fft, hop_length, j_taps, kpad)
    fb_pad = _fb_pad(n_fft, nt_g, n_mels, sample_rate, f_min, f_max,
                     band_map, k_sig)
    fbhi, fblo = _np_split_hi_lo(fb_pad)
    tapsn = _taps_nyq(tmat, k_sig)
    fbn = jnp.asarray(_fb_nyq(n_fft, n_mels, sample_rate, f_min, f_max,
                              band_map, k_sig))
    width = LANE + 2 * j_taps

    kern = functools.partial(
        _fwd_kernel, g=g, gr=gr, hop_length=hop_length, n_fft=n_fft,
        hop_ext=hop_ext, nt_g=nt_g, nyq=nyq, kpad=kpad, j_taps=j_taps,
        k_sig=k_sig, lowbin_fix=lowbin_fix, n_chunks=n_chunks,
        interpret=interpret, folded=folded, khp=khp, log_ep=log_ep)
    const = lambda bi, ki, kc: (0, 0)
    if folded:
        base_op = _eo_layout(xg, n_fft, khp)
        base_spec = pl.BlockSpec((1, gr, 2 * khp),
                                 lambda bi, ki, kc: (bi, ki, 0))
        basis_spec = pl.BlockSpec((khp, kpad), const)
    else:
        base_op = xg
        base_spec = pl.BlockSpec((1, gr, chunk),
                                 lambda bi, ki, kc: (bi, ki, kc))
        basis_spec = pl.BlockSpec((chunk, kpad),
                                  lambda bi, ki, kc: (kc, 0))
    mel_pm, xres = pl.pallas_call(
        kern,
        grid=(b, nblk, n_chunks),
        in_specs=[
            # base-GEMM operand: chunked view of xg (same array as the
            # full view below), or the folded [e | o] planes ...
            base_spec,
            # ... and the full group-row view for the delta GEMMs
            pl.BlockSpec((1, gr, l_row), lambda bi, ki, kc: (bi, ki, 0)),
            # the four base-basis planes: full (chunk, kpad) tiles
            # streamed along kc, or the folded (khp, kpad) ce/se pairs
            basis_spec,
            basis_spec,
            basis_spec,
            basis_spec,
            pl.BlockSpec((LANE, kpad), const),
            pl.BlockSpec((LANE, kpad), const),
            pl.BlockSpec((LANE, kpad), const),
            pl.BlockSpec((LANE, kpad), const),
            pl.BlockSpec((1, kpad), const),
            pl.BlockSpec((1, kpad), const),
            pl.BlockSpec((width, k_sig * LANE), const),
            pl.BlockSpec((nt_g * k_sig * LANE, MEL_PAD), const),
            pl.BlockSpec((nt_g * k_sig * LANE, MEL_PAD), const),
            pl.BlockSpec((k_sig, LANE), const),
            pl.BlockSpec((k_sig, MEL_PAD), const),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, MEL_PAD),
                         lambda bi, ki, kc: (bi, ki, 0)),
            pl.BlockSpec((1, rows, 2 * kpad),
                         lambda bi, ki, kc: (bi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nblk * rows, MEL_PAD), jnp.float32),
            jax.ShapeDtypeStruct((b, nblk * rows, 2 * kpad),
                                 jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, kpad), jnp.float32),
            pltpu.VMEM((rows, kpad), jnp.float32),
        ],
        # large geometries raise XLA's default 16 MB scoped-vmem
        # budget so the hi/lo-split bases stay resident (2048: ~19 MB
        # bases + ~13 MB working set; 4096: ~71 MB + ~15 MB); rows>512
        # blocks at any n_fft also exceed the default (round 2 measured
        # ROWS=1024 over by 68 KB at n_fft=1024 before learning the cap
        # is scheduling-only). The certified production <=1024
        # compilations (rows<=512) keep the default budget.
        # (k_sig > 1 at rows > ROWS_MULTI also needs the raise: the
        # K-wide band/mel intermediates put the round-2 default-budget
        # estimate 1.5 MB over at rows=512 — the budget is
        # scheduling-only, so the A/B can measure those geometries)
        compiler_params=(pltpu.CompilerParams(
            # 110 MB at 4096: the resident working set measures ~86 MB
            # solo but a VMAPPED trial pack (parallel/trials.py) adds
            # ~1 MB of operand window over the old 100 MB budget
            # (measured: 101.11 MB estimate, scripts/bench_packed_pallas)
            vmem_limit_bytes=(110 if n_fft > 2048 else 36) * 1024 * 1024)
            if (n_fft > 1024 or rows > 512
                or (k_sig > 1 and rows > ROWS_MULTI)
                # the stacked band conv's (2*nt_g*rows, width) LHS +
                # splits + output add ~7 MB of scheduling estimate at
                # the 1024/rows=512 geometry
                or ((STACK_BAND or STACK_BAND_FWD)
                    and not lowbin_fix)) else None),
        interpret=interpret,
    )(base_op, xg, bchi, bclo, bshi, bslo, dchi, dclo, dshi, dslo,
      jnp.asarray(rr), jnp.asarray(ri), tmat, fbhi, fblo, tapsn, fbn)

    if _frame_io(n_fft, g):
        mel_fr = mel_pm[:, :nfr, :n_mels]      # kernel emitted frame order
    else:
        mel_fr = (mel_pm.reshape(b, nblk, g, gr, MEL_PAD)
                  .transpose(0, 1, 3, 2, 4)
                  .reshape(b, nblk * rows, MEL_PAD))[:, :nfr, :n_mels]
    # with the fused log epilogue the backward needs the LOG output to
    # reconstruct dP = dlog * exp(-logmel); saving the kernel's raw
    # padded output costs nothing (it is the array mel_fr slices from)
    return mel_fr, (xres, tmat, x, nfr, nblk,
                    mel_pm if log_ep else None)


def _specband_bwd(n_fft, hop_length, j_taps, mel_key, interpret,
                  lowbin_fix, log_ep, residuals, dmel_fr):
    xres, tmat, x_primal, nfr, nblk, logmel_pm = residuals
    n_mels, sample_rate, f_min, f_max, band_map = _mel_key_parts(mel_key)
    k_sig = tmat.shape[-1] // LANE
    rows, chain, chunk = _geom(n_fft, hop_length, k_sig, lowbin_fix)
    (g, gr, hop_ext, l_row, n_bins, k_ext, nt, kpad, nyq,
     nt_g) = _plan(n_fft, hop_length, j_taps, rows, chain)
    b = xres.shape[0]
    width = LANE + 2 * j_taps
    dmel_p = jnp.pad(dmel_fr, ((0, 0), (0, 0), (0, MEL_PAD - n_mels)))
    dmel_pm = jnp.zeros((b, nblk * rows, MEL_PAD), dmel_p.dtype)
    dmel_pm = dmel_pm.at[:, :nfr, :].set(dmel_p)
    if not _frame_io(n_fft, g):
        dmel_pm = (dmel_pm.reshape(b, nblk, gr, g, MEL_PAD)
                   .transpose(0, 1, 3, 2, 4)
                   .reshape(b, nblk * rows, MEL_PAD))
    fb_pad = _fb_pad(n_fft, nt_g, n_mels, sample_rate, f_min, f_max,
                     band_map, k_sig)
    fbt = jnp.asarray(np.ascontiguousarray(np.swapaxes(fb_pad, 0, 1)))
    tapsn = _taps_nyq(tmat, k_sig)
    fbn = jnp.asarray(_fb_nyq(n_fft, n_mels, sample_rate, f_min, f_max,
                              band_map, k_sig))

    kern = functools.partial(_bwd_kernel, nt_g=nt_g, nyq=nyq, kpad=kpad,
                             j_taps=j_taps, k_sig=k_sig, g=g, gr=gr,
                             frame_io=_frame_io(n_fft, g), log_ep=log_ep)
    const = lambda bi, ki: (0, 0)
    in_specs = [
        pl.BlockSpec((1, rows, 2 * kpad), lambda bi, ki: (bi, ki, 0)),
        pl.BlockSpec((1, rows, MEL_PAD), lambda bi, ki: (bi, ki, 0)),
        pl.BlockSpec((width, k_sig * LANE), const),
        pl.BlockSpec((MEL_PAD, nt_g * k_sig * LANE), const),
        pl.BlockSpec((k_sig, LANE), const),
        pl.BlockSpec((k_sig, MEL_PAD), const),
    ]
    operands = [xres, dmel_pm, tmat.astype(jnp.bfloat16), fbt, tapsn,
                fbn]
    if log_ep:
        # the saved kernel output (padded, emitted layout) rides in
        # with the same tiling as the cotangent
        in_specs.append(pl.BlockSpec((1, rows, MEL_PAD),
                                     lambda bi, ki: (bi, ki, 0)))
        operands.append(logmel_pm)
    dt_part = pl.pallas_call(
        kern,
        grid=(b, nblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, width, k_sig * LANE),
                               lambda bi, ki: (bi, ki, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nblk, width, k_sig * LANE),
                                       jnp.float32),
        # the stacked adjoint's (2*nt_g*rows, width) concat + its f32
        # recompute exceed the default 16 MB scheduling budget at the
        # covered buckets (the nt_g <= 8 gate caps this path at
        # n_fft = 2048; the 4096 attempt estimated 24.8 MB before the
        # gate excluded it for being slower) — same scheduling-only
        # raise as the forward
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=36 * 1024 * 1024)
            if _stacked_bwd_vmem_raise(nt_g, k_sig, n_fft) else None),
        interpret=interpret,
    )(*operands)
    dtmat = dt_part.sum(axis=(0, 1))

    # The x cotangent (dead-code eliminated unless requested): mel is
    # quadratic in X (linear in x) with lambda-independent maps, so a
    # vjp through the XLA specband rebuild gives dx exactly.
    def xla_specband(xv):
        return _specband_xla_ref(xv, tmat, n_fft, hop_length, j_taps,
                                 mel_key)
    _, pull = jax.vjp(xla_specband, x_primal)
    dmel_for_x = dmel_fr
    if log_ep:
        # the XLA rebuild produces mel POWER — convert the log-mel
        # cotangent first (slice the saved padded logmel back to the
        # frame layout the cotangent arrived in)
        if _frame_io(n_fft, g):
            logmel_fr = logmel_pm[:, :nfr, :n_mels]
        else:
            logmel_fr = (logmel_pm
                         .reshape(b, nblk, g, gr, MEL_PAD)
                         .transpose(0, 1, 3, 2, 4)
                         .reshape(b, nblk * rows, MEL_PAD)
                         )[:, :nfr, :n_mels]
        dmel_for_x = dmel_fr * jnp.exp(-logmel_fr)
    dx = pull(dmel_for_x)[0]
    return dx, dtmat


def _specband_xla_ref(x, tmat, n_fft, hop_length, j_taps, mel_key):
    """Pure-XLA rebuild of the kernel math (used for the dx adjoint and
    as an oracle in tests): direct ext-bin phase-flipped spectra,
    banded matmul with tmat, power, mel.  Handles K > 1 sigma groups
    through the same concatenated tmat / masked-filterbank layout."""
    n_mels, sample_rate, f_min, f_max, band_map = _mel_key_parts(mel_key)
    (g, gr, hop_ext, l_row, n_bins, k_ext, nt, _kpad, nyq,
     nt_g) = _plan(n_fft, hop_length, j_taps)
    # full-tile oracle: covers ALL nt tiles by GEMM (incl. the Nyquist
    # tile the kernel splits off), so it needs its own column padding
    kpad = _round_up(max(k_ext, (nt - 1) * LANE + LANE + 2 * j_taps),
                     LANE)
    b, t = x.shape
    nfr = num_frames(t, hop_length)
    pad = n_fft // 2
    need = (nfr - 1) * hop_length + n_fft
    xp = jnp.pad(x, ((0, 0), (pad, max(0, need - pad - t))))
    idx = (jnp.arange(nfr)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :])
    frames = xp[:, idx]                                  # (B, nfr, n_fft)
    bc, bs = _bases_np(n_fft, j_taps, kpad)
    xr = jnp.matmul(frames, jnp.asarray(bc),
                    precision=jax.lax.Precision.HIGHEST)
    xi = jnp.matmul(frames, jnp.asarray(bs),
                    precision=jax.lax.Precision.HIGHEST)
    width = LANE + 2 * j_taps
    k_sig = tmat.shape[-1] // LANE
    fb_pad = jnp.asarray(_fb_pad(n_fft, nt, n_mels, sample_rate, f_min,
                                 f_max, band_map, k_sig))
    outs = []
    for f in range(nt):
        xrs = xr[..., f * LANE:f * LANE + width]
        xis = xi[..., f * LANE:f * LANE + width]
        sre = jnp.matmul(xrs, tmat, precision=jax.lax.Precision.HIGHEST)
        sim = jnp.matmul(xis, tmat, precision=jax.lax.Precision.HIGHEST)
        outs.append(sre * sre + sim * sim)
    p = jnp.concatenate(outs, axis=-1)              # (B, nfr, nt*K*128)
    mel = jnp.matmul(p, fb_pad, precision=jax.lax.Precision.HIGHEST)
    return mel[..., :n_mels]


_specband_mel.defvjp(_specband_fwd, _specband_bwd)


def specband_mel_power(x, window, *, n_fft: int, hop_length: int,
                       n_mels: int, sample_rate: int, f_min: float = 0.0,
                       f_max: float | None = None,
                       j_taps: int = SPECGEMM_J_TAPS,
                       lowbin_fix: bool = False,
                       interpret: bool = False,
                       log_epilogue: bool = False):
    """Fused specband mel power spectrogram: ``(B, n_mels, n_frames)``.

    ``log_epilogue=True`` returns ``log(mel + 1e-10)`` computed INSIDE
    the kernel (Newton-refined, matching ops.numerics.accurate_log) —
    the log-mel production path without the XLA-side log round trip
    (VERDICT r4 next #4; fwd emits logmel, bwd reconstructs the power
    cotangent in-VMEM from the saved output).

    ``window`` must be symmetric about ``n_fft/2`` (the Gaussian
    window is); the lambda gradient flows through
    :func:`window_taps_sym` -> :func:`band_matrix` -> the kernel's dT
    adjoint.  Truncation validity is the caller's responsibility
    (stft.specband_ok).  ``lowbin_fix`` (static; gate with
    stft.lowbin_fix_needed on the same lambd hint) adds the 3-way-split
    correction passes that keep the deep-fade lowest mel bands inside
    the 1e-4 parity gate at small lambda/n_fft ratios; level ``2``
    (small-n_fft full ladder) extends the correction to every basis
    column and every band tile, reclaiming the n_fft < 1024 buckets
    from the round-2 certified-parity floor (gate with
    stft.SPECBAND_HIPREC_NFFTS).
    """
    if f_max is None:
        f_max = sample_rate // 2
    if window.shape[-1] != n_fft:
        raise ValueError("specband requires win_length == n_fft")
    if not supported(n_fft, hop_length, n_mels, j_taps):
        raise ValueError("unsupported geometry for the specband kernel; "
                         "gate with specband_dmel.supported")
    b_shape = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    rho = window_taps_sym(window, n_fft, j_taps)
    tmat = band_matrix(rho, j_taps)
    key = (n_mels, sample_rate, float(f_min), float(f_max))
    mel = _specband_mel(x2, tmat, n_fft, hop_length, j_taps, key,
                        interpret, lowbin_fix, log_epilogue)
    mel = jnp.swapaxes(mel, -1, -2)
    return mel.reshape(b_shape + mel.shape[-2:])


def specband_mel_power_multi(x, windows, band_map, *, n_fft: int,
                             hop_length: int, n_mels: int,
                             sample_rate: int, f_min: float = 0.0,
                             f_max: float | None = None,
                             j_taps: int = SPECGEMM_J_TAPS,
                             lowbin_fix: bool = False,
                             interpret: bool = False):
    """Multi-sigma fused specband mel: ``(B, n_mels, n_frames)``.

    ``windows`` is ``(K, n_fft)`` (one symmetric window per sigma
    group) and ``band_map`` maps each mel band to its group (cf.
    :func:`dmel_tpu.ops.dmel.multi_sigma_mel_spectrogram`).  All K
    sigmas SHARE the single in-kernel sliding-DFT spectra pass — the
    expensive part — so the marginal cost per extra sigma is one banded
    GEMM per output tile, not a full spectrogram.  Every lambda must
    satisfy the truncation guard (stft.specband_ok); gate outside jit.
    """
    if f_max is None:
        f_max = sample_rate // 2
    k_sig = windows.shape[0]
    if windows.shape[-1] != n_fft:
        raise ValueError("specband requires win_length == n_fft")
    if not supported(n_fft, hop_length, n_mels, j_taps):
        raise ValueError("unsupported geometry for the specband kernel; "
                         "gate with specband_dmel.supported")
    if k_sig * LANE > 1024:
        raise ValueError("too many sigma groups for one VMEM tile row")
    b_shape = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    rhos = jax.vmap(lambda w: window_taps_sym(w, n_fft, j_taps))(windows)
    tmat = jnp.concatenate(
        [band_matrix(rhos[k], j_taps) for k in range(k_sig)], axis=1)
    key = (n_mels, sample_rate, float(f_min), float(f_max),
           tuple(int(v) for v in np.asarray(band_map)))
    mel = _specband_mel(x2, tmat, n_fft, hop_length, j_taps, key,
                        interpret, lowbin_fix, False)
    mel = jnp.swapaxes(mel, -1, -2)
    return mel.reshape(b_shape + mel.shape[-2:])
