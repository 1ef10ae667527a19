"""Fully-fused DMEL Pallas kernels with IN-KERNEL framing.

Round-1's fused kernel (fused_dmel.py) still framed the signal with an
XLA pass because Mosaic cannot vector-load HBM at unaligned lane
offsets; at hop 80 that framing materializes a 266 MB frames tensor and
costs ~1.5 ms of the fwd+bwd budget (PERF.md).  This module removes it:

- XLA builds a cheap *group-row* layout ``XG[b, g] = xp[g*G*hop :
  g*G*hop + L_row]`` (G = frames per group = lcm(hop,128)/hop, so the
  group stride is lane-aligned and the copy is gather-free; ~2.8x
  duplication = 58 MB instead of 266 MB at the bench config).
- Inside the kernel each of the G phases is an *unaligned slice of a
  VMEM-resident row*, realized as a lane roll (``pltpu.roll``) + an
  aligned slice — the thing that is impossible on HBM refs but cheap on
  registers.  Frames are laid out phase-major; the tiny mel output is
  permuted back to frame order in XLA.
- Forward fuses frame-build -> window -> bf16x3 real-DFT GEMMs ->
  |.|^2 -> mel GEMM; the only big HBM traffic is XG in and the saved
  bf16 Re/Im residuals out.
- Backward is its own kernel: rebuilds frames the same way, turns the
  mel cotangent into dRe/dIm via in-kernel tiny GEMMs against the saved
  residuals, accumulates ``dfw`` with single-pass bf16 MXU GEMMs
  (gradient-only precision, cf. stft.py:stft_power_matmul_ext_mp), and
  reduces the window gradient per block.  dx (rarely needed — the
  signal is data) is produced by an XLA adjoint that XLA dead-code
  eliminates when unused.

Parity contract: same math as /root/reference/time_frequency.py:48-53 +
models.py:42-53 (centered constant-pad STFT, |.|^2, mel GEMM), gated by
tests against the torch oracle in interpret mode and by bench.py's
in-run parity check on hardware.
"""

from __future__ import annotations

import functools
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmel_tpu.ops.mel import melscale_fbanks
from dmel_tpu.ops.stft import num_frames

LANE = 128
MEL_PAD = 128          # mel bands padded to one lane tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported(n_fft: int, hop_length: int, n_mels: int) -> bool:
    """Static dispatch guard: n_fft must be a lane multiple and the hop
    must admit a group of <= 16 frames (G*hop lane-aligned).

    n_fft is capped at 1024 for the same reason as
    specband_dmel.supported: at 2048 the four hi/lo-split DFT bases
    alone (4 x n_fft x f_pad bf16 ~ 19 MB) exceed the 16 MB scoped
    VMEM (measured OOM on v5e for the same shapes) — interpret-mode
    tests cannot see the budget, so the guard must.  The win=2048
    window bucket (lambda in (170.7, 341.3] under the optimized 6-sigma
    rule) falls back to the XLA matmul_ext paths, which the n_fft
    crossover table in PERF.md shows are the right tool there anyway.
    """
    g = LANE // gcd(hop_length, LANE)
    return (n_fft % LANE == 0 and g <= 16 and n_mels <= MEL_PAD
            and n_fft <= 1024)


ROWS = 256             # frames per kernel block (2 MXU row tiles) —
                       # big blocks amortize per-grid-step pipeline
                       # overhead (2560 small steps measured 8.1 ms vs
                       # theory ~4.5; see PERF.md)


@functools.lru_cache(maxsize=16)
def _plan(n_fft: int, hop_length: int):
    g = LANE // gcd(hop_length, LANE)       # frames per group
    gr = ROWS // g                          # groups per ROWS-frame block
    hop_ext = g * hop_length                # lane-aligned group stride
    l_row = _round_up((g - 1) * hop_length + n_fft, hop_ext)
    n_bins = n_fft // 2 + 1
    f_pad = _round_up(n_bins, LANE)         # padded bin count
    n_f = f_pad // LANE                     # freq tiles
    # Nyquist split: when the one-sided bins are exactly tiles + 1 bin
    # (n_fft % 256 == 0), the last tile would waste a whole GEMM pass on
    # 127 zero bins — compute bin n_fft/2 as a VPU reduction instead
    nyq_split = (n_bins - 1) % LANE == 0
    f_main = (n_bins - 1) // LANE if nyq_split else n_f
    return g, gr, hop_ext, l_row, n_bins, f_pad, n_f, nyq_split, f_main


@functools.lru_cache(maxsize=16)
def _bases_np(n_fft: int, f_pad: int):
    m = np.arange(n_fft)[:, None]
    k = np.arange(f_pad)[None, :]
    ang = -2.0 * np.pi * m * k / n_fft
    c = np.where(k < n_fft // 2 + 1, np.cos(ang), 0.0)
    s = np.where(k < n_fft // 2 + 1, np.sin(ang), 0.0)
    return c.astype(np.float32), s.astype(np.float32)


def _split_hi_lo(a32):
    hi = a32.astype(jnp.bfloat16)
    lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _build_frames(xg, g, gr, hop_length, n_fft, interpret):
    """(gr, l_row) group rows -> list of G phase tiles (gr, n_fft)."""
    l_row = xg.shape[-1]
    tiles = []
    for c in range(g):
        off = c * hop_length
        loff = off % LANE
        base = off - loff
        if loff == 0:
            fr = xg[:, base:base + n_fft]
        else:
            if interpret:
                shifted = jnp.roll(xg, -loff, axis=1)
            else:
                shifted = pltpu.roll(xg, l_row - loff, axis=1)
            fr = shifted[:, base:base + n_fft]
        tiles.append(fr)
    return tiles


def _alt_row(n_fft):
    m = jax.lax.broadcasted_iota(jnp.int32, (1, n_fft), 1)
    return jnp.where(m % 2 == 0, 1.0, -1.0).astype(jnp.float32)


def _fwd_kernel(xg_ref, w_ref, chi_ref, clo_ref, shi_ref, slo_ref, fb_ref,
                fbhi_ref, fblo_ref, mel_ref, reim_ref, fwhi_ref,
                fwlo_ref, *scr, g, gr, hop_length, n_fft, n_f,
                nyq_split, f_main, n_bins, lowbin_fix, interpret,
                hiprec=False):
    tiles = _build_frames(xg_ref[0], g, gr, hop_length, n_fft, interpret)
    alt = _alt_row(n_fft)
    f32 = jnp.float32
    nyq_parts = []
    for c, fr in enumerate(tiles):
        fw = fr * w_ref[0, :]
        if nyq_split:
            nyq_parts.append(jnp.sum(fw * alt, axis=1, keepdims=True))
        if hiprec:
            # full-f32 route (round 5, VERDICT r4 next #3): no operand
            # splits at all — the windowed frames stay f32 and the DFT
            # GEMMs below run at Mosaic's native f32 HIGHEST (the
            # hardware's own 6-pass decomposition, ~2^-27 class).  The
            # explicit bf16 ladders (x3/x4/x5) could not close the
            # small-n_fft deep-fade gap (round-2/round-4 findings);
            # this formulation removes their absolute floor entirely.
            scr[-1][c * gr:(c + 1) * gr, :] = fw
            continue
        hi, lo = _split_hi_lo(fw)
        fwhi_ref[c * gr:(c + 1) * gr, :] = hi
        fwlo_ref[c * gr:(c + 1) * gr, :] = lo
        if lowbin_fix:
            # third piece of a 3-way split (~2^-18 of fw): consumed by
            # one extra bf16 pass on bin tile 0 below — the deep-fade
            # lowest mel bands amplify the 2-way split's representation
            # floor past the 1e-4 gate at small lambda/n_fft (see
            # stft.lowbin_fix_needed)
            lo2 = (fw - hi.astype(f32) - lo.astype(f32)).astype(
                jnp.bfloat16)
            scr[0][c * gr:(c + 1) * gr, :] = lo2

    fhi = fwhi_ref[:]
    flo = fwlo_ref[:]
    mel_acc = None
    if nyq_split:
        re_nyq = jnp.concatenate(nyq_parts, axis=0)      # (ROWS, 1)
        mel_acc = (re_nyq * re_nyq) * fb_ref[n_bins - 1, :][None, :]
    for f in range(f_main):        # static loop: one grid step does all
        col = pl.ds(f * LANE, LANE)

        def dot3(bhi_ref, blo_ref):
            bhi = bhi_ref[:, col]
            blo = blo_ref[:, col]
            return (jnp.dot(fhi, bhi, preferred_element_type=f32)
                    + jnp.dot(flo, bhi, preferred_element_type=f32)
                    + jnp.dot(fhi, blo, preferred_element_type=f32))

        if hiprec:
            fw_all = scr[-1][:]
            re = jnp.dot(fw_all, chi_ref[:, col],
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=f32)
            im = jnp.dot(fw_all, shi_ref[:, col],
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=f32)
        else:
            re = dot3(chi_ref, clo_ref)
            im = dot3(shi_ref, slo_ref)
        if lowbin_fix and not hiprec:
            # all tiles, not just tile 0: framed is the fallback for
            # lambdas OUTSIDE the specband window, where lambda/n_fft
            # can be deep enough (< 1/30) that the window spectrum's
            # smoothing creates fades beyond the first bin tile.  Two
            # extra passes: the 3-way-split residual (lo2*bhi) and the
            # x4 cross term (lo*blo) — both ~2^-18 absolute class,
            # amplified past the gate at the deep mel fades
            re = re + (jnp.dot(scr[0][:], chi_ref[:, col],
                               preferred_element_type=f32)
                       + jnp.dot(flo, clo_ref[:, col],
                                 preferred_element_type=f32))
            im = im + (jnp.dot(scr[0][:], shi_ref[:, col],
                               preferred_element_type=f32)
                       + jnp.dot(flo, slo_ref[:, col],
                                 preferred_element_type=f32))
        p = re * re + im * im
        reim_ref[0, :, pl.ds(f * 2 * LANE, 2 * LANE)] = jnp.concatenate(
            [re, im], axis=1).astype(jnp.bfloat16)
        row = pl.ds(f * LANE, LANE)
        if lowbin_fix and not hiprec:
            # explicit bf16x4 mel GEMM (p hi/lo x fb hi/lo, all four
            # terms): Mosaic HIGHEST's own pass schedule leaves
            # absolute-class cross terms that the deep fades amplify
            # (hardware-measured: framed errors exceeded the matched
            # CPU-interpret run only on this route)
            phi = p.astype(jnp.bfloat16)
            plo = (p - phi.astype(f32)).astype(jnp.bfloat16)
            mel_t = (jnp.dot(phi, fbhi_ref[row, :],
                             preferred_element_type=f32)
                     + jnp.dot(plo, fbhi_ref[row, :],
                               preferred_element_type=f32)
                     + jnp.dot(phi, fblo_ref[row, :],
                               preferred_element_type=f32)
                     + jnp.dot(plo, fblo_ref[row, :],
                               preferred_element_type=f32))
        else:
            # f32 x f32 mel projection: without an explicit precision
            # Mosaic drops to one bf16 pass (4e-3-grade features)
            mel_t = jnp.dot(p, fb_ref[row, :],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)
        mel_acc = mel_t if mel_acc is None else mel_acc + mel_t
    mel_ref[0] = mel_acc


def _bwd_kernel(xg_ref, dmel_ref, reim_ref, w_ref, fbt_ref, ct_ref,
                st_ref, dw_ref, *, g, gr, hop_length, n_fft, n_f,
                nyq_split, f_main, n_bins, interpret):
    f32 = jnp.float32
    bf = jnp.bfloat16

    dmel = dmel_ref[0]
    dfw = None
    for f in range(f_main):
        reim = reim_ref[0, :, pl.ds(f * 2 * LANE, 2 * LANE)]
        re = reim[:, :LANE].astype(f32)
        im = reim[:, LANE:].astype(f32)
        # dP tile from the mel cotangent: (ROWS, M) @ (M, 128); explicit
        # f32 precision (Mosaic would otherwise run one bf16 pass)
        dp = jnp.dot(dmel, fbt_ref[:, pl.ds(f * LANE, LANE)],
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=f32)
        dre = (2.0 * re * dp).astype(bf)
        dim = (2.0 * im * dp).astype(bf)
        # single-pass bf16 adjoint GEMMs (gradient-only precision)
        row = pl.ds(f * LANE, LANE)
        contrib = (jnp.dot(dre, ct_ref[row, :],
                           preferred_element_type=f32)
                   + jnp.dot(dim, st_ref[row, :],
                             preferred_element_type=f32))
        dfw = contrib if dfw is None else dfw + contrib

    tiles = _build_frames(xg_ref[0], g, gr, hop_length, n_fft, interpret)
    if nyq_split:
        # Nyquist contribution: re recomputed from frames (fw = fr*w),
        # dP from the fb row, dfw += outer(dre_nyq, alt)
        alt = _alt_row(n_fft)
        dp_nyq = jnp.dot(dmel, fbt_ref[:, n_bins - 1][:, None],
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=f32)      # (ROWS, 1)
        re_parts = []
        for c, fr in enumerate(tiles):
            fw = fr * w_ref[0, :]
            re_parts.append(jnp.sum(fw * alt, axis=1, keepdims=True))
        re_nyq = jnp.concatenate(re_parts, axis=0)
        dfw = dfw + (2.0 * re_nyq * dp_nyq) * alt
    acc = jnp.zeros((8, n_fft), f32)
    for c, fr in enumerate(tiles):
        prod = fr * dfw[c * gr:(c + 1) * gr, :]
        acc = acc + prod.reshape(gr // 8, 8, n_fft).sum(axis=0)
    dw_ref[0, 0] = acc


def _xg_layout(x, n_fft, hop_length):
    """(B, T) -> (B, ngrp_pad, l_row) lane-aligned overlapping group
    rows (gather-free: hop_ext-strided reshape + k static slices)."""
    g, gr, hop_ext, l_row = _plan(n_fft, hop_length)[:4]
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


def _fwd(x, window, n_fft, hop_length, fb_pad, interpret, lowbin_fix,
         hiprec=False):
    (g, gr, hop_ext, l_row, n_bins, f_pad, n_f, nyq_split,
     f_main) = _plan(n_fft, hop_length)
    b, t = x.shape
    xg, nfr, nblk = _xg_layout(x, n_fft, hop_length)
    c_np, s_np = _bases_np(n_fft, f_pad)
    # constant operands split in NUMPY: under a jit trace these jnp
    # ops would be staged and XLA's excess-precision rewrite can zero
    # the lo plane (round-3 find on specband's K>1 filterbank —
    # specband_dmel._np_split_hi_lo)
    from dmel_tpu.ops.pallas.specband_dmel import _np_split_hi_lo
    if hiprec:
        # full-f32 bases (no splits); the clo/slo operand slots carry
        # inert bf16 copies (the kernel never reads them on this route
        # — keeping the operand arity fixed is simpler than a second
        # signature, and the waste is <1 MB at the covered n_fft)
        chi = jnp.asarray(c_np)
        shi = jnp.asarray(s_np)
        clo = jnp.asarray(c_np).astype(jnp.bfloat16)
        slo = jnp.asarray(s_np).astype(jnp.bfloat16)
    else:
        chi, clo = _np_split_hi_lo(c_np)
        shi, slo = _np_split_hi_lo(s_np)
    fbhi, fblo = _np_split_hi_lo(fb_pad)
    fb_pad = jnp.asarray(fb_pad)
    w_pad = window[None, :]

    kern = functools.partial(_fwd_kernel, g=g, gr=gr,
                             hop_length=hop_length, n_fft=n_fft, n_f=n_f,
                             nyq_split=nyq_split, f_main=f_main,
                             n_bins=n_bins, lowbin_fix=lowbin_fix,
                             interpret=interpret, hiprec=hiprec)
    mel_pm, reim = pl.pallas_call(
        kern,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, gr, l_row), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, n_fft), lambda bi, ki: (0, 0)),
            # bases + filterbank stay VMEM-resident (constant index =>
            # no per-step re-DMA); the kernel slices the f-th tile
            pl.BlockSpec((n_fft, f_pad), lambda bi, ki: (0, 0)),
            pl.BlockSpec((n_fft, f_pad), lambda bi, ki: (0, 0)),
            pl.BlockSpec((n_fft, f_pad), lambda bi, ki: (0, 0)),
            pl.BlockSpec((n_fft, f_pad), lambda bi, ki: (0, 0)),
            pl.BlockSpec((f_pad, MEL_PAD), lambda bi, ki: (0, 0)),
            pl.BlockSpec((f_pad, MEL_PAD), lambda bi, ki: (0, 0)),
            pl.BlockSpec((f_pad, MEL_PAD), lambda bi, ki: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ROWS, MEL_PAD), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, ROWS, f_main * 2 * LANE),
                         lambda bi, ki: (bi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nblk * ROWS, MEL_PAD), jnp.float32),
            jax.ShapeDtypeStruct((b, nblk * ROWS, f_main * 2 * LANE),
                                 jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((ROWS, n_fft), jnp.bfloat16),
            pltpu.VMEM((ROWS, n_fft), jnp.bfloat16),
        ] + ([pltpu.VMEM((ROWS, n_fft), jnp.bfloat16)]
             if lowbin_fix and not hiprec else [])
          + ([pltpu.VMEM((ROWS, n_fft), jnp.float32)]
             if hiprec else []),
        interpret=interpret,
    )(xg, w_pad, chi, clo, shi, slo, fb_pad, fbhi, fblo)

    # phase-major -> frame order on the tiny mel tensor
    mel_fr = (mel_pm.reshape(b, nblk, g, gr, MEL_PAD)
              .transpose(0, 1, 3, 2, 4)
              .reshape(b, nblk * ROWS, MEL_PAD))[:, :nfr, :]
    return mel_fr, (xg, reim, nfr, nblk)


def _bwd(window, n_fft, hop_length, fb_pad, interpret, residuals, dmel_fr):
    (g, gr, hop_ext, l_row, n_bins, f_pad, n_f, nyq_split,
     f_main) = _plan(n_fft, hop_length)
    xg, reim, nfr, nblk = residuals
    b = xg.shape[0]
    # frame order -> phase-major, pad rows back to nblk*ROWS
    dmel_pm = jnp.zeros((b, nblk * ROWS, MEL_PAD), dmel_fr.dtype)
    dmel_pm = dmel_pm.at[:, :nfr, :].set(dmel_fr)
    dmel_pm = (dmel_pm.reshape(b, nblk, gr, g, MEL_PAD)
               .transpose(0, 1, 3, 2, 4)
               .reshape(b, nblk * ROWS, MEL_PAD))

    c_np, s_np = _bases_np(n_fft, f_pad)
    ct = jnp.asarray(c_np).T.astype(jnp.bfloat16)   # (f_pad, n_fft)
    st = jnp.asarray(s_np).T.astype(jnp.bfloat16)
    fbt = jnp.asarray(np.ascontiguousarray(
        np.swapaxes(np.asarray(fb_pad), 0, 1)))     # (MEL_PAD, f_pad)

    kern = functools.partial(_bwd_kernel, g=g, gr=gr,
                             hop_length=hop_length, n_fft=n_fft, n_f=n_f,
                             nyq_split=nyq_split, f_main=f_main,
                             n_bins=n_bins, interpret=interpret)
    dw_part = pl.pallas_call(
        kern,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, gr, l_row), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, ROWS, MEL_PAD), lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, ROWS, f_main * 2 * LANE),
                         lambda bi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, n_fft), lambda bi, ki: (0, 0)),
            pl.BlockSpec((MEL_PAD, f_pad), lambda bi, ki: (0, 0)),
            pl.BlockSpec((f_pad, n_fft), lambda bi, ki: (0, 0)),
            pl.BlockSpec((f_pad, n_fft), lambda bi, ki: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, n_fft),
                               lambda bi, ki: (bi, ki, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nblk, 8, n_fft), jnp.float32),
        interpret=interpret,
    )(xg, dmel_pm, reim, window[None, :], fbt, ct, st)
    dwindow = dw_part.sum(axis=(0, 1, 2))
    return dwindow


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _framed_mel(x, window, n_fft, hop_length, n_mels_key, interpret,
                lowbin_fix, hiprec=False):
    mel, _ = _framed_mel_fwd(x, window, n_fft, hop_length, n_mels_key,
                             interpret, lowbin_fix, hiprec)
    return mel


def _fb_pad(n_fft, f_pad, n_mels, sample_rate, f_min, f_max):
    """NUMPY by contract — the downstream hi/lo split must happen
    outside any trace (see specband_dmel._np_split_hi_lo: staged
    constant splits can lose their lo plane to XLA's excess-precision
    rewrite under jit)."""

    from dmel_tpu.ops.mel import melscale_fbanks_np
    fb = melscale_fbanks_np(n_fft // 2 + 1, f_min, f_max, n_mels,
                            sample_rate).astype(np.float32)
    return np.pad(fb, ((0, f_pad - fb.shape[0]),
                       (0, MEL_PAD - n_mels)))


def _framed_mel_fwd(x, window, n_fft, hop_length, n_mels_key, interpret,
                    lowbin_fix=False, hiprec=False):
    n_mels, sample_rate, f_min, f_max = n_mels_key
    (g, gr, hop_ext, l_row, n_bins, f_pad, n_f, nyq_split,
     f_main) = _plan(n_fft, hop_length)
    fb_pad = _fb_pad(n_fft, f_pad, n_mels, sample_rate, f_min, f_max)
    mel_fr, res = _fwd(x, window, n_fft, hop_length, fb_pad, interpret,
                       lowbin_fix, hiprec)
    # x rides along for the (lazily-built) dx adjoint: |STFT|^2 is
    # quadratic in x, so its VJP needs the primal point
    return mel_fr[..., :n_mels], (res, window, x)


def _framed_mel_bwd(n_fft, hop_length, n_mels_key, interpret, lowbin_fix,
                    hiprec, residuals, dmel):
    (res, window, x_primal) = residuals
    n_mels, sample_rate, f_min, f_max = n_mels_key
    (g, gr, hop_ext, l_row, n_bins, f_pad, n_f, nyq_split,
     f_main) = _plan(n_fft, hop_length)
    fb_pad = _fb_pad(n_fft, f_pad, n_mels, sample_rate, f_min, f_max)
    dmel_p = jnp.pad(dmel, ((0, 0), (0, 0), (0, MEL_PAD - n_mels)))
    dwindow = _bwd(window, n_fft, hop_length, fb_pad, interpret, res,
                   dmel_p)[:n_fft]

    # dx via the XLA adjoint (dead-code-eliminated unless requested):
    # rebuild the forward chain functionally and use jax.vjp
    def xla_mel(xv):
        from dmel_tpu.ops.stft import stft_power
        p = stft_power(xv, window, n_fft, hop_length, method="matmul_ext")
        fb = melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels,
                             sample_rate)
        return jnp.matmul(jnp.swapaxes(p, -1, -2), fb)
    _, pull = jax.vjp(xla_mel, x_primal)
    dx = pull(dmel)[0]
    return dx, dwindow


_framed_mel.defvjp(_framed_mel_fwd, _framed_mel_bwd)


def framed_mel_power(x, window, *, n_fft: int, hop_length: int,
                     n_mels: int, sample_rate: int, f_min: float = 0.0,
                     f_max: float | None = None,
                     lowbin_fix: bool = True,
                     interpret: bool = False,
                     hiprec: bool = False):
    """Fused in-kernel-framed mel power spectrogram.

    Returns ``(B, n_mels, n_frames)`` (same contract as
    ops.mel_spectrogram without the log).  Gradient w.r.t. ``window``
    flows through the fused backward kernel; gradient w.r.t. ``x``
    through an XLA adjoint (built lazily).  ``lowbin_fix`` (static)
    adds one extra bf16 pass on bin tile 0 so the deep-fade lowest mel
    bands stay inside the 1e-4 gate at small lambda/n_fft ratios
    (stft.lowbin_fix_needed); it defaults ON (correctness-first, ~3%
    DFT cost) — the production dispatch turns it off when the static
    lambd hint shows it is unnecessary.
    """
    if f_max is None:
        f_max = sample_rate // 2
    if window.shape[-1] != n_fft:
        raise ValueError("framed kernel requires win_length == n_fft")
    if not supported(n_fft, hop_length, n_mels):
        raise ValueError("unsupported (n_fft, hop, n_mels) for the "
                         "framed kernel; gate with framed_dmel.supported")
    b_shape = x.shape[:-1]
    x2 = x.reshape((-1, x.shape[-1]))
    key = (n_mels, sample_rate, float(f_min), float(f_max))
    if hiprec:
        lowbin_fix = False     # no splits to correct on the f32 route
    mel = _framed_mel(x2, window, n_fft, hop_length, key, interpret,
                      lowbin_fix, hiprec)
    mel = jnp.swapaxes(mel, -1, -2)
    return mel.reshape(b_shape + mel.shape[-2:])
