"""Fused Pallas TPU kernel for the DMEL hot path.

One kernel fuses the whole per-step feature chain that the reference
spreads over torch.stft + per-sample Python loops
(/root/reference/time_frequency.py:48-53, models.py:37-53):

    frame -> window multiply -> real DFT -> |.|^2 -> mel GEMM

The DFT is expressed as two MXU GEMMs with cos/sin basis matrices
(``rfft(v) = v @ C + i v @ S``) — on TPU the MXU makes an O(n^2) DFT
faster than an O(n log n) VPU FFT for the window sizes used here, and
the formulation keeps everything in one kernel: the only HBM traffic is
the strips of input signal in and the tiny (frames x n_mels) output
out.  The (frames x n_freqs) power spectrogram — 40 MB/sample for the
reference's ESC-50 configuration — is never materialized.

Grid: ``(batch, frame_blocks, freq_tiles)`` with the freq axis
innermost. Per (b, t): the frame block is built once from the input
strip into VMEM scratch (predicated on f == 0), then every freq tile
streams its C/S columns through the MXU and accumulates the mel
projection into the resident output block.

The backward pass is the exact adjoint chain (dP = g @ FB^T,
dRe/dIm = 2 Re/Im * dP, dfw = dRe C^T + dIm S^T, dw = sum frames*dfw,
dx = overlap-scatter of dfw*w), implemented with the same basis
matrices in XLA; a custom VJP wires it up so ``jax.grad`` through the
trainable window parameter works transparently (SURVEY.md §3.3
contract).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dmel_tpu.ops.mel import melscale_fbanks
from dmel_tpu.ops.stft import dft_matrices, num_frames, pad_window
from dmel_tpu.ops.window import gaussian_window

LANE = 128

#: largest FFT size the kernel supports: basis tiles + frame blocks must
#: fit VMEM with double buffering (see _plan's size-dependent tiling).
MAX_N_FFT = 4096

#: use the fully-fused backward kernel for dL/dw instead of the XLA
#: adjoint over saved residuals (see _dmel_bwd for the measurement).
USE_FUSED_BWD = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def _kernel_core(frames_ref, w_ref, c_ref, s_ref, fb_ref, out_ref, fw_ref,
                 *, compute_dtype, dft_precision=None):
    """Fuses window-multiply + real-DFT GEMMs + |.|^2 + mel GEMM for one
    (frame-rows x freq-tile) block.  Mosaic cannot vector-load from
    unaligned lane offsets, so framing itself (a strided gather) happens
    in XLA just before the kernel — one memory-bound pass; all compute
    and all large intermediates stay in VMEM here.

    ``compute_dtype``: DFT-GEMM input dtype.  float32 runs the MXU in
    full-precision multi-pass mode (parity path, ~1e-5 of float64);
    bfloat16 is ~4x faster with ~3e-3 relative feature error (fine for
    training; gate parity tests on float32)."""
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _window():
        dt = (jnp.float32 if compute_dtype == "bf16x3" else compute_dtype)
        fw_ref[:] = (frames_ref[:] * w_ref[0, :]).astype(dt)

    fw = fw_ref[:]
    hi = jax.lax.Precision.HIGHEST
    if compute_dtype == "bf16x3":
        # manual 3-pass split (Mosaic has no Precision.HIGH): a ~ hi+lo
        # with hi=bf16(a); dropping the lo*lo term keeps ~1e-4 features
        bf = jnp.bfloat16
        fw_hi = fw.astype(bf)
        fw_lo = (fw - fw_hi.astype(jnp.float32)).astype(bf)

        def dot3(b_ref):
            b32 = b_ref[:]
            b_hi = b32.astype(bf)
            b_lo = (b32 - b_hi.astype(jnp.float32)).astype(bf)
            f32 = jnp.float32
            return (jnp.dot(fw_hi, b_hi, preferred_element_type=f32)
                    + jnp.dot(fw_lo, b_hi, preferred_element_type=f32)
                    + jnp.dot(fw_hi, b_lo, preferred_element_type=f32))

        re = dot3(c_ref)
        im = dot3(s_ref)
    else:
        # bf16 operands use the MXU's native single pass; HIGHEST on
        # bf16 is rejected by Mosaic (and meaningless).
        if compute_dtype == jnp.float32:
            dft_prec = dft_precision or hi
        else:
            dft_prec = None
        re = jnp.dot(fw, c_ref[:].astype(compute_dtype),
                     precision=dft_prec,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(fw, s_ref[:].astype(compute_dtype),
                     precision=dft_prec,
                     preferred_element_type=jnp.float32)
    p = re * re + im * im
    contrib = jnp.dot(p, fb_ref[:], precision=hi,
                      preferred_element_type=jnp.float32)

    @pl.when(f == 0)
    def _init():
        out_ref[:] = contrib

    @pl.when(f > 0)
    def _accum():
        out_ref[:] += contrib

    return re, im


def _kernel(frames_ref, w_ref, c_ref, s_ref, fb_ref, out_ref, fw_ref,
            *, compute_dtype, dft_precision=None):
    _kernel_core(frames_ref, w_ref, c_ref, s_ref, fb_ref, out_ref, fw_ref,
                 compute_dtype=compute_dtype, dft_precision=dft_precision)


def _kernel_res(frames_ref, w_ref, c_ref, s_ref, fb_ref, out_ref, re_ref,
                im_ref, fw_ref, *, compute_dtype, dft_precision=None):
    """Variant that also streams Re/Im tiles to HBM as residuals for the
    backward pass (saves two full recompute GEMMs there)."""
    re, im = _kernel_core(frames_ref, w_ref, c_ref, s_ref, fb_ref, out_ref,
                          fw_ref, compute_dtype=compute_dtype,
                          dft_precision=dft_precision)
    re_ref[:] = re
    im_ref[:] = im


def _bwd_kernel(g_ref, re_ref, im_ref, frames_ref, fbt_ref, ct_ref, st_ref,
                dw_ref, dfw_ref, *, compute_dtype):
    """Fused dL/dw: per (row-block, freq-tile) computes
    dP = g @ FB^T, dRe/dIm = 2 Re/Im * dP, accumulates
    dfw += dRe C^T + dIm S^T in VMEM, and on the last freq tile reduces
    dw_part = sum_rows frames * dfw — no dP/dRe/dIm/dfw ever reach HBM."""
    f = pl.program_id(1)
    n_f = pl.num_programs(1)
    hi = jax.lax.Precision.HIGHEST
    f32 = jnp.float32

    dp = jnp.dot(g_ref[:], fbt_ref[:], precision=hi,
                 preferred_element_type=f32)          # (tb, ft)
    dre = 2.0 * re_ref[:] * dp
    dim = 2.0 * im_ref[:] * dp

    if compute_dtype == "bf16x3":
        bf = jnp.bfloat16

        def dot3(a, b_ref):
            a_hi = a.astype(bf)
            a_lo = (a - a_hi.astype(f32)).astype(bf)
            b32 = b_ref[:]
            b_hi = b32.astype(bf)
            b_lo = (b32 - b_hi.astype(f32)).astype(bf)
            return (jnp.dot(a_hi, b_hi, preferred_element_type=f32)
                    + jnp.dot(a_lo, b_hi, preferred_element_type=f32)
                    + jnp.dot(a_hi, b_lo, preferred_element_type=f32))

        contrib = dot3(dre, ct_ref) + dot3(dim, st_ref)
    else:
        prec = hi if compute_dtype == jnp.float32 else None
        cd = (f32 if compute_dtype == jnp.float32 else compute_dtype)
        contrib = (jnp.dot(dre.astype(cd), ct_ref[:].astype(cd),
                           precision=prec, preferred_element_type=f32)
                   + jnp.dot(dim.astype(cd), st_ref[:].astype(cd),
                             precision=prec, preferred_element_type=f32))

    @pl.when(f == 0)
    def _init():
        dfw_ref[:] = contrib

    @pl.when(f > 0)
    def _accum():
        dfw_ref[:] += contrib

    @pl.when(f == n_f - 1)
    def _reduce():
        dw_ref[0, 0, :] = jnp.sum(frames_ref[:] * dfw_ref[:], axis=0)


def _bwd_dw_fused(g2, re, im, frames, fb_pad, c_ext, s_ext, *, plan,
                  interpret, compute_dtype):
    """dL/dw via the fused backward kernel.

    Args are in the kernel's padded layout: g2 (n_rows, m_pad), re/im
    (n_rows, f_pad), frames (n_rows, n_ext), fb_pad (f_pad, m_pad),
    c_ext/s_ext (n_ext, f_pad).  Returns dw_ext (n_ext,).
    """
    tb, ft, m_pad = plan["tb"], plan["ft"], plan["m_pad"]
    n_ext = plan["n_ext"]
    n_rows = g2.shape[0]
    grid = (n_rows // tb, plan["n_f"])
    dw_parts = pl.pallas_call(
        functools.partial(_bwd_kernel, compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, m_pad), lambda r_, f_: (r_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ft), lambda r_, f_: (r_, f_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ft), lambda r_, f_: (r_, f_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n_ext), lambda r_, f_: (r_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, ft), lambda r_, f_: (0, f_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, n_ext), lambda r_, f_: (f_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, n_ext), lambda r_, f_: (f_, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_ext), lambda r_, f_: (r_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows // tb, 1, n_ext),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((tb, n_ext), jnp.float32)],
        interpret=interpret,
    )(g2, re, im, frames, jnp.transpose(fb_pad),
      jnp.transpose(c_ext), jnp.transpose(s_ext))
    return jnp.sum(dw_parts, axis=(0, 1))


@functools.lru_cache(maxsize=32)
def _padded_basis(n_fft: int, f_pad: int):
    from dmel_tpu.ops.stft import _dft_matrices_np
    c, s = _dft_matrices_np(n_fft)          # float64 numpy (trace-safe)
    pad = ((0, 0), (0, f_pad - c.shape[1]))
    return (np.pad(c, pad).astype(np.float32),
            np.pad(s, pad).astype(np.float32))


def _plan(t: int, n_fft: int, hop: int, n_mels: int):
    n_bins = n_fft // 2 + 1
    nfr = num_frames(t, hop)
    # VMEM budget: double-buffered frame blocks (2*tb*n_fft*4) plus
    # double-buffered C/S tiles (2*2*n_fft*ft*4) must stay well under
    # ~16 MB; shrink both tiles as n_fft grows.
    tb_max = 128 if n_fft <= 2048 else 64
    ft_cap = 4 if n_fft <= 1024 else (2 if n_fft <= 2048 else 1)
    tb = min(tb_max, _round_up(nfr, 8))
    n_tb = -(-nfr // tb)
    nfr_pad = n_tb * tb
    strip = (tb - 1) * hop + n_fft
    strip_pad = _round_up(strip, LANE)
    f_pad = _round_up(n_bins, LANE)
    k = f_pad // LANE
    for m in range(ft_cap, 0, -1):  # largest allowed tile dividing f_pad
        if k % m == 0:
            ft = LANE * m
            break
    n_f = f_pad // ft
    m_pad = _round_up(n_mels, LANE)
    # gather-free framing (see stft.frame_signal_ext) when the per-frame
    # slice count k is small; frames then carry k*hop >= n_fft columns
    # and the window/basis are zero-extended to match.
    # ext framing only when the extended width stays lane-aligned —
    # otherwise Mosaic pads the GEMM K-dim (+12%), costing more than the
    # gather it avoids (measured).
    k_frames = -(-n_fft // hop)
    use_ext = k_frames <= 32 and (k_frames * hop) % LANE == 0
    n_ext = k_frames * hop if use_ext else n_fft
    return dict(n_bins=n_bins, nfr=nfr, tb=tb, n_tb=n_tb, nfr_pad=nfr_pad,
                strip=strip, strip_pad=strip_pad, f_pad=f_pad, ft=ft,
                n_f=n_f, m_pad=m_pad, n_ext=n_ext, use_ext=use_ext)


def _make_frames(x2, n_fft: int, hop: int, plan) -> jnp.ndarray:
    """(B, T) -> (B * nfr_pad, n_ext) frame rows with torch.stft
    center/constant padding; rows beyond nfr are zeros (sliced away
    after the kernel; zero cotangents there in the backward).

    Uses the gather-free strided-reshape framing when profitable
    (n_ext > n_fft; extra columns are zeroed out by the extended
    window/basis), falling back to an explicit gather for dense hops."""
    n_ext = plan["n_ext"]
    if plan["use_ext"]:
        from dmel_tpu.ops.stft import frame_signal_ext
        frames, got_ext = frame_signal_ext(x2, n_fft, hop)
        assert got_ext == n_ext
        pad_rows = plan["nfr_pad"] - frames.shape[1]
        if pad_rows:
            frames = jnp.pad(frames, ((0, 0), (0, pad_rows), (0, 0)))
        return frames.reshape((-1, n_ext))
    pad = n_fft // 2
    xp = jnp.pad(x2, ((0, 0), (pad, pad)))
    starts = jnp.minimum(jnp.arange(plan["nfr_pad"]) * hop,
                         xp.shape[1] - n_fft)
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = xp[:, idx]
    return frames.reshape((-1, n_fft))


def _forward(x2, w, fb_pad, *, n_fft: int, hop: int, plan,
             interpret: bool, compute_dtype=jnp.float32,
             dft_precision=None, save_residuals: bool = False):
    b = x2.shape[0]
    tb, ft, m_pad = plan["tb"], plan["ft"], plan["m_pad"]
    n_ext = plan["n_ext"]
    from dmel_tpu.ops.stft import DEVICE_BASIS_MIN_N_FFT
    if n_fft >= DEVICE_BASIS_MIN_N_FFT:
        # generate on device: embedding ~268 MB basis literals in the
        # program breaks upload/cache limits at large n_fft
        cd, sd = dft_matrices(n_fft, dtype=jnp.float32)
        zpad = ((0, n_ext - n_fft), (0, plan["f_pad"] - cd.shape[1]))
        c = jnp.pad(cd, zpad)
        s = jnp.pad(sd, zpad)
    else:
        c_np, s_np = _padded_basis(n_fft, plan["f_pad"])
        zrows = ((0, n_ext - n_fft), (0, 0))
        c = jnp.asarray(np.pad(c_np, zrows))
        s = jnp.asarray(np.pad(s_np, zrows))
    w = jnp.pad(w, (0, n_ext - n_fft))
    frames = _make_frames(x2, n_fft, hop, plan)
    n_rows = frames.shape[0]

    grid = (n_rows // tb, plan["n_f"])
    in_specs = [
        pl.BlockSpec((tb, n_ext), lambda r_, f_: (r_, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_ext), lambda r_, f_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_ext, ft), lambda r_, f_: (0, f_),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_ext, ft), lambda r_, f_: (0, f_),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ft, m_pad), lambda r_, f_: (f_, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((tb, m_pad), lambda r_, f_: (r_, 0),
                            memory_space=pltpu.VMEM)
    ri_spec = pl.BlockSpec((tb, ft), lambda r_, f_: (r_, f_),
                           memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        in_specs=in_specs,
        scratch_shapes=[pltpu.VMEM(
            (tb, n_ext),
            jnp.float32 if compute_dtype == "bf16x3" else compute_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * n_fft * plan["f_pad"] * 2
            + 2 * n_rows * plan["f_pad"] * m_pad,
            bytes_accessed=frames.size * 4 + n_rows * m_pad * 4,
            transcendentals=0),
        interpret=interpret,
    )
    args = (frames, w[None, :], c, s, fb_pad)
    if save_residuals:
        out, re, im = pl.pallas_call(
            functools.partial(_kernel_res, compute_dtype=compute_dtype,
                              dft_precision=dft_precision),
            out_specs=(out_spec, ri_spec, ri_spec),
            out_shape=(
                jax.ShapeDtypeStruct((n_rows, m_pad), jnp.float32),
                jax.ShapeDtypeStruct((n_rows, plan["f_pad"]), jnp.float32),
                jax.ShapeDtypeStruct((n_rows, plan["f_pad"]), jnp.float32),
            ),
            **common,
        )(*args)
        return out.reshape((b, plan["nfr_pad"], m_pad)), re, im
    out = pl.pallas_call(
        functools.partial(_kernel, compute_dtype=compute_dtype,
                          dft_precision=dft_precision),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, m_pad), jnp.float32),
        **common,
    )(*args)
    return out.reshape((b, plan["nfr_pad"], m_pad))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _dmel_from_window(x2, w, fb, n_fft, hop, interpret, compute_dtype):
    """(B, T), (n_fft,) padded window, (n_bins, M) fbank ->
    (B, nfr, M) mel power."""
    plan = _plan(x2.shape[1], n_fft, hop, fb.shape[1])
    fb_pad = jnp.pad(fb, ((0, plan["f_pad"] - fb.shape[0]),
                          (0, plan["m_pad"] - fb.shape[1])))
    out = _forward(x2, w, fb_pad, n_fft=n_fft, hop=hop, plan=plan,
                   interpret=interpret, compute_dtype=compute_dtype)
    return out[:, :plan["nfr"], :fb.shape[1]]


def _dmel_fwd(x2, w, fb, n_fft, hop, interpret, compute_dtype):
    plan = _plan(x2.shape[1], n_fft, hop, fb.shape[1])
    fb_pad = jnp.pad(fb, ((0, plan["f_pad"] - fb.shape[0]),
                          (0, plan["m_pad"] - fb.shape[1])))
    out, re, im = _forward(x2, w, fb_pad, n_fft=n_fft, hop=hop, plan=plan,
                           interpret=interpret,
                           compute_dtype=compute_dtype,
                           save_residuals=True)
    primal = out[:, :plan["nfr"], :fb.shape[1]]
    return primal, (x2, w, fb, re, im)


def _dmel_bwd(n_fft, hop, interpret, compute_dtype, res, g):
    """Adjoint chain in XLA reusing the kernel's saved Re/Im residuals
    (skips two full recompute GEMMs).  Precision follows the forward's
    compute mode: HIGHEST for f32, HIGH (bf16x3) otherwise."""
    x2, w, fb, re, im = res                     # re/im (n_rows, f_pad)
    b, t = x2.shape
    nfr = num_frames(t, hop)
    plan = _plan(t, n_fft, hop, fb.shape[1])
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.HIGH)

    # pad the cotangent to the kernel's padded layout (padded rows and
    # mel columns are zero => contribute nothing)
    g_pad = jnp.zeros((b, plan["nfr_pad"], plan["m_pad"]), g.dtype)
    g_pad = g_pad.at[:, :nfr, :fb.shape[1]].set(g)
    g2 = g_pad.reshape((-1, plan["m_pad"]))     # (n_rows, m_pad)

    fb_pad = jnp.pad(fb, ((0, plan["f_pad"] - fb.shape[0]),
                          (0, plan["m_pad"] - fb.shape[1])))
    dp = jnp.matmul(g2, fb_pad.T, precision=prec)   # (n_rows, f_pad)
    dre = 2.0 * re * dp
    dim = 2.0 * im * dp

    n_ext = plan["n_ext"]
    c, s = dft_matrices(n_fft, dtype=jnp.float32)
    zc = jnp.zeros((n_fft, plan["f_pad"] - c.shape[1]), c.dtype)
    c_pad = jnp.pad(jnp.concatenate([c, zc], axis=1),
                    ((0, n_ext - n_fft), (0, 0)))
    s_pad = jnp.pad(jnp.concatenate([s, zc], axis=1),
                    ((0, n_ext - n_fft), (0, 0)))
    frames = _make_frames(x2, n_fft, hop, plan)         # (n_rows, n_ext)

    dfw = (jnp.matmul(dre, c_pad.T, precision=prec)
           + jnp.matmul(dim, s_pad.T, precision=prec))  # (n_rows, n_ext)
    if USE_FUSED_BWD:
        # fully-fused dw kernel: measured ~4% slower than the big-GEMM
        # XLA adjoint at n_fft=1024 (small freq tiles lose more MXU
        # efficiency than the saved HBM traffic buys) — kept for larger
        # n_bins regimes and further tuning.
        dw = _bwd_dw_fused(g2, re, im, frames, fb_pad, c_pad, s_pad,
                           plan=plan, interpret=interpret,
                           compute_dtype=compute_dtype)[:n_fft]
    else:
        dw = jnp.sum(frames * dfw, axis=0)[:n_fft]

    # dx: dead-code-eliminated by XLA whenever x carries no cotangent —
    # i.e. in all training paths
    pad = n_fft // 2
    xp_shape = (b, t + 2 * pad)
    idx = (jnp.arange(nfr) * hop)[:, None] + jnp.arange(n_fft)[None, :]
    dfw_valid = dfw.reshape((b, plan["nfr_pad"], n_ext))[:, :nfr, :n_fft]
    dxp = jnp.zeros(xp_shape, x2.dtype).at[:, idx].add(dfw_valid * w)
    dx = dxp[:, pad:pad + t]

    p = re * re + im * im
    dfb_pad = jnp.matmul(p.T, g2, precision=prec)       # (f_pad, m_pad)
    dfb = dfb_pad[:fb.shape[0], :fb.shape[1]]
    return dx, dw, dfb


_dmel_from_window.defvjp(_dmel_fwd, _dmel_bwd)


def dmel_power(x, lambd, *, win_length: int, n_fft: int, hop_length: int,
               n_mels: int, sample_rate: int, f_min: float = 0.0,
               f_max: Optional[float] = None,
               normalize_window: bool = False,
               interpret: Optional[bool] = None,
               compute_dtype=jnp.float32) -> jnp.ndarray:
    """Fused mel power spectrogram ``(..., n_mels, n_frames)``.

    Numerically matches the XLA path (``ops.mel_spectrogram``) to the
    1e-4 feature gate; differentiable in ``lambd`` (via the window
    values) and ``x``.  Falls back to interpreter mode off-TPU so tests
    run on CPU.
    """
    if f_max is None:
        f_max = sample_rate // 2
    if interpret is None:
        interpret = not _on_tpu()
    orig_shape = x.shape
    x2 = x.reshape((-1, orig_shape[-1])).astype(jnp.float32)
    window = gaussian_window(lambd, win_length, norm=normalize_window,
                             dtype=jnp.float32)
    w = pad_window(window, n_fft)
    fb = melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate,
                         dtype=jnp.float32)
    cd = (compute_dtype if compute_dtype == "bf16x3"
          else jnp.dtype(compute_dtype))
    out = _dmel_from_window(x2, w, fb, n_fft, hop_length, interpret, cd)
    out = jnp.swapaxes(out, -1, -2)             # (B, M, nfr)
    return out.reshape(orig_shape[:-1] + out.shape[1:])
