"""Bisect the hiprec-512 hardware-vs-interpret divergence at FIXED
operands (round-4 follow-up to diag_hiprec_512: the excess is
kernel-level, identical eager/jit — locate WHICH in-kernel product
diverges between Mosaic and interpret).

Method: build x / window-taps tmat once in NUMPY (bit-identical
operands on both backends), call the kernel's private forward
(_specband_fwd) on the TPU and in CPU interpret mode, and compare
BOTH outputs per ablation:

  xres (the bf16 spectra residual)  -> isolates base/delta/rotation
  mel                               -> adds band conv + mel GEMM
  xres with _ABLATE={'nodelta'}     -> pure base GEMM spectra

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_512_bisect.py
Commit output to results/diag_512_bisect_r4.txt (CLAUDE.md policy).

FINDING (round 4, results/diag_512_bisect_r4.txt): interpret mode is
NOT a valid oracle on the TPU backend.  The interpret lowering stages
the kernel's jnp body — including the in-kernel _split_hi_lo /_lo2
compensated splits — into a regular XLA-TPU program, where
--xla_allow_excess_precision elides the bf16 roundings and zeroes the
correction planes (the same rewrite class as the round-2 tap-split and
round-3 constant-split findings).  Measured: interpret-on-TPU diverges
from the COMPILED Mosaic kernel by 3.5e-2 logmel at fixed operands —
two orders beyond the 1.6e-4 hardware excess being bisected — while
CPU interpret matches the oracle at 4e-5.  Rule recorded: interpret
parity numbers must be produced on CPU; any future 512 bisect needs a
kernel debug output of the f32 spectra (pre-bf16-residual) compared
against the HIGHEST XLA reference on the same chip.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, SR, HOP, NM, WIN = 4, 40000, 8000, 80, 64, 512
LAM = 40.0


def np_tmat(lam, n_fft, j_taps):
    """window_taps_sym + band_matrix in float64 numpy -> f32 bits."""
    m = np.arange(n_fft, dtype=np.float64)
    w = np.exp(-0.5 * ((m - n_fft / 2) / (abs(lam) + 1e-15)) ** 2)
    mm = m[:, None] - n_fft / 2.0
    d = np.arange(j_taps + 1)[None, :]
    cb = np.cos(2.0 * np.pi * mm * d / n_fft)
    rho_pos = (w[None, :] @ cb)[0] / n_fft
    rho = np.concatenate([rho_pos[:0:-1], rho_pos])
    width = 128 + 2 * j_taps
    u = np.arange(width)[:, None]
    v = np.arange(128)[None, :]
    idx = v - u + 2 * j_taps
    valid = (idx >= 0) & (idx <= 2 * j_taps)
    t = np.where(valid, rho[np.clip(idx, 0, 2 * j_taps)], 0.0)
    return t.astype(np.float32)


def run_backend(x_np, tmat_np, j, ablate, interpret):
    import jax
    import jax.numpy as jnp
    from dmel_tpu.ops.pallas import specband_dmel as sb
    sb._ABLATE = frozenset(ablate)
    try:
        def f(x, tmat):
            mel, (xres, *_rest) = sb._specband_fwd(
                x, tmat, WIN, HOP, j, (NM, SR, 0.0, SR // 2),
                interpret, 2)
            return mel, xres
        mel, xres = jax.jit(f)(jnp.asarray(x_np), jnp.asarray(tmat_np))
        return (np.asarray(mel, np.float32),
                np.asarray(xres.astype(jnp.float32)))
    finally:
        sb._ABLATE = frozenset()


def main():
    import jax
    from dmel_tpu.ops import stft as stft_mod
    j = stft_mod.specband_j_taps(LAM, WIN)
    print(f"lam={LAM} win={WIN} J={j} lowbin_fix=2 (hiprec)", flush=True)
    rng = np.random.default_rng(7)
    x_np = rng.standard_normal((B, T)).astype(np.float32)
    tmat_np = np_tmat(LAM, WIN, j)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    assert on_tpu, "run on the TPU backend"

    for abl, what in [((), "full"), (("nodelta",), "base-only spectra"),
                      (("norot",), "no rotation")]:
        mel_t, xres_t = run_backend(x_np, tmat_np, j, abl, False)
        mel_i, xres_i = run_backend(x_np, tmat_np, j, abl, True)
        xerr = float(np.max(np.abs(xres_t - xres_i)))
        xrel = float(np.max(np.abs(xres_t - xres_i))
                     / max(np.max(np.abs(xres_i)), 1e-30))
        lm_t = np.log(np.maximum(mel_t, 0) + 1e-10)
        lm_i = np.log(np.maximum(mel_i, 0) + 1e-10)
        merr = float(np.max(np.abs(lm_t - lm_i)))
        print(f"[{what:18s}] xres max-abs {xerr:.3e} (rel {xrel:.3e})  "
              f"logmel max-abs {merr:.3e}", flush=True)


if __name__ == "__main__":
    main()
