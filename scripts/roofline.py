"""Roofline / MFU analysis of the specband kernel (VERDICT r2 next #5).

Counts the MXU-pass MACs, VPU flops and HBM bytes of the specband
fwd+bwd analytically from the kernel plan (every term cites the code
path in ops/pallas/specband_dmel.py), then combines them with measured
per-batch times to report arithmetic intensity, achieved TFLOP/s and
% of v5e peak — and states what bounds the remaining gap.

v5e public peaks: 197 TFLOP/s bf16 (MXU), ~0.8 TB/s HBM.  A bf16x3
compensated GEMM costs 3 MXU passes per real output; passes are what
the MXU executes, so "achieved TFLOP/s" below counts PASS-MACs x 2
(the number a kernel at 100% MXU utilization would hit 197 with).

Run: python scripts/roofline.py   (pure host math, no TPU needed)
"""
import sys
import os
from math import gcd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dmel_tpu.ops.pallas import specband_dmel as sb
from dmel_tpu.ops import stft as stft_mod

LANE, MEL_PAD = 128, 128
PEAK_BF16 = 197e12          # v5e MXU, bf16
HBM_BW = 0.819e12           # bytes/s

# measured fwd+bwd ms/batch on v5e (B=128 x 5 s @ 8 kHz, hop 80,
# 64 mels; RTT-amortized on-device loops, this round's runs)
MEASURED = {
    # A/B-adopted geometries (round 3) + round-4 levers: stacked bwd
    # (nt_g <= 8), frame-order IO (<=1024), folded base (2048/4096) —
    # results/{diag_1024_residual,ab_folded}_r4.txt
    1024: dict(lam=128.0, ms=2.312),   # bench headline (J=24, chain=2,
                                       # + frame-order IO)
    2048: dict(lam=204.8, ms=4.267),   # rows=512, chain=2 (J=12, folded)
    4096: dict(lam=409.6, ms=8.955),   # rows=512, chain=2 (J=12, folded)
}
B, T, SR, HOP, N_MELS = 128, 40000, 8000, 80, 64


def count(n_fft, lam):
    j = stft_mod.specband_j_taps(lam, n_fft)
    k_sig = 1
    rows, chain, chunk = sb._geom(n_fft, HOP, k_sig)
    (g, gr, hop_ext, l_row, n_bins, k_ext, nt, kpad, nyq,
     nt_g) = sb._plan(n_fft, HOP, j, rows, chain)
    width = LANE + 2 * j
    nfr = T // HOP + 1
    ngrp = -(-nfr // g)
    nblk = -(-ngrp // gr)
    blocks = B * nblk
    f = {}
    # ---- forward MXU pass-MACs per block (_fwd_kernel/_fwd_rest) ----
    # folded base (FOLDED_BASE_NFFTS): e@ce + o@se at K = n_fft/2+1
    folded = n_fft in sb.FOLDED_BASE_NFFTS
    base_k = (n_fft // 2 + 1) if folded else n_fft
    f["base (bf16x3 re+im)"] = gr * base_k * kpad * 6
    f["deltas (bf16x3 re+im)"] = (g - 1) * gr * LANE * kpad * 6
    f["band conv (bf16x3 re+im)"] = nt_g * rows * width * LANE * 6
    f["mel GEMM (bf16x4)"] = nt_g * rows * (k_sig * LANE) * MEL_PAD * 4
    fwd = sum(f.values())
    # ---- backward MXU pass-MACs per block (_bwd_kernel) ----
    bwd_t = {
        "dp = dmel @ fbt (bf16)": nt_g * rows * MEL_PAD * (k_sig * LANE),
        "sre/sim recompute (bf16)": nt_g * 2 * rows * width * LANE,
        "dT accumulation (bf16)": nt_g * 2 * rows * width * (k_sig * LANE),
    }
    bwd = sum(bwd_t.values())
    # ---- VPU flops per block (rotation chain + power + nyquist) ----
    vpu = (g - 1) * gr * kpad * 6 + nt_g * rows * LANE * 3 \
        + (rows * LANE * 8 if nyq else 0)
    # ---- HBM bytes per batch ----
    bytes_fwd = (
        B * nblk * gr * l_row * 4              # xg full view (f32)
        # base operand: chunked xg view, or the folded [e|o] planes
        # (built in XLA: one extra write + kernel read)
        + (3 if folded else 1) * B * nblk * gr * 2
        * (base_k if folded else n_fft // 2) * 4
        + 4 * base_k * kpad * 2 * 2            # resident bases hi+lo, once
        + B * nblk * rows * 2 * kpad * 2       # xres write (bf16)
        + B * nblk * rows * MEL_PAD * 4        # mel write (f32)
        + B * T * 4 * 2)                       # x read + xg build write
    bytes_bwd = (
        B * nblk * rows * 2 * kpad * 2         # xres read
        + B * nblk * rows * MEL_PAD * 4 * 3    # dmel pad/transpose traffic
        + B * nblk * width * (k_sig * LANE) * 4)  # dt partials
    return dict(j=j, rows=rows, chain=chain, g=g, gr=gr, kpad=kpad,
                nt_g=nt_g, blocks=blocks, fwd_per_block=fwd,
                bwd_per_block=bwd, vpu_per_block=vpu, f_terms=f,
                b_terms=bwd_t, bytes_total=bytes_fwd + bytes_bwd)


def main():
    audio_s = B * T / SR
    for n_fft, meas in MEASURED.items():
        c = count(n_fft, meas["lam"])
        pass_macs = (c["fwd_per_block"] + c["bwd_per_block"]) * c["blocks"]
        pass_flops = 2 * pass_macs
        t = meas["ms"] * 1e-3
        tflops = pass_flops / t / 1e12
        ai = pass_flops / c["bytes_total"]
        print(f"\n=== n_fft={n_fft} lam={meas['lam']} (J={c['j']}, "
              f"chain={c['chain']}, g_eff={c['g']}, rows={c['rows']}, "
              f"kpad={c['kpad']}) ===")
        for k, v in c["f_terms"].items():
            share = v / c["fwd_per_block"]
            print(f"  fwd {k:28s} {share:6.1%} of fwd pass-MACs")
        print(f"  fwd/bwd pass-MAC split: "
              f"{c['fwd_per_block']/(c['fwd_per_block']+c['bwd_per_block']):.0%}"
              f"/{c['bwd_per_block']/(c['fwd_per_block']+c['bwd_per_block']):.0%}")
        print(f"  total pass-FLOPs/batch: {pass_flops/1e12:.3f} T   "
              f"HBM bytes/batch: {c['bytes_total']/1e6:.0f} MB   "
              f"AI: {ai:.0f} FLOP/B")
        print(f"  measured {meas['ms']:.2f} ms/batch -> "
              f"{audio_s/t:,.0f} audio-s/s | achieved {tflops:.1f} "
              f"TFLOP/s = {tflops/197:.1%} of v5e bf16 peak")
        print(f"  HBM-bound floor: {c['bytes_total']/HBM_BW*1e3:.2f} ms "
              f"({c['bytes_total']/HBM_BW/t:.1%} of measured)")


if __name__ == "__main__":
    main()
