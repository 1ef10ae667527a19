"""Hardware probe of the full-f32 (hiprec) framed kernel at the
floored small buckets (VERDICT r4 next #3).

Round-4 left lambda <= win/12 at 512 and the whole 256 bucket on the
matmul_ext_mp XLA floor: the bf16-split framed kernel measured
3.9e-4 - 1.5e-3 there (results/certify_ladder_r4_512framed.txt) and
explicit split ladders could not close it.  The hiprec route removes
the splits entirely (f32 operands, Mosaic-native f32 HIGHEST GEMMs).

This probe certifies the EXPLICIT kernel (parity vs fresh torch
oracles, through jit) across the deep-fade range AND times it against
the current floor, before any dispatch change.  Commit output as
results/probe_framed_hiprec_r5.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B, T, SR, HOP, N_MELS = 4, 40000, 8000, 80, 64
TB = 128                   # timing batch
ITERS = 200


def main():
    import jax
    import jax.numpy as jnp

    from dmel_tpu import ops
    from dmel_tpu.ops.pallas import framed_dmel as fd
    from tests.reference_impl import torch_logmel_oracle

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(11)
    x_np = rng.standard_normal((B, T)).astype(np.float32)
    xj = jnp.asarray(x_np)

    # ---- parity: deep-fade 512 + whole 256 bucket -------------------
    cases = [(512, lam) for lam in (13.3, 20.0, 30.0, 36.0, 40.0, 42.0)]
    cases += [(256, lam) for lam in (12.0, 16.5, 21.3, 24.0, 31.9, 42.0)]
    fails = 0
    for win, lam in cases:
        def feat(l, x, _win=win):
            w = ops.gaussian_window(jnp.abs(l), _win)
            m = fd.framed_mel_power(
                x - x.mean(-1, keepdims=True), w, n_fft=_win,
                hop_length=HOP, n_mels=N_MELS, sample_rate=SR,
                hiprec=True)
            return ops.accurate_log(m + 1e-10)

        ref_feat, ref_grad = torch_logmel_oracle(x_np, lam, win, HOP,
                                                 N_MELS, SR)
        got = np.asarray(jax.jit(feat)(jnp.float32(lam), xj))
        g = float(jax.jit(jax.grad(
            lambda l, x: feat(l, x).sum()))(jnp.float32(lam), xj))
        ferr = float(np.max(np.abs(got - ref_feat)))
        gerr = abs(g - ref_grad) / max(abs(ref_grad), 1e-30)
        ok = ferr <= 1e-4 and gerr <= 1e-3
        fails += not ok
        print(f"hiprec win={win:4d} lambda={lam:6.1f}: "
              f"logmel_err={ferr:.2e} dlambda_rel={gerr:.2e} "
              f"{'PASS' if ok else 'FAIL'}", flush=True)

    # ---- throughput vs the matmul_ext_mp floor ----------------------
    def measure(feat, lam):
        @jax.jit
        def run(x):
            def body(i, acc):
                g = jax.grad(lambda l, xx: feat(l, xx).sum())(
                    lam + i.astype(jnp.float32) * 1e-6, x)
                return acc + g
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        x = jnp.asarray(rng.standard_normal((TB, T)).astype(np.float32))
        jax.block_until_ready(x)
        float(run(x))                         # compile
        best = float("inf")
        for _ in range(3):
            x = jnp.asarray(rng.standard_normal((TB, T)).astype(
                np.float32))
            jax.block_until_ready(x)
            t0 = time.time()
            v = float(run(x))
            if np.isfinite(v):
                best = min(best, (time.time() - t0) / ITERS)
        return best

    audio = TB * T / SR
    for win, lam in [(512, 36.0), (256, 31.9)]:
        def hp(l, x, _win=win):
            w = ops.gaussian_window(jnp.abs(l), _win)
            m = fd.framed_mel_power(
                x - x.mean(-1, keepdims=True), w, n_fft=_win,
                hop_length=HOP, n_mels=N_MELS, sample_rate=SR,
                hiprec=True)
            return ops.accurate_log(m + 1e-10)

        def floor(l, x, _win=win):
            m = ops.mel_spectrogram(
                x, l, n_mels=N_MELS, sample_rate=SR, hop_length=HOP,
                optimized=True, window_length=_win,
                method="matmul_ext_mp",
                precision=jax.lax.Precision.HIGH)
            return ops.accurate_log(m + 1e-10)

        dt_h = measure(hp, jnp.float32(lam))
        dt_f = measure(floor, jnp.float32(lam))
        print(f"win={win} lambda={lam}: hiprec {dt_h * 1e3:.3f} ms "
              f"({audio / dt_h:,.0f} audio-s/s) vs floor "
              f"{dt_f * 1e3:.3f} ms ({audio / dt_f:,.0f}) -> "
              f"{(dt_f / dt_h - 1) * 100:+.1f}%", flush=True)

    print("FAILED" if fails else "all hiprec probe cases PASS")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
