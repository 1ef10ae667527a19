"""Same-session A/B of the fused in-kernel log epilogue (round 5).

Times the specband production dispatch at the bench geometry with the
log computed (a) in-kernel (log_epilogue) vs (b) in XLA
(accurate_log(power + eps)) — same session, same inputs, RTT-amortized
fori_loop like bench.py, so the comparison is not polluted by the
session-to-session ±1% the bench headline swings by.

Run on TPU; commit as results/ab_fused_log_r5.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B, T, SR, HOP, N_MELS = 128, 40000, 8000, 80, 64
ITERS = 200
REPEATS = 5


def main():
    import jax
    import jax.numpy as jnp

    from dmel_tpu import ops

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)

    def measure(feat, lambd, win):
        @jax.jit
        def run(x):
            def body(i, acc):
                g = jax.grad(lambda l, xx: feat(l, xx, win).sum())(
                    lambd + i.astype(jnp.float32) * 1e-6, x)
                return acc + g
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        def fresh():
            x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
            jax.block_until_ready(x)
            return x

        x0 = fresh()
        ref = float(jax.jit(jax.grad(
            lambda l, xx: feat(l, xx, win).sum()))(jnp.float32(lambd), x0))
        float(run(x0))                        # compile
        times = []
        for _ in range(REPEATS):
            x = fresh()
            t0 = time.time()
            v = float(run(x))
            dt = (time.time() - t0) / ITERS
            expect = ref * ITERS
            if np.isfinite(v) and 0.5 * abs(expect) <= abs(v) <= \
                    2.0 * abs(expect):
                times.append(dt)
            else:
                print(f"  suspicious value {v} (expect ~{expect})")
        return float(np.median(times)), min(times), max(times)

    def fused(l, x, win):
        return ops.log_mel_spectrogram(
            x, l, n_mels=N_MELS, sample_rate=SR, hop_length=HOP,
            optimized=True, window_length=win, impl="pallas",
            lambd_hint=LAM[0])

    def xla_log(l, x, win):
        m = ops.mel_spectrogram(
            x, l, n_mels=N_MELS, sample_rate=SR, hop_length=HOP,
            optimized=True, window_length=win, impl="pallas",
            lambd_hint=LAM[0])
        return ops.accurate_log(m + 1e-10)

    cases = [(1024, 128.0), (2048, 204.8), (4096, 400.0)]
    if len(sys.argv) > 1:                      # optional win filter
        keep = {int(a) for a in sys.argv[1:]}
        cases = [c for c in cases if c[0] in keep]
    LAM = [None]             # static hint for the closures above
    for win, lam in cases:
        LAM[0] = lam
        med_a, lo_a, hi_a = measure(xla_log, lam, win)
        med_b, lo_b, hi_b = measure(fused, lam, win)
        audio = B * T / SR
        print(f"win={win} lambda={lam}:")
        print(f"  xla-log : {med_a * 1e3:.3f} ms [{lo_a * 1e3:.3f}-"
              f"{hi_a * 1e3:.3f}] -> {audio / med_a:,.0f} audio-s/s")
        print(f"  fused   : {med_b * 1e3:.3f} ms [{lo_b * 1e3:.3f}-"
              f"{hi_b * 1e3:.3f}] -> {audio / med_b:,.0f} audio-s/s "
              f"({(med_a / med_b - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
