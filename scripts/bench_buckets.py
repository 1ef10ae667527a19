"""Per-bucket throughput ladder: DMEL fwd+bwd across the production
power-of-2 window buckets {128, 512, 1024, 2048, 4096}, with in-run
torch-oracle parity for every timed candidate.

This is VERDICT r2 next-#1's deliverable: the reference's real
experiments run 300 ms init windows (search_spaces.py:29,61 — lambda =
400 -> optimized_window_length = 4096), where round 2 fell off the
fused-kernel cliff to ~5.1k audio-s/s on plain XLA FFT.  Round 3's
chunk-streamed specband kernel serves 2048/4096; this script measures
each bucket's production dispatch against the best XLA fallback.

Per bucket, lambda is the mid-bucket value win/10 (inside the bucket's
(win/12, win/6] production range and the specband truncation window).

Usage: python scripts/bench_buckets.py  [--iters-small N] (TPU)
Writes a markdown table to stdout; diagnostics to stderr.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, SR, HOP, N_MELS = 128, 40000, 8000, 80, 64
PARITY_B = 2
REPEATS = 3
BUCKETS = [128, 512, 1024, 2048, 4096]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def torch_oracle(x_np, n_fft, lam):
    from tests.reference_impl import torch_logmel_oracle
    return torch_logmel_oracle(x_np, lam, n_fft, HOP, N_MELS, SR)

def main():
    import jax
    import jax.numpy as jnp
    from dmel_tpu import ops

    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    log(f"backend: {backend}")
    rng = np.random.default_rng(0)
    rows = []

    only = {int(a) for a in sys.argv[1:]} or None
    for n_fft in BUCKETS:
        if only is not None and n_fft not in only:
            continue
        lam = n_fft / 10.0
        iters = 200 if n_fft <= 1024 else 50
        from dmel_tpu.ops import stft as stft_mod
        from dmel_tpu.ops.pallas import specband_dmel as sb

        def feat(impl_kwargs):
            def f(l, x):
                m = ops.mel_spectrogram(
                    x, l, n_mels=N_MELS, sample_rate=SR, hop_length=HOP,
                    optimized=True, window_length=n_fft, **impl_kwargs)
                return ops.accurate_log(m + 1e-10)
            return f

        candidates = {
            # the production auto dispatch (specband kernel at >= 1024
            # when the hint passes specband_ok; exact XLA below the
            # certified floor)
            "auto": feat(dict(impl="pallas", lambd_hint=lam)),
        }
        if n_fft <= 1024:
            candidates["xla-mp"] = feat(dict(
                method="matmul_ext_mp", precision=jax.lax.Precision.HIGH))
        else:
            # round-2's only option at these buckets (the cliff)
            candidates["xla-fft"] = feat(dict(method="fft"))

        x_par = rng.standard_normal((PARITY_B, T)).astype(np.float32)
        log(f"n_fft={n_fft}: torch oracle ...")
        ref_feat, ref_grad = torch_oracle(x_par, n_fft, lam)
        xj = jnp.asarray(x_par)

        for name, f in candidates.items():
            try:
                got = np.asarray(jax.jit(f)(jnp.float32(lam), xj))
                ferr = float(np.max(np.abs(got - ref_feat)))
                g = float(jax.jit(jax.grad(
                    lambda l, x: f(l, x).sum()))(jnp.float32(lam), xj))
                gerr = abs(g - ref_grad) / max(abs(ref_grad), 1e-30)

                loss = lambda l, x: f(l, x).sum()

                @jax.jit
                def run(x):
                    def body(i, acc):
                        return acc + jax.grad(loss)(
                            jnp.float32(lam) + i.astype(jnp.float32) * 1e-6,
                            x)
                    return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

                single = jax.jit(jax.grad(loss))
                x0 = jnp.asarray(
                    rng.standard_normal((B, T)).astype(np.float32))
                jax.block_until_ready(x0)
                refv = float(single(jnp.float32(lam), x0))
                float(run(x0))
                times = []
                for _ in range(REPEATS):
                    x = jnp.asarray(
                        rng.standard_normal((B, T)).astype(np.float32))
                    jax.block_until_ready(x)
                    t0 = time.time()
                    v = float(run(x))
                    dt = (time.time() - t0) / iters
                    expect = refv * iters
                    if np.isfinite(v) and (0.5 * abs(expect) <= abs(v)
                                           <= 2.0 * abs(expect)):
                        times.append(dt)
                    else:
                        log(f"  suspicious value {v} vs {expect}")
                if not times:
                    raise RuntimeError(
                        "no repeat passed the grad sanity window")
                med = float(np.median(times))
                aps = B * T / SR / med
                ok = ferr <= 1e-4 and gerr <= 1e-2
                log(f"  {name}: {med*1e3:.2f} ms/batch -> {aps:,.0f} "
                    f"audio-s/s | logmel={ferr:.2e} dlam={gerr:.2e} "
                    f"{'PASS' if ok else 'FAIL'}")
                rows.append(dict(n_fft=n_fft, lam=lam, path=name,
                                 ms=round(med * 1e3, 2),
                                 audio_s=round(aps),
                                 logmel_err=float(f"{ferr:.3e}"),
                                 dlam_rel=float(f"{gerr:.3e}"),
                                 parity_pass=ok))
            except Exception as e:
                log(f"  {name}: FAILED {type(e).__name__}: {e}")
                rows.append(dict(n_fft=n_fft, lam=lam, path=name,
                                 error=f"{type(e).__name__}: {e}"))

    print(json.dumps(rows, indent=1))
    print("\n| n_fft | lambda | path | ms/batch | audio-s/s | logmel err "
          "| dlam rel | gate |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['n_fft']} | {r['lam']:.1f} | {r['path']} | — | — "
                  f"| — | — | {r['error'][:40]} |")
        else:
            print(f"| {r['n_fft']} | {r['lam']:.1f} | {r['path']} | "
                  f"{r['ms']} | {r['audio_s']:,} | {r['logmel_err']:.1e} | "
                  f"{r['dlam_rel']:.1e} | "
                  f"{'PASS' if r['parity_pass'] else 'FAIL'} |")


if __name__ == "__main__":
    main()
