"""A/B specband block-geometry variants on hardware (fwd+bwd timing,
RTT-amortized loop) — used to pick (rows, chain, chunk) per n_fft.

Each variant monkeypatches specband_dmel._geom, re-times the production
dispatch, and checks the result against the baseline variant's value.
Run: python scripts/ab_specband_geom.py [n_fft ...]
"""
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dmel_tpu import ops
from dmel_tpu.ops.pallas import specband_dmel as sb

B, T, SR, HOP, NM = 128, 40000, 8000, 80, 64

#: variants per n_fft: (rows, chain, chunk) — chunk = n_fft keeps the
#: bases resident; vmem budgets are set inside the kernel call
VARIANTS = {
    1024: [("r512.c2 (prod)", (512, 2, 1024)),
           ("r512.c1 (prod when lowbin)", (512, 1, 1024)),
           ("r512.c4", (512, 4, 1024))],
    2048: [("r512.c2 (prod)", (512, 2, 2048)),
           ("r256.c2", (256, 2, 2048)),
           ("r256.c4", (256, 4, 2048)),
           ("r512.c4", (512, 4, 2048)),
           ("r1024.c2", (1024, 2, 2048))],
    4096: [("r512.c2 (prod)", (512, 2, 4096)),
           ("r512.c4", (512, 4, 4096)),
           ("r768.c4", (768, 4, 4096)),
           ("r1024.c4", (1024, 4, 4096)),
           ("r256.c4", (256, 4, 4096))],
}
LAMS = {1024: 128.0, 2048: 204.8, 4096: 409.6}


def measure(n_fft, lam, iters):
    def feat(l, x):
        m = ops.mel_spectrogram(x, l, n_mels=NM, sample_rate=SR,
                                hop_length=HOP, optimized=True,
                                window_length=n_fft, impl="pallas",
                                lambd_hint=lam)
        return ops.accurate_log(m + 1e-10)

    loss = lambda l, x: feat(l, x).sum()

    @jax.jit
    def run(x):
        def body(i, acc):
            return acc + jax.grad(loss)(
                jnp.float32(lam) + i.astype(jnp.float32) * 1e-6, x)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    jax.block_until_ready(x0)
    single = jax.jit(jax.grad(loss))
    ref = float(single(jnp.float32(lam), x0))
    float(run(x0))
    times = []
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
        jax.block_until_ready(x)
        t0 = time.time()
        v = float(run(x))
        dt = (time.time() - t0) / iters
        ok = (np.isfinite(v)
              and 0.5 * abs(ref * iters) <= abs(v) <= 2 * abs(ref * iters))
        if ok:
            times.append(dt)
    if not times:
        raise RuntimeError("no repeat passed the grad sanity window "
                           "(wedged relay / garbage recompile?)")
    return float(np.median(times)), ref


#: multi-sigma (K=3) variants — the round-2 rows=256 default predates
#: the raised-VMEM-budget finding; re-try larger blocks per VERDICT r3
#: next #5.  Lambda triples = the certified K=3 ladder rungs.
VARIANTS_K3 = {
    1024: [("r256.c1 (prod)", (256, 1, 1024)),
           ("r512.c1", (512, 1, 1024)),
           ("r512.c2", (512, 2, 1024)),
           ("r256.c2", (256, 2, 1024))],
    2048: [("r128.c2 (prod)", (128, 2, 2048)),
           ("r256.c2", (256, 2, 2048)),
           ("r512.c2", (512, 2, 2048)),
           ("r256.c4", (256, 4, 2048))],
    4096: [("r128.c2 (prod eff)", (128, 2, 4096)),
           ("r256.c4", (256, 4, 4096)),
           ("r256.c2", (256, 2, 4096)),
           ("r512.c4", (512, 4, 4096)),
           ("r512.c2", (512, 2, 4096))],
}
LAMS_K3 = {1024: (100.0, 115.0, 128.0),
           2048: (180.0, 204.8, 240.0),
           4096: (360.0, 409.6, 480.0)}


def measure_multi(n_fft, lams, iters):
    from dmel_tpu.ops import dmel as dmel_mod
    band_map = dmel_mod.default_band_map(NM, len(lams))

    def feat(ls, x):
        m = dmel_mod.multi_sigma_mel_spectrogram(
            x, ls, n_mels=NM, sample_rate=SR, hop_length=HOP,
            optimized=True, window_length=n_fft, impl="pallas",
            lambd_hint=list(lams), band_map=band_map)
        return ops.accurate_log(m + 1e-10)

    loss = lambda ls, x: feat(ls, x).sum()
    l0 = jnp.asarray(lams, jnp.float32)

    @jax.jit
    def run(x):
        def body(i, acc):
            g = jax.grad(loss)(l0 + i.astype(jnp.float32) * 1e-6, x)
            return acc + g.sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    jax.block_until_ready(x0)
    ref = float(jax.jit(lambda x: jax.grad(loss)(l0, x).sum())(x0))
    float(run(x0))
    times = []
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
        jax.block_until_ready(x)
        t0 = time.time()
        v = float(run(x))
        dt = (time.time() - t0) / iters
        ok = (np.isfinite(v)
              and 0.5 * abs(ref * iters) <= abs(v) <= 2 * abs(ref * iters))
        if ok:
            times.append(dt)
    if not times:
        raise RuntimeError("no repeat passed the grad sanity window")
    return float(np.median(times)), ref


def main():
    args = [a for a in sys.argv[1:]]
    multi = "--multi" in args
    nffts = [int(a) for a in args if a != "--multi"] or [4096, 2048, 1024]
    orig = sb._geom
    variants = VARIANTS_K3 if multi else VARIANTS
    for n_fft in nffts:
        lam = LAMS[n_fft]
        iters = 200 if n_fft <= 1024 else 50
        if multi:
            iters = max(iters // 2, 25)
        base_ref = None
        for name, geom in variants[n_fft]:
            g0 = 128 // np.gcd(HOP, 128)
            rows, chain, chunk = geom
            if rows % (g0 * chain):
                print(f"n_fft={n_fft} {name}: skipped (rows % g_eff)")
                continue
            sb._geom = lambda n, h, k, *a, _g=geom, **kw: _g
            try:
                if multi:
                    med, ref = measure_multi(n_fft, LAMS_K3[n_fft], iters)
                else:
                    med, ref = measure(n_fft, lam, iters)
                drift = ((abs(ref - base_ref)
                          / max(abs(base_ref), 1e-30))
                         if base_ref is not None else 0.0)
                if base_ref is None:
                    base_ref = ref
                print(f"n_fft={n_fft} {name}: {med*1e3:.2f} ms/batch -> "
                      f"{B*T/SR/med:,.0f} audio-s/s  "
                      f"(grad drift vs first: {drift:.2e})", flush=True)
            except Exception as e:
                print(f"n_fft={n_fft} {name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
            finally:
                sb._geom = orig


if __name__ == "__main__":
    main()
