"""Apportion the 1024-bucket residual-to-peak by MEASUREMENT
(VERDICT r3 next #3: the 53%-of-peak attribution was model-only).

Times the production specband dispatch at the headline geometry
(n_fft=1024, hop 80, lambda=128 -> J=24, chain=2, rows=512) with
single kernel components no-op'd via specband_dmel._ABLATE
(trace-time static; outputs are numerically wrong by construction —
the deltas are TIMING attribution only):

    full fwd+bwd        the bench number
    fwd only            splits the backward kernel + dmel epilogue
    fwd - norot         cost of the VPU recurrence rotation chain
    fwd - nodelta       rotation + the 15 per-phase delta GEMMs
    fwd - nonyq         cost of the f32 Nyquist VPU tap-reduction
    fwd - nores         cost of the bf16 residual write (HBM store)
    fwd - nomel         band conv + power + mel tile loop (leaves the
                        spectra: base GEMM + deltas + rotation)

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python scripts/diag_1024_residual.py
Per CLAUDE.md policy, commit the output to results/diag_1024_residual_r4.txt.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dmel_tpu import ops
from dmel_tpu.ops.pallas import specband_dmel as sb

B, T, SR, HOP, NM, NFFT = 128, 40000, 8000, 80, 64, 1024
LAM = 128.0
ITERS = 200


def timed(make_run):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    jax.block_until_ready(x0)
    run = make_run()
    v0 = float(run(x0))
    assert np.isfinite(v0), "non-finite output"
    times = []
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
        jax.block_until_ready(x)
        t0 = time.time()
        v = float(run(x))
        dt = (time.time() - t0) / ITERS
        if np.isfinite(v):
            times.append(dt)
    return float(np.median(times))


def feat(l, x):
    m = ops.mel_spectrogram(x, l, n_mels=NM, sample_rate=SR,
                            hop_length=HOP, optimized=True,
                            window_length=NFFT, impl="pallas",
                            lambd_hint=LAM)
    return ops.accurate_log(m + 1e-10)


def make_fwd():
    @jax.jit
    def run(x):
        def body(i, acc):
            return acc + feat(jnp.float32(LAM)
                              + i.astype(jnp.float32) * 1e-6, x).sum()
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return run


def make_fwdbwd():
    loss = lambda l, x: feat(l, x).sum()

    @jax.jit
    def run(x):
        def body(i, acc):
            return acc + jax.grad(loss)(
                jnp.float32(LAM) + i.astype(jnp.float32) * 1e-6, x)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return run


def main():
    print(f"geometry: n_fft={NFFT} hop={HOP} lambda={LAM} B={B} T={T} "
          f"iters={ITERS}", flush=True)
    full_fb = timed(make_fwdbwd)
    print(f"full fwd+bwd : {full_fb*1e3:7.3f} ms/batch "
          f"({B*T/SR/full_fb:,.0f} audio-s/s)", flush=True)
    full_f = timed(make_fwd)
    print(f"fwd only     : {full_f*1e3:7.3f} ms/batch  "
          f"(bwd+epilogue = {1e3*(full_fb-full_f):.3f} ms)", flush=True)
    rows = []
    for ab in ("norot", "nodelta", "nonyq", "nores", "nomel"):
        sb._ABLATE = frozenset({ab})
        try:
            t = timed(make_fwd)
            rows.append((ab, t))
            print(f"fwd -{ab:8s}: {t*1e3:7.3f} ms/batch  "
                  f"(component = {1e3*(full_f-t):+.3f} ms)", flush=True)
        except Exception as e:
            print(f"fwd -{ab:8s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
        finally:
            sb._ABLATE = frozenset()

    # MXU pass floor at this geometry (roofline.py accounting): fwd
    # pass-FLOPs at J=24/chain=2 -> time at 197 TFLOP/s peak
    print("\nattribution vs the fwd MXU-pass floor is computed in "
          "PERF.md from these numbers + scripts/roofline.py", flush=True)


if __name__ == "__main__":
    main()
