"""Measure the packed-trial (vmapped) train step with and without the
shared-hint specband dispatch (VERDICT r3 next #4's measurement).

The realistic Ray-packing analog is K concurrent seeds/repeats of ONE
search-space arm (the reference packs 4 trials per GPU,
/root/reference/main.py:131) — same init_lambd magnitude, so the pack
shares one static-switch region and fit_trials can ride the specband
kernel.  This times the esc50 flagship arm (PANNs CNN6, lambda=400 ->
bucket 4096, batch 32 x 5 s @ 8 kHz) as an ON-DEVICE scan of the
vmapped train step (fit()-level walls here are tunnel-transfer-bound,
CLAUDE.md), K = 4 trials, impl="pallas"+hint vs impl="xla".

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python scripts/bench_packed_pallas.py
Commit output to results/bench_packed_pallas_r4.txt (CLAUDE.md policy).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from dmel_tpu.models.registry import get_model_by_config
from dmel_tpu.parallel.trials import (_lr_tree, _shared_specband_hint,
                                      make_multitrial_step)

K, BATCH, T, SR = 4, 32, 40000, 8000
LAM = 400.0
STEPS = 20


def base_cfg(impl):
    return dict(model_name="panns_cnn6", dataset_name="esc50",
                n_mels=64, hop_length=80, energy_normalize=True,
                optimized=True, impl=impl, normalize_window=False,
                augment=False, pretrained=False, optimizer_name="adam",
                lr_model=1e-4, lr_tf=1.0, batch_size=BATCH,
                trainable=True, max_epochs=1, patience=100,
                resample_rate=SR, init_lambd=LAM, n_points=T,
                # round-5 production config (the esc50 space ships both)
                model_dtype="bfloat16", rng_impl="rbg")


def build(impl):
    from dmel_tpu.ops.spectrogram import bucketed_window_length
    cfg = base_cfg(impl)
    wl = bucketed_window_length(LAM, T)
    hint = _shared_specband_hint(cfg, wl, [LAM] * K)
    model = get_model_by_config(cfg, window_length=wl, lambd_hint=hint)
    sample = jnp.zeros((BATCH, T), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), K)
    variables = [model.init(k, sample) for k in keys]
    params = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[v["params"] for v in variables])
    batch_stats = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[v["batch_stats"] for v in variables])
    base_opt = optax.adam(1.0)
    opt_state = jax.vmap(base_opt.init)(params)
    lrs = [_lr_tree(variables[i]["params"], 1.0, 1e-4) for i in range(K)]
    lrs = jax.tree.map(lambda *xs: jnp.asarray(xs, jnp.float32), *lrs)
    step = make_multitrial_step(model, base_opt, True, 50)
    return wl, hint, step, params, opt_state, batch_stats, lrs


def bench(impl):
    wl, hint, step, params, opt_state, batch_stats, lrs = build(impl)
    print(f"impl={impl}: bucket wl={wl}, shared hint={hint}", flush=True)
    rng = np.random.default_rng(0)
    rngs = jax.random.split(jax.random.PRNGKey(1), K)
    active = jnp.ones((K,), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 50, (K, BATCH)).astype(np.int32))
    mask = jnp.ones((K, BATCH), jnp.float32)

    @jax.jit
    def run(params, opt_state, batch_stats, rngs, xs):
        def body(carry, _):
            params, opt_state, batch_stats, rngs = carry
            params, opt_state, batch_stats, rngs, m = step(
                params, opt_state, batch_stats, lrs, active, rngs, xs,
                ys, mask)
            return (params, opt_state, batch_stats, rngs), m["loss"]
        carry, losses = jax.lax.scan(
            body, (params, opt_state, batch_stats, rngs), None,
            length=STEPS)
        return carry[0]["spectrogram_layer"]["lambd"], losses[-1]

    times = []
    for rep in range(3):
        xs = jnp.asarray(rng.standard_normal(
            (K, BATCH, T)).astype(np.float32))
        jax.block_until_ready(xs)
        t0 = time.time()
        lam, loss = run(params, opt_state, batch_stats, rngs, xs)
        lam = np.asarray(lam)
        dt = (time.time() - t0) / STEPS
        assert np.all(np.isfinite(np.asarray(loss))), "non-finite loss"
        if rep > 0:          # rep 0 pays the compile
            times.append(dt)
    med = float(np.median(times))
    audio = K * BATCH * T / SR
    print(f"impl={impl}: {med*1e3:8.2f} ms/packed-step "
          f"({audio/med:,.0f} audio-s/s through training, K={K}), "
          f"final lambdas {np.asarray(lam).ravel()}", flush=True)
    return med


def main():
    t_x = bench("xla")
    t_p = bench("pallas")
    print(f"\npacked esc50 arm (K={K}, bucket 4096): pallas "
          f"{t_x/t_p:.2f}x faster than xla ({t_x*1e3:.1f} -> "
          f"{t_p*1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
