"""Steady-state end-to-end train-step benchmark (flagship = esc50).

The product is the *training step* — DMEL front-end + PANNs CNN6
fwd+bwd + Adam — at the reference's esc50 configuration
(/root/reference/doit.sh:7 + main.py:131: the 16 h sweep whose step
rate sets total wall).  This script measures it the only way that is
valid through the tunneled TPU (CLAUDE.md gotchas):

- RTT amortization: S train steps run as ONE dispatched jitted
  program (`lax.scan` threading params/opt_state/batch_stats/rng);
  per-step inputs are generated on-device from the carried rng, so no
  host transfer and no relay round-trip rides the timer.
- Fixed-overhead cancellation: each case is timed at two scan lengths
  and the per-step time is the slope (t_long - t_short)/(S_long -
  S_short) — the ~27 ms relay dispatch overhead cancels exactly.
- Memoization defense: the rng key input differs per repeat, and the
  per-step losses are validated finite + actually-moving.

Per-component breakdown by ablation (VERDICT r4 next #1):
  full      = DMEL(front-end, impl per row) + CNN6 fwd+bwd + Adam
  cnn6-only = identical CNN6 train step on a fixed precomputed
              log-mel feature tensor (no front-end, no lambd param)
  dmel-only = front-end fwd + dlambd bwd alone at the same batch
  full - cnn6-only ~ front-end share incl. the classifier<->front-end
  coupling (transpose, s-cotangent materialization, optimizer glue).

Writes results to stdout; commit the run as results/bench_train_r<N>.txt
per the round-4 artifact policy.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PEAK_BF16 = 197e12          # v5e MXU peak (PERF.md roofline)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--short", type=int, default=8)
    parser.add_argument("--long", type=int, default=32)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--rows", default="all",
                        help="comma-set of row keys to run (default all)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from dmel_tpu import models
    from dmel_tpu.ops.spectrogram import optimized_window_length
    from dmel_tpu.ops.stft import pallas_compile_hint
    from dmel_tpu.training.optim import build_optimizer
    from dmel_tpu.training.train import (bce_loss, make_eval_step,
                                         make_train_step)

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    print(f"scan lengths: short={args.short} long={args.long}  "
          f"repeats={args.repeats}")

    # ---- the reference's esc50 flagship config (doit.sh:7) ----------
    esc50 = dict(
        model_name="panns_cnn6", dataset_name="esc50",
        init_lambd=8000 * 0.035 / 6, n_points=40000, hop_length=80,
        optimized=True, normalize_window=False, n_mels=64,
        resample_rate=8000, energy_normalize=True, augment=False,
        optimizer_name="adam", lr_model=1e-4, lr_tf=1.0,
        trainable=True, batch_size=32)
    audio_mnist = dict(
        model_name="mel_linear_net", dataset_name="audio_mnist",
        init_lambd=8000 * 0.035 / 6, n_points=8000, hop_length=80,
        optimized=True, normalize_window=False, n_mels=64,
        resample_rate=8000, energy_normalize=True,
        optimizer_name="adam", lr_model=1e-4, lr_tf=1.0,
        trainable=True, batch_size=64)

    def hinted(cfg, impl=None, **over):
        c = dict(cfg)
        if impl is not None:
            c["impl"] = impl
        c.update(over)
        return c

    def measure_loop(build_run, describe):
        """build_run(S) -> (jitted_fn, example_inputs maker).  Times the
        two scan lengths, returns (per-step seconds (slope), long run)."""
        runs = {}
        for S in (args.short, args.long):
            runs[S] = build_run(S)
        # compile both (first call)
        for S, (fn, inputs) in runs.items():
            out = fn(*inputs(0))
            jax.block_until_ready(out)
        best = float("inf")
        for rep in range(1, args.repeats + 1):
            ts = {}
            ok = True
            for S, (fn, inputs) in runs.items():
                inp = inputs(rep)
                jax.block_until_ready(inp)
                t0 = time.time()
                out = fn(*inp)
                out = jax.block_until_ready(out)
                ts[S] = time.time() - t0
                losses = np.asarray(out)
                if not np.all(np.isfinite(losses)):
                    print(f"  [{describe}] non-finite losses, discarding")
                    ok = False
            if not ok:
                continue
            dt = (ts[args.long] - ts[args.short]) / (args.long - args.short)
            if dt <= 0:
                print(f"  [{describe}] non-positive slope "
                      f"({ts[args.long]:.3f}s vs {ts[args.short]:.3f}s), "
                      "discarding")
                continue
            best = min(best, dt)
        return best, runs[args.long]

    def cnn6_flops(cfg):
        """Analytic fwd+bwd conv FLOPs for the CNN6 stack at the config
        geometry (bwd ~ 2x fwd).  XLA's cost_analysis through the relay
        under-counts convolutions ~35x here (measured r5), so the MFU
        is reported against this count instead."""
        h = cfg["n_points"] // cfg["hop_length"] + 1
        w, cin, b = cfg["n_mels"], 1, cfg["batch_size"]
        total = 0
        for cout in (64, 128, 256, 512):
            total += b * h * w * 25 * cin * cout * 2
            h, w, cin = h // 2, w // 2, cout
        return 3 * total

    results = {}

    def full_step_case(name, cfg):
        """Full train step via the PUBLIC make_train_step at the
        production dispatch (hint plumbing identical to fit())."""
        wl = (optimized_window_length(cfg["init_lambd"])
              if cfg["optimized"] else None)
        hint = None
        if cfg.get("impl") == "pallas" and wl is not None:
            hint = pallas_compile_hint(abs(float(cfg["init_lambd"])), wl,
                                       int(cfg["hop_length"]))
        model = models.get_model_by_config(cfg, window_length=wl,
                                           lambd_hint=hint)
        b, t = cfg["batch_size"], cfg["n_points"]
        n_classes = models.n_classes_for(cfg["dataset_name"])
        one_hot = "panns" in cfg["model_name"]
        x0 = jnp.zeros((b, t), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0)
        params = variables["params"]
        stats = variables.get("batch_stats")
        opt = build_optimizer(cfg, params)
        opt_state = opt.init(params)
        step = make_train_step(model, opt, one_hot, n_classes)
        rng = np.random.default_rng(0)
        ys = jnp.asarray(rng.integers(0, n_classes, b).astype(np.int32))
        mask = jnp.ones(b, bool)

        def build_run(S):
            @jax.jit
            def run(p0, o0, st0, key, ys, mask):
                def body(carry, _):
                    p, o, st, k = carry
                    k, kx, ks = jax.random.split(k, 3)
                    xs = jax.random.normal(kx, (b, t), jnp.float32)
                    p, o, st, _, m = step(p, o, st, ks, xs, ys, mask)
                    return (p, o, st, k), m["loss"]
                _, losses = jax.lax.scan(
                    body, (p0, o0, st0, key), None, length=S)
                return losses

            impl = cfg.get("rng_impl", "threefry2x32")

            def inputs(rep):
                key = (jax.random.PRNGKey(100 + rep)
                       if impl == "threefry2x32"
                       else jax.random.key(100 + rep, impl=impl))
                return (params, opt_state, stats, key, ys, mask)
            return run, inputs

        dt, _ = measure_loop(build_run, name)
        audio_s = b * t / cfg.get("resample_rate", 8000)
        line = (f"{name}: {dt * 1e3:.2f} ms/step  "
                f"{audio_s / dt:,.0f} audio-s/s")
        if "panns" in cfg["model_name"]:
            fl = cnn6_flops(cfg)
            line += (f"  conv-flops/step {fl / 1e9:.0f} G  "
                     f"step-MFU {fl / dt / PEAK_BF16 * 100:.0f}% "
                     f"(analytic conv fwd+bwd vs bf16 peak)")
        print(line)
        results[name] = dt
        return dt

    def cnn6_only_case(name, cfg):
        """CNN6 backbone train step on a FIXED feature tensor — the
        classifier share of the full step (no front-end)."""
        from dmel_tpu.models.panns import Cnn6
        b = cfg["batch_size"]
        frames = cfg["n_points"] // cfg["hop_length"] + 1
        m = cfg["n_mels"]
        n_classes = models.n_classes_for(cfg["dataset_name"])
        cnn = Cnn6(n_classes, m, augment=False)
        feat0 = jnp.zeros((b, frames, m, 1), jnp.float32)
        variables = cnn.init(jax.random.PRNGKey(0), feat0)
        params = variables["params"]
        stats = variables.get("batch_stats")
        import optax
        opt = optax.adam(cfg["lr_model"])
        opt_state = opt.init(params)
        rng = np.random.default_rng(0)
        ys1h = jax.nn.one_hot(
            jnp.asarray(rng.integers(0, n_classes, b)), n_classes)
        mask = jnp.ones(b, jnp.float32)

        def inner(p, o, st, k, xs):
            def loss_fn(q):
                out, upd = cnn.apply(
                    {"params": q, "batch_stats": st}, xs, train=True,
                    mutable=["batch_stats"], rngs={"dropout": k})
                return bce_loss(out, ys1h, mask), upd["batch_stats"]
            (loss, st2), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, o2 = opt.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, st2, loss

        def build_run(S):
            @jax.jit
            def run(p0, o0, st0, key):
                def body(carry, _):
                    p, o, st, k = carry
                    k, kx, ks = jax.random.split(k, 3)
                    xs = jax.random.normal(kx, (b, frames, m, 1),
                                           jnp.float32)
                    p, o, st, loss = inner(p, o, st, ks, xs)
                    return (p, o, st, k), loss
                _, losses = jax.lax.scan(
                    body, (p0, o0, st0, key), None, length=S)
                return losses

            def inputs(rep):
                return (params, opt_state, stats,
                        jax.random.PRNGKey(200 + rep))
            return run, inputs

        dt, _ = measure_loop(build_run, name)
        fl = cnn6_flops(cfg)
        print(f"{name}: {dt * 1e3:.2f} ms/step  "
              f"conv-flops/step {fl / 1e9:.0f} G  "
              f"step-MFU {fl / dt / PEAK_BF16 * 100:.0f}%")
        results[name] = dt
        return dt

    def dmel_only_case(name, cfg):
        """Front-end alone: log-mel fwd + dlambd bwd at the same batch
        (bench.py's quantity at the esc50 batch geometry)."""
        from dmel_tpu.models.layers import MelSpectrogramLayer
        b, t = cfg["batch_size"], cfg["n_points"]
        wl = optimized_window_length(cfg["init_lambd"])
        hint = None
        if cfg.get("impl") == "pallas":
            hint = pallas_compile_hint(abs(float(cfg["init_lambd"])), wl,
                                       int(cfg["hop_length"]))
        layer = MelSpectrogramLayer(
            init_lambd=float(cfg["init_lambd"]), n_points=t,
            hop_length=cfg["hop_length"], n_mels=cfg["n_mels"],
            sample_rate=cfg["resample_rate"], optimized=True,
            window_length=wl,
            impl=cfg.get("impl", "xla"), lambd_hint=hint)
        x0 = jnp.zeros((b, t), jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), x0)

        def build_run(S):
            @jax.jit
            def run(p0, key):
                def body(carry, _):
                    k, acc = carry
                    k, kx = jax.random.split(k)
                    xs = jax.random.normal(kx, (b, t), jnp.float32)
                    g = jax.grad(
                        lambda q: jnp.mean(layer.apply(q, xs) ** 2))(p0)
                    lam_g = jax.tree.leaves(g)[0]
                    return (k, acc + jnp.sum(lam_g)), jnp.sum(lam_g)
                _, vals = jax.lax.scan(
                    body, (key, jnp.float32(0)), None, length=S)
                return vals

            def inputs(rep):
                return (params, jax.random.PRNGKey(300 + rep))
            return run, inputs

        dt, _ = measure_loop(build_run, name)
        print(f"{name}: {dt * 1e3:.2f} ms/step")
        results[name] = dt
        return dt

    def eval_case(name, cfg):
        """Full-model eval step (predict-path compute, no grad)."""
        wl = optimized_window_length(cfg["init_lambd"])
        hint = None
        if cfg.get("impl") == "pallas":
            hint = pallas_compile_hint(abs(float(cfg["init_lambd"])), wl,
                                       int(cfg["hop_length"]))
        model = models.get_model_by_config(cfg, window_length=wl,
                                           lambd_hint=hint)
        b, t = cfg["batch_size"], cfg["n_points"]
        n_classes = models.n_classes_for(cfg["dataset_name"])
        one_hot = "panns" in cfg["model_name"]
        x0 = jnp.zeros((b, t), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0)
        params = variables["params"]
        stats = variables.get("batch_stats")
        estep = make_eval_step(model, one_hot, n_classes)
        rng = np.random.default_rng(0)
        ys = jnp.asarray(rng.integers(0, n_classes, b).astype(np.int32))
        mask = jnp.ones(b, bool)

        def build_run(S):
            @jax.jit
            def run(p0, st0, key, ys, mask):
                def body(carry, _):
                    k = carry
                    k, kx = jax.random.split(k)
                    xs = jax.random.normal(kx, (b, t), jnp.float32)
                    m = estep(p0, st0, xs, ys, mask)
                    return k, m["loss"]
                _, losses = jax.lax.scan(body, key, None, length=S)
                return losses

            def inputs(rep):
                return (params, stats, jax.random.PRNGKey(400 + rep),
                        ys, mask)
            return run, inputs

        dt, _ = measure_loop(build_run, name)
        print(f"{name}: {dt * 1e3:.2f} ms/step")
        results[name] = dt
        return dt

    rows = {
        "esc50-full-pallas": lambda: full_step_case(
            "esc50 full step (impl=pallas, hinted)",
            hinted(esc50, impl="pallas")),
        "esc50-full-xla": lambda: full_step_case(
            "esc50 full step (XLA auto front-end)", dict(esc50)),
        "esc50-full-fast": lambda: full_step_case(
            "esc50 full step (pallas + rbg + bf16 conv stack)",
            hinted(esc50, impl="pallas", rng_impl="rbg",
                   model_dtype="bfloat16")),
        "esc50-cnn6": lambda: cnn6_only_case(
            "esc50 CNN6-only step (fixed features)", esc50),
        "esc50-dmel": lambda: dmel_only_case(
            "esc50 DMEL-only fwd+dlambd (impl=pallas)",
            hinted(esc50, impl="pallas")),
        "esc50-eval-pallas": lambda: eval_case(
            "esc50 eval step (impl=pallas, hinted)",
            hinted(esc50, impl="pallas")),
        "audio_mnist-full": lambda: full_step_case(
            "audio_mnist full step (impl=pallas, hinted)",
            hinted(audio_mnist, impl="pallas")),
    }
    chosen = (rows if args.rows == "all"
              else {k: rows[k] for k in args.rows.split(",")})
    for fn in chosen.values():
        fn()

    if {"esc50-full-pallas", "esc50-cnn6"} <= set(chosen):
        full = results["esc50 full step (impl=pallas, hinted)"]
        cnn = results["esc50 CNN6-only step (fixed features)"]
        b, t, sr = esc50["batch_size"], esc50["n_points"], 8000
        print("\n--- breakdown (esc50 flagship) ---")
        print(f"full step:        {full * 1e3:8.2f} ms  "
              f"({b * t / sr / full:,.0f} audio-s/s)")
        print(f"CNN6-only share:  {cnn * 1e3:8.2f} ms  "
              f"({cnn / full * 100:.0f}% of step)")
        print(f"front-end + glue: {(full - cnn) * 1e3:8.2f} ms  "
              f"({(full - cnn) / full * 100:.0f}% of step)")


if __name__ == "__main__":
    main()
