"""Data-parallel scaling bench on a virtual device mesh.

Measures DP training-step throughput at mesh sizes 1/2/4/8 and reports
scaling efficiency (BASELINE.md north-star: >= 0.9 at 2 hosts).  Real
multi-chip hardware is unavailable in this sandbox, so the default runs
on the CPU host platform with 8 virtual devices
(``--xla_force_host_platform_device_count``) — this validates the
sharding machinery (replicated params, batch-dim sharding, GSPMD psum)
end-to-end; absolute numbers are CPU-bound.  On a real slice, run with
``--platform tpu``.

Weak scaling: per-device batch is fixed, global batch grows with the
mesh.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default="cpu",
                        help="cpu (8 virtual devices) or tpu")
    parser.add_argument("--per_device_batch", type=int, default=16)
    parser.add_argument("--n_points", type=int, default=4000)
    parser.add_argument("--steps", type=int, default=10)
    args = parser.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_platforms", args.platform
                      if args.platform != "tpu" else "axon,cpu")

    from dmel_tpu import models, parallel
    from dmel_tpu.training.optim import build_optimizer
    from dmel_tpu.training.train import make_train_step

    n_dev_all = len(jax.devices())
    print(f"platform={jax.default_backend()}, devices={n_dev_all}")

    cfg = dict(model_name="mel_linear_net", dataset_name="esc50",
               init_lambd=128.0, n_points=args.n_points, hop_length=80,
               optimized=True, normalize_window=False, n_mels=64,
               resample_rate=8000, energy_normalize=True,
               optimizer_name="adam", lr_model=1e-4, lr_tf=1.0,
               trainable=True)
    from dmel_tpu.ops.spectrogram import optimized_window_length
    wl = optimized_window_length(cfg["init_lambd"])

    rng = np.random.default_rng(0)
    results = {}
    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev_all]
    for n_dev in sizes:
        mesh = parallel.make_mesh(("data",), devices=jax.devices()[:n_dev])
        batch = args.per_device_batch * n_dev
        model = models.get_model_by_config(cfg, window_length=wl)
        x0 = jnp.zeros((batch, args.n_points), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0)
        params = parallel.replicate(variables["params"], mesh)
        opt = build_optimizer(cfg, params)
        opt_state = parallel.replicate(opt.init(params), mesh)
        step = make_train_step(model, opt, one_hot=False, n_classes=50)

        sh = parallel.batch_sharding(mesh)
        xs = jax.device_put(jnp.asarray(rng.standard_normal(
            (batch, args.n_points)).astype(np.float32)), sh)
        ys = jax.device_put(jnp.asarray(
            rng.integers(0, 50, batch).astype(np.int32)), sh)
        mask = jax.device_put(jnp.ones(batch, bool), sh)

        key = jax.random.PRNGKey(1)
        out = step(params, opt_state, None, key, xs, ys, mask)
        jax.block_until_ready(out[0])           # compile
        t = time.time()
        p, o, _, key, m = params, opt_state, None, key, None
        for _ in range(args.steps):
            p, o, _, key, m = step(p, o, None, key, xs, ys, mask)
        jax.block_until_ready(p)
        dt = (time.time() - t) / args.steps
        audio_s = batch * args.n_points / 8000
        results[n_dev] = audio_s / dt
        print(f"mesh={n_dev}: {dt * 1e3:.2f} ms/step, "
              f"{audio_s / dt:,.0f} audio-s/s "
              f"({audio_s / dt / n_dev:,.0f} /device)")

    base = results[sizes[0]]
    for n_dev in sizes[1:]:
        eff = results[n_dev] / (base * n_dev)
        print(f"scaling efficiency @ {n_dev} devices: {eff:.2f}")


if __name__ == "__main__":
    main()
