"""Full train-step throughput for the real experiment configs.

Measures end-to-end jitted train-step time (DMEL front-end + classifier
fwd+bwd + optimizer update) for the published configurations — the
whole-training analog of bench.py's DMEL-only headline.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from dmel_tpu import models
    from dmel_tpu.ops.spectrogram import optimized_window_length
    from dmel_tpu.training.optim import build_optimizer
    from dmel_tpu.training.train import make_train_step

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)

    configs = {
        "esc50/panns_cnn6 (B=32, 5s)": dict(
            model_name="panns_cnn6", dataset_name="esc50",
            init_lambd=8000 * 0.035 / 6, n_points=40000, hop_length=80,
            optimized=True, normalize_window=False, n_mels=64,
            resample_rate=8000, energy_normalize=True, augment=False,
            optimizer_name="adam", lr_model=1e-4, lr_tf=1.0,
            trainable=True, batch_size=32),
        "esc50/panns_cnn6 mp-frontend (B=32, 5s)": dict(
            model_name="panns_cnn6", dataset_name="esc50",
            init_lambd=8000 * 0.035 / 6, n_points=40000, hop_length=80,
            optimized=True, normalize_window=False, n_mels=64,
            resample_rate=8000, energy_normalize=True, augment=False,
            optimizer_name="adam", lr_model=1e-4, lr_tf=1.0,
            trainable=True, batch_size=32,
            method="matmul_ext_mp", precision="high"),
        "audio_mnist/mel_linear_net (B=64, 1s)": dict(
            model_name="mel_linear_net", dataset_name="audio_mnist",
            init_lambd=8000 * 0.035 / 6, n_points=8000, hop_length=80,
            optimized=True, normalize_window=False, n_mels=64,
            resample_rate=8000, energy_normalize=True,
            optimizer_name="adam", lr_model=1e-4, lr_tf=1.0,
            trainable=True, batch_size=64),
        "audio_mnist/mel_linear_net mp (B=64, 1s)": dict(
            model_name="mel_linear_net", dataset_name="audio_mnist",
            init_lambd=8000 * 0.035 / 6, n_points=8000, hop_length=80,
            optimized=True, normalize_window=False, n_mels=64,
            resample_rate=8000, energy_normalize=True,
            optimizer_name="adam", lr_model=1e-4, lr_tf=1.0,
            trainable=True, batch_size=64,
            method="matmul_ext_mp", precision="high"),
        "time_frequency/linear_net (B=128)": dict(
            model_name="linear_net", dataset_name="time_frequency",
            init_lambd=6.38, n_points=128, hop_length=1, optimized=False,
            normalize_window=False, optimizer_name="sgd", lr_model=1e-3,
            lr_tf=1.0, trainable=True, batch_size=128),
    }

    for name, cfg in configs.items():
        wl = (optimized_window_length(cfg["init_lambd"])
              if cfg["optimized"] else None)
        model = models.get_model_by_config(cfg, window_length=wl)
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

        ys = jnp.asarray(rng.integers(0, n_classes, b).astype(np.int32))
        mask = jnp.ones(b, bool)
        key = jax.random.PRNGKey(1)

        xs = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
        out = step(params, opt_state, stats, key, xs, ys, mask)
        jax.block_until_ready(out[0])           # compile

        # min over repeats: the tunneled runtime occasionally stalls a
        # dispatch for minutes, which would poison a single average
        best, loss = float("inf"), float("nan")
        for _ in range(3):
            xs = jnp.asarray(rng.standard_normal((b, t)).astype(
                np.float32))
            jax.block_until_ready(xs)
            p, o, st, k2 = params, opt_state, stats, key
            t0 = time.time()
            for _ in range(args.steps):
                p, o, st, k2, m = step(p, o, st, k2, xs, ys, mask)
            loss = float(m["loss"])              # forces completion
            best = min(best, (time.time() - t0) / args.steps)
        dt = best
        audio_s = b * t / cfg.get("resample_rate", 8000)
        print(f"{name}: {dt * 1e3:.2f} ms/step -> "
              f"{audio_s / dt:,.0f} audio-s/s (loss {loss:.3f})")


if __name__ == "__main__":
    main()
