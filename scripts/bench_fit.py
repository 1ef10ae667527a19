"""End-to-end fit() step-rate measurement (VERDICT r1 #3).

Times the PANNs CNN6 esc50-config training loop THROUGH training.fit —
including data placement, metric handling and epoch bookkeeping — to
verify the device-side metric accumulation removed the per-step host
syncs.  Round-1 fit() measured 22 ms/step with per-step float();
target <= 15 ms.
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
    parser.add_argument("--batches", type=int, default=24)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--impl", default="xla",
                        help="front-end impl (xla | pallas); pallas "
                        "auto-selects the specband kernel when lambda "
                        "sits inside the truncation window")
    args = parser.parse_args()

    import jax
    from dmel_tpu import data, training

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    n = args.batches * args.batch_size
    xs = rng.standard_normal((n, 40000)).astype(np.float32)
    ys = rng.integers(0, 50, n).astype(np.int32)
    ds = data.ArrayDataset(xs, ys, 8000)
    vn = 2 * args.batch_size
    va = data.ArrayDataset(xs[:vn], ys[:vn], 8000)

    cfg = dict(model_name="panns_cnn6", dataset_name="esc50",
               init_lambd=8000 * 0.035 / 6, n_points=40000, hop_length=80,
               optimized=True, normalize_window=False, n_mels=64,
               resample_rate=8000, energy_normalize=True, augment=False,
               optimizer_name="adam", lr_model=1e-4, lr_tf=1.0,
               trainable=True, batch_size=args.batch_size, max_epochs=3,
               patience=100, impl=args.impl)

    t0 = time.time()
    epoch_times = []
    last = [t0]

    def report(rec):
        now = time.time()
        epoch_times.append(now - last[0])
        last[0] = now

    training.fit(cfg, ds, va, report_fn=report, seed=0)
    # first epoch includes compilation; report steady-state per-step
    steady = epoch_times[1:]
    per_epoch = float(np.mean(steady))
    # subtract the valid pass crudely: valid is 2 batches of fwd-only
    per_step = per_epoch / (args.batches + 2 * 0.4)
    print(f"epoch times: {[f'{t:.2f}' for t in epoch_times]} s")
    print(f"steady-state: {per_epoch:.2f} s/epoch over {args.batches} "
          f"train batches (+2 valid) -> ~{per_step * 1e3:.1f} ms/step")
    audio_s = args.batch_size * 5.0
    print(f"~{audio_s / per_step:,.0f} audio-s/s full-training")


if __name__ == "__main__":
    main()
