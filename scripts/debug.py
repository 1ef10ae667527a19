"""Single-batch forward debug script (parity: /root/reference/debug.py).

Runs one batch through a model and prints logits / softmax /
spectrogram stats for eyeballing.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dmel_tpu import data, models, ops  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", default="mel_linear_net")
    parser.add_argument("--batch_size", type=int, default=4)
    args = parser.parse_args()

    cfg = dict(model_name=args.model_name, dataset_name="time_frequency",
               init_lambd=6.38, n_points=128, hop_length=1,
               optimized=False, normalize_window=False, n_mels=32,
               resample_rate=8000, energy_normalize=True, sigma_ref=6.38,
               noise_std=0.5, n_samples=64, center_offset=False,
               data_seed=0)
    if args.model_name in ("linear_net", "mlp_net", "conv_net",
                           "bn_linear_net"):
        cfg["energy_normalize"] = False

    tr, _, _ = data.get_dataset_by_config(cfg, "/tmp")
    loader = data.BatchLoader(tr, args.batch_size)
    xs, ys, _ = next(iter(loader))

    model = models.get_model_by_config(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(xs))
    logits, s = model.apply(variables, jnp.asarray(xs))

    np.set_printoptions(precision=4, suppress=True)
    print("labels:   ", ys)
    print("logits:   ", np.asarray(logits))
    print("softmax:  ", np.asarray(jax.nn.softmax(logits, axis=-1)))
    print("preds:    ", np.asarray(jnp.argmax(logits, axis=-1)))
    print("spectrogram:", s.shape, "min", float(s.min()),
          "max", float(s.max()), "mean", float(s.mean()))


if __name__ == "__main__":
    main()
