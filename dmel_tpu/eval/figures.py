"""Figure generation.

Parity target: /root/reference/produce_figures.py — (a) demo
spectrograms of the three synthetic classes at lambda scales
{1, 0.2, 5} (produce_figures.py:18-75), (b) accuracy-vs-lambda_init and
(c) lambda_est-vs-lambda_init lineplots with a trainable hue
(produce_figures.py:78-245).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from dmel_tpu.data.synthetic import make_gauss_pulse_dataset  # noqa: E402
from dmel_tpu.experiments.runner import load_results  # noqa: E402
from dmel_tpu.ops.spectrogram import spectrogram  # noqa: E402
from dmel_tpu.utils.plot import plot_spectrogram  # noqa: E402

ACC_BANDS = {  # expected valid-accuracy bands (produce_figures.py:156-162,
    # 239-240) — sanity rails for the rebuild
    "time_frequency": (0.95, 1.00),
    "audio_mnist": (0.75, 0.96),
    "esc50": (0.65, 0.90),
}


def produce_data_example_plot(out_path: str, sigma_ref: float = 6.38,
                              n_points: int = 128):
    """3x3 grid: one sample per class (rows) at lambda scales
    {1, 0.2, 5} (columns) — produce_figures.py:18-75."""
    ds = make_gauss_pulse_dataset(sigma=sigma_ref, n_points=n_points,
                                  noise_std=0.0, n_samples=64, demo=True,
                                  seed=0)
    scales = [1.0, 0.2, 5.0]
    fig, ax = plt.subplots(3, 3, figsize=(8, 8))
    for row, cls in enumerate(range(3)):
        idx = int(np.nonzero(ds.ys == cls)[0][0])
        x = jnp.asarray(ds.xs[idx])
        for col, scale in enumerate(scales):
            s = spectrogram(x - x.mean(), sigma_ref * scale, hop_length=1)
            plot_spectrogram(np.asarray(s), ax[row, col],
                             decorate_axes=False)
            if row == 0:
                ax[row, col].set_title(
                    rf"$\lambda = {sigma_ref * scale:.1f}$")
        ax[row, 0].set_ylabel("normalized frequency")
    for col in range(3):
        ax[2, col].set_xlabel("time")
    fig.tight_layout()
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def _lineplot_by_init(ax, df, ycol, ylabel):
    tmask = df["config/trainable"].astype(str) == "True" \
        if df["config/trainable"].dtype != bool else df["config/trainable"]
    for trainable, sub_mask in [(True, tmask), (False, ~tmask)]:
        sub = df[sub_mask]
        if not len(sub):
            continue
        grp = sub.groupby(sub["config/init_lambd"].astype(float))[ycol]
        mean, std = grp.mean(), grp.std().fillna(0.0)
        ax.errorbar(mean.index, mean.values, yerr=std.values, marker="o",
                    capsize=3, label=f"trainable={trainable}")
    ax.set_xlabel(r"$\lambda_{init}$")
    ax.set_ylabel(ylabel)
    ax.legend()


def produce_accuracy_plot(sweep_dir: str, out_path: str,
                          split: str = "valid"):
    """Accuracy and lambda_est vs lambda_init with trainable hue
    (produce_figures.py:78-245)."""
    df = load_results(sweep_dir)
    dataset_name = str(df.iloc[0]["config/dataset_name"])
    if split == "test":
        csv = os.path.join(sweep_dir, f"{dataset_name}.csv")
        df = pd.read_csv(csv)
        ycol, ylabel = "test_accuracy", "Test accuracy"
    else:
        ycol, ylabel = "best_valid_acc", "Validation accuracy"

    fig, ax = plt.subplots(1, 2, figsize=(9, 3.5))
    _lineplot_by_init(ax[0], df, ycol, ylabel)
    band = ACC_BANDS.get(dataset_name)
    if band:
        ax[0].set_ylim(band)
    _lineplot_by_init(ax[1], df, "best_lambd_est", r"$\lambda_{est}$")
    sigma_ref = df.iloc[0].get("config/sigma_ref")
    if sigma_ref is not None and not pd.isna(sigma_ref):
        ax[1].axhline(float(sigma_ref), linestyle="dashed", color="purple",
                      label=r"$\sigma_{ref}$")
        ax[1].legend()
    fig.suptitle(dataset_name)
    fig.tight_layout()
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description="Produce figures.")
    parser.add_argument("--sweep_dir", required=True, type=str)
    parser.add_argument("--split", default="valid",
                        choices=["valid", "test"])
    parser.add_argument("--out_dir", default=None)
    args = parser.parse_args(argv)
    out_dir = args.out_dir or args.sweep_dir
    os.makedirs(out_dir, exist_ok=True)
    produce_data_example_plot(os.path.join(out_dir, "data_example.png"))
    produce_accuracy_plot(args.sweep_dir,
                          os.path.join(out_dir, "accuracy.png"),
                          split=args.split)


if __name__ == "__main__":
    main()
