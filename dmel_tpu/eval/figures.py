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


#: reference model-name display titles (produce_figures.py:277-291)
MODEL_TITLES = {
    "conv_net": "ConvNet",
    "linear_net": "LinearNet",
    "mel_linear_net": "MelLinearNet",
    "mel_conv_net": "MelConvNet",
    "mel_mlp_net": "MelMlpNet",
    "panns_cnn6": "PANNs CNN6",
}

#: reference per-dataset model columns (produce_figures.py:79-87)
DATASET_MODELS = {
    "audio_mnist": ["mel_linear_net", "mel_conv_net"],
    "esc50": ["panns_cnn6"],
    "time_frequency": ["linear_net", "conv_net"],
}


def _lineplot(ax, df, ycol, legend_loc):
    """Seaborn lineplot of ycol vs init_lambd with trainable hue — the
    reference's exact mark/hue styling (produce_figures.py:136-145)."""
    import seaborn as sns
    d = df.copy()
    d["config/init_lambd"] = d["config/init_lambd"].astype(float)
    d["config/trainable"] = d["config/trainable"].astype(str)
    sns.lineplot(data=d, x="config/init_lambd", y=ycol, marker="o",
                 hue="config/trainable", ax=ax)
    ax.legend(loc=legend_loc, title="Trainable")


def produce_accuracy_plot(sweep_dir: str, out_path: str | None = None,
                          split: str = "valid"):
    """Per-dataset accuracy + lambda_est figure with the reference's
    exact structure (produce_figures.py:78-168): a 2 x n_models grid —
    one column per model (titled), row 0 accuracy-vs-lambda_init, row 1
    lambda_est-vs-lambda_init, trainable hue, per-dataset y-limits, and
    the ``{split}_{dataset}.pdf`` naming convention."""
    df = load_results(sweep_dir)
    dataset_name = str(df.iloc[0]["config/dataset_name"])
    if split == "test":
        csv = os.path.join(sweep_dir, f"{dataset_name}.csv")
        df = pd.read_csv(csv)
        ycol, ylabel = "test_accuracy", "Test accuracy"
    else:
        ycol, ylabel = "best_valid_acc", "Validation accuracy"

    present = [str(m) for m in df["config/model_name"].unique()]
    model_names = [m for m in DATASET_MODELS.get(dataset_name, present)
                   if m in present] or present
    n = len(model_names)
    column_width, figure_height = 4, 3          # produce_figures.py:111-112
    fig, ax = plt.subplots(2, n, figsize=(column_width * n,
                                          figure_height * 2),
                           squeeze=False)
    lcol = "best_lambd_est" if "best_lambd_est" in df else "lambd_est"
    for col, model_name in enumerate(model_names):
        dfm = df[df["config/model_name"].astype(str) == model_name]
        ax[0, col].set_title(MODEL_TITLES.get(model_name, model_name))
        _lineplot(ax[0, col], dfm, ycol, "lower center")
        _lineplot(ax[1, col], dfm, lcol, "upper left")
        band = ACC_BANDS.get(dataset_name)
        if band:
            ax[0, col].set_ylim(band)
        # reference label pattern: y-labels only on the first column,
        # x-labels only on the bottom row (produce_figures.py:148-155)
        ax[0, col].set_ylabel(ylabel if col == 0 else "")
        ax[0, col].set_xlabel("")
        ax[1, col].set_ylabel(r"$\lambda_{est}$" if col == 0 else "")
        ax[1, col].set_xlabel(r"$\lambda_{init}$")
        sigma_ref = df.iloc[0].get("config/sigma_ref")
        if sigma_ref is not None and not pd.isna(sigma_ref):
            ax[1, col].axhline(float(sigma_ref), linestyle="dashed",
                               color="purple", label=r"$\sigma_{ref}$")
            ax[1, col].legend(loc="upper left")
    fig.tight_layout()
    if out_path is None:
        out_path = os.path.join(sweep_dir, f"{split}_{dataset_name}.pdf")
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
