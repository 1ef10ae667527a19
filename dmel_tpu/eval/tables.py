"""LaTeX results tables.

Parity target: /root/reference/produce_tables.py — table 1 (real
datasets, per init window length in ms) and table 2 (synthetic, per
lambda_init): mean±std test accuracy for DMEL (trainable) vs baseline
(fixed), plus the (min, max) learned lambda converted to milliseconds
via ``lambd * 6 / sr`` (produce_tables.py:46-47).
"""

from __future__ import annotations

import os

import pandas as pd

MODEL_TITLES = {
    "conv_net": "ConvNet",
    "linear_net": "LinearNet",
    "mel_linear_net": "MelLinearNet",
    "mel_conv_net": "MelConvNet",
    "mel_mlp_net": "MelMlpNet",
    "panns_cnn6": "PANNs CNN6",
}


def get_model_title(model_name: str) -> str:
    try:
        return MODEL_TITLES[model_name]
    except KeyError:
        raise ValueError(f"model_name: {model_name} is not defined.")


def _trainable_mask(df):
    t = df["config/trainable"]
    if t.dtype == bool:
        return t
    return t.astype(str) == "True"


def window_length_results(df, window_length: float, sr: int = 8000):
    """Rows whose init_lambd corresponds to a window length in seconds
    (produce_tables.py:18-23)."""
    init_lambd = window_length / 6 * sr
    eps = 1e-5
    lam = df["config/init_lambd"].astype(float)
    return df[(lam > init_lambd - eps) & (lam < init_lambd + eps)]


def produce_table_1(sweep_dir: str, dataset_name: str,
                    window_lengths=(0.010, 0.035, 0.300), sr: int = 8000,
                    model_title: str = "LNet") -> str:
    """DMEL-vs-baseline per init window length (produce_tables.py:25-59)."""
    df = pd.read_csv(os.path.join(sweep_dir, f"{dataset_name}.csv"))
    tmask = _trainable_mask(df)
    df_train, df_fixed = df[tmask], df[~tmask]

    lines = ["Model & $l_{\\lambda_{init}}$ & $l_{\\lambda_{est}}$ & "
             "Method & Accuracy \\\\", "\\hline \\hline"]
    for wlen in window_lengths:
        dtr = window_length_results(df_train, wlen, sr)
        dfx = window_length_results(df_fixed, wlen, sr)
        est = dtr["best_lambd_est"].abs() * 6 / sr
        lines.append(
            "{} & {} ms & ({}, {}) ms & DMEL & ${:.1f} \\pm {:.1f}$ \\\\"
            .format(model_title, int(wlen * 1000),
                    int(est.min() * 1000) if len(est) else "-",
                    int(est.max() * 1000) if len(est) else "-",
                    dtr["test_accuracy"].mean() * 100,
                    dtr["test_accuracy"].std() * 100))
        lines.append(
            "{} & {} ms & {} ms & baseline & ${:.1f} \\pm {:.1f}$ \\\\"
            .format(model_title, int(wlen * 1000), int(wlen * 1000),
                    dfx["test_accuracy"].mean() * 100,
                    dfx["test_accuracy"].std() * 100))
        lines.append("\\hline")
    table = "\n".join(lines)
    print(table)
    return table


def produce_table_2(sweep_dir: str, dataset_name: str = "time_frequency",
                    sigma_ref: float = 6.38,
                    scales=(0.2, 1.0, 5.0)) -> str:
    """Synthetic-task table per lambda_init (produce_tables.py:61-101)."""
    df = pd.read_csv(os.path.join(sweep_dir, f"{dataset_name}.csv"))
    tmask = _trainable_mask(df)
    df_train, df_fixed = df[tmask], df[~tmask]

    lines = ["Model & $\\lambda_{init}$ & $\\lambda_{est}$ & Method & "
             "Accuracy \\\\", "\\hline \\hline"]
    for scale in scales:
        lam0 = sigma_ref * scale
        lamcol = df_train["config/init_lambd"].astype(float)
        dtr = df_train[(lamcol - lam0).abs() < 1e-9]
        lamcol = df_fixed["config/init_lambd"].astype(float)
        dfx = df_fixed[(lamcol - lam0).abs() < 1e-9]
        est = dtr["best_lambd_est"].abs()
        lines.append(
            "LinearNet & {:.1f} & ({:.1f}, {:.1f}) & DSPEC & "
            "${:.1f} \\pm {:.1f}$ \\\\".format(
                lam0, est.min() if len(est) else float("nan"),
                est.max() if len(est) else float("nan"),
                dtr["test_accuracy"].mean() * 100,
                dtr["test_accuracy"].std() * 100))
        lines.append(
            "LinearNet & {:.1f} & {:.1f} & baseline & "
            "${:.1f} \\pm {:.1f}$ \\\\".format(
                lam0, lam0,
                dfx["test_accuracy"].mean() * 100,
                dfx["test_accuracy"].std() * 100))
        lines.append("\\hline")
    table = "\n".join(lines)
    print(table)
    return table


def produce_result_table(sweep_dir: str, dataset_name: str,
                         init_lambd: float | None = None) -> str:
    """Per-model trainable-vs-fixed accuracy table
    (produce_tables.py:103-141)."""
    model_names = {"audio_mnist": ["mel_conv_net", "mel_linear_net"],
                   "esc50": ["panns_cnn6"],
                   "fsd": ["panns_cnn6"]}.get(dataset_name, [])
    df = pd.read_csv(os.path.join(sweep_dir, f"{dataset_name}.csv"))
    df = df[df["config/dataset_name"] == dataset_name]
    if init_lambd is not None:
        lam = df["config/init_lambd"].astype(float)
        df = df[(lam - init_lambd).abs() < 1e-6]

    lines = ["Trainable & True & False \\\\"]
    tmask = _trainable_mask(df)
    for model_name in model_names:
        dm = df[df["config/model_name"] == model_name]
        if not len(dm):
            continue
        dm_mask = _trainable_mask(dm)
        dtr, dfx = dm[dm_mask], dm[~dm_mask]
        lines.append(
            "{} & ${:.2f} \\pm {:.2f}$ & ${:.2f} \\pm {:.2f}$ \\\\".format(
                get_model_title(model_name),
                dtr["test_accuracy"].mean(), dtr["test_accuracy"].std(),
                dfx["test_accuracy"].mean(), dfx["test_accuracy"].std()))
    table = "\n".join(lines)
    print(table)
    return table


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description="Produce LaTeX tables.")
    parser.add_argument("--results_dir", required=True, type=str)
    args = parser.parse_args(argv)
    for name, fn in [("esc50", produce_table_1),
                     ("audio_mnist", produce_table_1)]:
        path = os.path.join(args.results_dir, name)
        if os.path.exists(os.path.join(path, f"{name}.csv")):
            print(name.upper())
            fn(path, name)
            print()
    tf_path = os.path.join(args.results_dir, "time_frequency")
    if os.path.exists(os.path.join(tf_path, "time_frequency.csv")):
        print("time-frequency")
        produce_table_2(tf_path)


if __name__ == "__main__":
    main()
