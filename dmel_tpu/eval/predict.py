"""Test-set prediction over a finished sweep.

Parity target: /root/reference/predict_test.py + ``get_predictions_by_row_new``
(utils.py:263-286): for every trial row, rebuild the model from its
config, restore the best checkpoint, run argmax inference on the test
split, and write ``{dataset}.csv`` with a ``test_accuracy`` column plus
``{dataset}_predictionss.npy`` / ``{dataset}_labelss.npy``.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from dmel_tpu.data.loader import BatchLoader, PrefetchIterator
from dmel_tpu.data.registry import get_dataset_by_config
from dmel_tpu.experiments.runner import get_config_by_row, load_results
from dmel_tpu.models.registry import get_model_by_config
from dmel_tpu.ops.spectrogram import bucketed_window_length
from dmel_tpu.training.checkpoint import load_checkpoint


def _coerce(config: dict) -> dict:
    """results.csv round-trip stringifies some values; coerce back."""
    out = dict(config)
    for k in ("trainable", "optimized", "normalize_window",
              "energy_normalize", "augment", "pretrained",
              "center_offset"):
        if k in out and isinstance(out[k], str):
            out[k] = out[k] == "True"
    for k in ("n_points", "hop_length", "batch_size", "max_epochs",
              "patience", "n_mels", "resample_rate", "n_samples"):
        if k in out and out[k] is not None and not isinstance(out[k], bool):
            try:
                out[k] = int(float(out[k]))
            except (TypeError, ValueError):
                pass
    for k in ("init_lambd", "lr_model", "lr_tf", "noise_std", "sigma_ref"):
        if k in out and out[k] is not None:
            try:
                out[k] = float(out[k])
            except (TypeError, ValueError):
                pass
    return out


def predictions_by_row(row: dict, testloader) -> tuple:
    """Rebuild model + restore best checkpoint for one results row and
    predict (utils.py:263-286).

    Single-label datasets return ``(labels, argmax_preds)``; multi-label
    datasets (2-D ys, FSD-style) return ``(multi_hot_labels, scores)``
    so the caller can compute mAP (the PANNs headline metric)."""
    config = _coerce(get_config_by_row(row))
    ckpt_path = os.path.join(row["logdir"], "checkpoint_000000",
                             "best_model")
    restored = load_checkpoint(ckpt_path)
    params = restored["params"]
    batch_stats = restored.get("batch_stats")

    meta_path = ckpt_path + ".meta.json"
    if os.path.exists(meta_path):
        # geometry sidecar written by fit() at checkpoint time: the
        # EXACT bucket + static hint this checkpoint validated at.
        # Deriving the bucket from the checkpoint lambda instead is
        # wrong whenever lambda crossed a bucket boundary during its
        # best epoch (round-5 find: 0.87 valid -> 0.34 test on
        # esc50_synth when 6*lambda crossed 512 -> 1024).
        import json as _json
        with open(meta_path) as f:
            meta = _json.load(f)
        wl = meta.get("window_length")
        hint = meta.get("lambd_hint")
    else:
        # legacy checkpoints: derive both from the checkpoint lambda
        # (mean matches training's current_lambd; multi-sigma vectors)
        lam_ckpt = float(np.mean(np.asarray(
            params["spectrogram_layer"]["lambd"])))
        wl = None
        if config.get("optimized", False):
            # SAME clamp as training's bucket_for
            wl = bucketed_window_length(lam_ckpt, int(config["n_points"]))
        from dmel_tpu.models.registry import dispatch_hint_for
        hint = dispatch_hint_for(config, wl, lam_ckpt)
    model = get_model_by_config(config, window_length=wl,
                                lambd_hint=hint)

    @jax.jit
    def forward(params, batch_stats, xs):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        logits, _ = model.apply(variables, xs, train=False)
        return logits

    preds, labels = [], []
    it = PrefetchIterator(
        ((jax.numpy.asarray(xs), ys, mask) for xs, ys, mask in testloader),
        depth=2)
    for xd, ys, mask in it:
        scores = np.asarray(forward(params, batch_stats, xd))
        if ys.ndim == 2:                      # multi-label: keep scores
            preds.append(scores[mask])
        else:                                 # single-label: argmax
            preds.append(np.argmax(scores, axis=-1)[mask])
        labels.append(ys[mask])
    return np.concatenate(labels), np.concatenate(preds)


def predict_test(sweep_dir: str, data_dir: str, batch_size: int = 32,
                 verbose: int = 1):
    """Run test predictions for every trial; write ``{dataset}.csv``
    (predict_test.py:10-38 parity).  Returns the augmented dataframe."""
    df = load_results(sweep_dir)
    if not len(df):
        raise ValueError(f"no finished trials in {sweep_dir}")
    dataset_name = str(df.iloc[0]["config/dataset_name"])

    config0 = _coerce(get_config_by_row(df.iloc[0].to_dict()))
    _, _, testset = get_dataset_by_config(config0, data_dir)
    testloader = BatchLoader(testset, batch_size, shuffle=False)

    accs, maps, predss, labelss = [], [], [], []
    multilabel = False
    for _, row in df.iterrows():
        ckpt = os.path.join(str(row["logdir"]), "checkpoint_000000",
                            "best_model")
        if not os.path.exists(ckpt):
            # a trial that diverged before its first valid improvement
            # has no checkpoint (training/train.py NaN guard) — record
            # NaN metrics instead of killing the whole prediction pass
            accs.append(float("nan"))
            maps.append(float("nan"))
            predss.append(np.array([]))
            labelss.append(np.array([]))
            if verbose:
                print(f"{os.path.basename(str(row['logdir']))}: no "
                      "checkpoint (diverged trial) — skipped")
            continue
        labels, preds = predictions_by_row(row.to_dict(), testloader)
        if labels.ndim == 2:
            # multi-label: headline metric is mAP (PANNs convention,
            # /root/reference/utils.py:17); "accuracy" = top-1 precision
            from dmel_tpu.eval.metrics import (mean_average_precision,
                                               top1_precision)
            multilabel = True
            acc = top1_precision(labels, preds)
            m_ap = mean_average_precision(labels, preds)
            maps.append(m_ap)
        else:
            acc = float(np.mean(labels == preds))
            maps.append(float("nan"))    # keeps maps aligned with accs
        accs.append(acc)
        predss.append(preds)
        labelss.append(labels)
        if verbose:
            extra = f" test_mAP={maps[-1]:.4f}" if multilabel else ""
            print(f"{os.path.basename(str(row['logdir']))}: "
                  f"test_accuracy={acc:.4f}{extra}")

    df = df.copy()
    df["test_accuracy"] = accs
    if multilabel:
        df["test_mAP"] = maps
    df.to_csv(os.path.join(sweep_dir, f"{dataset_name}.csv"), index=False)
    _save_stack(os.path.join(sweep_dir, f"{dataset_name}_predictionss.npy"),
                predss)
    _save_stack(os.path.join(sweep_dir, f"{dataset_name}_labelss.npy"),
                labelss)
    return df


def _save_stack(path: str, arrs: list):
    """Save per-trial arrays; homogeneous lists stack to a dense 2-D
    array (the reference's layout, predict_test.py:35-36), but a
    diverged trial contributes an empty array which makes the list
    ragged — numpy >= 1.24 raises on implicit ragged stacking, so fall
    back to an object array (np.load(..., allow_pickle=True))."""
    try:
        np.save(path, np.asarray(arrs))
    except ValueError:
        obj = np.empty(len(arrs), dtype=object)
        for i, a in enumerate(arrs):
            obj[i] = a
        np.save(path, obj, allow_pickle=True)


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(description="Test predictions.")
    parser.add_argument("--sweep_dir", required=True, type=str)
    parser.add_argument("--data_dir", required=True, type=str)
    parser.add_argument("--batch_size", type=int, default=32)
    args = parser.parse_args(argv)
    predict_test(args.sweep_dir, args.data_dir, args.batch_size)


if __name__ == "__main__":
    main()
