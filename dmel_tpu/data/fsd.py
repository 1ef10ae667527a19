"""FSD50K dataset: multi-label environmental sounds (200 classes).

Extension beyond the reference repo, required by BASELINE.json
configs[3] ("FSD with PANNs CNN backbone + DMEL front-end").  Follows
the official FSD50K layout:

    <root>/FSD50K.ground_truth/dev.csv        fname,labels,mids,split
    <root>/FSD50K.ground_truth/eval.csv       fname,labels,mids
    <root>/FSD50K.ground_truth/vocabulary.csv index,label,mid
    <root>/FSD50K.dev_audio/<fname>.wav
    <root>/FSD50K.eval_audio/<fname>.wav

Clips are resampled to ``resample_rate``, center-cropped / zero-padded
to ``n_points`` samples, and labels become multi-hot vectors.  Cached as
npy per (rate, n_points) like the ESC-50 cache (datasets.py:243-264
pattern).
"""

from __future__ import annotations

import csv
import os

import numpy as np

from dmel_tpu.data.audio import ArrayDataset, load_wav, resample


def load_vocabulary(root: str) -> dict:
    """label string -> class index (vocabulary.csv)."""
    path = os.path.join(root, "FSD50K.ground_truth", "vocabulary.csv")
    vocab = {}
    with open(path) as f:
        for row in csv.reader(f):
            vocab[row[1]] = int(row[0])
    return vocab


def _fix_length(x: np.ndarray, n_points: int) -> np.ndarray:
    if len(x) >= n_points:
        start = (len(x) - n_points) // 2
        return x[start:start + n_points]
    out = np.zeros(n_points, dtype=np.float32)
    ofs = (n_points - len(x)) // 2
    out[ofs:ofs + len(x)] = x
    return out


def _load_split(root: str, csv_name: str, audio_dir: str, vocab: dict,
                resample_rate: int, n_points: int,
                split_filter: str | None = None):
    xs, ys = [], []
    with open(os.path.join(root, "FSD50K.ground_truth", csv_name)) as f:
        reader = csv.DictReader(f)
        for row in reader:
            if split_filter is not None and row.get("split") != split_filter:
                continue
            path = os.path.join(root, audio_dir, row["fname"] + ".wav")
            audio, sr = load_wav(path)
            x = _fix_length(resample(audio, sr, resample_rate), n_points)
            y = np.zeros(len(vocab), dtype=np.float32)
            for label in row["labels"].split(","):
                y[vocab[label]] = 1.0
            xs.append(x)
            ys.append(y)
    return np.asarray(xs, np.float32), np.asarray(ys, np.float32)


def fsd50k(root: str, resample_rate: int = 8000, n_points: int = 40000):
    """(train, valid, test) ArrayDatasets with multi-hot float labels.

    Official split: dev.csv rows marked 'train' / 'val'; eval.csv is the
    test set.  Results cached as npy keyed by (rate, n_points).
    """
    vocab = load_vocabulary(root)
    out = []
    cache_key = f"{resample_rate}_{n_points}"
    for name, csv_name, audio_dir, filt in [
            ("train", "dev.csv", "FSD50K.dev_audio", "train"),
            ("val", "dev.csv", "FSD50K.dev_audio", "val"),
            ("test", "eval.csv", "FSD50K.eval_audio", None)]:
        xs_p = os.path.join(root, f"{cache_key}_{name}_xs.npy")
        ys_p = os.path.join(root, f"{cache_key}_{name}_ys.npy")
        if os.path.exists(xs_p) and os.path.exists(ys_p):
            xs, ys = np.load(xs_p), np.load(ys_p)
        else:
            xs, ys = _load_split(root, csv_name, audio_dir, vocab,
                                 resample_rate, n_points, filt)
            np.save(xs_p, xs)
            np.save(ys_p, ys)
        out.append(ArrayDataset(xs, ys, resample_rate))
    return tuple(out)
