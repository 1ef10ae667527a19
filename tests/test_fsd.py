"""FSD50K multi-label pipeline tests (BASELINE.json configs[3])."""

import os
import wave

import numpy as np
import pytest

from dmel_tpu import data, experiments, training
from dmel_tpu.eval.metrics import (average_precision,
                                   mean_average_precision, top1_precision)


def write_wav(path, seconds=1.0, sr=44100, freq=300):
    t = np.arange(int(sr * seconds)) / sr
    x = (np.sin(2 * np.pi * freq * t) * 0.1 * 32767).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(x.tobytes())


@pytest.fixture(scope="module")
def mini_fsd(tmp_path_factory):
    """Synthesize a 3-class mini FSD50K layout."""
    root = tmp_path_factory.mktemp("fsd50k")
    gt = root / "FSD50K.ground_truth"
    os.makedirs(gt)
    os.makedirs(root / "FSD50K.dev_audio")
    os.makedirs(root / "FSD50K.eval_audio")
    (gt / "vocabulary.csv").write_text(
        "0,Dog,/m/0bt9lr\n1,Cat,/m/01yrx\n2,Rain,/m/06mb1\n")
    import csv as _csv
    with open(gt / "dev.csv", "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["fname", "labels", "mids", "split"])
        for i in range(6):
            fname = f"dev{i}"
            write_wav(root / "FSD50K.dev_audio" / f"{fname}.wav",
                      seconds=0.5 + 0.2 * i, freq=200 + 100 * (i % 3))
            labels = ["Dog", "Cat", "Rain"][i % 3]
            if i % 2 == 1:
                labels += ",Dog" if "Dog" not in labels else ",Rain"
            split = "train" if i < 4 else "val"
            w.writerow([fname, labels, "/m/x", split])
    eval_rows = ["fname,labels,mids"]
    for i in range(2):
        fname = f"ev{i}"
        write_wav(root / "FSD50K.eval_audio" / f"{fname}.wav")
        eval_rows.append(f"{fname},Dog,/m/x")
    (gt / "eval.csv").write_text("\n".join(eval_rows))
    return str(root)


class TestFSDData:
    def test_load_and_cache(self, mini_fsd):
        tr, va, te = data.fsd50k(mini_fsd, resample_rate=8000,
                                 n_points=8000)
        assert tr.xs.shape == (4, 8000) and tr.ys.shape == (4, 3)
        assert va.xs.shape == (2, 8000)
        assert te.xs.shape == (2, 8000)
        # multi-hot: some rows have 2 labels
        assert tr.ys.sum(axis=1).max() == 2
        # cache hit
        tr2, _, _ = data.fsd50k(mini_fsd, resample_rate=8000,
                                n_points=8000)
        np.testing.assert_array_equal(tr.xs, tr2.xs)

    def test_registry_dispatch(self, mini_fsd):
        cfg = dict(dataset_name="fsd", resample_rate=8000, n_points=8000)
        tr, va, te = data.get_dataset_by_config(cfg, mini_fsd)
        assert len(tr) == 4


class TestMultiLabelTraining:
    def test_fit_with_multihot_labels(self, rng):
        n, c = 48, 5
        xs = rng.standard_normal((n, 512)).astype(np.float32)
        ys = (rng.random((n, c)) < 0.3).astype(np.float32)
        ys[:, 0] = 1.0  # ensure nonempty labels
        ds = data.ArrayDataset(xs, ys, 8000)
        cfg = dict(model_name="panns_cnn6", dataset_name="fsd",
                   init_lambd=20.0, n_points=512, hop_length=32,
                   optimized=True, normalize_window=False, n_mels=16,
                   resample_rate=8000, energy_normalize=True,
                   optimizer_name="adam", lr_model=1e-4, lr_tf=1.0,
                   batch_size=16, trainable=True, max_epochs=1,
                   patience=10)
        # patch class count: mini test uses 5 classes
        from dmel_tpu.models import registry
        registry.N_CLASSES["fsd"] = c
        try:
            state, hist = training.fit(cfg, ds, ds, seed=0)
        finally:
            registry.N_CLASSES["fsd"] = 200
        assert np.isfinite(hist["records"][0]["loss"])
        assert 0.0 <= hist["records"][0]["valid_acc"] <= 1.0

    def test_fsd_search_space(self):
        space = experiments.get_search_space("fsd", 10)
        cfgs = experiments.expand_grid(space)
        assert len(cfgs) == 6
        assert cfgs[0]["dataset_name"] == "fsd"


class TestMetrics:
    def test_average_precision_perfect(self):
        y = np.array([1, 1, 0, 0])
        s = np.array([0.9, 0.8, 0.2, 0.1])
        assert average_precision(y, s) == pytest.approx(1.0)

    def test_map_and_top1(self):
        y = np.array([[1, 0], [0, 1], [1, 0]])
        s = np.array([[0.9, 0.1], [0.2, 0.8], [0.3, 0.7]])
        m = mean_average_precision(y, s)
        assert 0.5 < m <= 1.0
        assert top1_precision(y, s) == pytest.approx(2 / 3)
