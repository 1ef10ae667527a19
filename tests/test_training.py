"""Training-loop tests (SURVEY.md §2 C14 parity + §4c integration)."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dmel_tpu import data, training
from dmel_tpu.training.train import bce_loss, ce_loss


def tf_config(**over):
    """Small time_frequency config (search_spaces.py:70-100 shape)."""
    cfg = dict(
        model_name="linear_net", hop_length=1, optimized=False,
        normalize_window=False, optimizer_name="sgd", lr_model=1e-3,
        lr_tf=1.0, batch_size=32, trainable=True, max_epochs=2, patience=100,
        n_points=64, noise_std=0.5, init_lambd=6.38, n_samples=200,
        sigma_ref=6.38, dataset_name="time_frequency", center_offset=False,
        data_seed=0)
    cfg.update(over)
    return cfg


class TestLosses:
    def test_ce_matches_torch(self, rng):
        logits = rng.standard_normal((8, 5)).astype(np.float32)
        labels = rng.integers(0, 5, 8)
        mask = np.ones(8, bool)
        ours = float(ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                             jnp.asarray(mask)))
        theirs = float(torch.nn.CrossEntropyLoss()(
            torch.tensor(logits), torch.tensor(labels)))
        assert abs(ours - theirs) < 1e-5

    def test_bce_matches_torch(self, rng):
        probs = rng.uniform(0.01, 0.99, (8, 5)).astype(np.float32)
        labels = np.eye(5, dtype=np.float32)[rng.integers(0, 5, 8)]
        mask = np.ones(8, bool)
        ours = float(bce_loss(jnp.asarray(probs), jnp.asarray(labels),
                              jnp.asarray(mask)))
        theirs = float(torch.nn.functional.binary_cross_entropy(
            torch.tensor(probs), torch.tensor(labels)))
        assert abs(ours - theirs) < 1e-5

    def test_masked_rows_excluded(self, rng):
        logits = rng.standard_normal((4, 3)).astype(np.float32)
        labels = np.array([0, 1, 2, 0])
        full = float(ce_loss(jnp.asarray(logits[:2]),
                             jnp.asarray(labels[:2]),
                             jnp.ones(2, bool)))
        masked = float(ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray([True, True, False, False])))
        assert abs(full - masked) < 1e-6


class TestOptim:
    def test_param_groups(self):
        params = {"spectrogram_layer": {"lambd": jnp.float32(6.38)},
                  "fc": {"kernel": jnp.zeros((4, 2)),
                         "bias": jnp.zeros(2)}}
        labels = training.param_labels(params)
        assert labels["spectrogram_layer"]["lambd"] == "tf"
        assert labels["fc"]["kernel"] == "model"

    def test_lr_split_applies(self):
        params = {"spectrogram_layer": {"lambd": jnp.float32(6.38)},
                  "fc": {"kernel": jnp.ones((2, 2))}}
        opt = training.build_optimizer(
            dict(optimizer_name="sgd", lr_model=0.1, lr_tf=1.0,
                 trainable=True), params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = opt.update(grads, opt.init(params), params)
        assert float(updates["spectrogram_layer"]["lambd"]) == \
            pytest.approx(-1.0)
        assert float(updates["fc"]["kernel"][0, 0]) == pytest.approx(-0.1)

    def test_frozen_lambd(self):
        params = {"spectrogram_layer": {"lambd": jnp.float32(6.38)},
                  "fc": {"kernel": jnp.ones((2, 2))}}
        opt = training.build_optimizer(
            dict(optimizer_name="sgd", lr_model=0.1, lr_tf=1.0,
                 trainable=False), params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = opt.update(grads, opt.init(params), params)
        assert float(updates["spectrogram_layer"]["lambd"]) == 0.0


class TestFit:
    def test_two_epochs_reduce_loss_and_report(self):
        cfg = tf_config()
        tr, va, _ = data.get_dataset_by_config(cfg, "/tmp")
        reports = []
        state, history = training.fit(cfg, tr, va,
                                      report_fn=reports.append)
        assert len(history["records"]) == 2
        assert len(reports) == 2
        for key in ["loss", "lambd_est", "valid_loss", "valid_acc",
                    "best_valid_acc", "best_valid_loss", "energy",
                    "best_lambd_est"]:
            assert key in reports[0]
        # lambda actually moved (trainable=True, lr_tf=1.0)
        assert history["est_lambd"] != pytest.approx(6.38)

    def test_diverged_lambda_stops_gracefully(self):
        """A NaN loss cascade NaNs lambda; fit() must record a
        diverged trial and stop instead of crashing in the window
        bucket selection (the esc50 fixture sweep hit exactly this:
        round-3 find — SURVEY §5 failure detection)."""
        import numpy as np
        cfg = tf_config(model_name="mel_linear_net", n_mels=8,
                        hop_length=8, resample_rate=8000,
                        energy_normalize=True, optimized=True,
                        max_epochs=4, optimizer_name="sgd")
        tr, va, _ = data.get_dataset_by_config(cfg, "/tmp")
        xs = np.array(tr.xs)
        xs[0, 0] = np.nan          # one corrupt sample NaNs the epoch
        tr = data.ArrayDataset(xs, tr.ys, 8000)
        state, history = training.fit(cfg, tr, va)
        assert history["diverged"] is True
        assert len(history["records"]) < 4

    def test_predict_uses_capped_window_bucket(self):
        """Eval-side rebuilds must apply the SAME signal-length window
        clamp as training's bucket_for — a checkpoint whose lambda
        drifted past n_points/6 would otherwise be evaluated at a
        larger bucket than it ever trained at (round-3 review find)."""
        from dmel_tpu.ops.spectrogram import (bucketed_window_length,
                                              optimized_window_length)
        # lambda past the cap: 6*400 = 2400 -> pow2 4096 > signal 128
        assert optimized_window_length(400.0) == 4096
        assert bucketed_window_length(400.0, 128) == 128
        cfg = tf_config(model_name="mel_linear_net", n_mels=8,
                        hop_length=8, resample_rate=8000,
                        energy_normalize=True, optimized=True,
                        max_epochs=1)
        tr, va, te = data.get_dataset_by_config(cfg, "/tmp")
        state, _ = training.fit(cfg, tr, va)
        # inflate lambda far past the signal-length bucket and predict:
        # the capped geometry must build and run (uncapped would
        # construct a 4096-point window layer over a 128-pt signal that
        # training never compiled)
        import jax.numpy as jnp
        state["params"]["spectrogram_layer"]["lambd"] = jnp.float32(400.0)
        labels, preds = training.predict(cfg, state, te)
        assert len(labels) == len(preds) == len(te)

    def test_frozen_lambd_stays(self):
        cfg = tf_config(trainable=False, max_epochs=1)
        tr, va, _ = data.get_dataset_by_config(cfg, "/tmp")
        state, history = training.fit(cfg, tr, va)
        assert history["est_lambd"] == pytest.approx(6.38)

    def test_early_stopping(self):
        cfg = tf_config(patience=1, max_epochs=50, lr_model=0.0, lr_tf=0.0)
        tr, va, _ = data.get_dataset_by_config(cfg, "/tmp")
        state, history = training.fit(cfg, tr, va)
        # zero LR -> valid loss never improves after epoch 0 -> stops at 2
        assert history["converged"]
        assert len(history["records"]) <= 3

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = tf_config(max_epochs=1)
        tr, va, te = data.get_dataset_by_config(cfg, "/tmp")
        state, _ = training.fit(cfg, tr, va, checkpoint_dir=str(tmp_path))
        restored = training.load_checkpoint(
            str(tmp_path / "best_model"),
            {"params": state["params"], "opt_state": state["opt_state"],
             "batch_stats": state["batch_stats"]})
        assert "params" in restored
        labels, preds = training.predict(cfg, restored, te, batch_size=16)
        assert labels.shape == preds.shape == (40,)

    def test_mid_trial_resume_identical_history(self, tmp_path):
        """VERDICT r4 next #6: a trial killed mid-run resumes at its
        last completed epoch and produces a history IDENTICAL to an
        uninterrupted run (params/opt/rng restored bit-exact, loader
        shuffle stream fast-forwarded)."""
        cfg = tf_config(max_epochs=5, n_samples=120,
                        optimizer_name="adam", lr_model=1e-3)
        tr, va, _ = data.get_dataset_by_config(cfg, "/tmp")

        # uninterrupted reference run
        state_ref, hist_ref = training.fit(
            cfg, tr, va, checkpoint_dir=str(tmp_path / "ref"))
        assert len(hist_ref["records"]) == 5

        # killed run: raise out of fit after epoch 1's report
        class Kill(Exception):
            pass

        calls = []

        def killer(record):
            calls.append(record)
            if record["epoch"] == 1:
                raise Kill

        tr2, va2, _ = data.get_dataset_by_config(cfg, "/tmp")
        with pytest.raises(Kill):
            training.fit(cfg, tr2, va2,
                         checkpoint_dir=str(tmp_path / "kill"),
                         report_fn=killer)
        assert os.path.exists(tmp_path / "kill" / "live_state")

        # resume: fresh datasets + fresh fit call, same checkpoint dir
        tr3, va3, _ = data.get_dataset_by_config(cfg, "/tmp")
        state_res, hist_res = training.fit(
            cfg, tr3, va3, checkpoint_dir=str(tmp_path / "kill"))

        assert len(hist_res["records"]) == 5
        for a, b in zip(hist_ref["records"], hist_res["records"]):
            assert a == b, f"records diverge at epoch {a['epoch']}"
        # params bit-identical too
        import jax
        for pa, pb in zip(jax.tree.leaves(state_ref["params"]),
                          jax.tree.leaves(state_res["params"])):
            np.testing.assert_array_equal(np.asarray(pa),
                                          np.asarray(pb))
        # completed run cleans its live snapshot
        assert not os.path.exists(tmp_path / "kill" / "live_state")

    def test_predict_uses_validated_geometry(self, tmp_path, monkeypatch):
        """Round-5 find: predict must evaluate at the geometry the
        checkpoint VALIDATED at (state/sidecar), not at the bucket of
        the final lambda — which may have crossed a bucket boundary
        during the best epoch (esc50_synth probe: 0.87 valid vs 0.34
        test before the fix)."""
        cfg = tf_config(model_name="mel_linear_net", n_mels=8,
                        hop_length=8, resample_rate=8000,
                        energy_normalize=True, optimized=True,
                        max_epochs=2)
        tr, va, te = data.get_dataset_by_config(cfg, "/tmp")
        state, _ = training.fit(cfg, tr, va,
                                checkpoint_dir=str(tmp_path))
        # sidecar written next to the best checkpoint
        import json
        meta = json.load(open(tmp_path / "best_model.meta.json"))
        assert meta["window_length"] == state["window_length"]

        # even if lambda is pushed across a bucket boundary, predict
        # builds the model at the recorded geometry
        import dmel_tpu.training.train as T
        seen = {}
        real = T.get_model_by_config

        def spy(config, window_length=None, lambd_hint=None):
            seen["wl"] = window_length
            return real(config, window_length=window_length,
                        lambd_hint=lambd_hint)

        monkeypatch.setattr(T, "get_model_by_config", spy)
        state["params"]["spectrogram_layer"]["lambd"] = jnp.float32(400.0)
        training.predict(cfg, state, te)
        assert seen["wl"] == state["window_length"]

    def test_resume_with_rbg_rng_impl(self, tmp_path):
        """Typed (non-threefry) prng keys serialize through the live
        snapshot via key_data/wrap_key_data; kill+resume stays
        bit-identical with rng_impl='rbg' and a dropout-using model."""
        cfg = tf_config(model_name="mel_linear_net", n_mels=8,
                        hop_length=8, resample_rate=8000,
                        energy_normalize=True, optimized=True,
                        max_epochs=3, n_samples=120, rng_impl="rbg")
        tr, va, _ = data.get_dataset_by_config(cfg, "/tmp")
        _, hist_ref = training.fit(cfg, tr, va,
                                   checkpoint_dir=str(tmp_path / "ref"))

        class Kill(Exception):
            pass

        def killer(record):
            if record["epoch"] == 0:
                raise Kill

        tr2, va2, _ = data.get_dataset_by_config(cfg, "/tmp")
        with pytest.raises(Kill):
            training.fit(cfg, tr2, va2,
                         checkpoint_dir=str(tmp_path / "kill"),
                         report_fn=killer)
        tr3, va3, _ = data.get_dataset_by_config(cfg, "/tmp")
        _, hist_res = training.fit(cfg, tr3, va3,
                                   checkpoint_dir=str(tmp_path / "kill"))
        assert hist_ref["records"] == hist_res["records"]

    def test_model_dtype_bfloat16_panns(self):
        """model_dtype='bfloat16' trains the CNN6 conv stack in bf16
        with f32 params/BN stats and finite metrics (the measured
        1.27x step lever, results/diag_cnn6_r5.txt)."""
        cfg = tf_config(model_name="panns_cnn6", n_mels=16,
                        hop_length=4, n_points=512, resample_rate=8000,
                        energy_normalize=True, optimized=True,
                        optimizer_name="adam", lr_model=1e-4,
                        max_epochs=1, n_samples=96, batch_size=16,
                        model_dtype="bfloat16", rng_impl="rbg")
        tr, va, te = data.get_dataset_by_config(cfg, "/tmp")
        state, history = training.fit(cfg, tr, va)
        assert np.isfinite(history["records"][-1]["valid_loss"])
        # master params stay f32
        conv = state["params"]["spectrogram_model"]["conv_block1"][
            "conv1"]["kernel"]
        assert conv.dtype == jnp.float32
        stats = state["batch_stats"]["spectrogram_model"][
            "conv_block1"]["bn1"]["mean"]
        assert stats.dtype == jnp.float32
        labels, preds = training.predict(cfg, state, te)
        assert len(labels) == len(te)

    def test_predict_accuracy_better_than_chance(self):
        cfg = tf_config(max_epochs=5, n_samples=400)
        tr, va, te = data.get_dataset_by_config(cfg, "/tmp")
        state, history = training.fit(cfg, tr, va)
        labels, preds = training.predict(cfg, state, te)
        acc = float((labels == preds).mean())
        assert acc > 0.4  # 3 classes, chance = 0.33


class TestPANNsImport:
    def test_cnn6_weight_import(self):
        from dmel_tpu import models
        # build a tiny torch-like state dict matching Cnn6 module names
        model = models.MelPANNsNet(
            n_classes=50, init_lambd=46.67, n_mels=64, n_points=2000,
            sample_rate=8000, hop_length=80, optimized=True,
            window_length=512, energy_normalize=True)
        x = jnp.zeros((1, 2000))
        variables = jax.tree.map(np.asarray,
                                 model.init(jax.random.PRNGKey(0), x))
        sd = {
            "conv_block1.conv1.weight": torch.ones(64, 1, 5, 5),
            "conv_block1.bn1.weight": torch.full((64,), 2.0),
            "conv_block1.bn1.running_mean": torch.full((64,), 3.0),
            "fc1.weight": torch.ones(512, 512),
            "fc1.bias": torch.full((512,), 4.0),
            # AudioSet head: wrong shape, must be skipped (strict=False)
            "fc_esc50.weight": torch.ones(527, 512),
        }
        out = training.import_panns_cnn6(sd, {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"]})
        p = out["params"]["spectrogram_model"]
        assert p["conv_block1"]["conv1"]["kernel"].shape == (5, 5, 1, 64)
        assert float(p["conv_block1"]["conv1"]["kernel"][0, 0, 0, 0]) == 1.0
        assert float(p["conv_block1"]["bn1"]["scale"][0]) == 2.0
        assert float(out["batch_stats"]["spectrogram_model"]["conv_block1"]
                     ["bn1"]["mean"][0]) == 3.0
        assert float(p["fc1"]["bias"][0]) == 4.0
        # mismatched head untouched (random init, not all-ones)
        assert not np.allclose(np.asarray(p["fc_esc50"]["kernel"]), 1.0)


class TestBucketUpdate:
    def test_step_mode_and_bucket_change(self, rng):
        """Optimized-mode per-step bucket re-selection (the reference's
        per-forward next_power_of_2 at time_frequency.py:39), including
        an actual bucket crossing driven by a large lr_tf."""
        import numpy as np
        from dmel_tpu import data
        from dmel_tpu.ops.spectrogram import optimized_window_length
        xs = rng.standard_normal((64, 512)).astype(np.float32)
        ys = rng.integers(0, 10, 64).astype(np.int32)
        ds = data.ArrayDataset(xs, ys, 8000)
        # init just under the 128-bucket ceiling; huge lr_tf makes
        # lambda move enough to cross a power-of-2 boundary
        cfg = dict(model_name="mel_linear_net", dataset_name="audio_mnist",
                   init_lambd=21.0, n_points=512, hop_length=32,
                   optimized=True, normalize_window=False, n_mels=16,
                   resample_rate=8000, energy_normalize=True,
                   optimizer_name="sgd", lr_model=1e-3, lr_tf=200.0,
                   batch_size=16, trainable=True, max_epochs=2,
                   patience=10, bucket_update="step")
        assert optimized_window_length(21.0) == 128
        state, hist = training.fit(cfg, ds, ds, seed=0)
        lams = [r["lambd_est"] for r in hist["records"]]
        buckets = {optimized_window_length(l) for l in lams + [21.0]}
        # training ran to completion regardless of bucket churn
        assert np.isfinite(hist["records"][-1]["valid_loss"])
        # with lr_tf=200 the lambda moved far; usually crosses a bucket
        assert abs(lams[-1] - 21.0) > 0.5
