"""Experiment runner + eval pipeline tests (SURVEY.md §2 C15-C20)."""

import json
import os

import numpy as np
import pytest

from dmel_tpu import experiments
from dmel_tpu.experiments import runner


def tiny_space(max_epochs=1):
    return dict(
        model_name="linear_net", hop_length=1, optimized=False,
        normalize_window=False, optimizer_name="sgd", lr_model=1e-3,
        lr_tf=1.0, batch_size=32, max_epochs=max_epochs, patience=100,
        n_points=64, noise_std=0.5, n_samples=120, sigma_ref=6.38,
        dataset_name="time_frequency", center_offset=False, data_seed=0,
        trainable=experiments.grid_search([True, False]),
        init_lambd=experiments.grid_search([1.276, 6.38]),
    )


class TestGrid:
    def test_expand_grid(self):
        space = {"a": experiments.grid_search([1, 2]),
                 "b": experiments.grid_search(["x", "y"]), "c": 7}
        out = experiments.expand_grid(space)
        assert len(out) == 4
        assert all(cfg["c"] == 7 for cfg in out)
        assert {(c["a"], c["b"]) for c in out} == {(1, "x"), (1, "y"),
                                                  (2, "x"), (2, "y")}

    def test_reference_spaces(self):
        for name, n_grid in [("esc50", 6), ("audio_mnist", 6),
                             ("time_frequency", 6)]:
            space = experiments.get_search_space(name, max_epochs=10)
            cfgs = experiments.expand_grid(space)
            assert len(cfgs) == n_grid  # 2 trainable x 3 init_lambd
            assert all(c["max_epochs"] == 10 for c in cfgs)

    def test_space_dispatch_substring(self):
        s = experiments.get_search_space("my_esc50_run", 5)
        assert s["dataset_name"] == "esc50"
        with pytest.raises(ValueError):
            experiments.get_search_space("unknown", 5)


class TestSweep:
    @pytest.fixture(scope="class")
    def sweep_dir(self, tmp_path_factory):
        out = tmp_path_factory.mktemp("results")
        return runner.run_sweep("time_frequency_tiny", num_samples=1,
                                max_epochs=1, output_dir=str(out),
                                data_dir="/tmp", space=tiny_space())

    def test_sweep_layout(self, sweep_dir):
        assert os.path.isfile(os.path.join(sweep_dir, "manifest.json"))
        assert os.path.isfile(os.path.join(sweep_dir, "results.csv"))
        trials = [d for d in os.listdir(sweep_dir) if d.startswith("trial_")]
        assert len(trials) == 4
        t0 = os.path.join(sweep_dir, "trial_00000")
        assert os.path.isfile(os.path.join(t0, "config.json"))
        assert os.path.isfile(os.path.join(t0, "progress.csv"))
        assert os.path.isfile(os.path.join(t0, "checkpoint_000000",
                                           "best_model"))

    def test_results_roundtrip(self, sweep_dir):
        df = runner.load_results(sweep_dir)
        assert len(df) == 4
        row = df.iloc[0].to_dict()
        cfg = runner.get_config_by_row(row)
        assert cfg["dataset_name"] == "time_frequency"
        assert "best_valid_acc" in row and "best_lambd_est" in row

    def test_resume_skips_finished(self, sweep_dir, capsys):
        runner.run_sweep("time_frequency_tiny", num_samples=1,
                         max_epochs=1,
                         output_dir=os.path.dirname(sweep_dir),
                         data_dir="/tmp", space=tiny_space(), verbose=1)
        out = capsys.readouterr().out
        assert out.count("skip finished") == 4

    def test_predict_test_and_tables(self, sweep_dir):
        from dmel_tpu import eval as deval
        df = deval.predict_test(sweep_dir, "/tmp", verbose=0)
        assert "test_accuracy" in df.columns
        assert os.path.isfile(os.path.join(sweep_dir,
                                           "time_frequency.csv"))
        table = deval.produce_table_2(sweep_dir, scales=(0.2, 1.0))
        assert "LinearNet" in table and "DSPEC" in table

    def test_predict_skips_diverged_trial(self, sweep_dir, tmp_path):
        """A trial that diverged before its first valid improvement has
        no checkpoint (fit()'s NaN guard); predict must record NaN
        metrics for it and still save the (now ragged) prediction
        stacks instead of crashing (round-3 esc50 sweep find)."""
        import shutil
        from dmel_tpu import eval as deval
        sweep = str(tmp_path / "sweep")
        shutil.copytree(sweep_dir, sweep)
        # results.csv stores absolute logdirs; point them at the copy
        import pandas as pd
        rcsv = os.path.join(sweep, "results.csv")
        rdf = pd.read_csv(rcsv)
        rdf["logdir"] = [os.path.join(sweep, os.path.basename(str(p)))
                         for p in rdf["logdir"]]
        rdf.to_csv(rcsv, index=False)
        shutil.rmtree(os.path.join(sweep, "trial_00000",
                                   "checkpoint_000000"))
        df = deval.predict_test(sweep, "/tmp", verbose=0)
        order = [os.path.basename(str(p)) for p in df["logdir"]]
        i0 = order.index("trial_00000")
        accs = df["test_accuracy"].to_numpy()
        assert np.isnan(accs[i0])
        assert np.isfinite(np.delete(accs, i0)).all()
        preds = np.load(os.path.join(sweep,
                                     "time_frequency_predictionss.npy"),
                        allow_pickle=True)
        assert len(preds) == len(df) and preds[i0].size == 0
        assert preds[(i0 + 1) % len(preds)].size > 0

    def test_figures(self, sweep_dir, tmp_path):
        from dmel_tpu import eval as deval
        p1 = deval.produce_data_example_plot(str(tmp_path / "demo.png"))
        assert os.path.getsize(p1) > 10000
        p2 = deval.produce_accuracy_plot(sweep_dir,
                                         str(tmp_path / "acc.png"))
        assert os.path.getsize(p2) > 10000


class TestComplexity:
    def test_cost_ratio_shape_and_regimes(self):
        from dmel_tpu.eval.complexity import cost_ratio
        ds = np.arange(1, 30)
        r_nn = cost_ratio(ds, c1=0.0001, init_mi=0.02)
        assert r_nn.shape == (29,)
        # NN-dominated: DMEL trains 1 model vs D, ratio falls as D grows
        assert r_nn[-1] < r_nn[2]

    def test_plot(self, tmp_path):
        from dmel_tpu.eval.complexity import produce_complexity_plot
        p = produce_complexity_plot(str(tmp_path / "c.png"))
        assert os.path.getsize(p) > 10000


class TestCLI:
    def test_cli_runs_sweep(self, tmp_path, monkeypatch):
        from dmel_tpu.experiments import cli, configs
        monkeypatch.setitem(configs.SEARCH_SPACES, "tiny",
                            lambda me: tiny_space(me))
        cli.main(["--name", "tiny", "--num_samples", "1",
                  "--max_epochs", "1", "--output_dir", str(tmp_path),
                  "--data_dir", "/tmp", "--verbose", "0"])
        assert os.path.isfile(tmp_path / "tiny" / "results.csv")


class TestResultTable:
    def test_produce_result_table(self, tmp_path):
        import pandas as pd
        from dmel_tpu import eval as deval
        df = pd.DataFrame([
            {"config/dataset_name": "esc50", "config/model_name":
             "panns_cnn6", "config/trainable": True,
             "config/init_lambd": 33.3, "test_accuracy": 0.8},
            {"config/dataset_name": "esc50", "config/model_name":
             "panns_cnn6", "config/trainable": False,
             "config/init_lambd": 33.3, "test_accuracy": 0.7},
        ])
        df.to_csv(tmp_path / "esc50.csv", index=False)
        table = deval.produce_result_table(str(tmp_path), "esc50")
        assert "PANNs CNN6" in table and "0.80" in table


class TestPackedSweep:
    def test_packed_sweep_layout_and_eval(self, tmp_path):
        from dmel_tpu import eval as deval
        from dmel_tpu.experiments.runner import run_sweep_packed
        sweep = run_sweep_packed("tf_packed", num_samples=1, max_epochs=2,
                                 output_dir=str(tmp_path), data_dir="/tmp",
                                 space=tiny_space(2))
        assert os.path.isfile(os.path.join(sweep, "results.csv"))
        trials = [d for d in os.listdir(sweep) if d.startswith("trial_")]
        assert len(trials) == 4
        # full eval pipeline works on the packed layout
        df = deval.predict_test(sweep, "/tmp", verbose=0)
        assert "test_accuracy" in df.columns
        assert (df["test_accuracy"] > 0.3).all()


class TestPackedOptimized:
    def test_packed_sweep_optimized_buckets(self, tmp_path, rng):
        """Packed sweep across trials whose init_lambd implies different
        power-of-2 window buckets (fit_trials uses the max bucket)."""
        import numpy as np
        from dmel_tpu import data
        from dmel_tpu.experiments.runner import run_sweep_packed
        import dmel_tpu.data.registry as reg

        xs = rng.standard_normal((96, 512)).astype(np.float32)
        ys = rng.integers(0, 10, 96).astype(np.int32)
        ds = data.ArrayDataset(xs, ys, 8000)
        tr = data.Subset(ds, np.arange(64))
        va = data.Subset(ds, np.arange(64, 96))

        orig = reg._audio_mnist_splits
        reg._audio_mnist_splits = lambda d: (tr, va, va)
        try:
            space = dict(
                model_name="mel_linear_net", dataset_name="audio_mnist",
                n_mels=16, hop_length=32, energy_normalize=True,
                optimized=True, normalize_window=False,
                optimizer_name="adam", lr_model=1e-4, lr_tf=0.5,
                batch_size=16, trainable=True, max_epochs=1, patience=10,
                resample_rate=8000, n_points=512,
                init_lambd=experiments.grid_search([10.0, 40.0]))
            sweep = run_sweep_packed("packed_opt", 1, 1,
                                     str(tmp_path), "/tmp", space=space)
        finally:
            reg._audio_mnist_splits = orig
        df = runner.load_results(sweep)
        assert len(df) == 2
        assert np.isfinite(df["valid_loss"].astype(float)).all()


def pallas_space(max_epochs=1, **over):
    """Tiny optimized-mode space that rides the specband kernel when
    the auto floor is lowered: bucket(24) = 256, hop 16 -> g = 8,
    specband_ok(24, 256, 256, 16) holds, no lowbin."""
    space = dict(
        model_name="mel_linear_net", n_mels=64, hop_length=16,
        energy_normalize=True, optimized=True, impl="pallas",
        normalize_window=False, optimizer_name="sgd", lr_model=1e-3,
        lr_tf=1.0, batch_size=32, max_epochs=max_epochs, patience=100,
        n_points=256, noise_std=0.5, n_samples=96, sigma_ref=6.38,
        dataset_name="time_frequency", center_offset=False, data_seed=0,
        trainable=True, init_lambd=24.0, resample_rate=8000,
    )
    space.update(over)
    return space


class TestPallasDefault:
    def test_production_spaces_default_pallas(self):
        """VERDICT r3 next #2: the optimized-mode search spaces ship
        impl='pallas' so CLI sweeps ride the certified kernel; the
        faithful-mode time_frequency space stays XLA by documented
        decision (tiny FLOPs, below the certified floor)."""
        for name in ("esc50", "audio_mnist", "fsd"):
            assert experiments.get_search_space(name, 1)["impl"] == "pallas"
        assert "impl" not in experiments.get_search_space(
            "time_frequency", 1)

    def test_production_spaces_carry_round5_levers(self):
        """The measured step levers ship in the production spaces:
        rng_impl=rbg everywhere, model_dtype=bfloat16 for the PANNs
        spaces (task-equivalence validated on the esc50_synth sweep;
        results/diag_cnn6_r5.txt, bench_train_r5c.txt)."""
        for name in ("esc50", "esc50_synth", "fsd", "audio_mnist"):
            assert experiments.get_search_space(name, 1)[
                "rng_impl"] == "rbg"
        for name in ("esc50", "esc50_synth", "fsd"):
            assert experiments.get_search_space(name, 1)[
                "model_dtype"] == "bfloat16"

    def test_runner_engages_specband_hint(self, tmp_path, monkeypatch):
        """A runner sweep with impl='pallas' reaches the specband
        kernel through fit()'s bucket+hint step cache (the headline
        path is wired to the front door, not just direct fit calls)."""
        from dmel_tpu.ops import stft as stft_mod
        from dmel_tpu.ops.pallas import specband_dmel as sb
        monkeypatch.setattr(stft_mod, "PALLAS_AUTO_MIN_NFFT", 64)
        calls = []
        real = sb.specband_mel_power

        def spy(*a, **k):
            calls.append(k.get("j_taps"))
            return real(*a, **k)

        monkeypatch.setattr(sb, "specband_mel_power", spy)
        runner.run_sweep("pallas_tiny", num_samples=1, max_epochs=1,
                         output_dir=str(tmp_path), data_dir="/tmp",
                         space=pallas_space())
        assert calls, "specband kernel never dispatched by the runner"

    def test_predict_paths_use_certified_dispatch(self, tmp_path,
                                                  monkeypatch):
        """VERDICT r4 next #2: BOTH predict paths (training.predict and
        eval.predict_test -> predictions_by_row) derive the same static
        lambd_hint as fit(), so impl='pallas' checkpoints evaluate on
        the certified specband route they trained on instead of
        silently falling to the framed/XLA path."""
        from dmel_tpu import data, training
        from dmel_tpu.ops import stft as stft_mod
        from dmel_tpu.ops.pallas import specband_dmel as sb
        monkeypatch.setattr(stft_mod, "PALLAS_AUTO_MIN_NFFT", 64)
        sweep = runner.run_sweep("pallas_predict", num_samples=1,
                                 max_epochs=1, output_dir=str(tmp_path),
                                 data_dir="/tmp", space=pallas_space())
        calls = []
        real = sb.specband_mel_power

        def spy(*a, **k):
            calls.append(k.get("j_taps"))
            return real(*a, **k)

        monkeypatch.setattr(sb, "specband_mel_power", spy)
        # eval-side sweep predictions (predictions_by_row)
        from dmel_tpu.eval.predict import predict_test
        predict_test(sweep, "/tmp", batch_size=32, verbose=0)
        assert calls, "predict_test never dispatched the specband kernel"

        # training.predict on a fresh fit state
        cfg = pallas_space()
        tr, va, te = data.get_dataset_by_config(cfg, "/tmp")
        state, _ = training.fit(cfg, tr, va)
        calls.clear()
        labels, preds = training.predict(cfg, state, te)
        assert calls, "training.predict never dispatched specband"
        assert len(labels) == len(preds) == len(te)

    def test_packed_runner_engages_specband_hint(self, tmp_path,
                                                 monkeypatch):
        """run_sweep_packed (the --pack CLI path) with impl='pallas'
        rides the specband kernel when the pack shares one
        static-switch region (VERDICT r3 next #4 at the runner
        level)."""
        from dmel_tpu.ops import stft as stft_mod
        from dmel_tpu.ops.pallas import specband_dmel as sb
        monkeypatch.setattr(stft_mod, "PALLAS_AUTO_MIN_NFFT", 64)
        calls = []
        real = sb.specband_mel_power

        def spy(*a, **k):
            calls.append(k.get("j_taps"))
            return real(*a, **k)

        monkeypatch.setattr(sb, "specband_mel_power", spy)
        space = pallas_space(trainable=experiments.grid_search(
            [True, False]))   # 2 trials, same init_lambd -> one region
        sweep_dir = runner.run_sweep_packed(
            "pallas_packed_tiny", num_samples=1, max_epochs=1,
            output_dir=str(tmp_path), data_dir="/tmp", space=space)
        assert calls, "packed runner never dispatched specband"
        assert os.path.isfile(os.path.join(sweep_dir, "results.csv"))
