"""Dataset tests (SURVEY.md §2 C9-C12 parity)."""

import os
import wave

import numpy as np
import pytest

from dmel_tpu import data


class TestSynthetic:
    def test_shapes_classes_and_stats(self):
        ds = data.make_gauss_pulse_dataset(sigma=6.38, n_points=128,
                                           noise_std=0.5, n_samples=600,
                                           seed=0)
        assert ds.xs.shape == (600, 128) and ds.xs.dtype == np.float32
        assert set(np.unique(ds.ys)) == {0, 1, 2}
        # per-sample mean subtraction (datasets.py:131)
        assert np.abs(ds.xs.mean(axis=1)).max() < 1e-5
        assert ds.locs.shape == (600, 4)

    def test_class_geometry_in_locs(self):
        ds = data.make_gauss_pulse_dataset(sigma=6.38, n_points=128,
                                           noise_std=0.0, n_samples=900,
                                           seed=1)
        # class 1: two time locations straddling the center symmetrically
        l1 = ds.locs[ds.ys == 1]
        np.testing.assert_allclose((l1[:, 0] + l1[:, 2]) / 2, 64.0, atol=1e-3)
        assert (l1[:, 2] - l1[:, 0]).min() >= 2 * 6.38 - 1e-3
        # class 2: two frequency locations straddling 0.25
        l2 = ds.locs[ds.ys == 2]
        np.testing.assert_allclose((l2[:, 1] + l2[:, 3]) / 2, 0.25, atol=1e-6)

    def test_demo_mode_is_deterministic_geometry(self):
        ds = data.make_gauss_pulse_dataset(sigma=6.38, n_points=128,
                                           noise_std=0.5, n_samples=30,
                                           demo=True, seed=2)
        l1 = ds.locs[ds.ys == 1]
        # fixed offsets: t_offset = 0.5 * n/5
        np.testing.assert_allclose(l1[:, 2] - l1[:, 0], 128 / 5, atol=1e-4)

    def test_fmconst_normalized(self):
        y = data.fmconst_np(128, 0.25, 1.0)
        assert abs(float(np.max(y)) - 1.0) < 1e-9


class TestEsc50Synth:
    def test_shapes_classes_registry(self):
        from dmel_tpu.data.synthetic import make_esc50_synth_dataset
        ds = make_esc50_synth_dataset(n_samples=300, seed=0)
        assert ds.xs.shape == (300, 40000) and ds.xs.dtype == np.float32
        assert set(np.unique(ds.ys)) <= set(range(10))
        assert len(set(np.unique(ds.ys))) == 10
        # mean-subtracted like the reference generator
        assert np.abs(ds.xs.mean(axis=1)).max() < 1e-5
        # registry round-trip builds splits without touching disk
        cfg = dict(dataset_name="esc50_synth", n_points=40000,
                   n_samples=300, noise_std=0.05, data_seed=0)
        tr, va, te = data.get_dataset_by_config(cfg, "/nonexistent")
        assert len(tr) + len(va) + len(te) == 300
        from dmel_tpu.models.registry import n_classes_for
        assert n_classes_for("esc50_synth") == 10

    def test_deterministic_and_signal_present(self):
        from dmel_tpu.data.synthetic import make_esc50_synth_dataset
        a = make_esc50_synth_dataset(n_samples=50, seed=3)
        b = make_esc50_synth_dataset(n_samples=50, seed=3)
        np.testing.assert_array_equal(a.xs, b.xs)
        # pattern window carries far more energy than the noise floor
        for i in range(10):
            c = int(a.locs[i, 0])
            seg = a.xs[i, max(c - 2048, 0):c + 2048]
            assert float(np.sqrt((seg ** 2).mean())) > 2 * 0.05 * 0.29

    def test_search_space_dispatch_not_swallowed_by_esc50(self):
        """Substring dispatch must route esc50_synth to its own space
        (the esc50 key would otherwise match first)."""
        from dmel_tpu import experiments
        space = experiments.get_search_space("esc50_synth", 1)
        assert space["dataset_name"] == "esc50_synth"
        assert space["model_name"] == "panns_cnn6"

    def test_classes_mel_separable(self):
        """Crude learnability signal: time-averaged mel profiles at the
        reference sigma separate the three carriers (classes 0-2 vs
        3-5 occupy different mel bands)."""
        import jax
        import jax.numpy as jnp

        from dmel_tpu.models.layers import MelSpectrogramLayer
        from dmel_tpu.ops.spectrogram import optimized_window_length
        from dmel_tpu.data.synthetic import make_esc50_synth_dataset
        ds = make_esc50_synth_dataset(n_samples=120, seed=4,
                                      n_points=8000)
        lam = 8000 * 0.035 / 6
        layer = MelSpectrogramLayer(
            init_lambd=lam, n_points=8000, hop_length=80, n_mels=64,
            sample_rate=8000, optimized=True,
            window_length=optimized_window_length(lam))
        p = layer.init(jax.random.PRNGKey(0), jnp.asarray(ds.xs[:1]))
        mel = np.asarray(layer.apply(p, jnp.asarray(ds.xs)))[:, 0]
        prof = mel.mean(axis=-1)                 # (n, n_mels)
        lo = prof[np.isin(ds.ys, [0, 1, 2])].mean(0)
        hi = prof[np.isin(ds.ys, [6, 7, 8])].mean(0)
        # carrier 0.15 peaks in a lower mel band than carrier 0.35
        assert int(lo.argmax()) < int(hi.argmax())


class TestSplits:
    def test_matches_torch_random_split(self):
        import torch
        xs = np.arange(1000, dtype=np.float32)[:, None]
        ys = np.arange(1000)
        ds = data.ArrayDataset(xs, ys, 8000)
        ours = data.random_split(ds, (0.7, 0.1, 0.2), seed=0)

        g = torch.Generator()
        g.manual_seed(0)
        theirs = torch.utils.data.random_split(
            torch.utils.data.TensorDataset(torch.arange(1000)),
            [0.7, 0.1, 0.2], generator=g)
        for o, t in zip(ours, theirs):
            t_idx = np.asarray(t.indices)
            np.testing.assert_array_equal(o.indices, t_idx)

    def test_lengths(self):
        assert data.random_split_lengths(10, [0.7, 0.1, 0.2]) == [7, 1, 2]
        assert sum(data.random_split_lengths(5000, [0.7, 0.1, 0.2])) == 5000

    def test_speaker_partition_disjoint(self):
        from dmel_tpu.data.splits import check_speaker_partition
        check_speaker_partition()


class TestLoader:
    def test_batches_cover_dataset(self):
        ds = data.ArrayDataset(np.arange(10, dtype=np.float32)[:, None],
                               np.arange(10), 8000)
        loader = data.BatchLoader(ds, batch_size=4, shuffle=False)
        seen = []
        for xs, ys, mask in loader:
            assert xs.shape[0] == 4
            seen += list(ys[mask])
        assert sorted(seen) == list(range(10))

    def test_shuffle_changes_order_across_epochs(self):
        ds = data.ArrayDataset(np.arange(64, dtype=np.float32)[:, None],
                               np.arange(64), 8000)
        loader = data.BatchLoader(ds, batch_size=64, shuffle=True, seed=3)
        e1 = next(iter(loader))[1]
        e2 = next(iter(loader))[1]
        assert not np.array_equal(e1, e2)
        assert sorted(e1) == sorted(e2)

    def test_drop_last(self):
        ds = data.ArrayDataset(np.zeros((10, 2), np.float32),
                               np.zeros(10), 8000)
        loader = data.BatchLoader(ds, batch_size=4, drop_last=True)
        assert len(list(loader)) == 2


class TestWavIO:
    def test_wav_roundtrip(self, tmp_path):
        sr = 8000
        t = np.arange(sr)
        x = (0.5 * np.sin(2 * np.pi * 440 * t / sr))
        pcm = (x * 32767).astype("<i2")
        p = tmp_path / "0_test_0.wav"
        with wave.open(str(p), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes(pcm.tobytes())
        y, sr2 = data.load_wav(str(p))
        assert sr2 == sr
        assert np.max(np.abs(y - x)) < 1e-3

    def test_resample_preserves_tone(self):
        sr, target = 44100, 8000
        t = np.arange(sr * 2) / sr
        x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        y = data.resample(x, sr, target)
        assert abs(len(y) - 2 * target) <= 1
        # dominant frequency preserved
        spec = np.abs(np.fft.rfft(y))
        peak_hz = np.argmax(spec) / len(y) * target
        assert abs(peak_hz - 440) < 2

    def test_resample_kaiser_vs_polyphase_bound(self):
        """Quantified divergence between the two resampler filters
        (VERDICT r1 #8).  kaiser_fast reproduces librosa's design family
        (num_zeros=16, beta=8.555504, rolloff=0.85 — the reference's
        ESC-50 path, datasets.py:255) and is the default; scipy's
        default polyphase filter diverges mainly in the rolloff-edge
        mel bands.  Measured bounds (documented in COVERAGE.md): in-band
        (mel centers < 3.2 kHz) log-mel delta < 1.0; rolloff-edge bands
        can reach ~8 log units — which is exactly why the default
        matches the reference's filter design."""
        import jax.numpy as jnp
        from dmel_tpu import ops
        from tests.fixtures import speechish
        r = np.random.default_rng(0)
        x = speechish(r, 44100, 44100, 200.0)
        a = data.resample(x, 44100, 8000, quality="kaiser_fast")
        b = data.resample(x, 44100, 8000, quality="polyphase")
        assert a.shape == b.shape == (8000,)
        # in-band waveforms agree closely; full-band includes edge
        assert np.max(np.abs(a - b)) < 0.05

        def logmel(y):
            return np.asarray(ops.log_mel_spectrogram(
                jnp.asarray(y[None]), 46.67, n_mels=64, sample_rate=8000,
                hop_length=80, optimized=True, window_length=512))[0]

        d = np.abs(logmel(a) - logmel(b))
        from dmel_tpu.ops.mel import hz_to_mel, mel_to_hz
        centers = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(4000.0),
                                        66))[1:-1]
        assert d[centers < 3200].max() < 1.0     # in-band bound
        # the two filters are NOT 1e-4-equivalent — that is the point
        assert d.max() > 1e-3

    def test_esc50_cache(self, tmp_path):
        # synthesize a 2-file mini ESC-50 layout
        os.makedirs(tmp_path / "meta")
        os.makedirs(tmp_path / "audio")
        rows = ["filename,fold,target,category,esc10,src_file,take"]
        for i in range(2):
            name = f"clip{i}.wav"
            rows.append(f"{name},1,{i},cat{i},True,0,A")
            x = (np.sin(2 * np.pi * 300 * np.arange(44100) / 44100)
                 * 32767 * 0.1).astype("<i2")
            with wave.open(str(tmp_path / "audio" / name), "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(44100)
                f.writeframes(x.tobytes())
        (tmp_path / "meta" / "esc50.csv").write_text("\n".join(rows))
        ds = data.esc50(str(tmp_path), resample_rate=8000)
        assert ds.xs.shape[0] == 2 and ds.sample_rate == 8000
        assert os.path.exists(tmp_path / "8000_xs.npy")
        # second load hits the cache
        ds2 = data.esc50(str(tmp_path), resample_rate=8000)
        np.testing.assert_array_equal(ds.xs, ds2.xs)


class TestRegistry:
    def test_time_frequency_config(self):
        config = dict(dataset_name="time_frequency", sigma_ref=6.38,
                      n_points=128, noise_std=0.5, n_samples=200,
                      center_offset=False, data_seed=0)
        tr, va, te = data.get_dataset_by_config(config, data_dir="/tmp")
        assert len(tr) == 140 and len(va) == 20 and len(te) == 40
        # split membership is disjoint
        all_idx = np.concatenate([tr.indices, va.indices, te.indices])
        assert len(np.unique(all_idx)) == 200

    def test_unknown_dataset_raises(self):
        with pytest.raises(ValueError):
            data.get_dataset_by_config({"dataset_name": "nope"}, "/tmp")


class TestProfiling:
    def test_step_timer(self):
        import time
        from dmel_tpu.utils.profiling import StepTimer
        timer = StepTimer(audio_seconds_per_batch=10.0, n_chips=2,
                          skip_first=1)
        for _ in range(3):
            with timer.step():
                time.sleep(0.01)
        s = timer.summary()
        assert s["steps"] == 2  # first excluded (compile)
        assert s["audio_s_per_s_per_chip"] == pytest.approx(
            10.0 / s["mean_step_s"] / 2)


class TestPrefetchIterator:
    def _ds(self, n=10):
        from dmel_tpu import data
        xs = np.arange(n * 4, dtype=np.float32).reshape(n, 4)
        ys = np.arange(n, dtype=np.int32)
        return data.ArrayDataset(xs, ys, 8000)

    def test_yields_identical_batches_in_order(self):
        from dmel_tpu.data.loader import BatchLoader, PrefetchIterator
        ds = self._ds()
        direct = list(BatchLoader(ds, 4, shuffle=True, seed=3))
        pref = list(PrefetchIterator(
            iter(BatchLoader(ds, 4, shuffle=True, seed=3)), depth=2))
        assert len(direct) == len(pref)
        for a, b in zip(direct, pref):
            for x, y in zip(a, b):
                assert (np.asarray(x) == np.asarray(y)).all()

    def test_transform_applied_and_exception_propagates(self):
        from dmel_tpu.data.loader import PrefetchIterator
        out = list(PrefetchIterator(iter([1, 2, 3]),
                                    transform=lambda v: v * 10))
        assert out == [10, 20, 30]

        def bad():
            yield 1
            raise ValueError("boom")

        it = PrefetchIterator(bad())
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            next(it)

    def test_fit_with_prefetch_matches_without(self):
        """fit()'s prefetched placement is bit-equivalent to inline
        placement (same batches, same order, same device values)."""
        from dmel_tpu import training
        cfg = dict(model_name="mel_linear_net", dataset_name="audio_mnist",
                   init_lambd=10.0, n_points=256, hop_length=16,
                   optimized=False, normalize_window=False, n_mels=16,
                   resample_rate=8000, energy_normalize=True,
                   optimizer_name="sgd", lr_model=1e-3, lr_tf=1.0,
                   trainable=True, batch_size=8, max_epochs=2,
                   patience=100)
        rng = np.random.default_rng(0)
        from dmel_tpu import data
        xs = rng.standard_normal((24, 256)).astype(np.float32)
        ys = rng.integers(0, 10, 24).astype(np.int32)
        tr = data.ArrayDataset(xs, ys, 8000)
        _, h0 = training.fit(dict(cfg, prefetch=0), tr, tr, seed=0)
        _, h2 = training.fit(dict(cfg, prefetch=2), tr, tr, seed=0)
        for a, b in zip(h0["records"], h2["records"]):
            assert a["loss"] == b["loss"]
            assert a["valid_loss"] == b["valid_loss"]

    def test_abandoned_iteration_releases_worker(self):
        """Breaking out early (the fit() divergence path) must not leave
        the worker blocked forever holding queued batches."""
        import threading
        from dmel_tpu.data.loader import PrefetchIterator
        before = threading.active_count()
        it = PrefetchIterator(iter(range(1000)), depth=2)
        assert next(it) == 0
        it.close()
        assert not it._thread.is_alive()
        # close is idempotent and post-close next raises cleanly
        it.close()
        assert threading.active_count() <= before + 1

    def test_exhausted_iterator_raises_again_not_blocks(self):
        from dmel_tpu.data.loader import PrefetchIterator
        it = PrefetchIterator(iter([1, 2]))
        assert list(it) == [1, 2]
        with pytest.raises(StopIteration):   # latched — must NOT hang
            next(it)
