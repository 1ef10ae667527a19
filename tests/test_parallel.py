"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmel_tpu import data, models, parallel, training


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    return parallel.make_mesh(("data",), devices=jax.devices()[:8])


def small_cfg(**over):
    cfg = dict(model_name="mel_linear_net", dataset_name="audio_mnist",
               init_lambd=10.0, n_points=256, hop_length=16,
               optimized=False, normalize_window=False, n_mels=16,
               resample_rate=8000, energy_normalize=True,
               optimizer_name="sgd", lr_model=1e-3, lr_tf=1.0,
               trainable=True, batch_size=16, max_epochs=2, patience=100)
    cfg.update(over)
    return cfg


def toy_dataset(n=64, n_points=256, seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.standard_normal((n, n_points)).astype(np.float32)
    ys = (rng.integers(0, 10, n)).astype(np.int32)
    return data.ArrayDataset(xs, ys, 8000)


class TestMesh:
    def test_make_mesh(self, mesh8):
        assert mesh8.devices.size == 8
        assert mesh8.axis_names == ("data",)

    def test_shard_and_replicate(self, mesh8):
        x = jnp.zeros((16, 4))
        xs = jax.device_put(x, parallel.batch_sharding(mesh8))
        assert len(xs.sharding.device_set) == 8
        p = parallel.replicate({"w": jnp.zeros((3, 3))}, mesh8)
        assert p["w"].sharding.is_fully_replicated


class TestDataParallelFit:
    def test_dp_fit_matches_single_device(self, mesh8):
        """DP over 8 devices must be numerically equivalent to 1 device
        (same data order, deterministic ops)."""
        cfg = small_cfg(max_epochs=1)
        tr = toy_dataset(64)
        va = toy_dataset(32, seed=1)
        state1, hist1 = training.fit(cfg, tr, va, seed=0)
        state8, hist8 = training.fit(cfg, tr, va, seed=0, mesh=mesh8)
        l1 = hist1["records"][0]["loss"]
        l8 = hist8["records"][0]["loss"]
        assert abs(l1 - l8) < 1e-4 * max(1.0, abs(l1))
        d = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state1["params"], state8["params"])
        assert max(jax.tree.leaves(d)) < 1e-4

    def test_dp_batch_divisibility_check(self, mesh8):
        cfg = small_cfg(batch_size=12)  # not divisible by 8
        tr = toy_dataset(24)
        with pytest.raises(AssertionError):
            training.fit(cfg, tr, tr, mesh=mesh8)


class TestMultiTrial:
    def test_fit_trials_runs_and_separates(self):
        configs = [small_cfg(init_lambd=5.0, max_epochs=2),
                   small_cfg(init_lambd=20.0, max_epochs=2),
                   small_cfg(init_lambd=20.0, trainable=False,
                             max_epochs=2)]
        tr = toy_dataset(48)
        va = toy_dataset(16, seed=1)
        state, hists = parallel.fit_trials(configs, tr, va)
        assert len(hists) == 3
        lambds = np.asarray(state["params"]["spectrogram_layer"]["lambd"])
        # trainable trials moved, frozen trial did not
        assert lambds[0] != pytest.approx(5.0)
        assert lambds[2] == pytest.approx(20.0)
        for h in hists:
            assert len(h["records"]) == 2

    def test_fit_trials_per_trial_early_stopping(self):
        """A trial whose patience expires freezes (params stop moving,
        records stop) while the rest of the pack keeps training
        (VERDICT r1 #5; reference per-trial patience train.py:112-126)."""
        # trial 0: patience 1 with a huge destabilizing lr -> valid loss
        # climbs immediately and it early-stops; trial 1: patience large
        configs = [small_cfg(init_lambd=10.0, patience=1, lr_model=50.0,
                             max_epochs=6),
                   small_cfg(init_lambd=10.0, patience=100, max_epochs=6)]
        tr = toy_dataset(48)
        va = toy_dataset(16, seed=1)
        state, hists = parallel.fit_trials(configs, tr, va)
        assert hists[0]["converged"]
        assert not hists[1]["converged"]
        # frozen trial stops accumulating records before max_epochs ...
        assert len(hists[0]["records"]) < 6
        assert len(hists[1]["records"]) == 6
        # ... and its lambda stays put after the freeze epoch
        freeze_epoch = hists[0]["records"][-1]["epoch"]
        assert freeze_epoch < 5
        lam_frozen = hists[0]["records"][-1]["lambd_est"]
        final = np.asarray(state["params"]["spectrogram_layer"]["lambd"])
        assert float(final[0]) == pytest.approx(lam_frozen, abs=1e-6)
        # the surviving trial kept moving
        assert float(final[1]) != pytest.approx(10.0)

    def test_fit_trials_sharded_matches_unsharded(self, mesh8):
        configs = [small_cfg(init_lambd=5.0 + i, max_epochs=1)
                   for i in range(8)]
        tr = toy_dataset(32)
        va = toy_dataset(16, seed=1)
        _, h_un = parallel.fit_trials(configs, tr, va)
        _, h_sh = parallel.fit_trials(configs, tr, va, mesh=mesh8)
        for a, b in zip(h_un, h_sh):
            assert a["records"][0]["loss"] == pytest.approx(
                b["records"][0]["loss"], rel=1e-4)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (4, 50)

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)


class TestMultiTrialPallas:
    """VERDICT r3 next #4: packed trials ride the specband kernel under
    a SHARED static (bucket, hint) when every active trial's lambda
    sits in one static-switch region; any disagreement falls back to
    the framed/XLA path (correctness never depends on the hint)."""

    def pallas_cfg(self, **over):
        cfg = dict(model_name="mel_linear_net", dataset_name="audio_mnist",
                   init_lambd=24.0, n_points=256, hop_length=16,
                   optimized=True, impl="pallas", normalize_window=False,
                   n_mels=64, resample_rate=8000, energy_normalize=True,
                   optimizer_name="sgd", lr_model=1e-3, lr_tf=1.0,
                   trainable=True, batch_size=16, max_epochs=1,
                   patience=100)
        cfg.update(over)
        return cfg

    def _spy(self, monkeypatch):
        from dmel_tpu.ops import stft as stft_mod
        from dmel_tpu.ops.pallas import specband_dmel as sb
        monkeypatch.setattr(stft_mod, "PALLAS_AUTO_MIN_NFFT", 64)
        calls = []
        real = sb.specband_mel_power

        def spy(*a, **k):
            calls.append(k.get("j_taps"))
            return real(*a, **k)

        monkeypatch.setattr(sb, "specband_mel_power", spy)
        return calls

    def test_shared_region_dispatches_specband(self, monkeypatch):
        calls = self._spy(monkeypatch)
        # both lambdas in the J=12 / no-lowbin region of bucket 256
        configs = [self.pallas_cfg(init_lambd=24.0),
                   self.pallas_cfg(init_lambd=25.0)]
        tr = toy_dataset(32)
        va = toy_dataset(16, seed=1)
        _, hists = parallel.fit_trials(configs, tr, va)
        assert calls, "shared-region pack never dispatched specband"
        assert len(hists) == 2 and all(h["records"] for h in hists)

    def test_region_mismatch_falls_back(self, monkeypatch):
        calls = self._spy(monkeypatch)
        # 24 -> reduced-J region; 30 -> J=24 sidelobe regime (same
        # bucket 256): hints disagree, pack must NOT ride specband
        configs = [self.pallas_cfg(init_lambd=24.0),
                   self.pallas_cfg(init_lambd=30.0)]
        tr = toy_dataset(32)
        va = toy_dataset(16, seed=1)
        _, hists = parallel.fit_trials(configs, tr, va)
        assert calls == [], "mismatched regions must fall back"
        assert all(h["records"] for h in hists)

    def test_shared_hint_matches_xla_pack(self, monkeypatch):
        """The kernel-dispatched pack trains equivalently to the XLA
        pack (per-trial loss within the kernel's parity class)."""
        self._spy(monkeypatch)
        tr = toy_dataset(32)
        va = toy_dataset(16, seed=1)
        cfgs_p = [self.pallas_cfg(init_lambd=24.0),
                  self.pallas_cfg(init_lambd=25.0)]
        cfgs_x = [dict(c, impl="xla") for c in cfgs_p]
        _, hp = parallel.fit_trials(cfgs_p, tr, va)
        _, hx = parallel.fit_trials(cfgs_x, tr, va)
        for a, b in zip(hp, hx):
            assert a["records"][0]["loss"] == pytest.approx(
                b["records"][0]["loss"], rel=1e-3)
