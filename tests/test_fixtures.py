"""End-to-end validation of the real-data pipeline against byte-faithful
fixtures (VERDICT r1 #7): download_data.sh-shaped trees load through
``dmel_tpu.data.registry`` UNTOUCHED, init_dataset pre-materializes the
caches, and the PANNs pretrained import consumes a checkpoint that is
structurally identical to the Zenodo file."""

import os
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from dmel_tpu.data import audio
from dmel_tpu.data.registry import get_dataset_by_config
from tests import fixtures

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestESC50Fixture:
    @pytest.fixture(scope="class")
    def tree(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("data") / "esc50"
        return fixtures.make_esc50_tree(str(root), n_classes=5, per_class=8)

    def test_loads_through_registry(self, tree):
        cfg = {"dataset_name": "esc50", "resample_rate": 8000}
        tr, va, te = get_dataset_by_config(cfg, tree)
        assert len(tr) + len(va) + len(te) == 40
        # resampled 44.1 kHz * 0.5 s -> 4000 samples @ 8 kHz
        assert tr[0][0].shape == (4000,)
        assert tr.dataset.sample_rate == 8000
        # npy caches materialized with the reference's naming
        assert os.path.exists(os.path.join(tree, "8000_xs.npy"))
        assert os.path.exists(os.path.join(tree, "8000_ys.npy"))

    def test_cache_hit_skips_decode(self, tree):
        # after the first load the cache must serve (decode-free):
        # poison an audio file; a cache hit never notices
        audio_dir = os.path.join(tree, "audio")
        victim = os.path.join(audio_dir, sorted(os.listdir(audio_dir))[0])
        os.rename(victim, victim + ".hidden")
        try:
            ds = audio.esc50(tree, resample_rate=8000)
            assert len(ds) == 40
        finally:
            os.rename(victim + ".hidden", victim)

    def test_init_dataset_script(self, tree, tmp_path):
        """scripts/init_dataset.py runs against the bootstrap layout."""
        data_dir = os.path.dirname(tree)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "init_dataset.py"),
             "--data_dir", data_dir, "--resample_rate", "4000"],
            capture_output=True, timeout=240)
        assert out.returncode == 0, out.stderr.decode()[-1500:]
        assert os.path.exists(os.path.join(tree, "4000_xs.npy"))


@pytest.mark.slow
class TestAudioMNISTFixture:
    def test_full_tree_loads_with_speaker_splits(self, tmp_path):
        """The FULL 60-speaker/30000-file tree (the loaders hard-assert
        those totals, reference utils.py:85) loads through the exact
        speaker partition."""
        root = str(tmp_path / "audio_mnist")
        t0 = time.time()
        fixtures.make_audio_mnist_tree(root, min_len=1500, max_len=3500)
        gen_s = time.time() - t0
        tr, va, te = get_dataset_by_config(
            {"dataset_name": "audio_mnist"}, root)
        assert (len(tr), len(va), len(te)) == (18000, 6000, 6000)
        assert tr[0][0].shape == (8000,)        # symmetric pad formula
        assert set(np.unique(tr.ys)) == set(range(10))
        # padding parity (datasets.py:175): pad(1 + (8000-len)//2)[:8000]
        sid = 28                                 # first train speaker
        p = os.path.join(root, "data", f"{sid:02d}", f"0_{sid:02d}_0.wav")
        raw, sr = audio.load_wav(p)
        assert sr == 8000
        expect = np.pad(raw, 1 + (8000 - len(raw)) // 2)[:8000]
        hits = np.flatnonzero(np.abs(tr.xs - expect).max(axis=1) < 1e-7)
        assert len(hits) >= 1          # padded exactly per datasets.py:175
        print(f"[fixture] generated 30000 wavs in {gen_s:.1f}s")


class TestCnn6CheckpointFixture:
    def test_zenodo_identical_structure_imports(self, tmp_path):
        import torch
        import jax.numpy as jnp
        from dmel_tpu import models, training

        path = fixtures.make_fake_cnn6_checkpoint(
            str(tmp_path / "Cnn6_mAP=0.343.pth"))
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt["model"]                      # reference utils.py:28
        assert "fc_audioset.weight" in sd and sd[
            "fc_audioset.weight"].shape == (527, 512)

        model = models.MelPANNsNet(
            n_classes=50, init_lambd=46.67, n_mels=64, n_points=4000,
            sample_rate=8000, hop_length=80, optimized=True,
            window_length=512, energy_normalize=True)
        x = jnp.zeros((2, 4000))
        variables = jax.tree.map(np.asarray,
                                 model.init(jax.random.PRNGKey(0), x))
        before = variables["params"]["spectrogram_model"]["conv_block3"][
            "conv1"]["kernel"].copy()
        out = training.import_panns_cnn6(
            sd, {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}, verbose=False)
        p = out["params"]["spectrogram_model"]
        # every backbone tensor transferred with layout conversion
        w3 = sd["conv_block3.conv1.weight"].numpy().transpose(2, 3, 1, 0)
        assert np.allclose(p["conv_block3"]["conv1"]["kernel"], w3)
        assert not np.allclose(p["conv_block3"]["conv1"]["kernel"], before)
        assert np.allclose(p["fc1"]["kernel"],
                           sd["fc1.weight"].numpy().T)
        assert np.allclose(
            out["batch_stats"]["spectrogram_model"]["conv_block2"]["bn1"]
            ["mean"], sd["conv_block2.bn1.running_mean"].numpy())
        # 527-class AudioSet head + front-end buffers skipped, head kept
        assert p["fc_esc50"]["kernel"].shape == (512, 50)
        # the imported model still runs
        logits, s = model.apply(
            {"params": out["params"],
             "batch_stats": out["batch_stats"]}, x, train=False)
        assert logits.shape == (2, 50)
        assert bool(np.isfinite(np.asarray(logits)).all())
