"""Config-dict → (trainset, validset, testset) factory.

Parity target: ``get_dataset_by_config`` (/root/reference/utils.py:46-142)
including the center_offset logic (:96-101), the seeded 0.7/0.1/0.2
random split (:135-140) and the AudioMNIST speaker partition (:49-88).
"""

from __future__ import annotations

import glob
import os

from dmel_tpu.data import audio, splits, synthetic


def _audio_mnist_splits(data_dir: str):
    splits.check_speaker_partition()

    def paths(speaker_ids):
        out = []
        for sid in speaker_ids:
            out += glob.glob(os.path.join(data_dir, "data",
                                          f"{sid:02d}", "*.wav"))
        return out

    trainset = audio.audio_mnist_big(paths(splits.AUDIO_MNIST_TRAIN_SPEAKERS))
    validset = audio.audio_mnist_big(paths(splits.AUDIO_MNIST_VALID_SPEAKERS))
    testset = audio.audio_mnist_big(paths(splits.AUDIO_MNIST_TEST_SPEAKERS))
    assert len(trainset) + len(validset) + len(testset) == 30000
    return trainset, validset, testset


def get_dataset_by_config(config: dict, data_dir: str,
                          split_seed: int = 0):
    """Build (train, valid, test) datasets from a flat experiment config."""
    name = config["dataset_name"]
    if name == "audio_mnist":
        return _audio_mnist_splits(data_dir)

    if name == "fsd":
        from dmel_tpu.data.fsd import fsd50k
        return fsd50k(data_dir,
                      resample_rate=config.get("resample_rate", 8000),
                      n_points=config.get("n_points", 40000))

    if name == "esc50":
        dataset = audio.esc50(data_dir,
                              resample_rate=config["resample_rate"])
    elif name == "esc50_synth":
        # learnable ESC-50-shaped synthetic task (framework extension,
        # VERDICT r4 next #5) — no disk data needed
        dataset = synthetic.make_esc50_synth_dataset(
            sigma=float(config.get("sigma_ref", 8000 * 0.035 / 6)),
            n_points=config.get("n_points", 40000),
            noise_std=float(config.get("noise_std", 0.05)),
            n_samples=config.get("n_samples", 2000),
            seed=config.get("data_seed", 0),
            hard=bool(config.get("synth_hard", False)))
    elif name == "time_frequency":
        if config.get("center_offset"):
            f_off, t_off = 0.1, config["n_points"] / 5
        else:
            f_off, t_off = 0.0, 0.0
        dataset = synthetic.make_gauss_pulse_dataset(
            sigma=float(config["sigma_ref"]),
            n_points=config["n_points"],
            noise_std=float(config["noise_std"]),
            n_samples=config["n_samples"],
            f_center_max_offset=f_off,
            t_center_max_offset=t_off,
            seed=config.get("data_seed"))
    else:
        raise ValueError(f"dataset not defined: {name}")

    return splits.random_split(dataset, (0.7, 0.1, 0.2), seed=split_seed)
