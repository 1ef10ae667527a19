"""Byte-faithful dataset / checkpoint fixtures (VERDICT r1 #7).

The sandbox has zero egress, so the real AudioMNIST / ESC-50 / Zenodo
artifacts can never be downloaded.  These builders synthesize stand-ins
with the EXACT on-disk layout the bootstrap pipeline
(scripts/download_data.sh + scripts/init_dataset.py) would produce —
same directory trees, file-name grammar, metadata schema, sample rates
and serialization formats — with realistic audio statistics (tonal
bursts + pink-ish noise), so the production loaders run end-to-end
unmodified.

Layout parity:
- AudioMNIST: ``<dir>/data/<SS>/<digit>_<SS>_<rep>.wav`` 8 kHz PCM16
  (reference datasets.py:162-194 + download_data.sh sox resample).
- ESC-50: ``<dir>/meta/esc50.csv`` + ``<dir>/audio/<F>-<ID>-<T>-<C>.wav``
  44.1 kHz PCM16 5 s clips (reference datasets.py:139-160, 235-277).
- Cnn6 checkpoint: torch-serialized ``{'model': OrderedDict(...)}``
  with the full key set of the Zenodo ``Cnn6_mAP=0.343.pth`` (AudioSet
  527-class head + spectrogram_extractor/logmel_extractor front-end
  buffers), as consumed at /root/reference/utils.py:27-36.
"""

from __future__ import annotations

import collections
import os
import wave

import numpy as np


def write_wav(path: str, x: np.ndarray, sr: int) -> None:
    """PCM16 mono wav writer (inverse of dmel_tpu.data.audio.load_wav)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pcm = np.clip(x, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def speechish(rng, n: int, sr: int, f0: float) -> np.ndarray:
    """Tonal burst with harmonics + noise floor — enough realism that
    log-mel features have speech-like structure, cheap to generate."""
    t = np.arange(n) / sr
    env = np.exp(-0.5 * ((t - t[-1] / 2) / (t[-1] / 4)) ** 2)
    sig = sum(np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 6.28))
              / (k + 1) for k in range(3))
    return (0.4 * env * sig
            + 0.02 * rng.standard_normal(n)).astype(np.float32)


def make_audio_mnist_tree(root: str, *, n_per_speaker: int = 500,
                          min_len: int = 1500, max_len: int = 7500,
                          seed: int = 0) -> str:
    """Full 60-speaker / 30000-file AudioMNIST tree at 8 kHz.

    File grammar ``<digit>_<speaker>_<repetition>.wav`` with 50
    repetitions per digit per speaker (the loaders assert the 30000
    total and the uniform 8 kHz rate, utils.py:85 / datasets.py:179-187).
    """
    rng = np.random.default_rng(seed)
    sr = 8000
    for sid in range(1, 61):
        d = os.path.join(root, "data", f"{sid:02d}")
        os.makedirs(d, exist_ok=True)
        reps = n_per_speaker // 10
        for digit in range(10):
            f0 = 110.0 + 40.0 * digit + 2.0 * sid
            for rep in range(reps):
                n = int(rng.integers(min_len, max_len))
                x = speechish(rng, n, sr, f0)
                write_wav(os.path.join(d, f"{digit}_{sid:02d}_{rep}.wav"),
                          x, sr)
    return root


ESC50_CATEGORIES = ["dog", "rain", "crying_baby", "door_knock",
                    "helicopter"]


def make_esc50_tree(root: str, *, n_classes: int = 5, per_class: int = 8,
                    sr: int = 44100, clip_seconds: float = 0.5,
                    seed: int = 0) -> str:
    """ESC-50-layout tree: meta/esc50.csv (real schema: filename, fold,
    target, category, esc10, src_file, take) + audio/ wavs named
    ``<fold>-<src>-<take>-<target>.wav`` at the native 44.1 kHz."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "meta"), exist_ok=True)
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)
    n = int(sr * clip_seconds)
    rows = ["filename,fold,target,category,esc10,src_file,take"]
    for target in range(n_classes):
        cat = ESC50_CATEGORIES[target % len(ESC50_CATEGORIES)]
        for i in range(per_class):
            fold = 1 + (i % 5)
            src = 100000 + 37 * target + i
            fn = f"{fold}-{src}-A-{target}.wav"
            x = speechish(rng, n, sr, 150.0 + 90.0 * target)
            write_wav(os.path.join(root, "audio", fn), x, sr)
            rows.append(f"{fn},{fold},{target},{cat},False,{src},A")
    with open(os.path.join(root, "meta", "esc50.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    return root


def make_fake_cnn6_checkpoint(path: str, *, seed: int = 0) -> str:
    """torch-serialized checkpoint structurally identical to the Zenodo
    ``Cnn6_mAP=0.343.pth``: ``{'model': OrderedDict, 'iteration': int}``
    with the full PANNs Cnn6 key set — AudioSet front-end buffers
    (spectrogram_extractor / logmel_extractor, which the flax model has
    no counterpart for and must skip), the four ConvBlock5x5 stages, bn0
    over mel bins, fc1, and the 527-class fc_audioset head (shape-skip
    on a 50-class model).  Exercises the import path exactly as the real
    file would (reference utils.py:27-36)."""
    import torch

    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = collections.OrderedDict()
    # AudioSet front-end (torchlibrosa STFT/LogmelFilterBank buffers)
    sd["spectrogram_extractor.stft.conv_real.weight"] = t(513, 1, 1024)
    sd["spectrogram_extractor.stft.conv_imag.weight"] = t(513, 1, 1024)
    sd["logmel_extractor.melW"] = t(513, 64)
    # bn0 over the 64 mel bins
    for leaf, val in [("weight", torch.ones(64)),
                      ("bias", torch.zeros(64)),
                      ("running_mean", t(64)),
                      ("running_var", torch.ones(64)),
                      ("num_batches_tracked", torch.tensor(100000))]:
        sd[f"bn0.{leaf}"] = val
    chans = [(1, 64), (64, 128), (128, 256), (256, 512)]
    for b, (cin, cout) in enumerate(chans, start=1):
        sd[f"conv_block{b}.conv1.weight"] = t(cout, cin, 5, 5)
        sd[f"conv_block{b}.bn1.weight"] = torch.ones(cout)
        sd[f"conv_block{b}.bn1.bias"] = torch.zeros(cout)
        sd[f"conv_block{b}.bn1.running_mean"] = t(cout)
        sd[f"conv_block{b}.bn1.running_var"] = torch.ones(cout)
        sd[f"conv_block{b}.bn1.num_batches_tracked"] = torch.tensor(100000)
    sd["fc1.weight"] = t(512, 512)
    sd["fc1.bias"] = t(512)
    sd["fc_audioset.weight"] = t(527, 512)      # AudioSet head
    sd["fc_audioset.bias"] = t(527)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save({"model": sd, "iteration": 600000}, path)
    return path


def make_fsd50k_tree(root: str, *, n_classes: int = 200,
                     n_dev: int = 240, n_eval: int = 60, sr: int = 22050,
                     seed: int = 0) -> str:
    """Official-layout FSD50K tree (see dmel_tpu/data/fsd.py docstring):
    FSD50K.ground_truth/{dev,eval,vocabulary}.csv + dev/eval audio dirs.
    Clips carry 1-3 labels from a ``n_classes``-entry vocabulary (the
    production head is 200-class, models/registry.py N_CLASSES); the
    dev split column partitions train/val like the real ground truth."""
    rng = np.random.default_rng(seed)
    gt = os.path.join(root, "FSD50K.ground_truth")
    os.makedirs(gt, exist_ok=True)
    os.makedirs(os.path.join(root, "FSD50K.dev_audio"), exist_ok=True)
    os.makedirs(os.path.join(root, "FSD50K.eval_audio"), exist_ok=True)
    labels = [f"Class_{i:03d}" for i in range(n_classes)]
    with open(os.path.join(gt, "vocabulary.csv"), "w") as f:
        f.write("\n".join(f"{i},{lab},/m/fx{i:04d}"
                          for i, lab in enumerate(labels)) + "\n")

    def clip(f0):
        n = int(rng.integers(sr // 2, 2 * sr))
        return speechish(rng, n, sr, f0)

    dev_rows = ["fname,labels,mids,split"]
    for i in range(n_dev):
        k = int(rng.integers(1, 4))
        labs = rng.choice(n_classes, size=k, replace=False)
        fname = f"dev{i:05d}"
        write_wav(os.path.join(root, "FSD50K.dev_audio", fname + ".wav"),
                  clip(150.0 + 3.0 * labs[0]), sr)
        lab_s = '"' + ",".join(labels[j] for j in labs) + '"'
        split = "train" if i % 6 else "val"
        dev_rows.append(f"{fname},{lab_s},/m/x,{split}")
    with open(os.path.join(gt, "dev.csv"), "w") as f:
        f.write("\n".join(dev_rows) + "\n")
    eval_rows = ["fname,labels,mids"]
    for i in range(n_eval):
        k = int(rng.integers(1, 4))
        labs = rng.choice(n_classes, size=k, replace=False)
        fname = f"ev{i:05d}"
        write_wav(os.path.join(root, "FSD50K.eval_audio", fname + ".wav"),
                  clip(150.0 + 3.0 * labs[0]), sr)
        lab_s = '"' + ",".join(labels[j] for j in labs) + '"'
        eval_rows.append(f"{fname},{lab_s},/m/x")
    with open(os.path.join(gt, "eval.csv"), "w") as f:
        f.write("\n".join(eval_rows) + "\n")
    return root
