"""Real audio datasets: AudioMNIST and ESC-50.

Parity targets: ``AudioMNISTBigDataset`` (/root/reference/datasets.py:162-194),
``AudioMNISTDataset`` (:197-233), ``ESC50Dataset`` (:235-277) and the
csv metadata helpers (:139-160).  WAV decoding uses the stdlib ``wave``
module (librosa-equivalent normalization for PCM16); ESC-50 resampling
uses polyphase filtering (scipy) to the target rate with an npy cache
keyed by rate, like the reference.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import wave

import numpy as np


def load_wav(path: str):
    """Read a PCM wav as float32 in [-1, 1] (librosa.load(sr=None)
    equivalent for PCM16/PCM32; mono-mixes multi-channel)."""
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        channels = f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x, sr


import functools


@functools.lru_cache(maxsize=16)
def _kaiser_fast_fir(up: int, down: int):
    """FIR matching librosa/resampy's ``kaiser_fast`` design family
    (num_zeros=16, Kaiser beta=8.555504, rolloff=0.85) for a polyphase
    up/down stage — the filter the reference's ESC-50 resample uses
    (datasets.py:255 ``res_type='kaiser_fast'``)."""
    from scipy.signal import firwin
    num_zeros, beta, rolloff = 16, 8.555504, 0.85
    max_rate = max(up, down)
    half_len = num_zeros * max_rate
    return firwin(2 * half_len + 1, rolloff / max_rate,
                  window=("kaiser", beta))


def resample(x: np.ndarray, sr: int, target_sr: int,
             quality: str = "kaiser_fast") -> np.ndarray:
    """Polyphase resampling.

    ``quality='kaiser_fast'`` (default) uses the same windowed-sinc
    design family as librosa's ``res_type='kaiser_fast'`` so cached ESC-50
    arrays stay close to reference preprocessing; ``'polyphase'`` uses
    scipy's default filter (shorter, slightly different rolloff —
    measured log-mel divergence documented in COVERAGE.md)."""
    if sr == target_sr:
        return x.astype(np.float32)
    from math import gcd
    from scipy.signal import resample_poly
    g = gcd(sr, target_sr)
    up, down = target_sr // g, sr // g
    if quality == "kaiser_fast":
        h = _kaiser_fast_fir(up, down)
        return resample_poly(x, up, down, window=h).astype(np.float32)
    if quality == "polyphase":
        return resample_poly(x, up, down).astype(np.float32)
    raise ValueError(f"unknown resample quality: {quality!r}")


@dataclasses.dataclass
class ArrayDataset:
    """In-memory (xs, ys) pair with the reference's Dataset protocol."""

    xs: np.ndarray
    ys: np.ndarray
    sample_rate: int

    def __len__(self):
        return len(self.xs)

    def __getitem__(self, idx):
        return self.xs[idx], self.ys[idx]


def audio_mnist_big(wav_paths) -> ArrayDataset:
    """AudioMNIST at 8 kHz, symmetric-zero-padded to 8000 samples
    (datasets.py:162-194: label = leading digit of the filename; asserts
    10 classes and uniform 8 kHz)."""
    xs, ys, rates = [], [], []
    for p in wav_paths:
        audio, sr = load_wav(p)
        rates.append(sr)
        target = int(os.path.basename(p).split("_")[0])
        x = np.pad(audio, 1 + (8000 - len(audio)) // 2)[:8000]
        xs.append(x)
        ys.append(target)
    assert len(set(ys)) == 10, "expected 10 AudioMNIST classes"
    assert len(set(rates)) == 1 and rates[0] == 8000, "expected uniform 8 kHz"
    return ArrayDataset(np.asarray(xs, dtype=np.float32),
                        np.asarray(ys, dtype=np.int32), 8000)


def audio_mnist_legacy(source_dir: str) -> ArrayDataset:
    """Legacy Zenodo AudioMNIST variant: keep 1500..5500-sample clips,
    zero-pad the tail to 5500 (datasets.py:197-233)."""
    xs, ys, rates = [], [], []
    for p in glob.glob(os.path.join(source_dir, "recordings", "*.wav")):
        audio, sr = load_wav(p)
        rates.append(sr)
        if 1500 <= len(audio) <= 5500:
            x = np.zeros(5500, dtype=np.float32)
            x[:len(audio)] = audio
            xs.append(x)
            ys.append(int(os.path.basename(p).split("_")[0]))
    assert len(set(ys)) == 10
    assert len(set(rates)) == 1 and rates[0] == 8000
    return ArrayDataset(np.asarray(xs, dtype=np.float32),
                        np.asarray(ys, dtype=np.int32), 8000)


def parse_esc50_csv(csv_file: str):
    """Parse meta/esc50.csv rows -> (filename, fold, target, category)
    (datasets.py:139-155)."""
    with open(csv_file) as f:
        lines = f.readlines()
    meta = []
    for line in lines[1:]:
        row = line.rstrip().split(",")
        meta.append((row[0], int(row[1]), int(row[2]), row[3]))
    return meta


def esc50(source_dir: str, resample_rate: int = 8000) -> ArrayDataset:
    """ESC-50 resampled + cached as {rate}_xs.npy/{rate}_ys.npy
    (datasets.py:235-277)."""
    xs_path = os.path.join(source_dir, f"{resample_rate}_xs.npy")
    ys_path = os.path.join(source_dir, f"{resample_rate}_ys.npy")
    if os.path.exists(xs_path) and os.path.exists(ys_path):
        return ArrayDataset(np.load(xs_path), np.load(ys_path),
                            resample_rate)
    meta = parse_esc50_csv(os.path.join(source_dir, "meta", "esc50.csv"))
    xs, ys = [], []
    for filename, fold, target, category in meta:
        audio, sr = load_wav(os.path.join(source_dir, "audio", filename))
        xs.append(resample(audio, sr, resample_rate))
        ys.append(target)
    xs = np.asarray(xs, dtype=np.float32)
    ys = np.asarray(ys, dtype=np.int32)
    np.save(xs_path, xs)
    np.save(ys_path, ys)
    return ArrayDataset(xs, ys, resample_rate)
