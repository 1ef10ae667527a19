"""Independent PyTorch/numpy reference implementations for parity tests.

These transcribe the *formulas* of the reference system (DMEL, Martinsson
& Sandsten 2024) using torch.stft / float64 numpy as independent oracles.
BASELINE.md's parity gate: feature max-abs-err <= 1e-4 vs the PyTorch
reference spectrograms.  Formula sources (cited, not copied):
- Gaussian window:        /root/reference/time_frequency.py:21-30
- spectrogram modes:      /root/reference/time_frequency.py:32-58
- mel layer composition:  /root/reference/models.py:33-56
- melscale_fbanks:        torchaudio.functional.melscale_fbanks semantics
  (HTK mel scale, no norm), as invoked at /root/reference/models.py:42-48.
"""

import numpy as np
import torch


def torch_gaussian_window(lambd, window_length, norm=False):
    m = torch.arange(0, window_length).float()
    lambd = torch.as_tensor(lambd, dtype=torch.float32)
    w = torch.exp(-0.5 * ((m - window_length / 2) / (lambd + 1e-15)) ** 2)
    if norm:
        w = w / torch.sqrt(torch.sum(w ** 2))
    return w


def torch_spectrogram(x, lambd, optimized=False, hop_length=1, norm=False,
                      n_stds=6):
    """torch.stft-based power spectrogram, both reference modes."""
    x = torch.as_tensor(x, dtype=torch.float32)
    if optimized:
        wl = int(np.abs(float(lambd)) * n_stds)
        wl = 1 << (wl - 1).bit_length()
        n_fft = wl
    else:
        wl = len(x)
        n_fft = 2 * wl
    w = torch_gaussian_window(lambd, wl, norm=norm)
    s = torch.stft(x, n_fft=n_fft, hop_length=hop_length, win_length=wl,
                   window=w, return_complex=True, pad_mode="constant")
    return (torch.abs(s) ** 2).numpy()


def np_melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate):
    """HTK-mel triangular filterbank, float64 (torchaudio default args)."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, float) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, float) / 2595.0) - 1.0)

    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up))


def torch_mel_spectrogram(x, lambd, n_mels, sample_rate, hop_length,
                          optimized=False, f_min=0.0, f_max=None,
                          normalize_window=False):
    """Per-sample reference DMEL forward (models.py:33-56 semantics)."""
    if f_max is None:
        f_max = sample_rate // 2
    x = torch.as_tensor(np.asarray(x), dtype=torch.float32)
    if x.ndim == 1:
        x = x[None]
    out = []
    for xi in x:
        xi = xi - xi.mean()
        s = torch_spectrogram(xi, abs(float(lambd)), optimized=optimized,
                              hop_length=hop_length, norm=normalize_window)
        fb = np_melscale_fbanks(s.shape[0], f_min, f_max, n_mels,
                                sample_rate).astype(np.float32)
        out.append((s.T @ fb).T)
    return np.stack(out)


def torch_dmel_lambd_grad(x, lambd, n_mels, sample_rate, hop_length,
                          optimized=False, normalize_window=False):
    """d(sum(log(mel + 1e-10)))/d(lambd) via torch autograd — the grad
    chain the rebuild must preserve (SURVEY.md §3.3)."""
    x = torch.as_tensor(np.asarray(x), dtype=torch.float32)
    lam = torch.tensor(float(lambd), requires_grad=True)
    if x.ndim == 1:
        x = x[None]
    total = 0.0
    for xi in x:
        xi = xi - xi.mean()
        lam_abs = torch.abs(lam)
        if optimized:
            wl = int((lam_abs * 6).detach().numpy())
            wl = 1 << (wl - 1).bit_length()
            n_fft = wl
        else:
            wl = len(xi)
            n_fft = 2 * wl
        w = torch.exp(-0.5 * ((torch.arange(wl).float() - wl / 2)
                              / (lam_abs + 1e-15)) ** 2)
        if normalize_window:
            w = w / torch.sqrt(torch.sum(w ** 2))
        s = torch.stft(xi, n_fft=n_fft, hop_length=hop_length, win_length=wl,
                       window=w, return_complex=True, pad_mode="constant")
        s = torch.abs(s) ** 2
        fb = torch.from_numpy(
            np_melscale_fbanks(s.shape[0], 0.0, sample_rate // 2, n_mels,
                               sample_rate).astype(np.float32))
        mel = (s.transpose(-1, -2) @ fb).transpose(-1, -2)
        total = total + torch.log(mel + 1e-10).sum()
    total.backward()
    return float(lam.grad)


def torch_logmel_oracle(x_np, lambd, win, hop_length, n_mels,
                        sample_rate):
    """Batch log-mel + dlambda oracle at an explicit (win = n_fft)
    geometry: returns ``(logmel (B, n_mels, frames), dlambda)`` for
    ``sum(log(mel + 1e-10))``.  The single torch implementation behind
    scripts/certify_ladder.py, scripts/bench_buckets.py and
    tests/test_reference_geometries.py (one oracle, three consumers —
    a fix here fixes all certifications)."""
    fb = torch.from_numpy(np_melscale_fbanks(
        win // 2 + 1, 0.0, sample_rate // 2, n_mels,
        sample_rate).astype(np.float32))
    lam = torch.tensor(float(lambd), requires_grad=True)
    outs, total = [], None
    for i in range(x_np.shape[0]):
        xi = torch.from_numpy(x_np[i])
        xi = xi - xi.mean()
        m = torch.arange(win).float()
        w = torch.exp(-0.5 * ((m - win / 2) /
                              (torch.abs(lam) + 1e-15)) ** 2)
        s = torch.stft(xi, n_fft=win, hop_length=hop_length,
                       win_length=win, window=w, return_complex=True,
                       pad_mode="constant")
        s = torch.abs(s) ** 2
        mel = (s.transpose(-1, -2) @ fb).transpose(-1, -2)
        logmel = torch.log(mel + 1e-10)
        outs.append(logmel.detach().numpy())
        total = logmel.sum() if total is None else total + logmel.sum()
    total.backward()
    return np.stack(outs), float(lam.grad)
