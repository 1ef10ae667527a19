"""Parity at the reference's LITERAL executed geometries (VERDICT r2
next #4).

The reference's real experiments run ``optimized=True`` with
``window_length = len(x)`` (the short-window branch at
/root/reference/time_frequency.py:39 is dead in the executed configs),
so the actual geometries are:

- audio_mnist: len(x) = 8000  -> n_fft = win = 8000,  hop 80, 64 mels
  (/root/reference/time_frequency.py:41,48 with search_spaces.py:36-68)
- esc50:       len(x) = 40000 -> n_fft = win = 40000, hop 80, 64 mels
  (search_spaces.py:3-34)

Round 2 certified the pow2 production buckets {256..1024} but never
these literal non-pow2 shapes; this module gates them on CPU against
the torch.stft oracle (features 1e-4, dlambda 1e-3 — both geometries
ride the exact XLA FFT path, no bf16 kernels involved).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmel_tpu import ops

SR, HOP, N_MELS = 8000, 80, 64


def torch_oracle(x_np, lambd, win):
    from tests.reference_impl import torch_logmel_oracle
    return torch_logmel_oracle(x_np, lambd, win, HOP, N_MELS, SR)

@pytest.mark.parametrize("t,lam,b", [
    (8000, 46.67, 2),     # audio_mnist literal, mid lambda grid point
    (8000, 400.0, 1),     # audio_mnist literal, the 300 ms arm
    (40000, 400.0, 1),    # esc50 literal (n_fft = 40000)
])
def test_literal_geometry_parity(rng, t, lam, b):
    x_np = rng.standard_normal((b, t)).astype(np.float32)
    x = jnp.asarray(x_np)

    def feat(l):
        m = ops.mel_spectrogram(x, l, n_mels=N_MELS, sample_rate=SR,
                                hop_length=HOP, optimized=True,
                                window_length=t)
        return ops.accurate_log(m + 1e-10)

    ref_feat, ref_grad = torch_oracle(x_np, lam, t)
    got = np.asarray(feat(jnp.float32(lam)))
    assert got.shape == ref_feat.shape == (b, N_MELS, t // HOP + 1)
    ferr = float(np.max(np.abs(got - ref_feat)))
    assert ferr < 1e-4, ferr
    g = float(jax.grad(lambda l: feat(l).sum())(jnp.float32(lam)))
    gerr = abs(g - ref_grad) / max(abs(ref_grad), 1e-30)
    assert gerr < 1e-3, (g, ref_grad)


def test_faithful_mode_synthetic_geometry(rng):
    """The synthetic task's faithful mode (optimized=False: n_fft = 2T,
    time_frequency.py:51) at the published n_points=128 — covered
    elsewhere at small sizes; kept here so all three published
    experiment geometries live in one module."""
    t, lam = 128, 6.38
    x_np = rng.standard_normal((3, t)).astype(np.float32)
    x = jnp.asarray(x_np)
    import torch

    from tests.reference_impl import np_melscale_fbanks  # noqa: F401

    lam_t = torch.tensor(lam, requires_grad=True)
    outs = []
    for i in range(3):
        xi = torch.from_numpy(x_np[i])
        xi = xi - xi.mean()
        m = torch.arange(t).float()
        w = torch.exp(-0.5 * ((m - t / 2) / (torch.abs(lam_t) + 1e-15)) ** 2)
        s = torch.stft(xi, n_fft=2 * t, hop_length=1, win_length=t,
                       window=w, return_complex=True, pad_mode="constant")
        outs.append((torch.abs(s) ** 2).detach().numpy())
    ref = np.stack(outs)
    got = np.asarray(ops.spectrogram(x - x.mean(-1, keepdims=True),
                                     jnp.float32(lam), optimized=False,
                                     hop_length=1))
    assert got.shape == ref.shape
    assert float(np.max(np.abs(got - ref))) < 1e-4 * max(
        1.0, float(np.max(np.abs(ref))))
