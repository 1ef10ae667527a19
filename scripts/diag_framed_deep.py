"""Diagnose the framed kernel's HARDWARE-ONLY parity excess at deep
lambda/n_fft ratios (certify_ladder: lambda=13.3/30 @ win=1024 measure
1.1-1.7e-4 on TPU vs 4.8-8.0e-5 on matched-size CPU interpret).

Variants, all vs a fresh torch-f32 oracle on the same inputs:
  A. production framed (device-built window, lowbin fix on)
  B. framed with a HOST-f64-built window  -> isolates the device exp
  C. framed with lowbin fix OFF           -> sizes the fix's effect
  D. device XLA matmul-HIGHEST path       -> common-infra control
Each line reports max err and its (batch, mel, frame) location.

Run: python scripts/diag_framed_deep.py   (TPU)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, SR = 4, 40000, 8000
N_FFT = WIN = 1024
HOP, N_MELS = 80, 64


def main():
    import jax
    import jax.numpy as jnp
    import torch

    from tests.reference_impl import np_melscale_fbanks
    from dmel_tpu import ops
    from dmel_tpu.ops.pallas import framed_dmel

    rng = np.random.default_rng(7)
    x_np = rng.standard_normal((B, T)).astype(np.float32)
    xj = jnp.asarray(x_np)
    xs = xj - xj.mean(-1, keepdims=True)

    def torch_oracle(lam_v):
        fb = torch.from_numpy(np_melscale_fbanks(
            N_FFT // 2 + 1, 0.0, SR // 2, N_MELS, SR).astype(np.float32))
        lam = torch.tensor(lam_v)
        outs = []
        for i in range(B):
            xi = torch.from_numpy(x_np[i])
            xi = xi - xi.mean()
            m = torch.arange(WIN).float()
            w = torch.exp(-0.5 * ((m - WIN / 2) /
                                  (torch.abs(lam) + 1e-15)) ** 2)
            s = torch.stft(xi, n_fft=N_FFT, hop_length=HOP,
                           win_length=WIN, window=w, return_complex=True,
                           pad_mode="constant")
            s = torch.abs(s) ** 2
            mel = (s.transpose(-1, -2) @ fb).transpose(-1, -2)
            outs.append(torch.log(mel + 1e-10).numpy())
        return np.stack(outs)

    def report(tag, got, ref):
        d = np.abs(got - ref)
        idx = np.unravel_index(np.argmax(d), d.shape)
        print(f"  {tag}: max={d.max():.2e} at b{idx[0]} mel{idx[1]} "
              f"frame{idx[2]} (ref logmel {ref[idx]:+.2f})", flush=True)

    for lam in (13.3, 30.0):
        print(f"lambda={lam}:", flush=True)
        ref = torch_oracle(lam)
        m = np.arange(WIN)
        w64 = np.exp(-0.5 * ((m - WIN / 2) / lam) ** 2)
        w_dev = np.asarray(jax.jit(
            lambda l: ops.gaussian_window(l, WIN))(jnp.float32(lam)))
        nz = w64 > 1e-30
        rel = np.abs(w_dev[nz] - w64[nz]) / w64[nz]
        print(f"  device-exp window rel err: max={rel.max():.2e} "
              f"rms={np.sqrt((rel ** 2).mean()):.2e}", flush=True)

        def run(w, fix):
            mel = framed_dmel.framed_mel_power(
                xs, w, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS,
                sample_rate=SR, lowbin_fix=fix)
            return ops.accurate_log(mel + 1e-10)

        got = np.asarray(jax.jit(lambda w: run(w, True))(
            jnp.asarray(w_dev)))
        report("A device-window fix-on ", got, ref)
        got = np.asarray(jax.jit(lambda w: run(w, True))(
            jnp.asarray(w64.astype(np.float32))))
        report("B host-window   fix-on ", got, ref)
        got = np.asarray(jax.jit(lambda w: run(w, False))(
            jnp.asarray(w_dev)))
        report("C device-window fix-off", got, ref)

        def xla_feat(l, x):
            mm = ops.mel_spectrogram(
                x, l, n_mels=N_MELS, sample_rate=SR, hop_length=HOP,
                optimized=True, window_length=WIN, method="matmul")
            return ops.accurate_log(mm + 1e-10)
        got = np.asarray(jax.jit(xla_feat)(jnp.float32(lam), xj))
        report("D xla-HIGHEST          ", got, ref)


if __name__ == "__main__":
    main()
