"""Decompose the 512-bucket hiprec hardware excess (round-3 reclaim).

certify_ladder 512 measured specband(hiprec) at 1.15-2.52e-4 vs the
torch oracle while CPU interpret shows 3.9-4.7e-5 at the same lambdas.
Isolate, ON HARDWARE and through jit, which leg carries the excess:

  A  specband lvl2 (TPU, jit)   vs torch oracle   — the failing number
  B  exact XLA matmul (TPU, jit) vs torch oracle  — route baseline
  C  specband lvl2 (TPU, jit)   vs XLA matmul (TPU, jit) — kernel-only
  D  specband lvl2 (TPU, EAGER) vs XLA matmul      — jit-only excess?

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_hiprec_512.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, SR, HOP, N_MELS = 4, 40000, 8000, 80, 64


def main():
    import jax
    import jax.numpy as jnp

    from dmel_tpu import ops
    from dmel_tpu.ops import stft as stft_mod
    from tests.reference_impl import torch_logmel_oracle

    rng = np.random.default_rng(7)
    x_np = rng.standard_normal((B, T)).astype(np.float32)
    xj = jnp.asarray(x_np)
    win = 512

    def feat(l, x, impl, hint=None):
        m = ops.mel_spectrogram(
            x, l, n_mels=N_MELS, sample_rate=SR, hop_length=HOP,
            optimized=True, window_length=win, impl=impl,
            lambd_hint=hint, method="matmul")
        return ops.accurate_log(m + 1e-10)

    for lam in (33.0, 40.0, 63.9):
        ref, _ = torch_logmel_oracle(x_np, lam, win, HOP, N_MELS, SR)
        sb_jit = np.asarray(jax.jit(
            lambda l, x: feat(l, x, "pallas", lam))(jnp.float32(lam), xj))
        xla_jit = np.asarray(jax.jit(
            lambda l, x: feat(l, x, "xla"))(jnp.float32(lam), xj))
        sb_eager = np.asarray(feat(jnp.float32(lam), xj, "pallas", lam))
        a = np.max(np.abs(sb_jit - ref))
        b = np.max(np.abs(xla_jit - ref))
        c = np.max(np.abs(sb_jit - xla_jit))
        d = np.max(np.abs(sb_eager - xla_jit))
        e = np.max(np.abs(sb_eager - sb_jit))
        print(f"lam={lam:5.1f}: A sb_jit-torch {a:.2e}  B xla-torch {b:.2e}"
              f"  C sb_jit-xla {c:.2e}  D sb_eager-xla {d:.2e}"
              f"  E sb_eager-sb_jit {e:.2e}", flush=True)


if __name__ == "__main__":
    main()
