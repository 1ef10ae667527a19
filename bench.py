"""Headline benchmark: DMEL fwd+bwd throughput (audio-seconds/s/chip).

Workload (BASELINE.json): Gaussian-window DMEL at n_fft = win_length =
1024, hop 80, 64 mels, batch 128 x 5 s @ 8 kHz clips — forward +
backward through the trainable window parameter lambda, including the
reference's mean-subtraction and |lambda| (the training hot path,
/root/reference/time_frequency.py:48-53 + models.py:33-56).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "audio_s_per_s_per_chip",
     "vs_baseline": R}

``vs_baseline`` compares against the reference implementation's own
stack (torch.stft autograd with the reference's per-sample batch loop)
measured on this host's CPU — the only hardware the reference can run
on here (no CUDA).  Cached in .bench_baseline.json.

Timing method: jitted on-device fori_loop (20 iters, lambda varies per
iteration), warmed up, then timed on FRESH random inputs with a forced
host read-back; the accumulated value is cross-checked against a single
grad call to guard against runtime memoization returning stale/instant
results (observed on tunneled backends).  All diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

B = 128
T = 40000            # 5 s @ 8 kHz
SR = 8000
N_FFT = 1024
WIN = 1024
HOP = 80
N_MELS = 64
LAMBD = 128.0
ITERS = 20
AUDIO_S = B * T / SR

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def measure_jax(loss_fn, rng):
    """Per-batch seconds for grad(loss) via an on-device loop with
    value validation."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(i, acc):
            g = jax.grad(loss_fn)(LAMBD + i.astype(jnp.float32) * 1e-6, x)
            return acc + g
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    single = jax.jit(jax.grad(loss_fn))

    def fresh():
        x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
        jax.block_until_ready(x)
        return x

    x0 = fresh()
    ref = float(single(LAMBD, x0))          # compile + reference value
    float(run(x0))                          # compile loop
    best = float("inf")
    for _ in range(3):
        x = fresh()
        t = time.time()
        v = float(run(x))
        dt = (time.time() - t) / ITERS
        # validation: accumulated grad must be ~ITERS x a single grad
        # (lambda perturbations are tiny); wildly-off => stale result
        if not np.isfinite(v) or abs(v) < 0.01 * abs(ref) * ITERS:
            log(f"  suspicious loop value {v} (ref {ref}); discarding")
            continue
        best = min(best, dt)
    if not np.isfinite(best):
        raise RuntimeError("no valid timing obtained")
    return best


def measure_torch_reference() -> float:
    """Reference stack (torch.stft autograd DMEL with the per-sample
    Python loop, models.py:37) audio-s/s on this host's CPU; formula
    citations in tests/reference_impl.py."""
    import torch

    b_ref, iters = 4, 3
    x = torch.randn(b_ref, T)
    fb = None

    def one_step():
        nonlocal fb
        lam = torch.tensor(LAMBD, requires_grad=True)
        total = 0.0
        for i in range(b_ref):
            xi = x[i] - x[i].mean()
            m = torch.arange(WIN).float()
            w = torch.exp(-0.5 * ((m - WIN / 2) / (torch.abs(lam)
                                                   + 1e-15)) ** 2)
            s = torch.stft(xi, n_fft=N_FFT, hop_length=HOP, win_length=WIN,
                           window=w, return_complex=True,
                           pad_mode="constant")
            s = torch.abs(s) ** 2
            if fb is None:
                from tests.reference_impl import np_melscale_fbanks
                fb = torch.from_numpy(np_melscale_fbanks(
                    s.shape[0], 0.0, SR // 2, N_MELS, SR).astype(
                        np.float32))
            mel = (s.transpose(-1, -2) @ fb).transpose(-1, -2)
            total = total + torch.log(mel + 1e-10).sum()
        total.backward()

    one_step()  # warmup
    t = time.time()
    for _ in range(iters):
        one_step()
    dt = (time.time() - t) / iters
    return (b_ref * T / SR) / dt


def get_torch_baseline() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_audio_s_per_s"]
    log("measuring torch-CPU reference baseline ...")
    v = measure_torch_reference()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_audio_s_per_s": v,
                   "note": "reference torch.stft DMEL fwd+bwd "
                           "(per-sample loop), host CPU"}, f)
    return v


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    from dmel_tpu import ops
    from dmel_tpu.ops.pallas import fused_dmel

    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    log(f"backend: {backend}, devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def pal_loss(dtype):
        def loss(l, x):
            m = fused_dmel.dmel_power(
                x - x.mean(-1, keepdims=True), jnp.abs(l), win_length=WIN,
                n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS, sample_rate=SR,
                interpret=not on_tpu, compute_dtype=dtype)
            return jnp.log(m + 1e-10).sum()
        return loss

    def xla_loss(method, precision=None):
        import jax as _jax
        prec = precision or _jax.lax.Precision.HIGHEST
        def loss(l, x):
            m = ops.mel_spectrogram(x, l, n_mels=N_MELS, sample_rate=SR,
                                    hop_length=HOP, optimized=True,
                                    window_length=WIN, method=method,
                                    precision=prec)
            return jnp.log(m + 1e-10).sum()
        return loss

    # Parity-grade candidates: all verified <= 1e-4 log-mel max-abs-err
    # against the torch.stft reference on this workload (HIGH = bf16x3
    # passes at 9.4e-5; DEFAULT bf16 does NOT and stays in extras).
    candidates = {
        "xla-matmul": xla_loss("matmul"),
        "xla-matmul_ext": xla_loss("matmul_ext"),
        "xla-matmul_ext-HIGH": xla_loss("matmul_ext",
                                        jax.lax.Precision.HIGH),
    }
    extras = {}
    if on_tpu:  # interpret-mode pallas at bench scale would take hours
        candidates["pallas-f32"] = pal_loss(jnp.float32)
        candidates["pallas-bf16x3"] = pal_loss("bf16x3")
        extras["pallas-bf16"] = pal_loss(jnp.bfloat16)

    best_name, best_dt = None, float("inf")
    for name, loss in candidates.items():
        try:
            dt = measure_jax(loss, rng)
        except Exception as e:
            log(f"{name}: FAILED ({type(e).__name__}: {e})")
            continue
        log(f"{name}: {dt * 1e3:.2f} ms/batch -> "
            f"{AUDIO_S / dt:,.0f} audio-s/s")
        if dt < best_dt:
            best_name, best_dt = name, dt
    for name, loss in extras.items():
        try:
            dt = measure_jax(loss, rng)
            log(f"{name} (non-parity extra): {dt * 1e3:.2f} ms/batch -> "
                f"{AUDIO_S / dt:,.0f} audio-s/s")
        except Exception as e:
            log(f"{name}: FAILED ({type(e).__name__}: {e})")

    value = AUDIO_S / best_dt
    torch_cpu = get_torch_baseline()
    log(f"best f32-parity impl: {best_name}; torch-CPU reference: "
        f"{torch_cpu:,.1f} audio-s/s")

    print(json.dumps({
        "metric": "DMEL fwd+bwd audio-seconds/s/chip (n_fft=1024, hop=80, "
                  f"64 mels, batch {B}x5s@8kHz, parity<=1e-4) "
                  f"[{best_name}]",
        "value": round(value, 1),
        "unit": "audio_s_per_s_per_chip",
        "vs_baseline": round(value / torch_cpu, 2),
    }))


if __name__ == "__main__":
    main()
