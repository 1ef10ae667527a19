"""TPU ablation timing for the framed kernel: where do the 5.5 ms go?

Components timed separately (each as its own jitted 20-iter loop):
  full      : grad of accurate_log(framed_mel).sum()   (the bench loss)
  fwd       : framed_mel forward only (no grad)
  fwd+log   : forward + accurate_log + sum
  xg        : the XLA group-row layout build alone
  fwdkernel : pallas fwd call alone (via forward with jax.lax.stop_gradient)
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, T, SR, N, HOP, M, LAM = 128, 40000, 8000, 1024, 80, 64, 128.0
rng = np.random.default_rng(0)

from dmel_tpu import ops
from dmel_tpu.ops.pallas import framed_dmel

print("backend:", jax.default_backend(), flush=True)

ITERS = 20


def measure(fn, needs_lam=True):
    @jax.jit
    def run(x):
        def body(i, acc):
            l = LAM + i.astype(jnp.float32) * 1e-6
            v = fn(l, x) if needs_lam else fn(x)
            return acc + v
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    def fresh():
        x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
        jax.block_until_ready(x)
        return x

    float(run(fresh()))
    ts = []
    for _ in range(3):
        x = fresh()
        t0 = time.time()
        float(run(x))
        ts.append((time.time() - t0) / ITERS)
    return float(np.median(ts))


def mel_fwd(l, x):
    w = ops.gaussian_window(jnp.abs(l), N)
    return framed_dmel.framed_mel_power(x, w, n_fft=N, hop_length=HOP,
                                        n_mels=M, sample_rate=SR)


def loss(l, x):
    return ops.accurate_log(mel_fwd(l, x) + 1e-10).sum()


cases = {
    "full grad": lambda l, x: jax.grad(loss)(l, x),
    "fwd+log sum": lambda l, x: loss(l, x),
    "fwd sum": lambda l, x: mel_fwd(l, x).sum(),
    "xg layout": lambda l, x: framed_dmel._xg_layout(
        x, N, HOP)[0].sum() + 0 * l,
    "plain log of const": lambda l, x: ops.accurate_log(
        jnp.abs(x[:, :M * 501].reshape(B, M, 501)) + 1e-10).sum() + 0 * l,
}
for name, fn in cases.items():
    try:
        dt = measure(fn)
        print(f"{name:22s} {dt*1e3:7.2f} ms", flush=True)
    except Exception:
        import traceback
        traceback.print_exc()

# floor calibration: near-empty loop bodies
floor_cases = {
    "x.sum() only": lambda l, x: x.sum() + 0 * l,
    "scalar only": lambda l, x: l * 2.0,
}
for name, fn in floor_cases.items():
    dt = measure(fn)
    print(f"{name:22s} {dt*1e3:7.2f} ms", flush=True)
