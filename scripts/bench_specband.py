"""TPU timing: specband kernel vs framed kernel vs matmul_ext_mp at the
bench geometry (fwd+bwd through lambda, fori_loop-amortized)."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

from dmel_tpu import ops
from dmel_tpu.ops.window import gaussian_window
from dmel_tpu.ops.pallas import specband_dmel as sb

B, T, SR, N_FFT, HOP, N_MELS = 128, 40000, 8000, 1024, 80, 64
LAMBD, ITERS = 128.0, 200
on_tpu = jax.default_backend() in ("tpu", "axon")
print("backend", jax.default_backend(), file=sys.stderr)

def specband_feat(l, x):
    xm = x - x.mean(-1, keepdims=True)
    w = gaussian_window(jnp.abs(l), N_FFT, norm=False)
    m = sb.specband_mel_power(xm, w, n_fft=N_FFT, hop_length=HOP,
                              n_mels=N_MELS, sample_rate=SR,
                              interpret=not on_tpu)
    return ops.accurate_log(m + 1e-10)

def framed_feat(l, x):
    m = ops.mel_spectrogram(x, l, n_mels=N_MELS, sample_rate=SR,
                            hop_length=HOP, optimized=True,
                            window_length=N_FFT, impl="pallas_framed")
    return ops.accurate_log(m + 1e-10)

def mp_feat(l, x):
    m = ops.mel_spectrogram(x, l, n_mels=N_MELS, sample_rate=SR,
                            hop_length=HOP, optimized=True,
                            window_length=N_FFT, method="matmul_ext_mp",
                            precision=jax.lax.Precision.HIGH)
    return ops.accurate_log(m + 1e-10)

rng = np.random.default_rng(0)

def measure(feat, name):
    loss = lambda l, x: feat(l, x).sum()
    @jax.jit
    def run(x):
        def body(i, acc):
            return acc + jax.grad(loss)(LAMBD + i.astype(jnp.float32)*1e-6, x)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    single = jax.jit(jax.grad(loss))
    x0 = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    ref = float(single(LAMBD, x0))
    float(run(x0))
    times = []
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
        jax.block_until_ready(x)
        t = time.time()
        v = float(run(x))
        dt = (time.time() - t) / ITERS
        expect = ref * ITERS
        ok = np.isfinite(v) and 0.5*abs(expect) <= abs(v) <= 2.0*abs(expect)
        times.append(dt)
        print(f"  {name}: {dt*1e3:.3f} ms/batch valid={ok}", file=sys.stderr)
    med = float(np.median(times))
    print(f"{name}: median {med*1e3:.3f} ms/batch -> "
          f"{B*T/SR/med:,.0f} audio-s/s", file=sys.stderr)

for nm, f in [("specband", specband_feat), ("framed", framed_feat),
              ("matmul_ext_mp", mp_feat)]:
    try:
        measure(f, nm)
    except Exception as e:
        print(f"{nm}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
