"""TPU: framed (in-kernel-framing) fused kernel timing + parity."""
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
def measure(loss_fn):
    @jax.jit
    def run(x):
        def body(i, acc):
            g = jax.grad(loss_fn)(LAM + i.astype(jnp.float32) * 1e-6, x)
            return acc + g
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

def loss_framed(l, x):
    xx = x - x.mean(-1, keepdims=True)
    w = ops.gaussian_window(jnp.abs(l), N)
    mel = framed_dmel.framed_mel_power(xx, w, n_fft=N, hop_length=HOP,
                                       n_mels=M, sample_rate=SR)
    return ops.accurate_log(mel + 1e-10).sum()

def loss_mp(l, x):
    m = ops.mel_spectrogram(x, l, n_mels=M, sample_rate=SR, hop_length=HOP,
                            optimized=True, window_length=N,
                            method="matmul_ext_mp",
                            precision=jax.lax.Precision.HIGH)
    return ops.accurate_log(m + 1e-10).sum()

for name, fn in [("pallas-framed", loss_framed),
                 ("matmul_ext_mp", loss_mp)]:
    try:
        dt = measure(fn)
        print(f"{name:20s} {dt*1e3:7.2f} ms/batch -> "
              f"{B*T/SR/dt:8,.0f} audio-s/s", flush=True)
    except Exception:
        import traceback; traceback.print_exc()

# parity of framed fwd vs torch-grade reference (f64 numpy)
from dmel_tpu.ops.mel import _melscale_fbanks_np
bp = 2
xp = rng.standard_normal((bp, T)).astype(np.float32)
xp -= xp.mean(-1, keepdims=True)
def f64_logmel(x_np):
    m = np.arange(N, dtype=np.float64)
    wd = np.exp(-0.5 * ((m - N / 2) / LAM) ** 2)
    pad = N // 2
    fb = _melscale_fbanks_np(N // 2 + 1, 0.0, SR // 2, M, SR, None,
                             "htk").astype(np.float64)
    out = []
    for i in range(x_np.shape[0]):
        xi = np.pad(x_np[i].astype(np.float64), (pad, pad))
        nfr = T // HOP + 1
        fr = np.stack([xi[t * HOP:t * HOP + N] for t in range(nfr)])
        S = np.fft.rfft(fr * wd, axis=-1)
        out.append(np.log((np.abs(S) ** 2 @ fb) + 1e-10).T)
    return np.stack(out)
gt = f64_logmel(xp)
xj = jnp.asarray(xp)
w = ops.gaussian_window(LAM, N)
got = np.asarray(jax.jit(lambda x: ops.accurate_log(
    framed_dmel.framed_mel_power(x, w, n_fft=N, hop_length=HOP,
                                 n_mels=M, sample_rate=SR) + 1e-10))(xj))
print("framed feat err vs f64:", np.max(np.abs(got - gt)), flush=True)

# dlambda vs f64 identity
def f64_dlam(x_np):
    m = np.arange(N, dtype=np.float64)
    wd = np.exp(-0.5 * ((m - N / 2) / LAM) ** 2)
    dwd = wd * (m - N / 2) ** 2 / LAM ** 3
    pad = N // 2
    fb = _melscale_fbanks_np(N // 2 + 1, 0.0, SR // 2, M, SR, None,
                             "htk").astype(np.float64)
    gsum = 0.0
    for i in range(x_np.shape[0]):
        xi = np.pad(x_np[i].astype(np.float64), (pad, pad))
        nfr = T // HOP + 1
        fr = np.stack([xi[t * HOP:t * HOP + N] for t in range(nfr)])
        S = np.fft.rfft(fr * wd, axis=-1)
        Tm = np.fft.rfft(fr * dwd, axis=-1)
        mel = np.abs(S) ** 2 @ fb
        dP = (1.0 / (mel + 1e-10)) @ fb.T
        gsum += np.sum(dP * 2 * (S.real * Tm.real + S.imag * Tm.imag))
    return gsum
g64 = f64_dlam(xp)
gk = float(jax.jit(jax.grad(lambda l, x: ops.accurate_log(
    framed_dmel.framed_mel_power(
        x, ops.gaussian_window(jnp.abs(l), N), n_fft=N, hop_length=HOP,
        n_mels=M, sample_rate=SR) + 1e-10).sum()))(jnp.float32(LAM), xj))
print(f"framed dlam rel vs f64: {abs(gk-g64)/abs(g64):.3e}", flush=True)
