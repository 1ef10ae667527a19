"""TPU check: sliding-DFT specgemm timing + accurate_log parity."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, T, SR, N, HOP, M, LAM = 128, 40000, 8000, 1024, 80, 64, 128.0
rng = np.random.default_rng(0)

from dmel_tpu import ops
from dmel_tpu.ops.stft import stft_power, stft_power_specgemm
from dmel_tpu.ops.window import gaussian_window
from dmel_tpu.ops.mel import _melscale_fbanks_np

HIGH = jax.lax.Precision.HIGH
HIGHEST = jax.lax.Precision.HIGHEST
print("backend:", jax.default_backend(), flush=True)
fbj = ops.melscale_fbanks(N // 2 + 1, 0.0, SR // 2, M, SR)

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

def loss(method, prec, xprec=None, ximpl=None, j=None):
    def f(l, x):
        xx = x - x.mean(-1, keepdims=True)
        w = gaussian_window(jnp.abs(l), N)
        if method == "specgemm":
            kw = {}
            if j is not None:
                kw["j_taps"] = j
            p = stft_power_specgemm(xx, w, N, HOP, x_impl=ximpl or "auto",
                                    precision=prec, x_precision=xprec, **kw)
        else:
            p = stft_power(xx, w, N, HOP, method=method, precision=prec)
        mel = jnp.matmul(jnp.swapaxes(p, -1, -2), fbj, precision=HIGHEST)
        return ops.accurate_log(mel + 1e-10).sum()
    return f

for name, args in [
    ("specgemm sliding xHIGH bandHIGH J24", ("specgemm", HIGH, HIGH, "sliding")),
    ("specgemm sliding xHIGH bandHIGH J16", ("specgemm", HIGH, HIGH, "sliding", 16)),
    ("specgemm sliding xHIGH bandHST J24", ("specgemm", HIGHEST, HIGH, "sliding")),
    ("matmul_ext HIGH + acclog", ("matmul_ext", HIGH)),
]:
    try:
        dt = measure(loss(*args))
        print(f"{name:38s} {dt*1e3:7.2f} ms/batch -> "
              f"{B*T/SR/dt:8,.0f} audio-s/s", flush=True)
    except Exception as e:
        import traceback; traceback.print_exc()
        print(name, "FAIL", flush=True)

# parity vs f64 ground truth with accurate_log
bp = 2
xp_np = rng.standard_normal((bp, T)).astype(np.float32)
xp_np -= xp_np.mean(-1, keepdims=True)

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

gt = f64_logmel(xp_np)
xj = jnp.asarray(xp_np)
for name, fn in [
    ("matmul_ext HIGHEST + acclog",
     jax.jit(lambda x: ops.accurate_log(jnp.matmul(jnp.swapaxes(
         stft_power(x, gaussian_window(LAM, N), N, HOP,
                    method="matmul_ext", precision=HIGHEST), -1, -2),
         fbj, precision=HIGHEST) + 1e-10))),
    ("matmul_ext HIGH + acclog",
     jax.jit(lambda x: ops.accurate_log(jnp.matmul(jnp.swapaxes(
         stft_power(x, gaussian_window(LAM, N), N, HOP,
                    method="matmul_ext", precision=HIGH), -1, -2),
         fbj, precision=HIGHEST) + 1e-10))),
    ("specgemm sliding xHIGH J24 + acclog",
     jax.jit(lambda x: ops.accurate_log(jnp.matmul(jnp.swapaxes(
         stft_power_specgemm(x, gaussian_window(LAM, N), N, HOP,
                             x_impl="sliding", precision=HIGHEST,
                             x_precision=HIGH), -1, -2),
         fbj, precision=HIGHEST) + 1e-10))),
    ("specgemm sliding xHIGH J32 + acclog",
     jax.jit(lambda x: ops.accurate_log(jnp.matmul(jnp.swapaxes(
         stft_power_specgemm(x, gaussian_window(LAM, N), N, HOP,
                             j_taps=32, x_impl="sliding",
                             precision=HIGHEST,
                             x_precision=HIGH), -1, -2),
         fbj, precision=HIGHEST) + 1e-10))),
]:
    got = np.asarray(fn(xj)).transpose(0, 1, 2)
    e = np.max(np.abs(got - gt))
    print(f"{name:38s} err vs f64: {e:.3e}", flush=True)
