"""Round 2 diagnostics: isolate the shared ~1.1e-4 error source on TPU
and get memoization-proof timings for specgemm vs matmul_ext."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, T, SR, N, HOP, M, LAM = 128, 40000, 8000, 1024, 80, 64, 128.0
rng = np.random.default_rng(0)

from dmel_tpu import ops
from dmel_tpu.ops.window import gaussian_window
from dmel_tpu.ops.mel import _melscale_fbanks_np

HIGH = jax.lax.Precision.HIGH
HIGHEST = jax.lax.Precision.HIGHEST
print("backend:", jax.default_backend(), flush=True)

# ---------- error isolation ------------------------------------------
bp = 2
xp_np = rng.standard_normal((bp, T)).astype(np.float32)
xp_np -= xp_np.mean(-1, keepdims=True)

def f64_stages(x_np):
    m = np.arange(N, dtype=np.float64)
    wd = np.exp(-0.5 * ((m - N / 2) / LAM) ** 2)
    pad = N // 2
    fb = _melscale_fbanks_np(N // 2 + 1, 0.0, SR // 2, M, SR, None,
                             "htk").astype(np.float64)
    Ps, mels = [], []
    for i in range(x_np.shape[0]):
        xi = np.pad(x_np[i].astype(np.float64), (pad, pad))
        nfr = T // HOP + 1
        fr = np.stack([xi[t * HOP:t * HOP + N] for t in range(nfr)])
        S = np.fft.rfft(fr * wd, axis=-1)
        P = (np.abs(S) ** 2).T
        Ps.append(P)
        mels.append((P.T @ fb).T)
    return np.stack(Ps), np.stack(mels)

P64, mel64 = f64_stages(xp_np)
logmel64 = np.log(mel64 + 1e-10)

xj = jnp.asarray(xp_np)

# window error
w64 = np.exp(-0.5 * ((np.arange(N) - N / 2) / LAM) ** 2)
w_dev = np.asarray(jax.jit(lambda: gaussian_window(LAM, N))())
print(f"window err (dev exp vs f64): {np.max(np.abs(w_dev - w64)):.3e}")

fbj = ops.melscale_fbanks(N // 2 + 1, 0.0, SR // 2, M, SR)

for method, prec, xprec in [("matmul_ext", HIGHEST, None),
                            ("specgemm", HIGHEST, HIGH),
                            ("fft", HIGHEST, None)]:
    @jax.jit
    def stages(x):
        w = gaussian_window(LAM, N)
        from dmel_tpu.ops.stft import stft_power
        p = stft_power(x, w, N, HOP, method=method, precision=prec,
                       x_precision=xprec)
        mel = jnp.swapaxes(jnp.matmul(jnp.swapaxes(p, -1, -2), fbj,
                                      precision=HIGHEST), -1, -2)
        return p, mel, jnp.log(mel + 1e-10)
    p, mel, logmel = (np.asarray(a) for a in stages(xj))
    relP = np.max(np.abs(p - P64)) / np.max(P64)
    relmel = np.max(np.abs(mel - mel64) / np.maximum(mel64, 1e-6))
    lm_dev = np.max(np.abs(logmel - logmel64))
    lm_host = np.max(np.abs(np.log(mel.astype(np.float64) + 1e-10)
                            - logmel64))
    print(f"{method:12s} relP={relP:.2e} relmel={relmel:.2e} "
          f"logmel(dev log)={lm_dev:.2e} logmel(host log)={lm_host:.2e}",
          flush=True)

# ---------- memoization-proof timing ---------------------------------
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

def loss(method, prec, xprec=None, ximpl=None):
    kw = {}
    def f(l, x):
        from dmel_tpu.ops.stft import stft_power, stft_power_specgemm
        xx = x - x.mean(-1, keepdims=True)
        w = gaussian_window(jnp.abs(l), N)
        if method == "specgemm":
            p = stft_power_specgemm(xx, w, N, HOP, x_impl=ximpl or "conv",
                                    precision=prec, x_precision=xprec)
        else:
            p = stft_power(xx, w, N, HOP, method=method, precision=prec)
        mel = jnp.matmul(jnp.swapaxes(p, -1, -2), fbj, precision=HIGHEST)
        return jnp.log(mel + 1e-10).sum()
    return f

for name, args in [
    ("matmul_ext HIGH", ("matmul_ext", HIGH)),
    ("specgemm conv xHIGH", ("specgemm", HIGHEST, HIGH, "conv")),
    ("specgemm gemm xHIGH", ("specgemm", HIGHEST, HIGH, "gemm")),
    ("specgemm gemm xHIGH bandHIGH", ("specgemm", HIGH, HIGH, "gemm")),
]:
    try:
        dt = measure(loss(*args))
        print(f"{name:30s} {dt*1e3:7.2f} ms/batch -> "
              f"{B*T/SR/dt:8,.0f} audio-s/s", flush=True)
    except Exception as e:
        print(name, "FAIL", type(e).__name__, str(e)[:200], flush=True)
