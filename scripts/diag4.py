"""TPU: matmul_ext_mp timing + parity (features vs f64, dlambda vs f64)."""
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
DEFAULT = jax.lax.Precision.DEFAULT
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

def loss(method, prec, xprec=None):
    def f(l, x):
        m = ops.mel_spectrogram(x, l, n_mels=M, sample_rate=SR,
                                hop_length=HOP, optimized=True,
                                window_length=N, method=method,
                                precision=prec, x_precision=xprec)
        return ops.accurate_log(m + 1e-10).sum()
    return f

cands = [
    ("matmul_ext_mp HIGH/bf16", ("matmul_ext_mp", HIGH, DEFAULT)),
    ("matmul_ext_mp HIGH/HIGH", ("matmul_ext_mp", HIGH, HIGH)),
    ("matmul_ext HIGH (autodiff)", ("matmul_ext", HIGH)),
]
for name, args in cands:
    try:
        dt = measure(loss(*args))
        print(f"{name:32s} {dt*1e3:7.2f} ms/batch -> "
              f"{B*T/SR/dt:8,.0f} audio-s/s", flush=True)
    except Exception:
        import traceback; traceback.print_exc()

# ---- parity vs f64 (features and dlambda) ----
bp = 2
xp_np = rng.standard_normal((bp, T)).astype(np.float32)
xp_np -= xp_np.mean(-1, keepdims=True)

def f64_ref(x_np, dlam=False):
    m = np.arange(N, dtype=np.float64)
    lam = LAM
    wd = np.exp(-0.5 * ((m - N / 2) / lam) ** 2)
    dwd = wd * (m - N / 2) ** 2 / lam ** 3
    pad = N // 2
    fb = _melscale_fbanks_np(N // 2 + 1, 0.0, SR // 2, M, SR, None,
                             "htk").astype(np.float64)
    outs, g = [], 0.0
    for i in range(x_np.shape[0]):
        xi = np.pad(x_np[i].astype(np.float64), (pad, pad))
        nfr = T // HOP + 1
        fr = np.stack([xi[t * HOP:t * HOP + N] for t in range(nfr)])
        S = np.fft.rfft(fr * wd, axis=-1)
        P = np.abs(S) ** 2
        mel = P @ fb
        outs.append(np.log(mel + 1e-10).T)
        # dlambda: dL/dmel = 1/(mel+eps); dP = dmel @ fb^T;
        # dS = 2 dP * S; dlam = sum 2 Re(conj(S) T) dP, T = DFT(fr*dwd)
        Tm = np.fft.rfft(fr * dwd, axis=-1)
        dmel = 1.0 / (mel + 1e-10)
        dP = dmel @ fb.T
        g += np.sum(dP * 2 * (S.real * Tm.real + S.imag * Tm.imag))
    return np.stack(outs), g

gt, g64 = f64_ref(xp_np)
xj = jnp.asarray(xp_np)
for name, method, prec, xprec in [
    ("matmul_ext_mp HIGH/bf16", "matmul_ext_mp", HIGH, DEFAULT),
    ("matmul_ext HIGH", "matmul_ext", HIGH, None),
    ("matmul_ext HIGHEST", "matmul_ext", HIGHEST, None),
]:
    def feat(l, x):
        m = ops.mel_spectrogram(x, l, n_mels=M, sample_rate=SR,
                                hop_length=HOP, optimized=True,
                                window_length=N, method=method,
                                precision=prec, x_precision=xprec,
                                subtract_mean=False)
        return ops.accurate_log(m + 1e-10)
    got = np.asarray(jax.jit(feat)(jnp.float32(LAM), xj))
    ferr = np.max(np.abs(got - gt))
    g = float(jax.jit(jax.grad(lambda l, x: feat(l, x).sum()))(
        jnp.float32(LAM), xj))
    print(f"{name:28s} feat_err_vs_f64={ferr:.3e} "
          f"dlam_rel_vs_f64={abs(g-g64)/abs(g64):.3e}", flush=True)
