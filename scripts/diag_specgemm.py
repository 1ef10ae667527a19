"""TPU diagnostics: (a) where specgemm's time goes, (b) the true error
decomposition of each path against a float64 ground truth (including the
torch-f32 reference's OWN error — the parity gate is only meaningful
relative to that floor)."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, T, SR, N, HOP, M, LAM = 128, 40000, 8000, 1024, 80, 64, 128.0
AUDIO_S = B * T / SR
rng = np.random.default_rng(0)

from dmel_tpu import ops
from dmel_tpu.ops.stft import (stft_power_specgemm, frame_signal_ext,
                               _dft_matrices_ext_np, SPECGEMM_J_TAPS)
from dmel_tpu.ops.window import gaussian_window

on_tpu = jax.default_backend() in ("tpu", "axon")
print("backend:", jax.default_backend(), flush=True)
HIGH = jax.lax.Precision.HIGH
HIGHEST = jax.lax.Precision.HIGHEST


def timeit(f, *args, iters=10):
    g = jax.jit(f)
    o = g(*args); jax.block_until_ready(o)
    # fresh input to dodge memoization: perturb first arg
    t0 = time.time()
    for i in range(iters):
        o = g(*args)
    jax.block_until_ready(o)
    return (time.time() - t0) / iters


x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
w = gaussian_window(LAM, N)

# --- timing decomposition ---------------------------------------------
def x_conv(x):
    cb, sb = _dft_matrices_ext_np(N, SPECGEMM_J_TAPS)
    filt = jnp.asarray(np.concatenate([cb, sb], axis=1), jnp.float32)
    x3 = x.reshape((-1, 1, T))
    y = jax.lax.conv_general_dilated(
        x3, jnp.transpose(filt)[:, None, :], window_strides=(HOP,),
        padding=[(N // 2, N // 2)], dimension_numbers=("NCH", "OIH", "NCH"),
        precision=HIGH)
    return y

def x_gemm(x):
    frames_ext, n_ext = frame_signal_ext(x, N, HOP)
    cb, sb = _dft_matrices_ext_np(N, SPECGEMM_J_TAPS)
    zpad = ((0, n_ext - N), (0, 0))
    c_ext = jnp.asarray(np.pad(cb, zpad), jnp.float32)
    s_ext = jnp.asarray(np.pad(sb, zpad), jnp.float32)
    xr = jnp.matmul(frames_ext, c_ext, precision=HIGH)
    xi = jnp.matmul(frames_ext, s_ext, precision=HIGH)
    return xr, xi

def spec_full(x, l, x_impl, xp=HIGH):
    wd = gaussian_window(l, N)
    return stft_power_specgemm(x, wd, N, HOP, x_impl=x_impl,
                               precision=HIGHEST, x_precision=xp)

def grad_full(x_impl):
    def loss(l, x):
        p = spec_full(x - x.mean(-1, keepdims=True), jnp.abs(l), x_impl)
        fb = ops.melscale_fbanks(N // 2 + 1, 0.0, SR // 2, M, SR)
        mel = jnp.matmul(jnp.swapaxes(p, -1, -2), fb, precision=HIGHEST)
        return jnp.log(mel + 1e-10).sum()
    return jax.grad(loss)

print(f"x_conv fwd:  {timeit(x_conv, x)*1e3:8.2f} ms", flush=True)
print(f"x_gemm fwd:  {timeit(x_gemm, x)*1e3:8.2f} ms", flush=True)
print(f"spec conv fwd: {timeit(lambda x: spec_full(x, LAM, 'conv'), x)*1e3:8.2f} ms", flush=True)
print(f"spec gemm fwd: {timeit(lambda x: spec_full(x, LAM, 'gemm'), x)*1e3:8.2f} ms", flush=True)
print(f"spec conv f+b: {timeit(grad_full('conv'), jnp.float32(LAM), x)*1e3:8.2f} ms", flush=True)
print(f"spec gemm f+b: {timeit(grad_full('gemm'), jnp.float32(LAM), x)*1e3:8.2f} ms", flush=True)

# reference matmul_ext timing for context
def ref_grad(l, x):
    def loss(l, x):
        m = ops.mel_spectrogram(x, l, n_mels=M, sample_rate=SR,
                                hop_length=HOP, optimized=True,
                                window_length=N, method="matmul_ext",
                                precision=HIGH)
        return jnp.log(m + 1e-10).sum()
    return jax.grad(loss)(l, x)
print(f"matmul_ext HIGH f+b: {timeit(ref_grad, jnp.float32(LAM), x)*1e3:8.2f} ms", flush=True)

# --- error decomposition vs float64 -----------------------------------
bp = 2
xp_np = rng.standard_normal((bp, T)).astype(np.float32)
xp_np -= xp_np.mean(-1, keepdims=True)

# float64 ground truth (numpy)
def f64_logmel(x_np):
    from dmel_tpu.ops.mel import _melscale_fbanks_np
    m = np.arange(N, dtype=np.float64)
    wd = np.exp(-0.5 * ((m - N / 2) / LAM) ** 2)
    pad = N // 2
    out = []
    fb = _melscale_fbanks_np(N // 2 + 1, 0.0, SR // 2, M, SR, None,
                             "htk").astype(np.float64)
    for i in range(x_np.shape[0]):
        xi = np.pad(x_np[i].astype(np.float64), (pad, pad))
        nfr = T // HOP + 1
        fr = np.stack([xi[t * HOP:t * HOP + N] for t in range(nfr)])
        S = np.fft.rfft(fr * wd, axis=-1)
        P = np.abs(S) ** 2
        out.append(np.log(P @ fb + 1e-10).T)
    return np.stack(out)

gt = f64_logmel(xp_np)

import torch
from tests.reference_impl import np_melscale_fbanks
def torch_f32_logmel(x_np):
    fb = torch.from_numpy(np_melscale_fbanks(N//2+1, 0.0, SR//2, M, SR).astype(np.float32))
    outs = []
    for i in range(x_np.shape[0]):
        xi = torch.from_numpy(x_np[i])
        mm = torch.arange(N).float()
        wd = torch.exp(-0.5 * ((mm - N/2) / (LAM + 1e-15)) ** 2)
        s = torch.stft(xi, n_fft=N, hop_length=HOP, win_length=N, window=wd,
                       return_complex=True, pad_mode="constant")
        p = torch.abs(s) ** 2
        mel = (p.transpose(-1, -2) @ fb).transpose(-1, -2)
        outs.append(torch.log(mel + 1e-10).numpy())
    return np.stack(outs)

terr = np.max(np.abs(torch_f32_logmel(xp_np) - gt))
print(f"torch-f32 reference own err vs f64: {terr:.3e}", flush=True)

xj = jnp.asarray(xp_np)
fb = ops.melscale_fbanks(N // 2 + 1, 0.0, SR // 2, M, SR)
def ours(method, prec, xprec=None):
    mel = ops.mel_spectrogram(xj, LAM, n_mels=M, sample_rate=SR,
                              hop_length=HOP, optimized=True,
                              window_length=N, method=method,
                              precision=prec, x_precision=xprec,
                              subtract_mean=False)
    return np.asarray(jnp.log(mel + 1e-10))

for name, args in [
    ("matmul_ext HIGHEST", ("matmul_ext", HIGHEST)),
    ("matmul_ext HIGH", ("matmul_ext", HIGH)),
    ("specgemm xHIGH", ("specgemm", HIGHEST, HIGH)),
    ("specgemm xHIGHEST", ("specgemm", HIGHEST, HIGHEST)),
    ("fft", ("fft", HIGHEST)),
]:
    try:
        e = np.max(np.abs(ours(*args) - gt))
        print(f"{name:22s} err vs f64: {e:.3e}", flush=True)
    except Exception as ex:
        print(name, "FAILED", ex, flush=True)
