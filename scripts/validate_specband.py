"""Interpret-mode validation of ops/pallas/specband_dmel.py on CPU."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from dmel_tpu.ops import dmel
from dmel_tpu.ops.window import gaussian_window
from dmel_tpu.ops.pallas import specband_dmel as sb

N_FFT, HOP, N_MELS, SR = 1024, 80, 64, 8000
B, T = 2, 5000
LAMBD = 64.0

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))

print("supported:", sb.supported(N_FFT, HOP, N_MELS))
w = gaussian_window(LAMBD, N_FFT, norm=True)

# exact mel power (B, n_mels, n_frames)
mel_exact = dmel.mel_spectrogram(x, LAMBD, n_mels=N_MELS, sample_rate=SR,
                                 hop_length=HOP, optimized=True,
                                 window_length=N_FFT, normalize_window=True,
                                 subtract_mean=False, method="matmul")
print("exact shape", mel_exact.shape)

# XLA rebuild of the kernel math
rho = sb.window_taps_sym(w, N_FFT)
tmat = sb.band_matrix(rho, sb.SPECGEMM_J_TAPS if hasattr(sb,'SPECGEMM_J_TAPS') else 24)
from dmel_tpu.ops.stft import SPECGEMM_J_TAPS
tmat = sb.band_matrix(rho, SPECGEMM_J_TAPS)
key = (N_MELS, SR, 0.0, float(SR // 2))
mel_xla = sb._specband_xla_ref(x, tmat, N_FFT, HOP, SPECGEMM_J_TAPS, key)
mel_xla = jnp.swapaxes(mel_xla, -1, -2)
ref_mag = float(jnp.max(jnp.abs(mel_exact)))
print("xla-rebuild vs exact: max abs err %.3e (rel %.3e)" % (
    float(jnp.max(jnp.abs(mel_xla - mel_exact))),
    float(jnp.max(jnp.abs(mel_xla - mel_exact))) / ref_mag))

# kernel interpret mode
mel_k = sb.specband_mel_power(x, w, n_fft=N_FFT, hop_length=HOP,
                              n_mels=N_MELS, sample_rate=SR,
                              interpret=True)
print("kernel shape", mel_k.shape)
print("kernel vs xla-rebuild: max abs err %.3e (rel %.3e)" % (
    float(jnp.max(jnp.abs(mel_k - mel_xla))),
    float(jnp.max(jnp.abs(mel_k - mel_xla))) / ref_mag))
print("kernel vs exact: rel %.3e" % (
    float(jnp.max(jnp.abs(mel_k - mel_exact))) / ref_mag))

# log-mel comparison (the parity currency)
lm_err = float(jnp.max(jnp.abs(jnp.log(mel_k + 1e-10)
                               - jnp.log(mel_exact + 1e-10))))
print("log-mel err kernel vs exact: %.3e" % lm_err)

# gradient dλ
def loss_kernel(l):
    wl = gaussian_window(l, N_FFT, norm=True)
    m = sb.specband_mel_power(x, wl, n_fft=N_FFT, hop_length=HOP,
                              n_mels=N_MELS, sample_rate=SR,
                              interpret=True)
    return jnp.sum(jnp.log(m + 1e-10) * jnp.cos(jnp.arange(m.size).reshape(m.shape) * 0.1))

def loss_exact(l):
    m = dmel.mel_spectrogram(x, l, n_mels=N_MELS, sample_rate=SR,
                             hop_length=HOP, optimized=True,
                             window_length=N_FFT, normalize_window=True,
                             subtract_mean=False, method="matmul")
    return jnp.sum(jnp.log(m + 1e-10) * jnp.cos(jnp.arange(m.size).reshape(m.shape) * 0.1))

g_k = float(jax.grad(loss_kernel)(LAMBD))
g_e = float(jax.grad(loss_exact)(LAMBD))
print("dlambda kernel %.6e exact %.6e rel err %.3e" % (
    g_k, g_e, abs(g_k - g_e) / max(abs(g_e), 1e-12)))
