"""Numerical study: frequency-domain (banded) evaluation of the
Gaussian-windowed STFT.

S[t,k] = DFT(f_t * w)[k] = (1/N) sum_j X_t[j] W[k-j]   (circular)

where X = DFT(frames) is lambda-independent and W = DFT(window).  If W
can be truncated to |d| <= J taps, the whole lambda-dependent part of
DMEL (fwd AND bwd) collapses to a banded conv over frequency — the key
to the derivative-window gradient identity (PERF.md round-1 notes).

This script measures, in float64 (isolating *truncation* error from
rounding), the log-mel max-abs error of the J-truncated path vs the
exact windowed DFT, across the in-bucket lambda range of the optimized
mode (win = next_pow2(6*lambda) => win/12 < lambda <= win/6).
"""
import numpy as np

N = 1024
N_MELS = 64
SR = 8000
LOG_EPS = 1e-10

rng = np.random.default_rng(0)


def melfb(n_freqs):
    import sys
    sys.path.insert(0, "/root/repo")
    from dmel_tpu.ops.mel import _melscale_fbanks_np
    return _melscale_fbanks_np(n_freqs, 0.0, SR // 2, N_MELS, SR, None,
                               "htk").astype(np.float64)


def gauss(lam, n):
    m = np.arange(n, dtype=np.float64)
    return np.exp(-0.5 * ((m - n / 2) / lam) ** 2)


def run(lam, J, frames):
    n = N
    K = n // 2 + 1
    w = gauss(lam, n)
    # exact
    S = np.fft.rfft(frames * w, axis=-1)
    P = np.abs(S) ** 2
    fb = melfb(K)
    mel = P @ fb
    logmel = np.log(mel + LOG_EPS)

    # freq-domain truncated
    What = np.fft.fft(w)                      # (N,) complex
    X = np.fft.fft(frames, axis=-1)           # full spectrum (N,)
    taps = np.arange(-J, J + 1)
    St = np.zeros((frames.shape[0], K), dtype=complex)
    for d in taps:
        # S[k] = 1/N sum_d X[(k-d) mod N] * What[d mod N]
        idx = (np.arange(K) - d) % n
        St += X[:, idx] * What[d % n]
    St /= n
    Pt = np.abs(St) ** 2
    melt = Pt @ fb
    logmelt = np.log(melt + LOG_EPS)
    return np.max(np.abs(logmelt - logmel)), np.max(np.abs(St - S)) / np.max(np.abs(S))


frames = rng.standard_normal((64, N))
# also a "real audio"-ish signal: pink-ish noise + tones
t = np.arange(N)
tone = sum(np.sin(2 * np.pi * f * t / SR + p)
           for f, p in [(440, 0), (1210, 1), (3303, 2)])
pink = np.cumsum(rng.standard_normal((64, N)), axis=-1)
pink /= np.abs(pink).max()
frames2 = 0.1 * rng.standard_normal((64, N)) + tone * 0.3 + pink

for name, fr in [("white", frames), ("tonal+pink", frames2)]:
    print(f"== {name} ==")
    for lam in [N / 12 + 1, N / 8, N / 6]:
        for J in [4, 8, 12, 16, 24, 32]:
            e_log, e_s = run(lam, J, fr)
            print(f" lam={lam:7.2f} J={J:2d}  logmel_err={e_log:.3e}  "
                  f"relS_err={e_s:.3e}")
        print()
