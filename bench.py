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

Self-certification (round-2): every candidate's log-mel max-abs error
and dlambda relative error are measured IN THIS RUN against a torch
oracle on shared inputs; only candidates passing the 1e-4 gate compete
for the headline, and the winner's measured parity is embedded in the
metric string.  Timings are median-of-5 with reported spread.

Timing method: jitted on-device fori_loop (200 iters, lambda varies per
iteration), warmed up, then timed on FRESH random inputs with a forced
host read-back; the accumulated value must land within [0.5, 2]x of
ITERS x a single grad call to guard against runtime memoization
returning stale/instant results (observed on tunneled backends).  All
diagnostics go to stderr.

ITERS calibration: the tunneled runtime costs ~27 ms per dispatched
call *regardless of loop length* (measured: a scalar-body fori_loop
takes 27.3 ms at 1 iteration and 27.8 ms at 400 — scripts/diag6.py
floor cases).  At ITERS=20 that fixed RTT inflated every per-batch
number by ~1.35 ms; ITERS=200 amortizes it to ~0.14 ms so the metric
measures chip work, not sandbox relay latency.
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
ITERS = 200
REPEATS = 5
PARITY_B = 4         # batch for the in-bench parity check
PARITY_GATE = 1e-4   # log-mel feature max-abs error vs the torch oracle
GRAD_GATE = 1e-2     # dlambda relative error vs the torch oracle; the
                     # scalar window-length gradient tolerates bf16
                     # adjoint noise far below SGD batch noise, but a
                     # candidate must still stay in the 1% band
AUDIO_S = B * T / SR

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def measure_jax(loss_fn, rng):
    """Median per-batch seconds for grad(loss) via an on-device loop
    with value validation; returns (median, min, max)."""
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
    times = []
    for _ in range(REPEATS):
        x = fresh()
        t = time.time()
        v = float(run(x))
        dt = (time.time() - t) / ITERS
        # validation: lambda perturbations are 1e-6-tiny, so the
        # accumulated grad must be ~ITERS x a single grad; anything
        # outside a 2x relative band means a stale/memoized result.
        expect = ref * ITERS
        if not np.isfinite(v) or not (0.5 * abs(expect) <= abs(v)
                                      <= 2.0 * abs(expect)):
            log(f"  suspicious loop value {v} (expect ~{expect}); "
                "discarding")
            continue
        times.append(dt)
    if not times:
        raise RuntimeError("no valid timing obtained")
    return float(np.median(times)), min(times), max(times)


def torch_oracle(x_np: np.ndarray):
    """Reference log-mel features + dlambda on the parity inputs,
    computed with the reference's own stack (torch.stft, f32, per-sample
    loop; formulas at /root/reference/time_frequency.py:21-53 +
    models.py:38-53 — transcription in tests/reference_impl.py)."""
    import torch
    from tests.reference_impl import np_melscale_fbanks

    fb = torch.from_numpy(np_melscale_fbanks(
        N_FFT // 2 + 1, 0.0, SR // 2, N_MELS, SR).astype(np.float32))
    lam = torch.tensor(LAMBD, requires_grad=True)
    outs = []
    total = None
    for i in range(x_np.shape[0]):
        xi = torch.from_numpy(x_np[i])
        xi = xi - xi.mean()
        m = torch.arange(WIN).float()
        w = torch.exp(-0.5 * ((m - WIN / 2) /
                              (torch.abs(lam) + 1e-15)) ** 2)
        s = torch.stft(xi, n_fft=N_FFT, hop_length=HOP, win_length=WIN,
                       window=w, return_complex=True, pad_mode="constant")
        s = torch.abs(s) ** 2
        mel = (s.transpose(-1, -2) @ fb).transpose(-1, -2)
        logmel = torch.log(mel + 1e-10)
        outs.append(logmel.detach().numpy())
        total = logmel.sum() if total is None else total + logmel.sum()
    total.backward()
    return np.stack(outs), float(lam.grad)


def check_parity(feat_fn, x_par, ref_feat, ref_grad):
    """Measured log-mel max-abs-err and dlambda rel-err for a candidate
    on the shared parity inputs."""
    import jax
    import jax.numpy as jnp
    xj = jnp.asarray(x_par)
    # parity MUST go through jit: the certificate has to cover the
    # same compiled executable the timing loop runs — eager and jitted
    # numerics can differ (measured: an XLA excess-precision rewrite
    # zeroed a bf16 hi/lo split's lo-correction under jit only,
    # 9.7e-5 eager vs 1.3e-2 jitted before the in-kernel-split fix)
    got = np.asarray(jax.jit(feat_fn)(jnp.float32(LAMBD), xj))
    feat_err = float(np.max(np.abs(got - ref_feat)))
    g = float(jax.jit(jax.grad(lambda l, x: feat_fn(l, x).sum()))(
        jnp.float32(LAMBD), xj))
    grad_err = abs(g - ref_grad) / max(abs(ref_grad), 1e-30)
    return feat_err, grad_err


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

    # The tunneled backend can WEDGE (jax.devices() blocks forever in a
    # C call — SIGALRM can't interrupt it; observed: >6 h outage after
    # clients were killed mid-call).  Probe backend liveness in a
    # killable SUBPROCESS; wedges sometimes clear on their own, so
    # retry within a bounded window (BENCH_WEDGE_WAIT_S, default 30 min)
    # before failing with a diagnosable error instead of hanging the
    # driver.
    import subprocess
    wait_budget = float(os.environ.get("BENCH_WEDGE_WAIT_S", "1800"))
    deadline = time.time() + wait_budget
    attempt = 0
    while True:
        attempt += 1
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=300, check=True, capture_output=True)
            break
        except subprocess.TimeoutExpired:
            remaining = deadline - time.time()
            if remaining <= 0:
                raise SystemExit(
                    "bench aborted: backend init never completed within "
                    f"{wait_budget:.0f} s ({attempt} probes x 300 s) — "
                    "tunneled TPU relay is wedged (see CLAUDE.md)")
            log(f"backend probe {attempt} timed out; relay may be "
                f"wedged — retrying ({remaining:.0f} s budget left)")

    backend = jax.default_backend()
    on_tpu = backend in ("tpu", "axon")
    log(f"backend: {backend}, devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def pal_feat(dtype):
        def feat(l, x):
            m = fused_dmel.dmel_power(
                x - x.mean(-1, keepdims=True), jnp.abs(l), win_length=WIN,
                n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS, sample_rate=SR,
                interpret=not on_tpu, compute_dtype=dtype)
            return ops.accurate_log(m + 1e-10)
        return feat

    def xla_feat(method, precision=None, x_precision=None):
        prec = precision or jax.lax.Precision.HIGHEST
        def feat(l, x):
            m = ops.mel_spectrogram(x, l, n_mels=N_MELS, sample_rate=SR,
                                    hop_length=HOP, optimized=True,
                                    window_length=WIN, method=method,
                                    precision=prec, x_precision=x_precision)
            return ops.accurate_log(m + 1e-10)
        return feat

    # Candidates: parity is MEASURED below on this run's inputs; only
    # those passing the 1e-4 log-mel gate compete for the headline.
    candidates = {
        "xla-matmul_ext-HIGH": xla_feat("matmul_ext",
                                        jax.lax.Precision.HIGH),
        # mixed-precision custom VJP: HIGH fwd (feature parity), plain
        # bf16 adjoint GEMM (gradient-only, error printed below)
        "xla-matmul_ext_mp": xla_feat("matmul_ext_mp",
                                      jax.lax.Precision.HIGH),
        # insurance: HIGHEST fwd (1.2e-5-class features) + bf16 adjoint
        "xla-matmul_ext_mp-HST": xla_feat("matmul_ext_mp"),
    }
    extras = {
        # derivative-window identity path: exact (dlambda 6.5e-7) but
        # MXU-block-granularity-bound — see PERF.md; wins only for
        # multi-sigma where K sigmas share one spectra pass
        "xla-specgemm-HIGHEST": xla_feat("specgemm"),
    }
    def framed_feat(l, x):
        # in-kernel-framing fused kernel (ops/pallas/framed_dmel.py);
        # the hint statically disables the low-bin fix at this
        # lambda/n_fft ratio, as the production dispatch would
        return ops.log_mel_spectrogram(
            x, l, n_mels=N_MELS, sample_rate=SR, hop_length=HOP,
            optimized=True, window_length=WIN, impl="pallas_framed",
            lambd_hint=LAMBD)

    def specband_feat(l, x):
        # sliding-DFT + banded-window kernel (ops/pallas/specband_dmel)
        # via the production dispatch: impl="pallas" + a static
        # lambd_hint inside the truncation window resolves to it.
        # log_mel_spectrogram so the round-5 fused in-kernel log
        # epilogue is what gets benched AND parity-certified.
        return ops.log_mel_spectrogram(
            x, l, n_mels=N_MELS, sample_rate=SR, hop_length=HOP,
            optimized=True, window_length=WIN, impl="pallas",
            lambd_hint=LAMBD)

    if on_tpu:  # interpret-mode pallas at bench scale would take hours
        candidates["pallas-specband"] = specband_feat
        candidates["pallas-framed"] = framed_feat
        candidates["pallas-bf16x3"] = pal_feat("bf16x3")
        extras["pallas-f32"] = pal_feat(jnp.float32)
        extras["pallas-bf16"] = pal_feat(jnp.bfloat16)

    # ---- in-bench parity oracle (shared inputs) ----
    x_par = rng.standard_normal((PARITY_B, T)).astype(np.float32)
    log("computing torch oracle for parity gate ...")
    ref_feat, ref_grad = torch_oracle(x_par)

    def to_loss(feat):
        return lambda l, x: feat(l, x).sum()

    results = {}
    for name, feat in candidates.items():
        # one bounded retry: the tunneled relay occasionally drops a
        # remote compile ("response body closed ..."); a candidate —
        # possibly the headline — must not be lost to one hiccup
        for attempt in (1, 2):
            try:
                ferr, gerr = check_parity(feat, x_par, ref_feat, ref_grad)
                med, lo, hi = measure_jax(to_loss(feat), rng)
                break
            except Exception as e:
                if attempt == 2:
                    log(f"{name}: FAILED ({type(e).__name__}: {e})")
                else:
                    log(f"{name}: transient failure "
                        f"({type(e).__name__}), retrying ...")
        else:
            continue
        ok = ferr <= PARITY_GATE and gerr <= GRAD_GATE
        log(f"{name}: {med * 1e3:.2f} ms/batch "
            f"[{lo * 1e3:.2f}-{hi * 1e3:.2f}] -> "
            f"{AUDIO_S / med:,.0f} audio-s/s | logmel_err={ferr:.2e} "
            f"dlambda_rel={gerr:.2e} {'PASS' if ok else 'FAIL-gate'}")
        if ok:
            results[name] = (med, ferr, gerr)
    for name, feat in extras.items():
        try:
            ferr, gerr = check_parity(feat, x_par, ref_feat, ref_grad)
            med, lo, hi = measure_jax(to_loss(feat), rng)
            log(f"{name} (extra): {med * 1e3:.2f} ms/batch -> "
                f"{AUDIO_S / med:,.0f} audio-s/s | logmel_err={ferr:.2e} "
                f"dlambda_rel={gerr:.2e}")
        except Exception as e:
            log(f"{name}: FAILED ({type(e).__name__}: {e})")

    if not results:
        raise RuntimeError("no candidate passed the parity gate")
    best_name = min(results, key=lambda k: results[k][0])
    best_dt, best_ferr, best_gerr = results[best_name]

    value = AUDIO_S / best_dt
    torch_cpu = get_torch_baseline()
    log(f"best parity-passing impl: {best_name}; torch-CPU reference: "
        f"{torch_cpu:,.1f} audio-s/s")

    print(json.dumps({
        "metric": "DMEL fwd+bwd audio-seconds/s/chip (n_fft=1024, hop=80, "
                  f"64 mels, batch {B}x5s@8kHz; measured logmel_err="
                  f"{best_ferr:.1e}, dlambda_rel={best_gerr:.1e}) "
                  f"[{best_name}, median of {REPEATS}]",
        "value": round(value, 1),
        "unit": "audio_s_per_s_per_chip",
        "vs_baseline": round(value / torch_cpu, 2),
    }))


if __name__ == "__main__":
    main()
