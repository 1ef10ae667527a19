"""CNN6 train-step decomposition + lever A/B (VERDICT r4 next #1).

bench_train_r5 showed the esc50 flagship step is 97% CNN6 (17.9 of
18.4 ms), at ~53 TFLOP/s executed (analytic ~950 GFLOP fwd+bwd) = ~27%
of v5e bf16 peak.  This script isolates where the time goes and
measures the levers:

  base          f32 activations, threefry dropout      (production r4)
  no-dropout    deterministic (bounds the RNG+mask cost)
  rbg           threefry -> RBG dropout keys (TPU-native PRNG)
  bf16          conv stack in bfloat16 (Cnn6.dtype) — halves the
                activation HBM bytes; MXU passes are bf16 either way
  bf16+rbg      both
  blocks<=k     truncated stacks (f32) — per-block attribution

All timings use the same RTT-amortized two-length scan slope as
scripts/bench_train.py.  Run on TPU; commit output as
results/diag_cnn6_r5.txt.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B, FRAMES, MELS, NCLS = 32, 501, 64, 50


def analytic_flops(n_blocks=4):
    """Forward conv FLOPs for the esc50 geometry (fwd+bwd ~ 3x)."""
    h, w, cin = FRAMES, MELS, 1
    total = 0
    for i, cout in enumerate([64, 128, 256, 512][:n_blocks]):
        total += B * h * w * 25 * cin * cout * 2
        h, w, cin = h // 2, w // 2, cout
    return total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--short", type=int, default=8)
    parser.add_argument("--long", type=int, default=32)
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from dmel_tpu.models.panns import Cnn6, ConvBlock5x5
    from dmel_tpu.training.train import bce_loss

    print(f"backend: {jax.default_backend()}  B={B} frames={FRAMES} "
          f"mels={MELS}")
    fl3 = 3 * analytic_flops()
    print(f"analytic conv FLOPs: fwd {analytic_flops() / 1e9:.0f} G, "
          f"fwd+bwd ~{fl3 / 1e9:.0f} G")

    rng0 = np.random.default_rng(0)
    ys1h = jax.nn.one_hot(
        jnp.asarray(rng0.integers(0, NCLS, B)), NCLS)
    mask = jnp.ones(B, jnp.float32)

    class TruncCnn6(nn.Module):
        """First-k conv blocks + the standard head (f32)."""
        n_blocks: int
        dtype: jnp.dtype | None = None

        @nn.compact
        def __call__(self, x, train=False):
            drop = lambda x, r: nn.Dropout(r)(  # noqa: E731
                x, deterministic=not train)
            for i, ch in enumerate([64, 128, 256, 512][:self.n_blocks],
                                   start=1):
                x = ConvBlock5x5(ch, dtype=self.dtype,
                                 name=f"conv_block{i}")(x, train=train)
                x = drop(x, 0.2)
            x = x.astype(jnp.float32)
            x = jnp.mean(x, axis=2)
            x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)
            x = nn.Dense(NCLS, name="fc")(x)
            return jax.nn.sigmoid(x)

    def measure(model, label, train=True, rbg=False, flops=None):
        feat0 = jnp.zeros((B, FRAMES, MELS, 1), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), feat0)
        params = variables["params"]
        stats = variables.get("batch_stats")
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)

        def inner(p, o, st, k, xs):
            def loss_fn(q):
                v = {"params": q}
                if st is not None:
                    v["batch_stats"] = st
                kw = dict(train=True, rngs={"dropout": k})
                if st is not None:
                    kw["mutable"] = ["batch_stats"]
                out = model.apply(v, xs, **kw)
                if st is not None:
                    out, upd = out
                    st2 = upd["batch_stats"]
                else:
                    st2 = None
                return bce_loss(out, ys1h, mask), st2
            (loss, st2), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, o2 = opt.update(grads, o, p)
            return optax.apply_updates(p, updates), o2, st2, loss

        impl = "rbg" if rbg else "threefry2x32"

        def build_run(S):
            @jax.jit
            def run(p0, o0, st0, key):
                def body(carry, _):
                    p, o, st, k = carry
                    k, kx, ks = jax.random.split(k, 3)
                    xs = jax.random.normal(kx, (B, FRAMES, MELS, 1),
                                           jnp.float32)
                    p, o, st, loss = inner(p, o, st, ks, xs)
                    return (p, o, st, k), loss
                _, losses = jax.lax.scan(
                    body, (p0, o0, st0, key), None, length=S)
                return losses

            def inputs(rep):
                return (params, opt_state, stats,
                        jax.random.key(500 + rep, impl=impl))
            return run, inputs

        runs = {S: build_run(S) for S in (args.short, args.long)}
        for S, (fn, inputs) in runs.items():
            jax.block_until_ready(fn(*inputs(0)))
        best = float("inf")
        for rep in range(1, args.repeats + 1):
            ts = {}
            ok = True
            for S, (fn, inputs) in runs.items():
                inp = inputs(rep)
                jax.block_until_ready(inp)
                t0 = time.time()
                out = jax.block_until_ready(fn(*inp))
                ts[S] = time.time() - t0
                if not np.all(np.isfinite(np.asarray(out))):
                    ok = False
            if not ok:
                print(f"  [{label}] non-finite, discarded")
                continue
            dt = (ts[args.long] - ts[args.short]) / (args.long - args.short)
            if dt > 0:
                best = min(best, dt)
        extra = ""
        if flops is not None:
            extra = (f"  ~{flops / best / 1e12:.1f} TFLOP/s "
                     f"({flops / best / 197e12 * 100:.0f}% bf16 peak)")
        print(f"{label}: {best * 1e3:.2f} ms/step{extra}")
        return best

    # dropout-off variant: same Cnn6 applied with train=True but the
    # dropout layers deterministic is not reachable through the public
    # call; emulate by a module whose drop is identity
    class NoDropCnn6(nn.Module):
        dtype: jnp.dtype | None = None

        @nn.compact
        def __call__(self, x, train=False):
            from dmel_tpu.models.panns import _bn
            x = _bn(name="bn1", axis=2)(x, use_running_average=not train)
            for i, ch in enumerate([64, 128, 256, 512], start=1):
                x = ConvBlock5x5(ch, dtype=self.dtype,
                                 name=f"conv_block{i}")(x, train=train)
            x = x.astype(jnp.float32)
            x = jnp.mean(x, axis=2)
            x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)
            x = nn.relu(nn.Dense(512, name="fc1")(x))
            x = nn.Dense(NCLS, name="fc_esc50")(x)
            return jax.nn.sigmoid(x)

    base = measure(Cnn6(NCLS, MELS), "base (f32, threefry)", flops=fl3)
    measure(NoDropCnn6(), "no-dropout (f32)", flops=fl3)
    measure(Cnn6(NCLS, MELS), "rbg dropout (f32)", rbg=True, flops=fl3)
    bf16 = measure(Cnn6(NCLS, MELS, dtype=jnp.bfloat16),
                   "bf16 conv stack (threefry)", flops=fl3)
    both = measure(Cnn6(NCLS, MELS, dtype=jnp.bfloat16),
                   "bf16 conv stack + rbg", rbg=True, flops=fl3)
    for k in (1, 2, 3, 4):
        measure(TruncCnn6(k), f"blocks<={k} (f32, threefry)",
                flops=3 * analytic_flops(k))
    print(f"\nbf16 speedup: {base / bf16:.2f}x; +rbg: {base / both:.2f}x")


if __name__ == "__main__":
    main()
