"""Block1 decomposition at the PRODUCTION config + avg-pool impl A/B.

diag_cnn6_r5b measured blocks<=1 at 5.40 ms (f32/threefry) and ~1%
MFU — activation-HBM bound, the last big door in the esc50 step
(7.90 ms production, results/bench_train_r5c.txt).  Before deciding
whether the fused conv+BN+pool Pallas block is worth its custom
backward, this script:

  1. re-runs the truncated-stack attribution AT the production config
     (bf16 conv stack + rbg dropout keys), and
  2. A/Bs the one cheap XLA-level lever left: 2x2/stride-2 VALID
     avg-pool computed as a strided reshape + mean over the two
     window axes instead of lax.reduce_window (`nn.avg_pool`).  Same
     math (windows tile the truncated-to-even extent exactly like
     VALID pooling; verified numerically below), but the reshape form
     gives XLA a plain reduce it can fuse into the surrounding
     elementwise chain instead of a windowed primitive, and its
     BACKWARD is a broadcast instead of a select-and-scatter.

All timings use the RTT-amortized two-length on-device scan slope
(same harness as scripts/bench_train.py — the ~27 ms relay RTT
otherwise dominates, CLAUDE.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/diag_block1.py
Commit output as results/diag_block1_r5.txt (round-4 artifact policy).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

B, FRAMES, MELS, NCLS = 32, 501, 64, 50


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

    from dmel_tpu.models import panns
    from dmel_tpu.models.panns import Cnn6, ConvBlock5x5
    from dmel_tpu.training.train import bce_loss

    print(f"backend: {jax.default_backend()}  B={B} frames={FRAMES} "
          f"mels={MELS}")

    # ---- numeric equivalence of the reshape-mean pool (f32) ----------
    def reshape_avg_pool(x, pool_size, strides):
        (ph, pw) = pool_size
        b, h, w, c = x.shape
        h2, w2 = h // ph, w // pw
        x = x[:, :h2 * ph, :w2 * pw, :]
        x = x.reshape(b, h2, ph, w2, pw, c)
        return x.mean(axis=(2, 4))

    rng0 = np.random.default_rng(0)
    xt = jnp.asarray(rng0.normal(size=(2, 21, 16, 3)).astype(np.float32))
    ref = nn.avg_pool(xt, (2, 2), strides=(2, 2))
    got = reshape_avg_pool(xt, (2, 2), (2, 2))
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"reshape-mean vs nn.avg_pool (f32, odd extent): "
          f"max|diff| = {err:.2e}")
    assert err < 1e-6

    ys1h = jax.nn.one_hot(jnp.asarray(rng0.integers(0, NCLS, B)), NCLS)
    mask = jnp.ones(B, jnp.float32)

    class TruncCnn6(nn.Module):
        """First-k conv blocks + the standard head."""
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

    def measure(model, label, rbg=True):
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
        print(f"{label}: {best * 1e3:.2f} ms/step")
        return best

    bf16 = jnp.bfloat16
    orig_pool = panns._pool

    def pool_reshape(x, pool_size, pool_type):
        if pool_type == "avg" and tuple(pool_size) == (2, 2):
            return reshape_avg_pool(x, pool_size, pool_size)
        return orig_pool(x, pool_size, pool_type)

    def with_pool(fn):
        def wrapped(*a, **kw):
            panns._pool = pool_reshape
            try:
                return fn(*a, **kw)
            finally:
                panns._pool = orig_pool
        return wrapped

    # ---- production baseline + attribution ---------------------------
    base = measure(Cnn6(NCLS, MELS, dtype=bf16),
                   "full Cnn6 (bf16 + rbg) [production]")
    for k in (1, 2):
        measure(TruncCnn6(k, dtype=bf16), f"blocks<={k} (bf16 + rbg)")

    # ---- reshape-mean pool A/B ---------------------------------------
    pooled = with_pool(measure)(Cnn6(NCLS, MELS, dtype=bf16),
                                "full Cnn6 (bf16 + rbg, reshape-pool)")
    with_pool(measure)(TruncCnn6(1, dtype=bf16),
                       "blocks<=1 (bf16 + rbg, reshape-pool)")

    print(f"\nreshape-pool full-model speedup: {base / pooled:.3f}x")


if __name__ == "__main__":
    main()
