"""Vmapped multi-trial training — the TPU analog of Ray trial packing.

The reference packs 4 concurrent single-GPU trials per GPU via Ray's
fractional resources (/root/reference/main.py:131).  On TPU the
idiomatic equivalent is *vectorization*: stack K trials' parameters
along a leading axis, vmap the train step over it, and shard the trial
axis over the device mesh.  Trials never communicate, so scaling is
perfect; a single XLA program trains all K trials at once (far better
MXU utilization than K sequential tiny models).

Per-trial hyperparameters (init_lambd, lr_tf, trainable) become *arrays*
over the trial axis: the optimizer runs scale-free (lr=1) and per-trial
learning rates multiply the updates — exactly equivalent for SGD and
Adam, whose updates are linear in lr.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dmel_tpu.data.loader import BatchLoader, PrefetchIterator
from dmel_tpu.models.registry import get_model_by_config, n_classes_for
from dmel_tpu.ops.spectrogram import bucketed_window_length
from dmel_tpu.training.train import _loss_and_metrics


def _shared_specband_hint(c0, wl, lambds, active=None):
    """Shared static ``lambd_hint`` for a trial pack, or None.

    The specband kernel's dispatch is static per compilation (J bucket +
    lowbin flag, ops/stft.py:specband_compile_hint); a vmapped pack can
    ride it only when every ACTIVE trial's lambda sits in the SAME
    static-switch region (the common case: a reference grid shares
    init_lambd magnitudes per arm, search_spaces.py:29).  Frozen trials
    are ignored — their parameters no longer update and their metrics
    are discarded, so feature accuracy for them is moot.  Any
    disagreement (or any trial outside the truncation window) returns
    None and the pack keeps the framed/XLA path — correctness never
    depends on the hint (VERDICT r3 next #4).
    """
    if c0.get("impl") != "pallas" or wl is None:
        return None
    from dmel_tpu.ops.stft import pallas_compile_hint
    hints = []
    for i, lam in enumerate(lambds):
        if active is not None and not active[i]:
            continue
        if not np.isfinite(lam):
            return None
        hints.append(pallas_compile_hint(abs(float(lam)), wl,
                                         int(c0["hop_length"])))
    if not hints or any(h is None for h in hints):
        return None
    return hints[0] if all(h == hints[0] for h in hints) else None


def _lr_tree(params, lr_tf, lr_model):
    """Per-leaf learning-rate pytree: lambd leaves get lr_tf."""
    def walk(node, in_tf=False):
        if isinstance(node, dict):
            return {k: walk(v, in_tf or k == "lambd")
                    for k, v in node.items()}
        return lr_tf if in_tf else lr_model
    return walk(params)


def make_multitrial_step(model, base_opt, one_hot: bool, n_classes: int):
    """Build a jitted step vmapped over the leading trial axis.

    The step signature: (params_K, opt_state_K, batch_stats_K, lrs_K,
    rng_K, xs_K, ys_K, mask_K) -> updated + metrics.  ``lrs_K`` is a
    pytree matching params with per-trial scalar LRs (0 freezes a leaf).
    """

    def one_trial(params, opt_state, batch_stats, lrs, active, rng, xs, ys,
                  mask):
        rng, sub = jax.random.split(rng)
        grad_fn = jax.value_and_grad(
            lambda p: _loss_and_metrics(model, p, batch_stats, xs, ys, mask,
                                        sub, one_hot, n_classes, True),
            has_aux=True)
        (loss, (new_stats, acc, energy)), grads = grad_fn(params)
        updates, opt_state = base_opt.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u, lr: u * lr * active, updates, lrs)
        params = optax.apply_updates(params, updates)
        if new_stats is not None:
            # a patience-expired trial is fully frozen: its BN statistics
            # must not drift either (the reference *breaks* its loop,
            # /root/reference/train.py:112-126)
            new_stats = jax.tree.map(
                lambda new, old: jnp.where(active > 0, new, old),
                new_stats, batch_stats)
        return (params, opt_state, new_stats, rng,
                {"loss": loss, "acc": acc, "energy": energy})

    return jax.jit(jax.vmap(one_trial, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0)))


def make_multitrial_eval(model, one_hot: bool, n_classes: int):
    def one_trial(params, batch_stats, xs, ys, mask):
        loss, (_, acc, energy) = _loss_and_metrics(
            model, params, batch_stats, xs, ys, mask, jax.random.PRNGKey(0),
            one_hot, n_classes, False)
        return {"loss": loss, "acc": acc}

    return jax.jit(jax.vmap(one_trial))


def fit_trials(configs: Sequence[dict], trainset, validset, *,
               mesh=None, seed: int = 0, verbose: int = 0):
    """Train K trials simultaneously; returns per-trial histories.

    All configs must share static structure (model_name, shapes, epochs)
    and may differ in init_lambd / lr_tf / lr_model / trainable / seed.
    In optimized mode, the window bucket is derived from the *largest*
    init_lambd (buckets are per-XLA-program static; trials whose lambd
    would pick a smaller bucket still compute correctly — the reference's
    bucket only trades redundancy for speed, and parity tests gate the
    per-trial single-fit path).  With ``mesh``, the trial axis is
    sharded over the mesh's first axis — zero-communication scaling.
    """
    k = len(configs)
    c0 = configs[0]
    for c in configs:
        for key in ("model_name", "dataset_name", "n_points", "hop_length",
                    "batch_size", "max_epochs", "optimizer_name"):
            assert c[key] == c0[key], f"trial configs differ in {key}"

    one_hot = "panns" in c0["model_name"]
    n_classes = n_classes_for(c0["dataset_name"])
    batch_size = int(c0["batch_size"])
    max_epochs = int(c0["max_epochs"])

    wl = None
    if c0.get("optimized", False):
        wl = max(bucketed_window_length(float(c["init_lambd"]),
                                        int(c0["n_points"]))
                 for c in configs)
    model = get_model_by_config(c0, window_length=wl)

    # pallas front-end for the whole pack: the per-trial lambdas are
    # traced under vmap (the kernel's custom VJP vmaps bitwise —
    # tests/test_parallel.py), but the specband dispatch needs a shared
    # STATIC hint; re-derived each epoch from the last-known lambdas,
    # one recompile per static-switch region crossing (same mechanism
    # as fit()'s bucket+hint step cache)
    step_cache: dict = {}

    def steps_for(hint):
        if hint not in step_cache:
            m = (model if hint is None
                 else get_model_by_config(c0, window_length=wl,
                                          lambd_hint=hint))
            step_cache[hint] = (
                make_multitrial_step(m, base_opt, one_hot, n_classes),
                make_multitrial_eval(m, one_hot, n_classes))
        return step_cache[hint]

    # --- stacked init ---------------------------------------------------
    sample = jnp.zeros((batch_size, int(c0["n_points"])), jnp.float32)

    def init_one(cfg, rng):
        m = get_model_by_config(cfg, window_length=wl)
        return m.init(rng, sample)

    keys = jax.random.split(jax.random.PRNGKey(seed), k)
    variables = [init_one(c, keys[i]) for i, c in enumerate(configs)]
    params = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[v["params"] for v in variables])
    has_stats = "batch_stats" in variables[0]
    batch_stats = (jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[v["batch_stats"] for v in variables])
                   if has_stats else None)

    name = c0["optimizer_name"]
    base_opt = {"sgd": optax.sgd, "adam": optax.adam}[name](1.0)
    opt_state = jax.vmap(base_opt.init)(params)

    lrs = [
        _lr_tree(variables[i]["params"],
                 (float(c["lr_tf"]) if c.get("trainable", True) else 0.0),
                 float(c["lr_model"]))
        for i, c in enumerate(configs)
    ]
    lrs = jax.tree.map(lambda *xs: jnp.asarray(xs, jnp.float32), *lrs)

    rngs = jax.random.split(jax.random.PRNGKey(seed + 1), k)

    if mesh is not None:
        trial_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        put = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jax.device_put(x, trial_sh), t)
        params, opt_state, lrs = put(params), put(opt_state), put(lrs)
        rngs = jax.device_put(rngs, trial_sh)
        if batch_stats is not None:
            batch_stats = put(batch_stats)

    # last-known per-trial lambdas (host floats) drive the shared-hint
    # selection; refreshed from device each epoch below
    lambds_host = np.asarray([float(c["init_lambd"]) for c in configs])

    # per-trial shuffled loaders -> stacked (K, B, ...) batches
    loaders = [BatchLoader(trainset, batch_size, shuffle=True,
                           seed=seed + 13 * i) for i in range(k)]
    validloader = BatchLoader(validset, batch_size, shuffle=False)

    histories = [{"records": [], "best_valid_loss": np.inf,
                  "best_valid_acc": 0.0, "converged": False,
                  "init_lambd": float(c["init_lambd"]),
                  "best_lambd_est": float(c["init_lambd"])}
                 for c in configs]

    # per-trial early stopping (reference train.py:112-126 per trial):
    # a trial whose patience expires gets a zero active mask — its
    # updates AND batch stats freeze while the rest of the pack trains on
    patiences = np.asarray([int(c.get("patience", max_epochs))
                            for c in configs])
    patience_counts = np.zeros(k, dtype=int)
    active_np = np.ones(k, dtype=np.float32)

    for epoch in range(max_epochs):
        step, evaluate = steps_for(
            _shared_specband_hint(c0, wl, lambds_host, active_np))
        active = jnp.asarray(active_np)
        if mesh is not None:
            active = jax.device_put(active, trial_sh)
        sums = np.zeros(k)
        count = 0

        def stack_place(batches):
            xs = jnp.stack([b[0] for b in batches])
            ys = jnp.stack([b[1] for b in batches])
            mask = jnp.stack([b[2] for b in batches])
            if mesh is not None:
                sh = NamedSharding(mesh, P(mesh.axis_names[0]))
                xs, ys, mask = (jax.device_put(t, sh)
                                for t in (xs, ys, mask))
            return xs, ys, mask

        # background-prefetched stacking + placement (same overlap as
        # fit(); single-process only — see training/train.py)
        batches_it = zip(*loaders)
        if jax.process_count() == 1:
            batches_it = PrefetchIterator(batches_it, stack_place, depth=2)
        else:
            batches_it = (stack_place(b) for b in batches_it)
        for xs, ys, mask in batches_it:
            params, opt_state, batch_stats, rngs, m = step(
                params, opt_state, batch_stats, lrs, active, rngs, xs, ys,
                mask)
            sums += np.asarray(m["loss"])
            count += 1

        v_loss = np.zeros(k)
        v_acc = np.zeros(k)
        v_n = 0
        for xs, ys, mask in validloader:
            xsk = jnp.broadcast_to(xs, (k,) + xs.shape)
            ysk = jnp.broadcast_to(ys, (k,) + ys.shape)
            maskk = jnp.broadcast_to(mask, (k,) + mask.shape)
            m = evaluate(params, batch_stats, xsk, ysk, maskk)
            v_loss += np.asarray(m["loss"])
            v_acc += np.asarray(m["acc"])
            v_n += 1
        v_loss /= max(v_n, 1)
        v_acc /= max(v_n, 1)

        lambds = np.asarray(params["spectrogram_layer"]["lambd"])
        if lambds.ndim > 1:
            lambds = lambds.mean(axis=tuple(range(1, lambds.ndim)))
        lambds_host = lambds
        was_active = active_np.copy()
        for i, h in enumerate(histories):
            if active_np[i] and v_loss[i] < h["best_valid_loss"]:
                h["best_valid_loss"] = float(v_loss[i])
                h["best_valid_acc"] = float(v_acc[i])
                h["best_lambd_est"] = float(lambds[i])
                # best-on-valid-loss snapshot (reference train.py:112-117)
                # — fetch ONLY this trial's slice (device-side index,
                # then a single-trial transfer), not the full K-stack
                h["best_params"] = jax.device_get(
                    jax.tree.map(lambda a: a[i], params))
                if batch_stats is not None:
                    h["best_batch_stats"] = jax.device_get(
                        jax.tree.map(lambda a: a[i], batch_stats))
                patience_counts[i] = 0
            elif active_np[i]:
                patience_counts[i] += 1
                if patience_counts[i] >= patiences[i]:
                    active_np[i] = 0.0
                    h["converged"] = True
            if was_active[i]:
                h["records"].append({
                    "epoch": epoch,
                    "loss": float(sums[i] / max(count, 1)),
                    "valid_loss": float(v_loss[i]),
                    "valid_acc": float(v_acc[i]),
                    "lambd_est": float(lambds[i]),
                })
        # inert-ize frozen diverged rows (ADVICE r4): a frozen trial
        # that diverged keeps a non-finite lambda in the packed params,
        # so every later pack epoch would still push NaN through
        # gaussian_window for that row.  vmap isolates it today, but
        # cross-trial safety must hold by construction — overwrite the
        # frozen row's lambda with its last finite best estimate so no
        # NaN ever enters the feature path again.  Updates for the row
        # are masked (active=0) and its metrics are discarded, so the
        # value itself is inert.
        bad = [i for i in range(k)
               if not active_np[i] and not np.isfinite(lambds[i])]
        if bad:
            repl = lambds.copy()
            for i in bad:
                est = histories[i]["best_lambd_est"]
                repl[i] = est if np.isfinite(est) else 1.0
                histories[i]["diverged"] = True
            lam_leaf = params["spectrogram_layer"]["lambd"]
            repl_dev = jnp.asarray(repl, dtype=lam_leaf.dtype).reshape(
                (k,) + (1,) * (lam_leaf.ndim - 1))
            params["spectrogram_layer"]["lambd"] = jnp.where(
                jnp.isfinite(lam_leaf), lam_leaf,
                jnp.broadcast_to(repl_dev, lam_leaf.shape))
            lambds_host = repl

        if verbose:
            print(f"epoch {epoch}: valid_acc={v_acc}, lambd={lambds}, "
                  f"active={active_np}")
        if not active_np.any():
            break

    state = {"params": params, "opt_state": opt_state,
             "batch_stats": batch_stats}
    return state, histories
