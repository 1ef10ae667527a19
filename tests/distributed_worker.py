"""Worker for the multi-process jax.distributed smoke test.

Spawned (2 processes) by tests/test_distributed.py.  Each process owns a
subset of the virtual CPU devices; together they form one global mesh
and drive a data-parallel DMEL train step through
``dmel_tpu.parallel.mesh`` — the real multi-host bring-up path
(SURVEY.md §5 "distributed communication backend"; on hardware the same
code initializes over DCN and the psum rides ICI).

Usage: python distributed_worker.py <process_id> <num_processes> <port>
Prints one line: ``RESULT <loss> <gradnorm> <psum_check>`` which must be
identical across processes.
"""
import sys

import jax

# the sandbox sitecustomize force-sets jax_platforms at import; go to
# CPU *before* the distributed backend is created (CLAUDE.md gotcha)
jax.config.update("jax_platforms", "cpu")

proc_id, num_procs, port = (int(sys.argv[1]), int(sys.argv[2]),
                            int(sys.argv[3]))

sys.path.insert(0, __file__.rsplit("/", 2)[0])   # repo root
from dmel_tpu.parallel.mesh import (batch_sharding, initialize_distributed,
                                    make_mesh, replicate)

initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=num_procs, process_id=proc_id)

import jax.numpy as jnp
import numpy as np

from dmel_tpu import ops

assert jax.process_count() == num_procs, jax.process_count()
mesh = make_mesh(("data",), devices=jax.devices())   # GLOBAL mesh

# collective sanity: global device count via a cross-process reduction
from jax.sharding import NamedSharding, PartitionSpec as P
ndev = len(jax.devices())
ones = jax.make_array_from_process_local_data(
    batch_sharding(mesh),
    np.ones(len(jax.local_devices()), np.float32))
psum_check = float(jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(
    ones))

# --- one DP train step: batch sharded over processes, params replicated
B, T, N_MELS, SR, HOP, WL = 4 * ndev, 512, 16, 8000, 32, 128
rng = np.random.default_rng(0)
xs_global = rng.standard_normal((B, T)).astype(np.float32)
ys_global = rng.integers(0, 10, B).astype(np.int32)
shard = B // num_procs
lo = proc_id * shard
xs = jax.make_array_from_process_local_data(
    batch_sharding(mesh), xs_global[lo:lo + shard])
ys = jax.make_array_from_process_local_data(
    batch_sharding(mesh), ys_global[lo:lo + shard])

n_frames = T // HOP + 1
params = replicate({
    "lambd": jnp.float32(12.0),
    "w": jnp.asarray(rng.standard_normal(
        (N_MELS * n_frames, 10)).astype(np.float32) * 0.01),
}, mesh)


def loss_fn(p, xs, ys):
    feats = ops.log_mel_spectrogram(
        xs, p["lambd"], n_mels=N_MELS, sample_rate=SR, hop_length=HOP,
        optimized=True, window_length=WL)
    logits = feats.reshape((feats.shape[0], -1)) @ p["w"]
    import optax
    return optax.softmax_cross_entropy_with_integer_labels(logits, ys).mean()


@jax.jit
def train_step(p, xs, ys):
    loss, grads = jax.value_and_grad(loss_fn)(p, xs, ys)
    p = jax.tree.map(lambda a, g: a - 0.1 * g, p, grads)
    return loss, p, grads


loss, params, grads = train_step(params, xs, ys)
gradnorm = float(jnp.sqrt(sum(jnp.sum(g * g)
                              for g in jax.tree.leaves(grads))))
print(f"RESULT {float(loss):.8f} {gradnorm:.8f} {psum_check:.1f}",
      flush=True)

# --- the PUBLIC training.fit() across processes (VERDICT r2 next #3):
# the same entrypoint single-host users call, multi-epoch, with early
# stopping and best-checkpointing; only rank 0 writes the file.  Every
# rank must report an identical history and final parameters.
ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
from dmel_tpu import data as ddata, training

cfg = dict(model_name="mel_linear_net", dataset_name="audio_mnist",
           init_lambd=10.0, n_points=256, hop_length=32,
           optimized=False, normalize_window=False, n_mels=16,
           resample_rate=8000, energy_normalize=True,
           optimizer_name="sgd", lr_model=1e-3, lr_tf=1.0,
           trainable=True, batch_size=8, max_epochs=3, patience=2)
drng = np.random.default_rng(0)
tr = ddata.ArrayDataset(
    drng.standard_normal((32, 256)).astype(np.float32),
    drng.integers(0, 10, 32).astype(np.int32), 8000)
vrng = np.random.default_rng(1)
va = ddata.ArrayDataset(
    vrng.standard_normal((16, 256)).astype(np.float32),
    vrng.integers(0, 10, 16).astype(np.int32), 8000)
state, hist = training.fit(cfg, tr, va, seed=0, mesh=mesh,
                           checkpoint_dir=ckpt_dir)
pdig = float(sum(jnp.sum(jnp.abs(p))
                 for p in jax.tree.leaves(state["params"])))
losses = ",".join(f"{r['loss']:.8f}" for r in hist["records"])
print(f"FITRESULT {losses} {hist['best_valid_loss']:.8f} "
      f"{hist['records'][-1]['lambd_est']:.8f} {pdig:.6f}", flush=True)
