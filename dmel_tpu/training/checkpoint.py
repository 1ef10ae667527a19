"""Checkpointing: best-on-valid-loss policy + PANNs pretrained import.

Parity targets:
- best-model tuple ``(net.state_dict(), optimizer.state_dict())`` saved
  whenever valid loss improves (/root/reference/train.py:112-117),
  restored for eval (utils.py:269-271);
- PANNs pretrained loader with key remapping and non-strict load
  (utils.py:15-36).

Storage is single-file msgpack via flax.serialization: synchronous,
atomic (write-to-temp + rename) and dependency-light.  (Orbax's
async/multihost machinery is unnecessary at this model scale — params
are <20 MB — and its save path stalls under single-process sandboxes.)
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree of arrays to ``path`` (single msgpack file)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    With ``target`` (a pytree of matching structure, e.g. a freshly
    initialized state), leaves are restored into that structure; without
    it, nested dicts of arrays are returned.
    """
    with open(os.path.abspath(path), "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(jax.device_get(target), data)


def _convert_torch_tensor(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy())


def import_panns_cnn6(torch_state_dict: dict, flax_variables: dict,
                      verbose: bool = False) -> dict:
    """Map a PyTorch PANNs Cnn6 state_dict onto our flax Cnn6 variables.

    Equivalent to the reference's prefix-rekey + ``strict=False`` load
    (utils.py:30-36): keys that don't exist or don't shape-match on the
    flax side are skipped (e.g. the 527-class AudioSet head vs a 50-class
    ESC head).  Layout conversions: conv OIHW→HWIO, dense OI→IO,
    batch-norm (weight, bias, running_mean, running_var) →
    (scale, bias, mean, var).

    Args:
      torch_state_dict: torch ``checkpoint['model']`` mapping.
      flax_variables: ``{'params': ..., 'batch_stats': ...}`` of a
        :class:`dmel_tpu.models.MelPANNsNet` (the Cnn6 lives under
        ``spectrogram_model``).

    Returns:
      New variables dict with imported weights.
    """
    params = jax.tree.map(np.asarray, flax_variables["params"])
    stats = jax.tree.map(np.asarray, flax_variables.get("batch_stats", {}))

    def set_in(tree, path, value):
        node = tree
        for p in path[:-1]:
            if p not in node:
                return False
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            return False
        if node[leaf].shape != value.shape:
            if verbose:
                print(f"skip (shape) {'/'.join(path)}: "
                      f"{node[leaf].shape} vs {value.shape}")
            return False
        node[leaf] = value.astype(node[leaf].dtype)
        return True

    imported, skipped = 0, 0
    for key, tensor in torch_state_dict.items():
        v = _convert_torch_tensor(tensor)
        parts = key.split(".")
        # torch module path e.g. conv_block1.conv1.weight / bn1.running_mean
        *mods, leaf = parts
        base = ["spectrogram_model"] + mods
        ok = False
        if leaf == "weight" and v.ndim == 4:            # conv OIHW -> HWIO
            ok = set_in(params, base + ["kernel"], v.transpose(2, 3, 1, 0))
        elif leaf == "weight" and v.ndim == 2:          # dense OI -> IO
            ok = set_in(params, base + ["kernel"], v.T)
        elif leaf == "weight" and v.ndim == 1:          # bn scale
            ok = set_in(params, base + ["scale"], v)
        elif leaf == "bias":
            ok = set_in(params, base + ["bias"], v)
        elif leaf == "running_mean":
            ok = set_in(stats, base + ["mean"], v)
        elif leaf == "running_var":
            ok = set_in(stats, base + ["var"], v)
        elif leaf == "num_batches_tracked":
            continue
        imported += int(ok)
        skipped += int(not ok)
    if verbose:
        print(f"imported {imported} tensors, skipped {skipped}")
    out = dict(flax_variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out
