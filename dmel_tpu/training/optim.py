"""Optimizers with per-parameter-group learning rates.

Parity target: /root/reference/main.py:36-68 — the ``lambd`` parameter
gets its own learning rate ``lr_tf`` while every other parameter gets
``lr_model``; plain SGD or Adam (torch defaults: betas (0.9, 0.999),
eps 1e-8 — optax defaults match).  The reference's StepLR scheduler has
gamma=1.0 (a no-op, main.py:65-68) and is intentionally omitted.

``trainable=False`` freezes the spectrogram layer (main.py:27) — the
lambd group becomes ``optax.set_to_zero()``.
"""

from __future__ import annotations

import optax


def param_labels(params) -> dict:
    """Label tree: 'tf' for any leaf named lambd, 'model' otherwise."""
    def walk(node):
        if isinstance(node, dict):
            return {k: ("tf" if k == "lambd" else walk(v))
                    for k, v in node.items()}
        return "model"
    return walk(params)


def build_optimizer(config: dict, params) -> optax.GradientTransformation:
    """Config → optax optimizer with the reference's group structure."""
    name = config["optimizer_name"]
    lr_model = float(config["lr_model"])
    lr_tf = float(config["lr_tf"])

    if name == "sgd":
        make = optax.sgd
    elif name == "adam":
        make = optax.adam
    else:
        raise ValueError(f"optimizer not found: {name}")

    if config.get("trainable", True):
        tf_opt = make(lr_tf)
    else:
        tf_opt = optax.set_to_zero()

    return optax.multi_transform(
        {"tf": tf_opt, "model": make(lr_model)}, param_labels(params))
