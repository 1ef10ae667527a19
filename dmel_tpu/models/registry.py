"""Config-dict → model factory.

Parity target: ``get_model_by_config`` (/root/reference/utils.py:144-261)
including the dataset→n_classes mapping (utils.py:145-150) and the DSPEC
image size convention ``(n_points+1, n_points+1)`` (utils.py:159).
"""

from __future__ import annotations

from typing import Optional

from dmel_tpu.models import classifiers

N_CLASSES = {
    "time_frequency": 3,
    "audio_mnist": 10,
    "esc50": 50,
    "esc50_synth": 10,  # learnable esc50-shaped synthetic (extension)
    "fsd": 200,  # FSD config from BASELINE.json configs[3] (extension)
}


def n_classes_for(dataset_name: str) -> int:
    try:
        return N_CLASSES[dataset_name]
    except KeyError:
        raise ValueError(f"dataset_name: {dataset_name} not supported.")


def get_model_by_config(config: dict,
                        window_length: Optional[int] = None,
                        lambd_hint: Optional[float] = None):
    """Build a flax model module from a flat experiment config.

    ``window_length`` is the static optimized-mode window bucket for the
    current lambd (``ops.optimized_window_length``); pass None for
    faithful mode.  ``lambd_hint`` is the static lambda-magnitude hint
    that lets impl="pallas" front-ends pick the specband kernel when the
    current lambda sits inside its truncation window (the training loop
    refreshes it at bucket-update boundaries).
    """
    n_classes = n_classes_for(config["dataset_name"])
    name = config["model_name"]

    spec_kwargs = dict(
        n_classes=n_classes,
        init_lambd=float(config["init_lambd"]),
        size=(config["n_points"] + 1, config["n_points"] + 1),
        hop_length=config["hop_length"],
        optimized=config["optimized"],
        window_length=window_length,
        normalize_window=config["normalize_window"],
    )
    mel_kwargs = dict(
        n_classes=n_classes,
        init_lambd=float(config["init_lambd"]),
        n_mels=config.get("n_mels", 64),
        sample_rate=config.get("resample_rate", 8000),
        n_points=config["n_points"],
        hop_length=config["hop_length"],
        optimized=config["optimized"],
        window_length=window_length,
        energy_normalize=config.get("energy_normalize", False),
        normalize_window=config["normalize_window"],
        impl=config.get("impl", "xla"),
        n_sigma=int(config.get("n_sigma", 1)),
        precision=config.get("precision", "highest"),
        method=config.get("method", "auto"),
        lambd_hint=lambd_hint,
    )

    if name == "linear_net":
        return classifiers.LinearNet(**spec_kwargs)
    if name == "bn_linear_net":
        return classifiers.BatchNormLinearNet(**spec_kwargs)
    if name == "mlp_net":
        return classifiers.MlpNet(**spec_kwargs)
    if name == "conv_net":
        return classifiers.ConvNet(**spec_kwargs)
    if name == "mel_linear_net":
        return classifiers.MelLinearNet(**mel_kwargs)
    if name == "mel_mlp_net":
        return classifiers.MelMlpNet(**mel_kwargs)
    if name == "mel_conv_net":
        return classifiers.MelConvNet(**mel_kwargs)
    if name == "panns_cnn6":
        return classifiers.MelPANNsNet(
            augment=config.get("augment", False),
            model_dtype=config.get("model_dtype", "float32"),
            **mel_kwargs)
    raise ValueError(f"model name not found: {name}")


def dispatch_hint_for(config: dict, window_length: Optional[int],
                      lambd_value: float) -> Optional[float]:
    """Canonical static ``lambd_hint`` for a model built from ``config``
    at ``lambd_value`` — ONE source of truth for train AND eval
    dispatch (VERDICT r4 next #2: eval/predict previously built
    hintless models, silently falling off the certified specband route
    that training used).  None keeps the framed/XLA path; the hint is
    correctness-safe either way (route selection only, every route is
    parity-certified)."""
    if config.get("impl") != "pallas" or window_length is None:
        return None
    from dmel_tpu.ops.stft import pallas_compile_hint
    return pallas_compile_hint(float(lambd_value), int(window_length),
                               int(config["hop_length"]))
