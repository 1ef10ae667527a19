"""Experiment runner: resumable trial sweeps with CSV round-trip.

The TPU-native replacement for the reference's Ray Tune orchestration
(/root/reference/main.py:85-150).  A sweep is a directory:

    <output_dir>/<name>/
        manifest.json              trial -> status (resumable)
        trial_00000/
            config.json            flat config (round-trippable)
            progress.csv           per-epoch metric records
            checkpoint_000000/
                best_model         best-on-valid-loss checkpoint
        results.csv                one row per finished trial with
                                   config/* columns + final metrics

The ``config/*`` column convention matches Ray's dataframe export so the
eval layer can rebuild any trial's model from a results row
(utils.py:38-44 ``get_config_by_row`` parity).  Ray-style fault
tolerance (tune.Tuner.restore) maps to ``resume=True``: finished trials
are skipped via the manifest.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Optional

from dmel_tpu.data.registry import get_dataset_by_config
from dmel_tpu.experiments.configs import expand_grid, get_search_space
from dmel_tpu.training.train import fit


def trial_dirname(i: int) -> str:
    return f"trial_{i:05d}"


def _write_progress_csv(path: str, records, config: dict) -> None:
    if not records:
        return
    cfg_cols = {f"config/{k}": v for k, v in config.items()}
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=list(records[0].keys()) + list(cfg_cols.keys()))
        writer.writeheader()
        for r in records:
            writer.writerow({**r, **cfg_cols})


def run_trial(config: dict, data_dir: str, trial_dir: str,
              seed: int = 0, verbose: int = 0, fresh: bool = False):
    """Train one trial (run_experiment parity, main.py:17-83).

    A trial killed mid-run leaves a live state snapshot under its
    checkpoint dir; re-running the trial resumes at its last completed
    epoch (fit()'s mid-trial resume).  ``fresh=True`` discards any such
    snapshot first (the --no_resume semantics)."""
    os.makedirs(trial_dir, exist_ok=True)
    if fresh:
        live = os.path.join(trial_dir, "checkpoint_000000", "live_state")
        if os.path.exists(live):
            os.remove(live)
    with open(os.path.join(trial_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)

    trainset, validset, _ = get_dataset_by_config(config, data_dir)

    pretrained_sd = None
    if config.get("pretrained") and config.get("checkpoint_path"):
        path = config["checkpoint_path"]
        if os.path.exists(path):
            import torch
            pretrained_sd = torch.load(path, map_location="cpu",
                                       weights_only=False)["model"]
        elif verbose:
            print(f"pretrained checkpoint not found: {path} "
                  "(zero-egress environment; skipping download)")

    ckpt_dir = os.path.join(trial_dir, "checkpoint_000000")
    state, history = fit(config, trainset, validset,
                         checkpoint_dir=ckpt_dir, seed=seed,
                         verbose=verbose,
                         pretrained_state_dict=pretrained_sd)

    _write_progress_csv(os.path.join(trial_dir, "progress.csv"),
                        history["records"], config)
    summary = {k: v for k, v in history.items() if k != "records"}
    if history["records"]:
        summary.update(history["records"][-1])
    with open(os.path.join(trial_dir, "result.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    return state, history


def run_sweep_packed(name: str, num_samples: int, max_epochs: int,
                     output_dir: str, data_dir: str, *,
                     verbose: int = 0, space: Optional[dict] = None,
                     mesh=None):
    """Run the whole grid as ONE vmapped multi-trial program
    (dmel_tpu.parallel.fit_trials) — the TPU-idiomatic replacement for
    Ray's 4-trials-per-GPU packing.  All trials share static structure
    (guaranteed for the published spaces: only init_lambd/trainable
    vary); each trial early-stops independently via a per-trial active
    mask (updates and BN stats freeze once its patience expires), and
    the pack exits when every trial has converged.

    Writes the same sweep layout as :func:`run_sweep` (config.json /
    progress.csv / checkpoint / results.csv per trial), so the entire
    eval pipeline works unchanged.
    """
    from dmel_tpu.parallel.trials import fit_trials
    from dmel_tpu.training import checkpoint as ckpt
    import jax
    import numpy as np

    space = space if space is not None else get_search_space(name,
                                                            max_epochs)
    grid = expand_grid(space)
    trials = [dict(cfg, trial_repeat=rep)
              for rep in range(num_samples) for cfg in grid]

    sweep_dir = os.path.join(output_dir, name)
    os.makedirs(sweep_dir, exist_ok=True)

    config0 = trials[0]
    trainset, validset, _ = get_dataset_by_config(config0, data_dir)
    state, histories = fit_trials(trials, trainset, validset, mesh=mesh,
                                  verbose=verbose)

    params_all = jax.device_get(state["params"])
    stats_all = (jax.device_get(state["batch_stats"])
                 if state.get("batch_stats") is not None else None)
    manifest = {}
    for i, (config, hist) in enumerate(zip(trials, histories)):
        tname = trial_dirname(i)
        tdir = os.path.join(sweep_dir, tname)
        os.makedirs(tdir, exist_ok=True)
        with open(os.path.join(tdir, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
        _write_progress_csv(os.path.join(tdir, "progress.csv"),
                            hist["records"], config)
        take = lambda t: jax.tree.map(lambda a: np.asarray(a)[i], t)  # noqa: E731
        payload = {"params": hist.get("best_params", take(params_all))}
        if "best_batch_stats" in hist:
            payload["batch_stats"] = hist["best_batch_stats"]
        elif stats_all is not None:
            payload["batch_stats"] = take(stats_all)
        ckpt.save_checkpoint(
            os.path.join(tdir, "checkpoint_000000", "best_model"), payload)
        summary = {k: v for k, v in hist.items()
                   if k not in ("records", "best_params",
                                "best_batch_stats")}
        if hist["records"]:
            summary.update(hist["records"][-1])
        with open(os.path.join(tdir, "result.json"), "w") as f:
            json.dump(summary, f, indent=2, default=float)
        manifest[tname] = "done"
    with open(os.path.join(sweep_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    collect_results(sweep_dir)
    return sweep_dir


def run_sweep(name: str, num_samples: int, max_epochs: int,
              output_dir: str, data_dir: str, *,
              resume: bool = True, verbose: int = 0,
              space: Optional[dict] = None):
    """Expand the search space and run every trial (sequentially on this
    host's chip; see :func:`run_sweep_packed` / fit_trials for the
    vmapped variant).

    Returns the sweep directory.  Safe to re-invoke after interruption:
    finished trials are skipped via manifest.json.
    """
    space = space if space is not None else get_search_space(name,
                                                            max_epochs)
    grid = expand_grid(space)
    trials = [dict(cfg, trial_repeat=rep)
              for rep in range(num_samples) for cfg in grid]

    sweep_dir = os.path.join(output_dir, name)
    os.makedirs(sweep_dir, exist_ok=True)
    manifest_path = os.path.join(sweep_dir, "manifest.json")
    manifest = {}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)

    for i, config in enumerate(trials):
        tname = trial_dirname(i)
        if manifest.get(tname) == "done":
            if verbose:
                print(f"skip finished {tname}")
            continue
        if verbose:
            print(f"=== {tname}: init_lambd={config.get('init_lambd')}, "
                  f"trainable={config.get('trainable')} ===")
        manifest[tname] = "running"
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=2)
        run_trial(config, data_dir, os.path.join(sweep_dir, tname),
                  seed=i, verbose=verbose, fresh=not resume)
        manifest[tname] = "done"
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=2)

    collect_results(sweep_dir)
    return sweep_dir


def collect_results(sweep_dir: str):
    """Aggregate trial results into results.csv (Ray get_dataframe
    analog: one row per trial, config/* columns + final/best metrics)."""
    import pandas as pd
    rows = []
    for entry in sorted(os.listdir(sweep_dir)):
        tdir = os.path.join(sweep_dir, entry)
        result_path = os.path.join(tdir, "result.json")
        config_path = os.path.join(tdir, "config.json")
        if not (os.path.isfile(result_path) and os.path.isfile(config_path)):
            continue
        with open(result_path) as f:
            row = json.load(f)
        with open(config_path) as f:
            config = json.load(f)
        row.update({f"config/{k}": v for k, v in config.items()})
        row["logdir"] = tdir
        rows.append(row)
    df = pd.DataFrame(rows)
    if len(df):
        df.to_csv(os.path.join(sweep_dir, "results.csv"), index=False)
    return df


def load_results(sweep_dir: str):
    """Load (or rebuild) the sweep results dataframe."""
    import pandas as pd
    path = os.path.join(sweep_dir, "results.csv")
    if os.path.exists(path):
        return pd.read_csv(path)
    return collect_results(sweep_dir)


def get_config_by_row(row: dict) -> dict:
    """Extract the flat config back out of a results row
    (utils.py:38-44 parity)."""
    config = {}
    for k, v in row.items():
        if isinstance(k, str) and k.startswith("config/"):
            config[k.split("/", 1)[1]] = v
    return config
