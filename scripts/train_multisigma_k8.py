"""K=8 multi-sigma MelPANNsNet training at flagship scale (VERDICT r4
next #7 / BASELINE configs[4]).

Runs the PUBLIC training.fit() on the esc50_synth task with n_sigma=8
per-mel-band trainable windows (8 band groups over 64 mels) through the
specband shared-spectra Pallas path, and writes the per-band lambda
trajectory artifact:

  results/multisigma_k8_r5.json   (full per-epoch records)
  results/multisigma_k8_r5.txt    (summary; commit both)

Pair with the hardware parity rung:
  python scripts/certify_ladder.py multi   (K=3 and K=8 rungs)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--max_epochs", type=int, default=12)
    parser.add_argument("--out", default="results/multisigma_k8_r5")
    args = parser.parse_args()

    from dmel_tpu import data, training
    from dmel_tpu.experiments import configs

    cfg = configs.esc50_synth(args.max_epochs)
    cfg.update({
        "trainable": True,
        "init_lambd": 8000 * 0.035 / 6,
        "n_sigma": 8,
        "max_epochs": args.max_epochs,
    })
    # single concrete trial (no grid axes)
    cfg = {k: (v.values[0] if hasattr(v, "values") else v)
           for k, v in cfg.items()}

    tr, va, te = data.get_dataset_by_config(cfg, "/tmp")
    state, history = training.fit(cfg, tr, va, verbose=1, seed=0)

    labels, preds = training.predict(cfg, state, te)
    test_acc = float((labels == preds).mean())

    out = {
        "config": {k: v for k, v in cfg.items()},
        "records": history["records"],
        "best_valid_acc": history["best_valid_acc"],
        "test_acc": test_acc,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(out, f, indent=1, default=float)

    lines = [
        f"# K=8 multi-sigma MelPANNsNet fit() on esc50_synth "
        f"(TPU, {args.max_epochs} epochs)",
        f"best_valid_acc={history['best_valid_acc']:.4f}  "
        f"test_acc={test_acc:.4f} (chance 0.10)",
        "per-band lambda trajectory (epoch: band0..band7):",
    ]
    for r in history["records"]:
        bands = r.get("lambd_est_bands")
        if bands:
            lines.append(f"  {r['epoch']:3d}: "
                         + " ".join(f"{b:7.2f}" for b in bands)
                         + f"   valid_acc={r['valid_acc']:.3f}")
    txt = "\n".join(lines) + "\n"
    with open(args.out + ".txt", "w") as f:
        f.write(txt)
    print(txt)


if __name__ == "__main__":
    main()
