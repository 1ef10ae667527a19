"""Summarize the esc50_synth sweep into the RESULTS.md table + a
lambda-trajectory extract.  Run after scripts/run_esc50_synth.py;
commit stdout as results/esc50_synth/summary.txt."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import pandas as pd

    sweep = sys.argv[1] if len(sys.argv) > 1 else "results/esc50_synth"
    df = pd.read_csv(os.path.join(sweep, "esc50_synth.csv"))

    cols = ["config/init_lambd", "config/trainable", "config/model_dtype",
            "test_accuracy", "lambd_est", "best_valid_acc"]
    cols = [c for c in cols if c in df.columns]
    out = df[cols].copy()
    out = out.sort_values(["config/init_lambd", "config/trainable",
                           "config/model_dtype"])
    print("# esc50_synth sweep summary (chance = 0.10, sigma_ref = 46.67)")
    print(out.to_string(index=False))

    # per-arm DMEL vs frozen deltas
    print("\n# DMEL (trainable) minus frozen baseline, per arm:")
    for lam in sorted(df["config/init_lambd"].unique()):
        for dt in sorted(df["config/model_dtype"].unique()):
            sel = (df["config/init_lambd"] == lam) & \
                  (df["config/model_dtype"] == dt)
            tr = df[sel & (df["config/trainable"] == True)]   # noqa: E712
            fz = df[sel & (df["config/trainable"] == False)]  # noqa: E712
            if len(tr) and len(fz):
                d = float(tr["test_accuracy"].iloc[0]) - \
                    float(fz["test_accuracy"].iloc[0])
                print(f"  lambd_init={lam:6.1f} dtype={dt:8s}: "
                      f"dmel={float(tr['test_accuracy'].iloc[0]):.3f} "
                      f"frozen={float(fz['test_accuracy'].iloc[0]):.3f} "
                      f"delta={d:+.3f}  lambda_est="
                      f"{float(tr['lambd_est'].iloc[0]):.1f}")

    # lambda trajectories of the trainable arms
    print("\n# lambda trajectories (trainable arms):")
    for _, row in df[df["config/trainable"] == True].iterrows():  # noqa: E712
        prog = os.path.join(str(row["logdir"]), "progress.csv")
        if not os.path.exists(prog):
            continue
        p = pd.read_csv(prog)
        lams = [f"{v:.1f}" for v in p["lambd_est"].tolist()]
        print(f"  init={row['config/init_lambd']:6.1f} "
              f"dtype={row['config/model_dtype']:8s}: "
              + " ".join(lams))


if __name__ == "__main__":
    main()
