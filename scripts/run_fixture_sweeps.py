"""End-to-end fixture sweeps for audio_mnist and fsd (VERDICT r2 next
#6): build byte-faithful dataset trees (tests/fixtures.py), run the
full runner -> predict (mAP for fsd) -> tables -> figures pipeline
(scripts/doit.sh stages), and leave artifacts under results/.

Real AudioMNIST/FSD50K audio is unreachable here (zero egress); the
fixtures reproduce the exact on-disk layouts so every pipeline stage —
speaker splits, wav loading, resample+cache, multi-hot labels, predict
CSVs, tables, figures — runs the same code it would on real data.

Usage: python scripts/run_fixture_sweeps.py [--names audio_mnist,fsd]
       [--max-epochs 2] [--data-dir /tmp/dmel_fixture_data]
"""
import argparse
import os

import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_fixtures(data_dir, names):
    from tests import fixtures
    if "audio_mnist" in names:
        marker = os.path.join(data_dir, "data", "60")
        if not os.path.isdir(marker):
            print("building AudioMNIST fixture tree (30000 wavs) ...",
                  flush=True)
            fixtures.make_audio_mnist_tree(data_dir, min_len=1500,
                                           max_len=7500)
    if "fsd" in names:
        marker = os.path.join(data_dir, "FSD50K.ground_truth")
        if not os.path.isdir(marker):
            print("building FSD50K fixture tree ...", flush=True)
            fixtures.make_fsd50k_tree(data_dir)
    if "esc50" in names:
        marker = os.path.join(data_dir, "meta")
        if not os.path.isdir(marker):
            print("building ESC-50 fixture tree ...", flush=True)
            # 50 classes x uniform 5 s clips: the loader stacks clips
            # into one array (real ESC-50 clips are exactly 5 s) and
            # the esc50 config feeds n_points = 40000 to the models
            fixtures.make_esc50_tree(data_dir, n_classes=50, per_class=6,
                                     clip_seconds=5.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="audio_mnist,fsd")
    ap.add_argument("--max-epochs", type=int, default=2)
    ap.add_argument("--num-samples", type=int, default=1)
    ap.add_argument("--data-dir", default="/tmp/dmel_fixture_data")
    ap.add_argument("--output-dir", default=os.path.join(REPO, "results"))
    ap.add_argument("--platform", default=None,
                    help="cpu to avoid the tunneled TPU (the sandbox "
                         "sitecustomize force-selects it)")
    args = ap.parse_args()
    names = args.names.split(",")
    os.makedirs(args.data_dir, exist_ok=True)
    build_fixtures(args.data_dir, names)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    print("backend:", jax.default_backend(), flush=True)

    # all stages in-process so the platform choice applies everywhere
    from dmel_tpu.eval import figures, predict, tables
    from dmel_tpu.experiments import cli
    for name in names:
        cli.main(["--name", name,
                  "--num_samples", str(args.num_samples),
                  "--max_epochs", str(args.max_epochs),
                  "--output_dir", args.output_dir,
                  "--data_dir", args.data_dir])
        predict.main(["--sweep_dir", os.path.join(args.output_dir, name),
                      "--data_dir", args.data_dir])
        figures.main(["--sweep_dir", os.path.join(args.output_dir, name),
                      "--split", "test"])
    tables.main(["--results_dir", args.output_dir])
    print("fixture sweeps complete:", ", ".join(names), flush=True)


if __name__ == "__main__":
    main()
