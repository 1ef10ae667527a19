"""esc50_synth sweep on TPU (VERDICT r4 next #5 + bf16 validation).

Runs the esc50-shaped learnable synthetic task through the standard
runner at the flagship geometry (PANNs CNN6, 5 s @ 8 kHz, batch 32),
with a model_dtype grid axis so the bf16 conv-stack lever
(results/diag_cnn6_r5.txt) is validated at TASK level: bf16 arms must
match f32 arms on accuracy and lambda trajectory.

  python scripts/run_esc50_synth.py --probe     # 2 trials, 8 epochs
  python scripts/run_esc50_synth.py             # full grid, 25 epochs

Outputs under results/esc50_synth/ (runner layout: trial dirs,
results.csv; then predict_test -> esc50_synth.csv).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--probe", action="store_true")
    parser.add_argument("--hard", action="store_true",
                        help="resolution-critical task variant "
                             "(separations inside the wrong-window "
                             "blur radius; f32 arms only)")
    parser.add_argument("--max_epochs", type=int, default=25)
    parser.add_argument("--output_dir", default="results")
    parser.add_argument("--only_lambd", type=float, default=None,
                        help="run just the arm with this init_lambd "
                             "(both trainable and frozen), e.g. to "
                             "extend one arm's epoch budget")
    parser.add_argument("--suffix", default="",
                        help="appended to the sweep name (separate "
                             "output dir, e.g. _long)")
    args = parser.parse_args()

    from dmel_tpu.experiments import configs, runner
    from dmel_tpu.experiments.configs import grid_search

    space = configs.esc50_synth(args.max_epochs)
    space["model_dtype"] = grid_search(["float32", "bfloat16"])
    name = "esc50_synth"
    if args.hard:
        space["synth_hard"] = True
        space["noise_std"] = 0.3
        space["model_dtype"] = "float32"
        name = "esc50_synth_hard"
    if args.probe:
        space["max_epochs"] = 8
        space["trainable"] = True
        space["init_lambd"] = 8000 * 0.035 / 6
        name += "_probe"
    if args.only_lambd is not None:
        space["init_lambd"] = args.only_lambd
    name += args.suffix

    sweep = runner.run_sweep(name, num_samples=1,
                             max_epochs=space["max_epochs"],
                             output_dir=args.output_dir,
                             data_dir="/tmp", space=space, verbose=1)
    print("sweep dir:", sweep)

    from dmel_tpu.eval.predict import predict_test
    df = predict_test(sweep, "/tmp", batch_size=32)
    cols = [c for c in df.columns
            if c in ("config/init_lambd", "config/trainable",
                     "config/model_dtype", "test_accuracy")]
    print(df[cols].to_string())


if __name__ == "__main__":
    main()
