"""Experiment CLI (main.py:85-150 parity).

    python -m dmel_tpu.experiments.cli --name time_frequency \
        --num_samples 1 --max_epochs 100 \
        --output_dir ./results --data_dir ./data

``--output_dir`` is the ray_root_dir equivalent; sweeps are resumable
(finished trials are skipped on re-invocation).
"""

from __future__ import annotations

import argparse

from dmel_tpu.experiments.runner import run_sweep


def main(argv=None):
    parser = argparse.ArgumentParser(description="Hyperparameter search.")
    parser.add_argument("--num_samples", required=True, type=int,
                        help="The number of repeats of every grid point.")
    parser.add_argument("--max_epochs", required=True, type=int,
                        help="The maximum number of epochs.")
    parser.add_argument("--name", required=True, type=str,
                        help="Search-space name (time_frequency / "
                             "audio_mnist / esc50).")
    parser.add_argument("--output_dir", required=True, type=str,
                        help="Directory for sweep results.")
    parser.add_argument("--data_dir", required=True, type=str,
                        help="Dataset root directory.")
    parser.add_argument("--verbose", type=int, default=1)
    parser.add_argument("--no_resume", action="store_true",
                        help="Re-run finished trials instead of skipping.")
    parser.add_argument("--pack", action="store_true",
                        help="Run all trials as one vmapped program "
                             "(per-trial early stop via active-mask "
                             "freeze; see parallel/trials.py).")
    args = parser.parse_args(argv)

    if args.pack:
        from dmel_tpu.experiments.runner import run_sweep_packed
        sweep_dir = run_sweep_packed(args.name, args.num_samples,
                                     args.max_epochs, args.output_dir,
                                     args.data_dir, verbose=args.verbose)
    else:
        sweep_dir = run_sweep(args.name, args.num_samples, args.max_epochs,
                              args.output_dir, args.data_dir,
                              resume=not args.no_resume,
                              verbose=args.verbose)
    print(f"sweep complete: {sweep_dir}")


if __name__ == "__main__":
    main()
