"""Pre-materialize dataset caches (parity: /root/reference/init_dataset.py).

Builds the ESC-50 {rate}_xs.npy/{rate}_ys.npy caches and touches the
AudioMNIST speaker splits so training never pays first-load cost.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dmel_tpu.data.registry import get_dataset_by_config  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--resample_rate", type=int, default=8000)
    args = parser.parse_args()

    esc_dir = os.path.join(args.data_dir, "esc50")
    if os.path.isdir(esc_dir):
        print("caching ESC-50 ...")
        get_dataset_by_config({"dataset_name": "esc50",
                               "resample_rate": args.resample_rate},
                              esc_dir)
    am_dir = os.path.join(args.data_dir, "audio_mnist")
    if os.path.isdir(am_dir):
        print("loading AudioMNIST splits ...")
        tr, va, te = get_dataset_by_config(
            {"dataset_name": "audio_mnist"}, am_dir)
        print(f"train/valid/test = {len(tr)}/{len(va)}/{len(te)}")
    print("done")


if __name__ == "__main__":
    main()
