#!/bin/sh
# Parity: /root/reference/run_experiments.sh — run all three sweeps.
set -e
DATA_DIR="${DATA_DIR:-data}"
OUT_DIR="${OUT_DIR:-results}"
NUM_SAMPLES="${NUM_SAMPLES:-3}"
MAX_EPOCHS="${MAX_EPOCHS:-100}"
for name in time_frequency audio_mnist esc50; do
    python -m dmel_tpu.experiments.cli --name "$name" \
        --num_samples "$NUM_SAMPLES" --max_epochs "$MAX_EPOCHS" \
        --output_dir "$OUT_DIR" --data_dir "$DATA_DIR"
done
