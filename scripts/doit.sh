#!/bin/sh
# End-to-end pipeline driver (parity: /root/reference/doit.sh +
# run_experiments.sh + run_test_predictions.sh): run all three sweeps,
# make test predictions, then tables and figures.
set -e
DATA_DIR="${DATA_DIR:-data}"
OUT_DIR="${OUT_DIR:-results}"
NUM_SAMPLES="${NUM_SAMPLES:-3}"
MAX_EPOCHS="${MAX_EPOCHS:-100}"

for name in time_frequency audio_mnist esc50; do
    python -m dmel_tpu.experiments.cli --name "$name" \
        --num_samples "$NUM_SAMPLES" --max_epochs "$MAX_EPOCHS" \
        --output_dir "$OUT_DIR" --data_dir "$DATA_DIR"
    python -m dmel_tpu.eval.predict --sweep_dir "$OUT_DIR/$name" \
        --data_dir "$DATA_DIR"
done

python -m dmel_tpu.eval.tables --results_dir "$OUT_DIR"
for name in time_frequency audio_mnist esc50; do
    python -m dmel_tpu.eval.figures --sweep_dir "$OUT_DIR/$name" --split test
done
