#!/bin/sh
# Parity: /root/reference/run_test_predictions.sh — test predictions for
# every finished sweep.
set -e
DATA_DIR="${DATA_DIR:-data}"
OUT_DIR="${OUT_DIR:-results}"
for name in time_frequency audio_mnist esc50; do
    if [ -d "$OUT_DIR/$name" ]; then
        python -m dmel_tpu.eval.predict --sweep_dir "$OUT_DIR/$name" \
            --data_dir "$DATA_DIR"
    fi
done
