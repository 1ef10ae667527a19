#!/bin/sh
# Data bootstrap (parity: /root/reference/download_data.sh): clones
# AudioMNIST and ESC-50 and resamples AudioMNIST to 8 kHz.  Requires
# network access + git + a resampler; in zero-egress environments, place
# the datasets under $DATA_DIR manually in the same layout.
#
# Layout expected by dmel_tpu.data.registry.get_dataset_by_config:
#   $DATA_DIR/audio_mnist/data/<speaker_id>/<digit>_<speaker>_<rep>.wav (8 kHz)
#   $DATA_DIR/esc50/meta/esc50.csv, $DATA_DIR/esc50/audio/*.wav
set -e
DATA_DIR="${1:-data}"
mkdir -p "$DATA_DIR"
cd "$DATA_DIR"

if [ ! -d audio_mnist ]; then
    git clone https://github.com/soerenab/AudioMNIST.git audio_mnist_48k
    mkdir -p audio_mnist/data
    # resample 48 kHz -> 8 kHz (reference uses sox; ffmpeg works too)
    for d in audio_mnist_48k/data/*/; do
        sid=$(basename "$d")
        mkdir -p "audio_mnist/data/$sid"
        for f in "$d"*.wav; do
            sox "$f" -r 8000 "audio_mnist/data/$sid/$(basename "$f")"
        done
    done
fi

if [ ! -d esc50 ]; then
    git clone https://github.com/karolpiczak/ESC-50.git esc50
fi

echo "done. initialize caches with: python scripts/init_dataset.py --data_dir $DATA_DIR"
