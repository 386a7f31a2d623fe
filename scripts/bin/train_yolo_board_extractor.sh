#!/usr/bin/env bash
# YOLO-seg slot (reference scripts/bin/train_yolo_board_extractor.sh).
set -e
python -m chessvision_tpu.train.train_unet --model-id yolo --optimizer adam \
  --epochs 30 --batch-size 32 --learning-rate 1e-3 "$@"
