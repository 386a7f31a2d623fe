#!/usr/bin/env bash
# YOLO-cls slot (reference scripts/bin/train_yolo_classifier.sh).
set -e
python -m chessvision_tpu.train.train_classifier --model-id yolo \
  --epochs 30 --batch-size 256 --learning-rate 1e-3 --lr-step-size 10 "$@"
