#!/usr/bin/env bash
# Canonical segmentation training invocation (reference
# scripts/bin/train_board_extractor.sh semantics, TPU-sized defaults).
set -e
python -m chessvision_tpu.train.train_unet \
  --epochs 30 --batch-size 32 --learning-rate 3e-5 \
  --use-sample-weights --threshold 0.5 --patience 8 "$@"
