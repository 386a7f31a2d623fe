#!/usr/bin/env bash
set -e
python -m chessvision_tpu.train.train_classifier \
  --epochs 30 --batch-size 256 --learning-rate 1e-3 --lr-step-size 10 "$@"
