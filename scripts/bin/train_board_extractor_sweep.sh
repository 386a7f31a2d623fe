#!/usr/bin/env bash
# Grid sweep (reference train_board_extractor_sweep.sh: lr grid x
# thresholds x sample-weights), via the Python sweep runner.
set -e
python -m chessvision_tpu.train.sweep --target unet \
  --learning-rates 1e-5 3e-5 1e-4 3e-4 --thresholds 0.3 0.5 0.7 "$@"
