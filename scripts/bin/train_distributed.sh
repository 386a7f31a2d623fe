#!/usr/bin/env bash
# Multi-host data-parallel training launcher.
#
# On a real TPU pod, run the SAME command on every host — jax's cluster
# autodetection supplies the coordinator and process indices, and
# `initialize_distributed` joins automatically:
#
#   scripts/bin/train_distributed.sh --epochs 30 --batch-size 256
#
# For a local 2-process CPU rehearsal (4 virtual devices per process, the
# same path the CI test exercises):
#
#   COORD=127.0.0.1:12355
#   XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
#     python -m chessvision_tpu.train.train_unet \
#       --coordinator $COORD --num-processes 2 --process-id 0 "$@" &
#   XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
#     python -m chessvision_tpu.train.train_unet \
#       --coordinator $COORD --num-processes 2 --process-id 1 "$@"
#
# Every process loads the same seeded data order and contributes only its
# batch slice; process 0 owns the run dir, checkpoints, promotion, eval.
set -e
python -m chessvision_tpu.train.train_unet \
  --epochs 30 --batch-size 32 --learning-rate 3e-5 \
  --use-sample-weights --threshold 0.5 --patience 8 "$@"
