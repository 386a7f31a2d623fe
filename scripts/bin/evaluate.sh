#!/usr/bin/env bash
# Full evaluation suite (reference scripts/bin/evaluate.sh).
set -e
python -m chessvision_tpu.eval.evaluate --include-metrics-table "$@"
