#!/usr/bin/env bash
set -e
python -m chessvision_tpu.serve.server --port "${PORT:-7777}" --warmup "$@"
