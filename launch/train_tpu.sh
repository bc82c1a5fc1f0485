#!/usr/bin/env bash
# Single-host TPU training launch (replaces the reference's train_80gb.slurm:
# one process drives all local chips through the DP mesh; no mp.spawn).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python run_train.py "$@"
