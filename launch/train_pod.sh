#!/usr/bin/env bash
# Multi-host TPU pod training: run this ON EACH HOST of the pod slice
# (e.g. via `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`).
# jax.distributed.initialize() picks up the coordinator from the TPU
# runtime automatically on Cloud TPU; JAX_COORDINATOR_ADDRESS forces it
# elsewhere. The data pipeline shards per process; shardings are identical
# to single-host (SPMD — see rdm_tpu/parallel/mesh.py).
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COORDINATOR_ADDRESS="${JAX_COORDINATOR_ADDRESS:-}"
exec python run_train.py "$@"
