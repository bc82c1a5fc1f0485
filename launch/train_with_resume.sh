#!/usr/bin/env bash
# Supervised training with automatic stall recovery.
#
# The tunnelled/remote TPU can hang a device call indefinitely (observed
# twice during one 100k-step production run); the trainer's stall
# watchdog (training.stall_timeout_s) then exits with status 17.  This
# wrapper restarts the run from its rolling meta checkpoint until it
# completes, preserving ONE work dir across restarts by reusing the
# first run's checkpoints-meta as the checkpoint_path override.
#
# Usage: launch/train_with_resume.sh [run_train.py overrides...]
# Example:
#   launch/train_with_resume.sh training.n_iters=100000 \
#       model.precision=bfloat16 model.attn_pallas=true
set -u

STALL_TIMEOUT="${STALL_TIMEOUT:-600}"   # seconds without a step -> restart
MAX_RESTARTS="${MAX_RESTARTS:-20}"

cd "$(dirname "$0")/.."
meta=""
for i in $(seq 0 "$MAX_RESTARTS"); do
    args=("$@" "training.stall_timeout_s=${STALL_TIMEOUT}")
    if [[ -n "$meta" && -f "$meta" ]]; then
        args+=("checkpoint_path=${meta}")
        echo "[train_with_resume] restart #$i from $meta"
    fi
    before=$(ls -dt "Training Runs"/*/ 2>/dev/null | head -1)
    python run_train.py "${args[@]}"
    code=$?
    latest=$(ls -dt "Training Runs"/*/ 2>/dev/null | head -1)
    if [[ "$latest" != "$before" && -n "$latest" ]]; then
        meta="${latest}checkpoints-meta/checkpoint.pth"
    fi
    if [[ $code -eq 0 ]]; then
        echo "[train_with_resume] completed after $i restart(s)"
        exit 0
    elif [[ $code -ne 17 ]]; then
        echo "[train_with_resume] non-stall failure (exit $code); aborting"
        exit "$code"
    fi
done
echo "[train_with_resume] gave up after $MAX_RESTARTS restarts"
exit 1
