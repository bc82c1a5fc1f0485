#!/usr/bin/env bash
# CR3BP data-generation fan-out (replaces the reference's 28-way srun
# SLURM scripts, run/data_generation/fixed/*.slurm): N parallel workers,
# each owning a disjoint seed range.
set -euo pipefail
cd "$(dirname "$0")/.."
WORKERS="${WORKERS:-28}"
SEEDS_PER_WORKER="${SEEDS_PER_WORKER:-100}"
RESULT_FOLDER="${RESULT_FOLDER:-results/datagen}"
ALPHA="${ALPHA:-}"
EXTRA=()
[ -n "$ALPHA" ] && EXTRA+=(--alpha "$ALPHA")
for i in $(seq 0 $((WORKERS - 1))); do
  python generate_data.py \
    --seed $((i * SEEDS_PER_WORKER)) \
    --seed_step "$SEEDS_PER_WORKER" \
    --result_folder "$RESULT_FOLDER" \
    "${EXTRA[@]}" &
done
wait
python - <<PY
from rdm_tpu.datagen import prepare_training_data
prepare_training_data("$RESULT_FOLDER")
PY
