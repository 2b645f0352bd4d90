#!/bin/bash
# SLURM launcher for EvenNICER-SLAM-TPU (counterpart of the reference's
# scripts/slurm_run.sh, adapted for TPU partitions).
#
# Usage: sbatch scripts/slurm_run.sh <dataset-dir> [scene ...]
#   e.g. sbatch scripts/slurm_run.sh Replica room0 room1 office0
#
#SBATCH --job-name=enslam
#SBATCH --output=logs/%x_%A_%a.out
#SBATCH --time=24:00:00
#SBATCH --mem=40G
#SBATCH --cpus-per-task=8

set -euo pipefail

DATASET=${1:-Replica}
shift || true
SCENES=("$@")
if [ ${#SCENES[@]} -eq 0 ]; then
    SCENES=(room0)
fi

# scene arrays via SLURM_ARRAY_TASK_ID (sbatch --array=0-N)
if [ -n "${SLURM_ARRAY_TASK_ID:-}" ]; then
    SCENE=${SCENES[$SLURM_ARRAY_TASK_ID]}
else
    SCENE=${SCENES[0]}
fi

echo "Running ${DATASET}/${SCENE}"
python run.py "configs/${DATASET}/${SCENE}.yaml"
python -m evennicer_slam_tpu.tools.eval_ate "configs/${DATASET}/${SCENE}.yaml"
