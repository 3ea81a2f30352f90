#!/bin/bash
# SLURM wrapper — the reference's cluster entry point (reference
# sbatch_train.sh:1-8: 1 task, 1 accelerator, activate env, run "$@").
# Usage: sbatch scripts/sbatch_train.sh python -m art_sbir_tpu.cli.train ...
#SBATCH --job-name=art-sbir-tpu
#SBATCH --ntasks=1
#SBATCH --time=24:00:00
set -euo pipefail
"$@"
