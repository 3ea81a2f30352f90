#!/bin/bash
# TPU-pod launcher: run the SAME command on every host of a TPU VM pod
# slice (JAX multi-controller SPMD; art_sbir_tpu.parallel.multihost
# auto-detects the coordinator on TPU VMs). The multi-host equivalent of
# the reference's single-GPU sbatch wrapper.
#
# Usage:
#   scripts/launch_pod.sh <tpu-name> <zone> python -m art_sbir_tpu.cli.train \
#       -e 5 -d SketchyV2 --n_devices -1 --multihost ...
set -euo pipefail
TPU_NAME="$1"; ZONE="$2"; shift 2
exec gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" \
    --worker=all --command "cd $(pwd) && $*"
