#!/usr/bin/env bash
# Multi-host TPU pod launch (role of the reference's train.sh torchrun
# recipes + sagemaker/code/torch_launch.sh NCCL env plumbing).
#
# On TPU pod slices there is no torchrun equivalent to configure: every host
# runs the SAME command, and jax.distributed.initialize() (called inside
# scripts/finetune.py via distributed_init) picks up the coordinator from the
# TPU metadata environment automatically.
#
# Example — full finetune on every host of a v5p-16 slice:
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all -- \
#     "cd pangu_tpu_repo && bash scripts/launch_pod.sh finetune \
#        --set data.root=/data --set parallel.data=8 --weights params_24.npz"
#
# Single host, all local chips (the train.sh single-node recipe):
#   bash scripts/launch_pod.sh finetune --set parallel.data=4
set -euo pipefail

ENTRY=${1:?usage: launch_pod.sh <finetune|lora_tune|test|rollout> [args...]}
shift

SCRIPT_DIR=$(cd -- "$(dirname -- "${BASH_SOURCE[0]}")" &>/dev/null && pwd)

# Suppress per-host duplicated logging noise on pods.
export TPU_STDERR_LOG_LEVEL=${TPU_STDERR_LOG_LEVEL:-3}

exec python "${SCRIPT_DIR}/${ENTRY}.py" "$@"
