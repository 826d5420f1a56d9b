#!/usr/bin/env bash
# Launch distributed ddsp_tpu training on a Cloud TPU pod slice.
#
# TPU-native replacement for the reference's AI-Platform Docker launcher
# (reference: ddsp/training/docker/ddsp_ai_platform.py, task.py,
# config_multiple_vms.yaml). Instead of TF_CONFIG/gRPC cluster wiring, one
# python process runs per host and jax.distributed.initialize() discovers
# the slice topology from the TPU metadata; XLA lays gradient all-reduce
# over ICI within the slice.
#
# Usage:
#   ./scripts/launch_tpu_pod.sh TPU_NAME ZONE SAVE_DIR [extra ddsp-tpu-run args...]
#
# Example:
#   ./scripts/launch_tpu_pod.sh my-v5p-16 us-east5-a gs://bucket/run1 \
#       --preset=solo_instrument --data=tfrecord:/data/train*.tfrecord \
#       --batch_size=64
set -euo pipefail

TPU_NAME="${1:?TPU name}"
ZONE="${2:?zone}"
SAVE_DIR="${3:?save dir}"
shift 3

# Same invocation on every host; each host feeds its local batch shard and
# only process 0 writes checkpoints/summaries (orbax handles coordination).
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone="${ZONE}" --worker=all \
  --command="cd ~/ddsp_tpu && python -m ddsp_tpu.run \
    --mode=train --multihost --save_dir=${SAVE_DIR} $*"
