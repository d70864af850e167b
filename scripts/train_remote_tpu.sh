#!/usr/bin/env bash
# Remote training on a Cloud TPU VM — parity with the reference's
# scripts/train_remote.sh (rsync code+data to the worker, launch training in
# the background, periodically sync checkpoints/outputs back), targeting a
# TPU VM instead of a Jetson.
#
# Usage: scripts/train_remote_tpu.sh <tpu-vm-host> [model] [data_dir]
set -euo pipefail

HOST="${1:?usage: train_remote_tpu.sh <host> [model] [data_dir]}"
MODEL="${2:-denoiser}"
DATA_DIR="${3:-data/raw}"
REMOTE_DIR="~/ml-audio-restoration-tpu"
SYNC_INTERVAL="${SYNC_INTERVAL:-300}"

echo "==> syncing code to ${HOST}:${REMOTE_DIR}"
rsync -az --delete \
      --exclude '.git' --exclude 'models/checkpoints' --exclude 'runs' \
      --exclude 'outputs' --exclude '__pycache__' \
      ./ "${HOST}:${REMOTE_DIR}/"

echo "==> syncing data"
rsync -az "${DATA_DIR}/" "${HOST}:${REMOTE_DIR}/data/raw/"

echo "==> building native codec + launching training"
ssh "${HOST}" "cd ${REMOTE_DIR} && make -C native && \
  nohup python -m ml_audio_restoration_tpu.cli train ${MODEL} \
      --data-dir data/raw --checkpoint-dir models/checkpoints \
      > train_${MODEL}.log 2>&1 & echo started"

echo "==> background checkpoint sync every ${SYNC_INTERVAL}s (Ctrl+C to stop)"
mkdir -p models/checkpoints outputs runs
while true; do
    sleep "${SYNC_INTERVAL}"
    rsync -az "${HOST}:${REMOTE_DIR}/models/checkpoints/" models/checkpoints/ || true
    rsync -az "${HOST}:${REMOTE_DIR}/outputs/" outputs/ || true
    rsync -az "${HOST}:${REMOTE_DIR}/runs/" runs/ || true
    echo "synced $(date)"
done
