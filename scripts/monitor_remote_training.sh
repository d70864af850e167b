#!/usr/bin/env bash
# Tail remote training progress + serve TensorBoard locally — parity with
# the reference's scripts/monitor_remote_training.ps1.
#
# Usage: scripts/monitor_remote_training.sh <tpu-vm-host> [model]
set -euo pipefail

HOST="${1:?usage: monitor_remote_training.sh <host> [model]}"
MODEL="${2:-denoiser}"
REMOTE_DIR="~/ml-audio-restoration-tpu"

mkdir -p runs
rsync -az "${HOST}:${REMOTE_DIR}/runs/" runs/ || true

if command -v tensorboard >/dev/null; then
    (tensorboard --logdir runs --port 6006 >/dev/null 2>&1 &)
    echo "TensorBoard: http://localhost:6006 (JSONL metrics also in runs/*/*.jsonl)"
fi

exec ssh "${HOST}" "tail -f ${REMOTE_DIR}/train_${MODEL}.log"
