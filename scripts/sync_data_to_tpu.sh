#!/usr/bin/env bash
# Sync local training data to the TPU VM — parity with
# scripts/sync_data_to_jetson.ps1.
# Usage: scripts/sync_data_to_tpu.sh <tpu-vm-host> [local_data_dir]
set -euo pipefail

HOST="${1:?usage: sync_data_to_tpu.sh <host> [data_dir]}"
DATA_DIR="${2:-data/raw}"

rsync -az --info=progress2 "${DATA_DIR}/" \
      "${HOST}:~/ml-audio-restoration-tpu/data/raw/"
echo "synced ${DATA_DIR} -> ${HOST}"
