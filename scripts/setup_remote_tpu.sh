#!/usr/bin/env bash
# One-time TPU VM setup — parity with scripts/setup_remote_jetson.ps1.
# Usage: scripts/setup_remote_tpu.sh <tpu-vm-host>
set -euo pipefail

HOST="${1:?usage: setup_remote_tpu.sh <host>}"
REMOTE_DIR="~/ml-audio-restoration-tpu"

ssh "${HOST}" bash -s <<'EOF'
set -e
sudo apt-get update -qq && sudo apt-get install -y -qq g++ make rsync
python3 -m pip install -q --upgrade pip
python3 -m pip install -q "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
python3 -m pip install -q flax optax numpy scipy pyyaml
mkdir -p ~/ml-audio-restoration-tpu/data/raw
echo "TPU VM ready: $(python3 -c 'import jax; print(jax.devices())')"
EOF
