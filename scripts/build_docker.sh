#!/usr/bin/env bash
# Build the TPU deployment image — parity with scripts/build_docker_jetson.ps1
# (and rebuild_docker_jetson.ps1 via --no-cache).
set -euo pipefail

TAG="${1:-ml-audio-restoration-tpu:latest}"
shift || true
docker build -f Dockerfile.tpu -t "${TAG}" "$@" .
echo "built ${TAG}"
