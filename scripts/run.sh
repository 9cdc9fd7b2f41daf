#!/usr/bin/env bash
# Render the flagship Cornell frame (analogue of the reference's
# clean_build.sh: build + run). Usage: scripts/run.sh [extra cli args]
set -euo pipefail
cd "$(dirname "$0")/.."
python -m uob_raytracer_tpu.cli render "$@"
