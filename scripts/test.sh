#!/usr/bin/env bash
# Full test suite, including the slow-marked interpret-mode kernel cases
# (the default `pytest` run excludes them via addopts for speed).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -m 'slow or not slow' "$@"
