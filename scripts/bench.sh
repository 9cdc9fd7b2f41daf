#!/usr/bin/env bash
# Headline benchmark (one JSON line on stdout, details on stderr).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python bench.py "$@"
