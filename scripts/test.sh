#!/usr/bin/env bash
# Full test suite, including the slow-marked interpret-mode kernel cases
# (the default `pytest` run excludes them via addopts for speed).
#
#   scripts/test.sh               full suite (slow cases included)
#   scripts/test.sh --nan-check   fast subset with jax_debug_nans enabled:
#                                 any NaN produced anywhere aborts the test
#                                 (the SURVEY §4 CI hook, plus the checkify
#                                 instrumentation tests in test_checkify.py)
set -euo pipefail
cd "$(dirname "$0")/.."
if [[ "${1:-}" == "--nan-check" ]]; then
    shift
    exec env RAYTPU_DEBUG_NANS=1 python -m pytest \
        tests/test_checkify.py tests/test_render.py tests/test_grad.py \
        -q "$@"
fi
exec python -m pytest tests/ -q -m 'slow or not slow' "$@"
