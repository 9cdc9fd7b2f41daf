#!/usr/bin/env bash
# Full test suite, including the slow-marked interpret-mode kernel cases
# (the default `pytest` run excludes them via addopts for speed).
#
#   scripts/test.sh               full suite (slow cases included)
#   scripts/test.sh --nan-check   fast subset with jax_debug_nans enabled:
#                                 any NaN produced anywhere aborts the test
#                                 (the SURVEY §4 CI hook, plus the checkify
#                                 instrumentation tests in test_checkify.py)
#   scripts/test.sh --smoke       fresh-install smoke test: pip-install the
#                                 package into a clean --target dir (the
#                                 interpreter's site-packages supply
#                                 jax/optax — the environment has no network
#                                 egress, and the interpreter is itself a
#                                 venv so a nested venv would lose them) and
#                                 run the README-advertised CLI paths from
#                                 the *installed* copy (cli render, cli
#                                 fit). Catches undeclared-dependency and
#                                 packaging breaks like the r3 pytest-xdist
#                                 / r4 optax findings.
set -euo pipefail
cd "$(dirname "$0")/.."
if [[ "${1:-}" == "--nan-check" ]]; then
    shift
    exec env RAYTPU_DEBUG_NANS=1 python -m pytest \
        tests/test_checkify.py tests/test_render.py tests/test_grad.py \
        -q "$@"
fi
if [[ "${1:-}" == "--smoke" ]]; then
    tmp="$(mktemp -d)"
    trap 'rm -rf "$tmp"' EXIT
    # --no-index: zero egress; deps (jax, numpy, optax) resolve from the
    # interpreter's site-packages, so this validates OUR package metadata +
    # layout. --target puts the installed copy first on PYTHONPATH below.
    pip install --quiet --no-index --no-build-isolation --no-deps \
        --target "$tmp/site" .
    mkdir "$tmp/cwd"   # run away from the repo so the INSTALLED copy imports
    (cd "$tmp/cwd" && \
     JAX_PLATFORMS=cpu PYTHONPATH="$tmp/site${PYTHONPATH:+:$PYTHONPATH}" \
         python -m uob_raytracer_tpu.cli \
         render --width 32 --backend jnp -o smoke.bmp && \
     test -s smoke.bmp && \
     JAX_PLATFORMS=cpu PYTHONPATH="$tmp/site${PYTHONPATH:+:$PYTHONPATH}" \
         python -m uob_raytracer_tpu.cli fit --steps 1 --width 16)
    echo "smoke test OK: installed-package cli render + fit ran clean"
    exit 0
fi
exec python -m pytest tests/ -q -m 'slow or not slow' "$@"
