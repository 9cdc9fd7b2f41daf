#!/usr/bin/env bash
# Compiled-TPU test evidence (VERDICT r3 task 5): run the kernel-critical
# suites against the REAL backend (RAYTPU_TEST_TPU=1 — no interpret mode,
# full Mosaic legalization) and record the log as a per-round artifact.
#
#   scripts/tpu_suite.sh [round]       # writes docs/tpu_suite_r<round>.txt
#
# Interpret-mode tests provably miss Mosaic legalization failures (e.g.
# the i1-vector select of render_fwd.py's mixed quad scan), so this log is
# the proof that the production kernels compile AND pass the parity/grad
# suite on the chip. Single-device: the 8-virtual-device shard_map cases
# skip themselves; the dp/tp sharding is validated separately by
# dryrun_multichip and the CPU-mesh suite.
#
# Compiles are served from the persistent compilation cache (.jax_cache/,
# enabled by tests/conftest.py via uob_raytracer_tpu.cache) — the first run
# populates it; warm reruns skip the remote compile service entirely
# (r4 cold suite: 27.5 min, dominated by compiles).
set -uo pipefail
cd "$(dirname "$0")/.."
round="${1:-05}"
out="docs/tpu_suite_r${round}.txt"
{
    echo "# RAYTPU_TEST_TPU=1 suite — real backend, compiled kernels"
    date -u +"# %Y-%m-%dT%H:%M:%SZ"
    echo "# compile cache: $(ls .jax_cache 2>/dev/null | wc -l) entries at start"
    python - <<'EOF'
import jax
print(f"# device: {jax.devices()[0]}, backend: {jax.default_backend()}")
EOF
    RAYTPU_TEST_TPU=1 python -m pytest \
        tests/test_pallas.py tests/test_bwd_kernel.py tests/test_replay.py \
        tests/test_render.py tests/test_goldens.py tests/test_quads.py \
        -q -n 0 -m 'slow or not slow' --durations=10 2>&1
    echo "# exit: $?"
} | tee "$out"
