"""Test configuration.

By default tests run on CPU with 8 virtual devices so the shard_map /
multi-chip paths are exercised without TPU hardware (the strategy from
SURVEY.md §4). Set RAYTPU_TEST_TPU=1 to run against the real backend instead.

Note the ordering dance: the environment's axon PJRT sitecustomize hook runs
at interpreter start (before conftest), so overriding JAX_PLATFORMS=cpu here
would deadlock its client. Instead we leave the plugin alone, force the CPU
host-platform device count via XLA_FLAGS (must land before first backend
init), and select CPU as the default platform through jax.config — which
coexists with the registered plugin.
"""
import os

if not os.environ.get("RAYTPU_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("RAYTPU_TEST_TPU"):
    # Warm reruns of the compiled-TPU suite serve every kernel from the
    # persistent cache instead of the (slow, sometimes wedged) remote
    # compile service — the r4 suite spent 27.5 min compiling.
    from uob_raytracer_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
else:
    jax.config.update("jax_platform_name", "cpu")
    # The CPU suite is compile-bound (a 128x8 interpret-mode kernel case
    # spends seconds in XLA:CPU optimization passes and ~20 ms executing),
    # so trade optimization for compile time. Numerics note: this also
    # disables FMA contraction, i.e. results get CLOSER to the strict-f32
    # oracle; golden/byte tests still pass. Opt out with
    # RAYTPU_TEST_OPTIMIZED=1 to run the suite at full XLA optimization.
    if not os.environ.get("RAYTPU_TEST_OPTIMIZED"):
        jax.config.update("jax_disable_most_optimizations", True)

# CI NaN mode (SURVEY.md §4): RAYTPU_DEBUG_NANS=1 makes every jitted
# computation in the suite raise on the first NaN it produces
# (scripts/test.sh --nan-check runs a fast subset this way).
if os.environ.get("RAYTPU_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell():
    from uob_raytracer_tpu import cornell_box
    return cornell_box()


def assert_images_match(img, ref, *, outlier_frac=0.005, outlier_bound=0.45,
                        tight=3e-4, what=""):
    """Boundary-aware image parity.

    XLA contracts mul-add chains into FMAs (CPU and TPU); NumPy does not.
    The extra precision can flip marginal visibility comparisons (nearest-hit
    and shadow tests) on a handful of edge pixels, each off by at most a
    single shadow sample or hit reassignment. So: almost every pixel must
    match tightly, and the rare boundary pixels must stay bounded. The
    bound: one flipped shadow sample contributes up to
    light_color * lambert / S = 16 * ~0.25 / 10 ≈ 0.4 at the closest
    shaded points (the real-TPU suite measured a 0.3776 single-flip pixel),
    so 0.45 accommodates a worst-case single flip without admitting a
    two-flip or structural error.
    """
    img = np.asarray(img)
    ref = np.asarray(ref)
    diff = np.abs(img - ref).max(axis=-1)
    frac = (diff > tight).mean()
    assert frac <= outlier_frac, (
        f"{what}: {frac:.2%} pixels differ by more than {tight} "
        f"(max {diff.max():.4f})")
    assert diff.max() <= outlier_bound, (
        f"{what}: worst-pixel difference {diff.max():.4f} exceeds "
        f"{outlier_bound} — not a boundary flip")
