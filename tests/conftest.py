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
    if not os.environ.get("RAYTPU_TEST_NO_CACHE"):
        # silence the AOT cache loader's per-load feature-mismatch spam
        # (see the cache block below); must land before backend init
        os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

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
    # Persistent compilation cache for the compile-bound CPU suite: warm
    # reruns skip XLA:CPU entirely. The AOT loader logs a benign
    # machine-feature line per load (prefer-no-scatter/gather pseudo-
    # features differ between its compile-time and load-time detection on
    # the SAME host); a real mismatch would crash loudly, so the log spam
    # is suppressed via TF_CPP_MIN_LOG_LEVEL set before backend init
    # (opt out of caching with RAYTPU_TEST_NO_CACHE=1).
    if not os.environ.get("RAYTPU_TEST_NO_CACHE"):
        cache_dir = os.environ.get(
            "RAYTPU_TEST_CPU_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache", "cpu"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

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
