"""Persistent XLA compilation cache (evidence-loop cost control).

The round-4 compiled-TPU suite took 27.5 minutes, dominated by Mosaic/XLA
compiles of the fused kernels (top case 286 s) re-done from scratch every
run; the remote compile service makes cold compiles especially expensive.
JAX's persistent compilation cache removes all of that on warm runs — the
axon backend serves cached executables without touching the compile service
(measured here: a fresh-shape jit 0.95 s cold -> 0.13 s warm, Pallas kernels
included, since the Mosaic module is embedded in the cached XLA executable).

This helper is TPU-only by design: the XLA:CPU AOT loader logs a wall of
machine-feature mismatch errors per cache load (prefer-no-scatter/gather
pseudo-features) and warns about SIGILL, so CPU caching needs the
TF_CPP_MIN_LOG_LEVEL workaround — ``tests/conftest.py`` does that and
caches the CPU suite under ``.jax_cache/cpu`` itself (warm suite 210 s
vs 411 s cold; opt out with RAYTPU_TEST_NO_CACHE=1).

The reference has a compile boundary in the same place — it rebuilds
``kernels.cl`` from source on every startup (``Source/skeleton.cpp:380-421``)
and relies on the driver's own binary cache for warm starts; this is the
explicit TPU-native version of that cache.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on the persistent compilation cache when running on TPU.

    Caches every entry (min-compile-time/min-size floors lowered to zero:
    the suite's cost is many medium compiles, not a few giant ones).
    Returns the cache dir, or None when the backend isn't TPU. Honors an
    explicit ``JAX_COMPILATION_CACHE_DIR`` env var over the default."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
