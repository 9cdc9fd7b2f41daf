"""Counter-based RNG with exact parity to the reference's xorshift stream.

The reference seeds a 3-lane xorshift from the pixel id — including a
float-multiply-then-truncate quirk — and advances it once per shadow sample
(``Source/kernels.cl:42-52,319,331``). Because the seed depends only on the
pixel id, the noise is deterministic and temporally stable; we reproduce the
stream bit-for-bit so soft-shadow images match the oracle exactly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# np scalar (not jnp): avoid backend init at import (see ops/intersect.py)
_UINT_MAX_F = np.float32(4294967295.0)  # rounds to 2^32 in f32, as in OpenCL


def xorshift(state):
    """3-lane (or any-shape) uint32 xorshift: ^=<<13, ^=>>17, ^=<<5."""
    state = state ^ (state << jnp.uint32(13))
    state = state ^ (state >> jnp.uint32(17))
    state = state ^ (state << jnp.uint32(5))
    return state


def crush(state, rng: float):
    """uint32 -> float32 in (-range/2, range/2) (``kernels.cl:49-52``)."""
    r = jnp.float32(rng)
    return r * state.astype(jnp.float32) / _UINT_MAX_F - r / jnp.float32(2.0)


def shadow_seed(gid):
    """Initial RNG state for pixel id ``gid``: one xorshift step applied to
    ``(gid, (uint)(gid*91.0f), (uint)(gid*19.0f))`` (``kernels.cl:319``).
    ``gid`` may be any integer array; returns uint32 [..., 3]."""
    g = gid.astype(jnp.uint32)
    gf = gid.astype(jnp.float32)
    seed = jnp.stack([
        g,
        (gf * jnp.float32(91.0)).astype(jnp.uint32),
        (gf * jnp.float32(19.0)).astype(jnp.uint32),
    ], axis=-1)
    return xorshift(seed)
