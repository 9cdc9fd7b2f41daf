"""3-vector helpers shared by the jnp render path and the Pallas kernels.

Vectors are stored structure-of-arrays style: a "vec3 batch" is a tuple/stack
with a trailing xyz axis of size 3 only at the jnp level; the Pallas kernels
use three separate planes. The determinant uses the exact cofactor expansion
of the reference (``Source/kernels.cl:31-35``) so float32 results line up
with the NumPy oracle term by term.
"""
from __future__ import annotations

import jax.numpy as jnp


def det3(a, b, c):
    """3x3 determinant of rows (a, b, c); last axis is xyz. Cofactor
    expansion exactly as ``kernels.cl:31-35``."""
    return (
        a[..., 0] * (b[..., 1] * c[..., 2] - b[..., 2] * c[..., 1])
        - a[..., 1] * (b[..., 0] * c[..., 2] - b[..., 2] * c[..., 0])
        + a[..., 2] * (b[..., 0] * c[..., 1] - b[..., 1] * c[..., 0])
    )


def dot3(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize3(v, active=None):
    """Unit vector along v. If ``active`` is given, inactive lanes are
    replaced with a unit x vector *before* the norm so no NaN/inf enters the
    graph (the double-where gradient-safety pattern)."""
    if active is not None:
        v = jnp.where(active[..., None], v, jnp.array([1.0, 0.0, 0.0], v.dtype))
    return v / jnp.sqrt(dot3(v, v))[..., None]


def safe_recip(x, invalid):
    """1/x where ``invalid`` lanes (e.g. x == 0) are routed through a safe
    denominator; callers must mask invalid lanes out of the result. Keeps
    backward passes NaN-free without changing valid-lane forward values."""
    x_s = jnp.where(invalid, jnp.ones_like(x), x)
    return jnp.where(invalid, jnp.zeros_like(x), 1.0 / x_s)
