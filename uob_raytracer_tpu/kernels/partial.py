"""Partial-scan Pallas kernels for triangle (tp) sharding — the production
large-scene path.

Tensor-parallel rendering shards the triangle table across chips
(SURVEY.md §2f); each shard computes a LOCAL nearest hit / occlusion answer
and the winners are combined with the pmin/tie-break/psum collectives of
``ops/intersect.py`` OUTSIDE the kernel. These kernels are those per-shard
partial scans: the shard's triangle table is packed into the streamed
(HBM-resident, DMA-double-buffered) layout of ``render_fwd`` and scanned
with the same select-accumulate bodies as the fused kernel
(``_nearest_hit``'s running best of ``kernels.cl:92-166``; the occlusion
accept of ``kernels.cl:243-311``), over a grid of (8, 128) ray tiles.

Differentiable: ``nearest_tris_pallas`` carries a path-replay
``custom_vjp`` — the kernel records each ray's LOCAL winning triangle id,
and the backward gathers the winning rows, replays the lean Cramer/attribute
reconstruction in jnp, and lets the vjp of the gather scatter-add (segment-
sum) the per-lane cotangents back into the shard's tables. Visibility
(which triangle wins, occlusion bits) is frozen, exactly the gradient
convention of the jnp pipeline and the fused replay backward (SURVEY.md §7).
``occluded_tris_pallas`` returns booleans whose jnp-path gradient is zero
everywhere (comparisons only), so its inputs are stop_gradient'ed — not a
downgrade, the identical cotangent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_fwd import (STREAM_BLK, STREAM_COLS, _BIG, _det3, _dot,
                         _nearest_hit, _round_up, _scale, _streamed_scan,
                         _sub, default_interpret)

_F = np.float32

RAY_TILE = 8 * 128   # rays per grid step, one (8, 128) vector tile

# occlusion table: v0 0:3, e1 3:6, e2 6:9, mat 9 -> 12 items x 10 cols = 120
OCC_COLS = 10
OCC_PACK = 12


def _pack_rays(*arrs):
    """[N]-leading arrays -> (G, 8, 128)-tiled views padded with zeros."""
    n = arrs[0].shape[0]
    npad = _round_up(n, RAY_TILE)
    out = []
    for a in arrs:
        pad = [(0, npad - n)] + [(0, 0)] * (a.ndim - 1)
        a = jnp.pad(a, pad)
        if a.ndim == 2:           # [N, 3] -> (3, rows, 128)
            a = jnp.transpose(a, (1, 0)).reshape(a.shape[1], npad // 128, 128)
        else:                     # [N] -> (1, rows, 128)
            a = a.reshape(1, npad // 128, 128)
        out.append(a)
    return out, npad


def _nearest_kernel(tbl_ref, sph_ref, s_ref, d_ref, o_ref, buf, sems, *,
                    n_tri: int, n_rows: int):
    tri_scan = _streamed_scan(tbl_ref, buf, sems, n_rows, 19, 6)
    start = (s_ref[0], s_ref[1], s_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    t, pos, nrm, rgb, mat, idf = _nearest_hit(tri_scan, sph_ref, n_tri, 0,
                                              start, d)
    for c, v in enumerate((t, *pos, *nrm, *rgb, mat, idf)):
        o_ref[c] = v


@functools.partial(jax.jit, static_argnames=("n_tri", "n_rows", "interpret"))
def _call_nearest(tbl, sph_dummy, s, d, n_tri: int, n_rows: int,
                  interpret: bool):
    rows = s.shape[1]
    grid = (rows // 8,)
    ray_spec = pl.BlockSpec((3, 8, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_nearest_kernel, n_tri=n_tri, n_rows=n_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ray_spec, ray_spec,
        ],
        out_specs=pl.BlockSpec((12, 8, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12, rows, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2, STREAM_BLK, STREAM_COLS), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(tbl, sph_dummy, s, d)


def _nearest_impl(v0, e1, e2, n, rgb, mat, start, d, interpret: bool):
    from .render_fwd import pack_streamed
    n_tri = v0.shape[0]
    n_rays = start.shape[0]
    tbl = jnp.concatenate(
        [v0, e1, e2, n, rgb, mat[:, None], jnp.cross(e1, e2)], axis=1)
    tbl = pack_streamed(tbl.astype(jnp.float32), 19, 6)
    (s3, d3), npad = _pack_rays(start, d)
    out = _call_nearest(tbl, jnp.zeros((1, 12), jnp.float32), s3, d3,
                        n_tri, tbl.shape[0], interpret)
    flat = out.reshape(12, npad)[:, :n_rays]
    t = flat[0]
    miss = t >= _F(_BIG)
    t = jnp.where(miss, jnp.float32(jnp.inf), t)
    pos = jnp.transpose(flat[1:4])
    nrm = jnp.transpose(flat[4:7])
    rgb_o = jnp.transpose(flat[7:10])
    mat_o = flat[10]
    idx = jnp.where(miss, -1, flat[11].astype(jnp.int32))
    return t, pos, nrm, rgb_o, mat_o, idx


def _nearest_replay(idx, v0, e1, e2, n, rgb, start, d):
    """Differentiable reconstruction of the kernel's outputs from the
    recorded winning ids: gather the winning rows and replay the Cramer
    solve + attribute pick (kernels.cl:92-130) on [N]-lanes only. The vjp
    of the row gather IS the segment-sum scatter of per-lane cotangents
    into the shard's triangle table. Denominators carry the usual
    double-where guards so miss/degenerate lanes stay NaN-free in both
    directions; visibility (idx) is frozen."""
    hit = idx >= 0
    safe = jnp.clip(idx, 0, v0.shape[0] - 1)
    V0, E1, E2 = v0[safe], e1[safe], e2[safe]
    b = start - V0
    nd = -d
    detA = det3_rows(nd, E1, E2)
    degen = detA == 0
    recip = _F(1.0) / jnp.where(degen, _F(1.0), detA)
    t = det3_rows(b, E1, E2) * recip
    u = det3_rows(nd, b, E2) * recip
    v = det3_rows(nd, E1, b) * recip
    h3 = hit[:, None]
    t_o = jnp.where(hit, jnp.where(degen, _F(0.0), t), jnp.inf)
    pos = jnp.where(h3, V0 + u[:, None] * E1 + v[:, None] * E2, 0.0)
    nrm = jnp.where(h3, n[safe], 0.0)
    rgb_o = jnp.where(h3, rgb[safe], 0.0)
    return t_o, pos, nrm, rgb_o


def det3_rows(a, b, c):
    """Row-wise 3x3 determinant of [N,3] vectors (kernels.cl:31-35)."""
    return (a[..., 0] * (b[..., 1] * c[..., 2] - b[..., 2] * c[..., 1])
            - a[..., 1] * (b[..., 0] * c[..., 2] - b[..., 2] * c[..., 0])
            + a[..., 2] * (b[..., 0] * c[..., 1] - b[..., 1] * c[..., 0]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _nearest_diff(v0, e1, e2, n, rgb, mat, start, d, interpret):
    return _nearest_impl(v0, e1, e2, n, rgb, mat, start, d, interpret)


def _nearest_diff_fwd(v0, e1, e2, n, rgb, mat, start, d, interpret):
    out = _nearest_impl(v0, e1, e2, n, rgb, mat, start, d, interpret)
    idx = out[5]
    return out, (v0, e1, e2, n, rgb, start, d, idx)


def _nearest_diff_bwd(interpret, res, cts):
    v0, e1, e2, n, rgb, start, d, idx = res
    dt, dpos, dnrm, drgb, _dmat, _didx = cts   # mat/idx frozen (int/compare)
    hit = idx >= 0
    dt = jnp.where(hit & jnp.isfinite(dt), dt, 0.0)
    _, vjp = jax.vjp(functools.partial(_nearest_replay, idx),
                     v0, e1, e2, n, rgb, start, d)
    dv0, de1, de2, dn, drgb_t, dstart, dd = vjp((dt, dpos, dnrm, drgb))
    dmat = jnp.zeros_like(v0[:, 0])
    return dv0, de1, de2, dn, drgb_t, dmat, dstart, dd


_nearest_diff.defvjp(_nearest_diff_fwd, _nearest_diff_bwd)


def nearest_tris_pallas(v0, e1, e2, n, rgb, mat, start, d,
                        interpret: bool | None = None):
    """Local nearest triangle hit over this shard's table.

    Returns (t [N] with inf for miss, pos [N,3], normal [N,3], rgb [N,3],
    mat [N], idx [N] local int32 with -1 for miss) — the per-shard inputs
    of ``ops.intersect._combine_tri_best``. Differentiable via the
    path-replay custom_vjp (see module docstring)."""
    if interpret is None:
        interpret = default_interpret()
    return _nearest_diff(v0, e1, e2, n, rgb, mat, start, d, interpret)


def _occluded_kernel(tbl_ref, s_ref, d_ref, r_ref, o_ref, buf, sems, *,
                     n_rows: int):
    occ_scan = _streamed_scan(tbl_ref, buf, sems, n_rows, OCC_COLS, OCC_PACK)
    start = (s_ref[0], s_ref[1], s_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    radius_sq = r_ref[0]
    dd = _dot(d, d)

    def body(get, gi, occ):
        v0 = (get(0), get(1), get(2))
        e1 = (get(3), get(4), get(5))
        e2 = (get(6), get(7), get(8))
        glass = get(9) == _F(-1.0)       # glass casts no shadow
        b = _sub(start, v0)
        nd = (-d[0], -d[1], -d[2])
        detA = _det3(nd, e1, e2)
        degen = detA == 0
        recip = _F(1.0) / jnp.where(degen, _F(1.0), detA)
        t = _det3(b, e1, e2) * recip
        u = _det3(nd, b, e2) * recip
        v = _det3(nd, e1, b) * recip
        hit = ((t >= 0) & (t * t * dd < radius_sq) & (u >= 0) & (v >= 0)
               & ((u + v) <= 1) & ~degen & ~glass)
        return jnp.where(hit, _F(1.0), occ)

    o_ref[0] = occ_scan(body, jnp.zeros_like(radius_sq))


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def _call_occluded(tbl, s, d, r, n_rows: int, interpret: bool):
    rows = s.shape[1]
    grid = (rows // 8,)
    ray_spec = pl.BlockSpec((3, 8, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    one_spec = pl.BlockSpec((1, 8, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_occluded_kernel, n_rows=n_rows),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  ray_spec, ray_spec, one_spec],
        out_specs=one_spec,
        out_shape=jax.ShapeDtypeStruct((1, rows, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2, STREAM_BLK, STREAM_COLS), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(tbl, s, d, r)


def occluded_tris_pallas(v0, e1, e2, mat, start, d, radius_sq,
                         interpret: bool | None = None):
    """Local triangle occlusion (any hit within the light radius) over this
    shard's table — the triangle half of ``ops.intersect.in_shadow``.
    Returns occluded [N] bool. The boolean's gradient is identically zero
    on the jnp path (it is built from comparisons alone), so inputs are
    stop_gradient'ed here: same cotangents, and autodiff never tries to
    differentiate through the pallas_call."""
    from .render_fwd import pack_streamed
    if interpret is None:
        interpret = default_interpret()
    (v0, e1, e2, mat, start, d, radius_sq) = jax.lax.stop_gradient(
        (v0, e1, e2, mat, start, d, radius_sq))
    n_rays = start.shape[0]
    tbl = jnp.concatenate([v0, e1, e2, mat[:, None]], axis=1)
    tbl = pack_streamed(tbl.astype(jnp.float32), OCC_COLS, OCC_PACK)
    (s3, d3, r1), npad = _pack_rays(start, d, radius_sq)
    out = _call_occluded(tbl, s3, d3, r1, tbl.shape[0], interpret)
    return out.reshape(npad)[:n_rays] > 0
