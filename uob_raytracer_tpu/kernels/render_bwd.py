"""Fused Pallas TPU backward kernel: the path-replay VJP in one launch.

The jnp replay backward (``ops/replay.py`` under ``jax.vjp``) is correct but
HBM-bound: XLA materializes every [rays, 3] intermediate of the forward
replay plus its saved residuals — ~8 GB of traffic for a 512x512 frame.
This kernel computes the same gradient with every intermediate resident in
VMEM/registers: each (8, 128) pixel tile re-gathers the objects its rays hit
(recorded decision ids), replays the lean differentiable reconstruction,
runs ``jax.vjp`` *inside the kernel* over that tile-local function, and
scatter-accumulates the scene-parameter cotangents into small table-shaped
accumulators that live across the sequential grid. HBM traffic drops to the
residual/cotangent tiles (~tens of MB) and the compute is the ~3x-forward
cost of reverse mode — an order of magnitude faster than the jnp path.

Semantics are identical to ``ops/replay.replay_forward`` (same formulas,
same guards, same frozen-visibility gradient rules — SURVEY.md §7); the
equivalence is tested kernel-vs-jnp in ``tests/test_replay.py``. Gradients
flow to the packed tables of ``render_fwd.pack_scene`` and are pulled back
onto the Scene pytree through ``jax.vjp(pack_scene, scene)``, so vertex
gradients include the normal-recomputation path (``TestModelH.h:30``) just
like the jnp replay.

Reference for the replayed math: ``Source/kernels.cl:54-88`` (reflect /
refract), ``92-166`` (intersection), ``313-340`` (direct light),
``342-365`` (bounce loop), via the decision/recompute factorization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene import Scene
from .render_fwd import (STREAM_BLK, STREAM_COLS, STREAM_PACK, TILE_H,
                         TILE_W, UNROLL_TRIANGLES, _add, _dot, _round_up,
                         _scale, _smem_tri_scan, _streamed_tri_scan, _sub,
                         _unrolled_tri_scan, _use_streamed, _where3,
                         pack_scene, pack_streamed)

_F = np.float32

# pack_scene table layout (render_fwd.pack_scene)
TRI_COLS = 19   # v0 0:3, e1 3:6, e2 6:9, n 9:12, rgb 12:15, mat 15, E 16:19
SPH_COLS = 12   # c 0:3, r2 3, rgb 4:7, mat 7, pad 8:12
CAM_COLS = 21   # r0 0:3, r1 3:6, r2 6:9, cam 9:12, light 12:15,
                # light_rgb 15:18, indirect 18:21


def _det3(a, b, c):
    return (a[0] * (b[1] * c[2] - b[2] * c[1])
            - a[1] * (b[0] * c[2] - b[2] * c[0])
            + a[2] * (b[0] * c[1] - b[1] * c[0]))


# --------------------------------------------------------------------------
# Per-lane gathered object row: the differentiable inputs of the tile replay
# --------------------------------------------------------------------------

# --- division-lean differentiable primitives (round 5) -------------------
# f32 div is ~16x a regular VPU op (measured: dependency-fed div chains run
# 0.37 T divs/s vs 6 T mix-ops/s on this v5e), and every primal div spawns
# 1-2 MORE divs in its JAX transpose (d(a/b) needs g/b and g*a/b^2) — the
# r5 census showed ~3% div ops carrying ~45% of the backward's real cycle
# budget. These wrappers keep exactly ONE slow op per site and make every
# derivative term multiplicative (the transpose of a linear-in-tangent mul
# chain is mul). Math is identical to /-based forms up to 1-ulp rounding;
# the kernel-vs-jnp-replay gradient tests bound the drift at 1e-4 relative.


@jax.custom_jvp
def _recip(x):
    return _F(1.0) / x


@_recip.defjvp
def _recip_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    r = _F(1.0) / x
    return r, -t * r * r


@jax.custom_jvp
def _rsqrt(x):
    return jax.lax.rsqrt(x)


@_rsqrt.defjvp
def _rsqrt_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    r = jax.lax.rsqrt(x)
    return r, _F(-0.5) * t * r * r * r


def _sqrt_rs(x):
    """sqrt(x) as x * rsqrt(x): one slow op INCLUDING its derivative
    (d = 0.5 t rsqrt by the product rule through _rsqrt's jvp), vs
    sqrt-then-divide's two. Requires x > 0 — callers guard zeros."""
    return x * _rsqrt(x)


class _Row:
    """Unified per-lane object row (tuple-of-[A,TH,TW] components)."""

    __slots__ = ("v0", "e1", "e2", "n", "rgb", "r2", "mat", "is_sph", "valid")

    def __init__(self, v0, e1, e2, n, rgb, r2, mat, is_sph, valid):
        self.v0, self.e1, self.e2, self.n = v0, e1, e2, n
        self.rgb, self.r2 = rgb, r2
        self.mat, self.is_sph, self.valid = mat, is_sph, valid

    def diff_inputs(self):
        """The leaves that carry gradients (mat/masks are frozen)."""
        return (*self.v0, *self.e1, *self.e2, *self.n, *self.rgb, self.r2)

    def with_diff(self, flat):
        return _Row(tuple(flat[0:3]), tuple(flat[3:6]), tuple(flat[6:9]),
                    tuple(flat[9:12]), tuple(flat[12:15]), flat[15],
                    self.mat, self.is_sph, self.valid)


def _gather_row(tri_scan, sph_ref, n_tri: int, n_sph: int, ids):
    """Select-accumulate the row of the object each lane hit (id encoding as
    ops/replay.py: 0..T-1 triangle, T+s sphere, -1 miss).

    The triangle pass runs through a scan strategy (render_fwd's
    ``_smem_tri_scan`` for whole-table scenes, ``_streamed_tri_scan`` for
    HBM-resident tables) — a runtime loop with dynamic indexing, so
    trace/compile time is O(1) in the triangle count (the Python unroll it
    replaces was ~16 masked selects *per triangle*). Bounce-site gathers
    run inside the dynamic-depth chain loops of ``_bwd_kernel``, so only
    live steps ever reach this scan."""
    shape = ids.shape
    zero = jnp.zeros(shape, _F)
    # Triangle-lane ids as f32 (exact below 2^24), non-triangle lanes mapped
    # to -2 so streamed pad rows (global index >= n_tri) can never match a
    # sphere lane's id.
    idf = jnp.where(ids < n_tri, ids, -2).astype(_F)

    def body(get, gi, carry):
        m = idf == gi
        new = tuple(jnp.where(m, get(c), old)
                    for c, old in enumerate(carry[:15]))
        return new + (jnp.where(m, get(15), carry[15]),)

    init = (zero,) * 15 + (jnp.ones(shape, _F),)  # miss row: mat=1
    flat = tri_scan(body, init)
    v0, e1, e2 = tuple(flat[0:3]), tuple(flat[3:6]), tuple(flat[6:9])
    n, rgb, mat = tuple(flat[9:12]), tuple(flat[12:15]), flat[15]
    r2 = zero
    for s in range(n_sph):
        m = ids == n_tri + s
        v0 = _where3(m, (sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2]), v0)
        rgb = _where3(m, (sph_ref[s, 4], sph_ref[s, 5], sph_ref[s, 6]), rgb)
        r2 = jnp.where(m, sph_ref[s, 3], r2)
        mat = jnp.where(m, sph_ref[s, 7], mat)
    return _Row(v0, e1, e2, n, rgb, r2, mat, ids >= n_tri, ids >= 0)


def _hit_from_row(row: _Row, start, d):
    """Differentiable hit reconstruction — ops/replay.py:_hit_from_row in
    tile-component form. Returns (pos, normal, rgb, mat, valid)."""
    nd = (-d[0], -d[1], -d[2])
    b = _sub(start, row.v0)
    detA = _det3(nd, row.e1, row.e2)
    degen = detA == 0
    recip = _recip(jnp.where(degen, _F(1.0), detA))
    u = _det3(nd, b, row.e2) * recip
    v = _det3(nd, row.e1, b) * recip
    tri_pos = _add(row.v0, _add(_scale(u, row.e1), _scale(v, row.e2)))
    tri_n = row.n                       # unit normal from the packed table;
    # grads flow to vertices through pack_scene's normalize(cross(e2,e1))

    c = row.v0
    L = _sub(start, c)
    a_q = _dot(d, d)
    b_q = _F(2.0) * _dot(d, L)
    c_q = _dot(L, L) - row.r2
    disc = b_q * b_q - _F(4.0) * a_q * c_q
    no_sol = disc < 0
    # disc == 0 short-circuits the sqrt: its inf derivative poisons every
    # sphere-quadratic input's gradient (observed at 1024^2 b10 — tangent
    # lanes exist at f32); zero one-sided derivative instead.
    sq_zero = disc == 0
    sq = _sqrt_rs(jnp.where(no_sol | sq_zero | ~row.is_sph, _F(1.0), disc))
    sq = jnp.where(sq_zero, _F(0.0), sq)
    q = jnp.where(b_q > 0, _F(-0.5) * (b_q + sq), _F(-0.5) * (b_q - sq))
    qz = q == 0
    x0 = q * _recip(jnp.where(a_q == 0, _F(1.0), a_q))
    x1 = jnp.where(qz, x0, c_q * _recip(jnp.where(qz, _F(1.0), q)))
    xmin = jnp.minimum(x0, x1)
    xmax = jnp.maximum(x0, x1)
    cand = jnp.where(xmin >= 0, xmin, xmax)
    cand = jnp.where(no_sol, _F(0.0), cand)
    sph_pos = _add(start, _scale(cand, d))
    pc = _sub(sph_pos, c)
    pl2 = _dot(pc, pc)
    inv = _rsqrt(jnp.where(pl2 == 0, _F(1.0), pl2))
    sph_n = _scale(inv, pc)

    m = row.is_sph
    pos = _where3(m, sph_pos, tri_pos)
    normal = _where3(m, sph_n, tri_n)
    vz = row.valid
    zero = jnp.zeros_like(pos[0])
    pos = _where3(vz, pos, (zero, zero, zero))
    normal = _where3(vz, normal, (zero, zero, zero))
    rgb = _where3(vz, row.rgb, (zero, zero, zero))
    return pos, normal, rgb, row.mat, vz


def _bounce_step(cfg: RenderConfig, row_b: _Row, carry):
    """One replayed bounce step (carry → carry). Bool masks ride the carry
    as f32 0/1 flags — Mosaic cannot select/carry i1 vectors through scf
    control flow, and when the step is gated (``_gated_bounce``) the carry
    crosses an ``scf.if`` boundary."""
    (cur_d, cur_pos, cur_nrm, cur_mat, medium, active_f,
     term_valid_f, term_pos, term_nrm, term_rgb, weight) = carry
    active = active_f > 0
    term_valid = term_valid_f > 0
    dn = _dot(cur_d, cur_nrm)
    refl = _sub(cur_d, _scale(_F(2.0) * dn, cur_nrm))
    c1 = dn
    nflip = _where3(c1 < 0, _scale(_F(-1.0), cur_nrm), cur_nrm)
    c1a = jnp.abs(c1)
    in_air = medium == _F(cfg.ior_air)
    n1 = jnp.where(in_air, _F(cfg.ior_air), _F(cfg.ior_glass))
    n2 = jnp.where(in_air, _F(cfg.ior_glass), _F(cfg.ior_air))
    # nr = n1/n2 with both f32-constant ratios precomputed (numpy f32 div
    # == device f32 div bit-for-bit) — selects replace a 16x-cost div
    nr = jnp.where(in_air, _F(cfg.ior_air) / _F(cfg.ior_glass),
                   _F(cfg.ior_glass) / _F(cfg.ior_air))
    k = _F(1.0) - nr * nr * (_F(1.0) - c1a * c1a)
    tir = k < 0
    kz = k == 0   # grazing TIR boundary: kill the inf sqrt grad
    c2 = _sqrt_rs(jnp.where(tir | kz, _F(1.0), k))
    c2 = jnp.where(kz, _F(0.0), c2)
    refr = _add(_scale(nr, cur_d),
                _scale(nr * c1a - c2, _scale(_F(-1.0), nflip)))
    is_mirror = cur_mat == 0
    if cfg.quirk_nan_tir:
        dead = tir & ~is_mirror
        use_refl = is_mirror
    else:
        dead = jnp.zeros_like(tir)
        use_refl = is_mirror | tir
    ndir = _where3(use_refl, refl, refr)
    nmed = jnp.where(use_refl, _F(cfg.ior_air), n2)
    nstart = _add(cur_pos, _scale(_F(cfg.bias), ndir))
    alive = active & ~dead
    nd2 = jnp.maximum(_dot(ndir, ndir), _F(1e-30))
    inv = _rsqrt(nd2)
    ndir = _scale(inv, ndir)
    if cfg.fresnel:
        # ((n1-n2)/(n1+n2))^2 is the same trace-time constant for either
        # medium (sign squares away) — no runtime divide
        a_, g_ = _F(cfg.ior_air), _F(cfg.ior_glass)
        r0f = _F(((a_ - g_) / (a_ + g_)) ** 2)
        refl_w = r0f + (1 - r0f) * (1 - c1a) ** 5
        w_step = jnp.where(use_refl, _F(1.0), _F(1.0) - refl_w)
        weight = jnp.where(alive, weight * w_step, weight)

    h_pos, h_nrm, h_rgb, h_mat, h_valid = _hit_from_row(
        row_b, nstart, ndir)
    h_valid = h_valid & alive
    diffuse = h_valid & (h_mat > 0)
    term_valid = term_valid | diffuse
    term_pos = _where3(diffuse, h_pos, term_pos)
    term_nrm = _where3(diffuse, h_nrm, term_nrm)
    term_rgb = _where3(diffuse, h_rgb, term_rgb)
    cont = h_valid & (h_mat <= 0)
    cur_d = _where3(cont, ndir, cur_d)
    cur_pos = _where3(cont, h_pos, cur_pos)
    cur_nrm = _where3(cont, h_nrm, cur_nrm)
    cur_mat = jnp.where(cont, h_mat, cur_mat)
    medium = jnp.where(cont, nmed, medium)
    return (cur_d, cur_pos, cur_nrm, cur_mat, medium,
            jnp.where(cont, _F(1.0), _F(0.0)),
            jnp.where(term_valid, _F(1.0), _F(0.0)),
            term_pos, term_nrm, term_rgb, weight)


# --------------------------------------------------------------------------
# Carry pytree helpers for the dynamic-depth chain
# --------------------------------------------------------------------------

# bounce-chain carry: (cur_d, cur_pos, cur_nrm, cur_mat, medium, active_f,
# term_valid_f, term_pos, term_nrm, term_rgb, weight) with 3-vectors as
# component tuples -> 23 (A, TILE_H, TILE_W) f32 leaves. Bool masks ride as
# f32 0/1 flags (_bounce_step's contract). The carry crosses loop and vjp
# boundaries AS A PYTREE — only the per-step scratch write stacks leaves
# (the r5 layout-op census: stacking the loop carry cost ~225 uncounted
# concatenate/slice/pad vector moves per lane in the vjp transpose).

# Per-step scratch stores only the LINEARIZATION-RELEVANT carry leaves:
# 0..11 (cur_d, cur_pos, cur_nrm, cur_mat, medium, active_f) plus weight
# (leaf 22 — `weight * w_step` is bilinear, so w_step's cotangent needs
# the weight VALUE; the Fresnel equivalence test catches dropping it).
# The term leaves (term_valid_f, term_pos/nrm/rgb) enter _bounce_step
# ONLY through value-independent-vjp ops — diffuse-masked selects and the
# OR flag (zero cotangent) — so the reverse sweep rebuilds the step vjp
# with ZEROS in those slots and gets identical cotangents while the
# scratch shrinks 40 -> 30 rows/step. (If a future edit adds a NONLINEAR
# use of a term leaf, tests/test_bwd_kernel.py fails — save it then.)
_SAVED_LEAVES = 13
# chain scratch rows: saved carry leaves + cached gathered row (16 + mat)
_SCR_LEAVES = _SAVED_LEAVES + 17


def _carry_treedef(shape):
    zero = jnp.zeros(shape, _F)
    z3 = (zero, zero, zero)
    proto = (z3, z3, z3, zero, zero, zero, zero, z3, z3, z3, zero)
    return jax.tree_util.tree_structure(proto)


def _shade_tile(cfg: RenderConfig, cam_in, prim_diffuse, term_valid, lit,
                p_pos, p_nrm, p_rgb, t_pos, t_nrm, t_rgb, weight):
    """Tile radiance from the primary hit and the chain terminals —
    the shading tail of ops/replay.py:replay_forward (direct light with
    frozen lit counts, kernels.cl:313-340; terminal combine 353-355;
    AA mean 427). Pure in its array arguments so it sits under jax.vjp;
    prim_diffuse/term_valid/lit are frozen closures. cam_in components are
    (TILE_H, TILE_W) tiles (see _bwd_kernel's cam_vals) and broadcast
    against the (A, TILE_H, TILE_W) ray state on trailing dims."""
    shape = p_pos[0].shape
    light = (cam_in[12], cam_in[13], cam_in[14])
    light_rgb = (cam_in[15], cam_in[16], cam_in[17])
    indirect = (cam_in[18], cam_in[19], cam_in[20])

    sp_pos = _where3(prim_diffuse, p_pos, t_pos)
    sp_nrm = _where3(prim_diffuse, p_nrm, t_nrm)
    lb = tuple(jnp.broadcast_to(c[None], shape) for c in light)
    sdir = _sub(lb, sp_pos)
    radius_sq = _dot(sdir, sdir)
    rs = jnp.where(radius_sq == 0, _F(1.0), radius_sq)
    # x/(4 pi rs) as x * (1/4pi) * recip(rs): one div-class op, mul-only
    # transpose (see _recip) — <=1-ulp drift vs the /-form
    lam_base = (jnp.maximum(_dot(sdir, sp_nrm), 0.0)
                * _F(1.0 / (4.0 * np.pi)) * _recip(rs))
    lam_base = jnp.where(radius_sq == 0, _F(0.0), lam_base)
    dl_scale = (lit * lam_base
                * _F(1.0 / np.float32(cfg.shadow_samples)))  # lit frozen
    dl = tuple(c * dl_scale for c in light_rgb)

    color = tuple(
        jnp.where(prim_diffuse, p_rgb[c] * (indirect[c] + dl[c]), 0.0)
        for c in range(3))
    color = tuple(
        jnp.where(term_valid,
                  _F(0.9) * (indirect[c] + dl[c]) * t_rgb[c] * weight,
                  color[c]) for c in range(3))
    inv_a = _F(1.0 / cfg.aa_rays)
    return tuple(jnp.sum(c, axis=0) * inv_a for c in color)



# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

def _bwd_kernel(tri_ref, sph_ref, cam_ref, off_ref, g_ref, pid_ref, lit_ref,
                bid_ref, *refs, cfg: RenderConfig, n_tri: int, n_sph: int,
                streamed: bool = False, fast_scatter: bool = False,
                unroll: bool = True, ablate: frozenset = frozenset()):
    # unroll=False (interpret mode): per-object loops run as fori_loops —
    # same shared body closures, ~26x smaller jaxpr, which cuts the CPU
    # test suite's compile-dominated wall time (a 128x8 interpret case
    # spends ~70 s compiling the unrolled graph, ~0.02 s executing it).
    # Compiled TPU kernels keep the unroll (static SMEM offsets are
    # measurably faster) — the TPU-mode suite covers that variant.
    # dcam accumulates as a (CAM_COLS, TILE_H, TILE_W) VMEM tile in every
    # variant (the caller does the single final reduction): per-tile
    # camera cotangents are then 21 VECTOR adds instead of 42 cross-lane
    # tile->scalar reductions, which the r3 roofline showed serializing at
    # ~50 cycles each (the "dcam" ablation: 0.55 ms of a 1.9 ms backward).
    if streamed:
        # Triangle cotangents leave the kernel as per-lane tiles
        # (dlane_ref); the caller segment-sums them into the table — the
        # table-shaped accumulator would not fit SMEM at streamed scale.
        (dsph_ref, dcam_ref, img_ref, dlane_ref, tri_buf, tri_sems,
         chain_scr) = refs
        dtri_ref = dobj_ref = pres_ref = None
        tri_scan = _streamed_tri_scan(tri_ref, tri_buf, tri_sems,
                                      tri_ref.shape[0])
    elif fast_scatter:
        # Unified object-cotangent accumulator in VMEM (n_obj, 16, TH, TW):
        # triangles AND spheres, gated by the precomputed per-(site, tile)
        # presence bitword (pres_ref, SMEM) — zero in-kernel reductions on
        # the lane axis; the caller reduces the table once at the end.
        pres_ref, lut_ref, dobj_ref, dcam_ref, img_ref, chain_scr = refs
        dtri_ref = dsph_ref = dlane_ref = None
        # gathers run the presence-bit loop; RAYTPU_BWD_GATHER=scan keeps
        # the select-accumulate scan for A/B measurement (bench-only)
        import os as _os
        _gather_scan = _os.environ.get("RAYTPU_BWD_GATHER") == "scan"
        tri_scan = ((_unrolled_tri_scan
                     if unroll and n_tri <= UNROLL_TRIANGLES
                     else _smem_tri_scan)(tri_ref, n_tri)
                    if _gather_scan else None)
    else:
        dtri_ref, dsph_ref, dcam_ref, img_ref, chain_scr = refs
        dlane_ref = dobj_ref = pres_ref = None
        tri_scan = (_unrolled_tri_scan
                    if unroll and n_tri <= UNROLL_TRIANGLES
                    else _smem_tri_scan)(tri_ref, n_tri)
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        # scalar stores: the table accumulators live in SMEM
        if dtri_ref is not None:
            def zero_tri(r, _):
                for c in range(TRI_COLS):
                    dtri_ref[r, c] = _F(0.0)
                return 0
            jax.lax.fori_loop(0, dtri_ref.shape[0], zero_tri, 0)
        if dobj_ref is not None:
            dobj_ref[...] = jnp.zeros(dobj_ref.shape, _F)
        if dsph_ref is not None:
            for r in range(dsph_ref.shape[0]):
                for c in range(SPH_COLS):
                    dsph_ref[r, c] = _F(0.0)
        dcam_ref[...] = jnp.zeros(dcam_ref.shape, _F)

    A = cfg.aa_rays
    ax, ay = cfg.aa_x, cfg.aa_y
    W, H = cfg.width, cfg.height
    shape = (A, TILE_H, TILE_W)

    pid = pid_ref[...]
    lit = lit_ref[...]
    g = (g_ref[0], g_ref[1], g_ref[2])

    # --- liveness (monotone: the forward loop never revives a lane) ---
    # n_live = number of bounce steps any lane of this tile executed. The
    # chain below runs EXACTLY that many iterations in both passes — dead
    # tiles (most of the grid) skip the chain entirely, and no per-step
    # rows, conds or cotangent tiles exist for steps past n_live (the
    # per-bounce dead-site machinery of earlier designs cost ~2-3 ms per
    # bounce at 1024^2 regardless of gating granularity).
    B = cfg.bounces

    if fast_scatter:
        # Presence-bit gather/scatter (round 5): the select-accumulate
        # gather scanned ALL n_obj objects per site (~17 vector ops each —
        # a third of the whole backward census at Cornell scale), and the
        # round-4 scatter tested 28 static @pl.when gates per site whose
        # scalar branches stall the VLIW pipeline. Both are replaced by a
        # while-loop over the SET BITS of the per-(site, tile) presence
        # word — on average ~1.7 objects per tile — with the object index
        # recovered by a De Bruijn multiply + 32-entry SMEM LUT (ctz) and
        # the object row read via dynamic SMEM indexing.
        ncols_g = pl.num_programs(1)

        def _lowbit_index(w):
            """Index of the lowest set bit of scalar int32 w (de Bruijn)."""
            low = w & (-w)
            h = jax.lax.shift_right_logical(low * jnp.int32(0x077CB531),
                                            jnp.int32(27)) & jnp.int32(31)
            return lut_ref[h]

        def gather_pres(ids, site):
            """_Row for each lane's hit object, visiting only the objects
            present in this (site, tile) — replaces ``_gather_row``.

            Reads the UNIFIED (32, 17) object table the caller builds for
            the fast-scatter path (triangle and sphere rows pre-merged into
            one layout — see ``_unified_obj_table``): 17 scalar SMEM reads
            per present object, no per-column tri/sph selects. The r5
            structure-twin measurement exposed the old dual-table gather's
            ~34 scalar reads + 17 scalar selects per bit as pure
            scalar-unit overhead the VLIW pipeline cannot hide."""
            pres0 = pres_ref[site, i * ncols_g + j]
            zero_ = jnp.zeros(ids.shape, _F)
            # flat layout: cols 0..14 (v0,e1,e2,n,rgb), 15 mat (miss=1), 16 r2
            init = (zero_,) * 15 + (jnp.ones(ids.shape, _F), zero_)

            def body(st):
                w, flat = st
                o = _lowbit_index(w)
                m = ids == o
                flat2 = tuple(jnp.where(m, tri_ref[o, c], flat[c])
                              for c in range(17))
                return (w & (w - 1), flat2)

            _, flat = jax.lax.while_loop(lambda st: st[0] != 0, body,
                                         (pres0, init))
            return _Row(tuple(flat[0:3]), tuple(flat[3:6]),
                        tuple(flat[6:9]), tuple(flat[9:12]),
                        tuple(flat[12:15]), flat[16], flat[15],
                        ids >= n_tri, ids >= 0)

        if _gather_scan:
            gather_pres = lambda ids, site: _gather_row(
                tri_scan, sph_ref, n_tri, n_sph, ids)
        prim = gather_pres(pid, 0)
    else:
        prim = _gather_row(tri_scan, sph_ref, n_tri, n_sph, pid)
    if B > 0:
        n_live = jnp.int32(0)
        for b in range(B):
            n_live += jnp.where(jnp.max(bid_ref[b]) >= 0, 1, 0).astype(
                jnp.int32)
        if "chain" in ablate:
            n_live = jnp.int32(0)

    # --- non-differentiable ray-gen pieces (pixel coordinates) ---
    ys = (off_ref[0] + i * TILE_H
          + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0))
    xs = (j * TILE_W
          + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1))
    xsf = xs.astype(_F)
    ysf = ys.astype(_F)
    bx0 = xsf * _F(ax) - _F(W * ax / 2.0)
    by0 = ysf * _F(ay) - _F(H * ay / 2.0)
    focal = _F(cfg.effective_focal)
    dx = jnp.stack([bx0 + _F(a % ax) for a in range(A)])
    dy = jnp.stack([by0 + _F(a // ax) for a in range(A)])
    dz = jnp.full(shape, focal)

    # cam values enter the differentiable parts as (TILE_H, TILE_W) tiles
    # (splat from SMEM): jax.vjp's cotangent for them is then tile-shaped —
    # accumulated below with plain vector adds — instead of the scalar
    # whose transpose forces a cross-lane reduction per component per tile.
    cam_vals = tuple(jnp.full((TILE_H, TILE_W), cam_ref[k])
                     for k in range(CAM_COLS))

    # --- part 1: ray gen + primary reconstruction (under jax.vjp) ---
    def f1(cam_in, prim_in):
        r0 = (cam_in[0], cam_in[1], cam_in[2])
        r1 = (cam_in[3], cam_in[4], cam_in[5])
        r2 = (cam_in[6], cam_in[7], cam_in[8])
        base = (dx, dy, dz)
        d = (_dot(r0, base), _dot(r1, base), _dot(r2, base))
        if not cfg.cpu_ref:   # CPU-ref rays stay unnormalized
            inv_len = _rsqrt(_dot(d, d))   # nonzero: rotated focal ray
            d = _scale(inv_len, d)
        start = tuple(jnp.broadcast_to(cam_in[9 + c][None], shape)
                      for c in range(3))
        pos, normal, rgb, _, _ = _hit_from_row(prim.with_diff(prim_in),
                                               start, d)
        return d, pos, normal, rgb

    # NOTE on working set: vjp1 runs LAST (it needs the chain's
    # cotangents), so f1's residuals stay live across the bounce chain and
    # the shading vjp. An r5 experiment rematerialized f1 at the vjp1 use
    # site (manually — jax.checkpoint's remat2 has no Pallas TPU
    # lowering): measured time was IDENTICAL (0.39 ms) while the jaxpr
    # census grew ~180 ops/lane, i.e. Mosaic either CSEs the recompute
    # back or hides the residual traffic; the stored-residual form keeps
    # the census honest.
    if "dcam" in ablate:
        (d, pos, normal, rgb), _vjp1p = jax.vjp(
            functools.partial(f1, cam_vals), prim.diff_inputs())
        vjp1 = lambda g: ((jnp.float32(0.0),) * CAM_COLS, _vjp1p(g)[0])
    else:
        (d, pos, normal, rgb), vjp1 = jax.vjp(f1, cam_vals,
                                              prim.diff_inputs())
    mat, valid = prim.mat, prim.valid
    # CPU-ref shades ANY hit triangle (skeleton.cpp:268 has no material test)
    prim_diffuse = valid if cfg.cpu_ref else valid & (mat > 0)

    # --- part 2 forward: dynamic-depth bounce chain, carries to scratch ---
    zero = jnp.zeros(shape, _F)
    z3 = (zero, zero, zero)
    term_valid_f, term_pos, term_nrm, term_rgb = zero, z3, z3, z3
    weight = jnp.ones(shape, _F)
    if B > 0:
        treedef = _carry_treedef(shape)
        carry0 = (d, pos, normal, mat,
                  jnp.full(shape, _F(cfg.ior_air)),
                  jnp.where(valid & (mat <= 0), _F(1.0), _F(0.0)),
                  zero, z3, z3, z3, weight)

        # The chain carry crosses loop/vjp boundaries as a PYTREE, not a
        # stacked [23, A, TH, TW] array: the r5 layout-op census showed the
        # stacked form's per-step concatenate/slice (and the pads their
        # vjp transpose emits) cost ~225 uncounted vector moves per lane —
        # Mosaic emits real copies for them. Only the scratch write stacks.
        def fbody(k, carry):
            ids_k = bid_ref[pl.ds(k, 1)][0]
            row = (gather_pres(ids_k, 1 + k) if fast_scatter
                   else _gather_row(tri_scan, sph_ref, n_tri, n_sph, ids_k))
            # save the linearization-relevant carry prefix INTO step k plus
            # the gathered row (16 diff leaves + mat), so the reverse sweep
            # never rescans the table — for streamed scenes that is one
            # whole DMA table scan per step (see _SAVED_LEAVES)
            leaves = jax.tree_util.tree_leaves(carry)
            chain_scr[pl.ds(k, 1)] = jnp.stack(
                leaves[:12] + [leaves[22]]
                + list(row.diff_inputs()) + [row.mat])[None]
            return _bounce_step(cfg, row, carry)

        carrN = jax.lax.fori_loop(0, n_live, fbody, carry0)
        (_, _, _, _, _, _, term_valid_f, term_pos, term_nrm, term_rgb,
         weight) = carrN
    term_valid = term_valid_f > 0

    # --- part 3: shading (under jax.vjp) ---
    def f3(cam_in, p_pos, p_nrm, p_rgb, t_pos, t_nrm, t_rgb, w):
        return _shade_tile(cfg, cam_in, prim_diffuse, term_valid, lit,
                           p_pos, p_nrm, p_rgb, t_pos, t_nrm, t_rgb, w)

    if "dcam" in ablate:
        primal, vjp3p = jax.vjp(functools.partial(f3, cam_vals), pos, normal,
                                rgb, term_pos, term_nrm, term_rgb, weight)
        (dpos3, dnrm3, drgb3, dt_pos, dt_nrm, dt_rgb, dw) = vjp3p(g)
        dcam3 = (jnp.float32(0.0),) * CAM_COLS
    else:
        primal, vjp3 = jax.vjp(f3, cam_vals, pos, normal, rgb,
                               term_pos, term_nrm, term_rgb, weight)
        (dcam3, dpos3, dnrm3, drgb3, dt_pos, dt_nrm, dt_rgb, dw) = vjp3(g)
    img_ref[0] = primal[0]
    img_ref[1] = primal[1]
    img_ref[2] = primal[2]

    # --- scatter helpers: object cotangents for one site (prim / bounce k)
    if fast_scatter:
        # Presence-bit-loop VMEM accumulate (round 5; supersedes the r4
        # design whose 28 static @pl.when gates per site each cost a scalar
        # branch — the branch stalls, not the masked sums, dominated its
        # measured time). One while-loop iteration per PRESENT object
        # (avg ~1.7/tile on Cornell): the masked sums reduce only over the
        # AA axis into a persistent (n_obj, 16, TILE_H, TILE_W) VMEM table
        # at a dynamic object row — plain vector adds — which the caller
        # reduces across lanes ONCE at the end.
        def scatter_site(site, dflat, ids):
            # pres_ref holds the whole (sites, n_tiles) table in SMEM
            # (Mosaic rejects sub-(8,128) blocked specs even for SMEM)
            pres0 = pres_ref[site, i * ncols_g + j]

            def body(w):
                o = _lowbit_index(w)
                mf = (ids == o).astype(_F)
                # one batched dynamic RMW of the object's 16-col row
                # (static-stacked update): 1 dynamic address instead of 16
                upd = jnp.stack([jnp.sum(mf * dflat[c], axis=0)
                                 for c in range(16)])
                dobj_ref[pl.ds(o, 1)] = dobj_ref[pl.ds(o, 1)] + upd[None]
                return w & (w - 1)

            jax.lax.while_loop(lambda w: w != 0, body, pres0)
    else:
        # Sphere cotangents: SMEM accumulates (spheres are always few).
        def scatter_sph(ids, dflat):
            for s in range(n_sph):
                m = ids == n_tri + s

                @pl.when(jnp.any(m))
                def _(s=s, m=m):
                    mf = m.astype(_F)
                    for c in range(3):       # center
                        dsph_ref[s, c] += jnp.sum(mf * dflat[c])
                    for c in range(3):       # rgb
                        dsph_ref[s, 4 + c] += jnp.sum(mf * dflat[12 + c])
                    dsph_ref[s, 3] += jnp.sum(mf * dflat[15])   # r2

        if streamed:
            # Triangle cotangents: written per lane at the (possibly
            # traced) site index; the caller segment-sums them over the
            # recorded ids.
            def scatter_tri(site, dflat, ids=None):
                for c in range(16):
                    dlane_ref[pl.ds(site * 16 + c, 1)] = dflat[c][None]
        else:
            # >32-object SMEM scenes: per-object masked sums into the SMEM
            # table, any()-gated (each tile touches only a handful of
            # objects). fori_loop keeps compile time O(1) in scene size.
            def scatter_tri(site, dflat, ids):
                def one(o, m):
                    @pl.when(jnp.any(m))
                    def _():
                        mf = m.astype(_F)
                        for c in range(15):  # v0,e1,e2,n,rgb -> cols 0..14
                            dtri_ref[o, c] += jnp.sum(mf * dflat[c])

                if unroll and n_tri <= UNROLL_TRIANGLES:
                    for o in range(n_tri):
                        one(o, ids == o)
                else:
                    def body(o, _):
                        one(o, ids == o)
                        return 0
                    jax.lax.fori_loop(0, n_tri, body, 0)

        def scatter_site(site, dflat, ids):
            scatter_tri(site, dflat, ids)
            scatter_sph(ids, dflat)

    if "scatter" in ablate:
        def scatter_site(site, dflat, ids):
            pass

    # --- part 2 backward: reverse dynamic loop with in-loop scatter ---
    if B > 0:
        if streamed:
            # dead bounce sites are never written by the reverse loop; the
            # caller's segment-sum masks them by recorded id, so they only
            # need to hold non-NaN values
            def zdead(b, _):
                @pl.when(b >= n_live)
                def _():
                    for c in range(16):
                        dlane_ref[pl.ds((1 + b) * 16 + c, 1)] = zero[None]
                return 0
            jax.lax.fori_loop(0, B, zdead, 0)

        dcarryN = (z3, z3, z3, zero, zero, zero, zero,
                   dt_pos, dt_nrm, dt_rgb, dw)

        def rbody(i2, dcarr):
            k = n_live - 1 - i2
            ids_k = bid_ref[pl.ds(k, 1)][0]
            scr = chain_scr[pl.ds(k, 1)][0]
            # rebuild the full carry PYTREE with ZEROS in the unsaved term
            # slots — their vjp is value-independent (see _SAVED_LEAVES)
            carr_k = jax.tree_util.tree_unflatten(
                treedef, [scr[r] for r in range(12)]
                + [zero] * 10 + [scr[12]])
            row_diffs = tuple(scr[_SAVED_LEAVES + c] for c in range(16))
            row_mat = scr[_SAVED_LEAVES + 16]
            masks = (row_mat, ids_k >= n_tri, ids_k >= 0)

            def step(diffs, carr_in):
                row = _Row(tuple(diffs[0:3]), tuple(diffs[3:6]),
                           tuple(diffs[6:9]), tuple(diffs[9:12]),
                           tuple(diffs[12:15]), diffs[15], *masks)
                return _bounce_step(cfg, row, carr_in)

            _, vjpk = jax.vjp(step, row_diffs, carr_k)
            drow, dcarr_prev = vjpk(dcarr)
            scatter_site(1 + k, drow, ids_k)
            return dcarr_prev

        dcarr0 = jax.lax.fori_loop(0, n_live, rbody, dcarryN)
        (dd_c, dpos_c, dnrm_c, _, _, _, _, _, _, _, _) = dcarr0
    else:
        dd_c, dpos_c, dnrm_c = z3, z3, z3

    # --- part 1 backward: summed cotangents from shading and the chain ---
    dcam1, dprim = vjp1((dd_c, _add(dpos3, dpos_c), _add(dnrm3, dnrm_c),
                         drgb3))
    scatter_site(0, dprim, pid)

    for k in range(CAM_COLS):   # (TILE_H, TILE_W) tiles: plain vector adds
        dcam_ref[k] = dcam_ref[k] + dcam1[k] + dcam3[k]




_DEBRUIJN_LUT = np.array(
    [0, 1, 28, 2, 29, 14, 24, 3, 30, 22, 20, 15, 25, 17, 4, 8,
     31, 27, 13, 23, 21, 19, 16, 7, 26, 12, 18, 6, 11, 5, 10, 9],
    dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "n_tri", "n_sph", "hp",
                                             "wp", "interpret", "streamed",
                                             "ablate"))
def _call_bwd(tri, sph, cam, off, g, pid, lit, bid, pres, cfg: RenderConfig,
              n_tri: int, n_sph: int, hp: int, wp: int,
              interpret: bool = False, streamed: bool = False,
              ablate: frozenset = frozenset()):
    grid = (hp // TILE_H, wp // TILE_W)
    A = cfg.aa_rays
    B = max(cfg.bounces, 1)   # bid is padded to >=1 so the spec is static
    sites = 1 + cfg.bounces   # prim + one per bounce
    fast_scatter = pres is not None
    kernel = functools.partial(_bwd_kernel, cfg=cfg, n_tri=n_tri,
                               n_sph=n_sph, streamed=streamed,
                               fast_scatter=fast_scatter,
                               unroll=not interpret, ablate=ablate)
    sph_spec = pl.BlockSpec((max(n_sph, 1), SPH_COLS), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    # dcam: persistent VMEM tile accumulator (caller reduces once)
    cam_spec = pl.BlockSpec((CAM_COLS, TILE_H, TILE_W), lambda i, j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((3, TILE_H, TILE_W), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    sph_shape = jax.ShapeDtypeStruct((max(n_sph, 1), SPH_COLS), jnp.float32)
    cam_shape = jax.ShapeDtypeStruct((CAM_COLS, TILE_H, TILE_W), jnp.float32)
    img_shape = jax.ShapeDtypeStruct((3, hp, wp), jnp.float32)
    chain_scr = pltpu.VMEM((B, _SCR_LEAVES, A, TILE_H, TILE_W), jnp.float32)
    if streamed:
        out_specs = [
            sph_spec, cam_spec, img_spec,
            pl.BlockSpec((sites * 16, A, TILE_H, TILE_W),
                         lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            sph_shape, cam_shape, img_shape,
            jax.ShapeDtypeStruct((sites * 16, A, hp, wp), jnp.float32),
        ]
        scratch = [pltpu.SMEM((2, STREAM_BLK, STREAM_COLS), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,)),
                   chain_scr]
        tri_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    elif fast_scatter:
        n_obj = n_tri + n_sph
        out_specs = [
            pl.BlockSpec((n_obj, 16, TILE_H, TILE_W),
                         lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            cam_spec, img_spec,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_obj, 16, TILE_H, TILE_W), jnp.float32),
            cam_shape, img_shape,
        ]
        scratch = [chain_scr]
        tri_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        out_specs = [
            pl.BlockSpec((n_tri, TRI_COLS), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            sph_spec, cam_spec, img_spec,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_tri, TRI_COLS), jnp.float32),
            sph_shape, cam_shape, img_shape,
        ]
        scratch = [chain_scr]
        tri_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [
        tri_spec,
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((3, TILE_H, TILE_W), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((A, TILE_H, TILE_W), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((A, TILE_H, TILE_W), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, A, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [tri, sph, cam, off, g, pid, lit, bid]
    if fast_scatter:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(pres)
        # ctz LUT for the presence-bit loops: index_of_lowest_set_bit via
        # de Bruijn multiply (0x077CB531) — 32 i32 scalars in SMEM
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(_DEBRUIJN_LUT)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # headroom above the default 16 MB scoped-vmem limit: the chain
        # scratch plus the per-step vjp's live values can top it at deep
        # chains; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    if streamed:
        dsph, dcam, img, dlane = outs
        return None, dsph, dcam, img, dlane, None
    if fast_scatter:
        dobj, dcam, img = outs
        return None, None, dcam, img, None, dobj
    dtri, dsph, dcam, img = outs
    return dtri, dsph, dcam, img, None, None


def _pad_hw(x, hp, wp, fill):
    """Pad the trailing two axes (h, w) up to (hp, wp) with `fill`."""
    h, w = x.shape[-2], x.shape[-1]
    if h == hp and w == wp:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(0, hp - h), (0, wp - w)]
    return jnp.pad(x, widths, constant_values=fill)


def render_replay_bwd(scene: Scene, cfg: RenderConfig, res, g,
                      row0=None, rows: int | None = None,
                      interpret: bool | None = None,
                      return_primal: bool = False):
    """Scene cotangent for the fused forward render: the Pallas path-replay
    backward. `res` is the Residuals record from ``render_fused_res``; `g`
    is the image cotangent [rows, W, 3]. Returns a Scene-pytree gradient
    identical (to float tolerance) to ``jax.vjp`` of
    ``ops/replay.replay_forward``."""
    from .render_fwd import default_interpret
    if interpret is None:
        interpret = default_interpret()
    rows = cfg.height if rows is None else rows
    off = (jnp.zeros((1,), jnp.int32) if row0 is None
           else jnp.asarray(row0, jnp.int32).reshape(1))
    streamed = _use_streamed(scene)
    (tri, sph, cam), pack_vjp = jax.vjp(pack_scene, scene)
    t_pad = tri.shape[0]
    if streamed:  # STREAM_PACK triangles per lane-tile-aligned HBM row
        tri = pack_streamed(tri, 19, STREAM_PACK)
    n_tri = scene.tri_v0.shape[0]
    n_sph = scene.sph_center.shape[0]
    hp = _round_up(rows, TILE_H)
    wp = _round_up(cfg.width, TILE_W)

    # pad residual/cotangent tiles: pid/bid -1 (inactive), lit 0, g 0 —
    # padded lanes contribute exactly zero gradient
    g3 = _pad_hw(jnp.transpose(g.astype(jnp.float32), (2, 0, 1)), hp, wp,
                 0.0)
    pid = _pad_hw(res.prim_id, hp, wp, -1)
    lit = _pad_hw(res.lit_cnt, hp, wp, 0.0)
    if cfg.bounces > 0:
        bid = _pad_hw(res.bounce_id, hp, wp, -1)
    else:
        bid = jnp.full((1,) + pid.shape, -1, jnp.int32)

    import os
    ablate = frozenset(x for x in os.environ.get(
        "RAYTPU_BWD_ABLATE", "").split(",") if x)
    if ablate:
        # Bench-only switch: zeroes whole gradient components. If it leaks
        # into a real training run the grads are silently wrong, so shout
        # (once per process) whenever it is active.
        import warnings
        warnings.warn(
            f"RAYTPU_BWD_ABLATE={sorted(ablate)} is active — gradient "
            f"components are ZEROED for ablation benchmarking; unset the "
            f"env var for correct gradients", stacklevel=2)

    # Presence bitwords for the fast in-kernel scatter: for every
    # (site, 8x128 tile), the OR over its lanes of (1 << hit_id) — one
    # cheap XLA reduction over residuals the backward reads anyway. Only
    # scenes with <= 32 objects qualify (one int32 word; covers every
    # Cornell/BASELINE config); larger SMEM scenes keep the any()-gated
    # scalar scatter and streamed scenes the segment-sum route.
    n_obj = n_tri + n_sph
    if not streamed and n_obj <= 32:
        # Unified (32, 17) object table for the presence-bit gather: one
        # row per object, triangle and sphere layouts pre-merged on the
        # host so the in-kernel gather is 17 scalar SMEM reads per present
        # object with NO per-column tri/sph selects (r5 structure-twin
        # finding: the dual-table gather's ~34 scalar reads + 17 scalar
        # selects per bit were pure scalar-unit overhead). Cols: 0..14
        # v0,e1,e2,n,rgb; 15 mat; 16 r2 (0 for triangles). The A/B scan
        # gather (RAYTPU_BWD_GATHER=scan) needs the original 19-col
        # layout, so it keeps the packed table.
        if os.environ.get("RAYTPU_BWD_GATHER") != "scan":
            obj = jnp.zeros((32, 17), jnp.float32)
            obj = obj.at[:n_tri, :16].set(tri[:n_tri, :16])
            if n_sph:
                s, o0 = sph[:n_sph], n_tri
                obj = (obj.at[o0:o0 + n_sph, 0:3].set(s[:, 0:3])
                          .at[o0:o0 + n_sph, 12:15].set(s[:, 4:7])
                          .at[o0:o0 + n_sph, 15].set(s[:, 7])
                          .at[o0:o0 + n_sph, 16].set(s[:, 3]))
            tri = obj
        ids_sites = (jnp.concatenate([pid[None], bid], axis=0)
                     if cfg.bounces > 0 else pid[None])
        sites = ids_sites.shape[0]
        r = ids_sites.reshape(sites, -1, hp // TILE_H, TILE_H,
                              wp // TILE_W, TILE_W)
        bits = jnp.where(r >= 0,
                         jnp.left_shift(jnp.int32(1), jnp.maximum(r, 0)),
                         jnp.int32(0))   # max: no negative shift amounts
        pres = jax.lax.reduce(bits, jnp.int32(0), jax.lax.bitwise_or,
                              (1, 3, 5)).reshape(sites, -1)
    else:
        pres = None

    dtri, dsph, dcam, img, dlane, dobj = _call_bwd(
        tri, sph, cam, off, g3, pid, lit, bid, pres, cfg, n_tri, n_sph,
        hp, wp, interpret, streamed=streamed, ablate=ablate)
    dcam_vec = jnp.sum(dcam, axis=(1, 2))[None]   # [1, CAM_COLS]
    if dobj is not None:
        # one deferred reduction of the unified VMEM accumulator
        sums = jnp.sum(dobj, axis=(-2, -1))       # [n_obj, 16]
        dtri = jnp.zeros((t_pad, TRI_COLS), jnp.float32
                         ).at[:n_tri, :15].set(sums[:n_tri, :15])
        dsph = jnp.zeros((max(n_sph, 1), SPH_COLS), jnp.float32)
        if n_sph:
            s = sums[n_tri:]
            dsph = (dsph.at[:, 0:3].set(s[:, 0:3])      # center
                        .at[:, 3].set(s[:, 15])         # r2
                        .at[:, 4:7].set(s[:, 12:15]))   # rgb
    if streamed:
        # Scatter the per-lane triangle cotangents into the table outside
        # the kernel: one segment-sum over the recorded hit ids. Traffic is
        # O(rays x (1+bounces) x 16 floats) — tiny next to the jnp replay
        # VJP's materialized intermediates, and independent of scene size.
        sites = 1 + cfg.bounces
        ids_sites = (jnp.concatenate([pid[None], bid], axis=0)
                     if cfg.bounces > 0 else pid[None])
        ids_all = ids_sites.reshape(-1)
        data = jnp.transpose(dlane.reshape(sites, 16, -1),
                             (0, 2, 1)).reshape(-1, 16)
        is_tri = (ids_all >= 0) & (ids_all < n_tri)
        seg = jnp.where(is_tri, ids_all, 0)
        sums = jax.ops.segment_sum(data * is_tri[:, None].astype(jnp.float32),
                                   seg, num_segments=t_pad)
        dtri = jnp.zeros((t_pad, TRI_COLS), jnp.float32
                         ).at[:, :15].set(sums[:, :15])
    if n_sph == 0:
        dsph = jnp.zeros((1, SPH_COLS), jnp.float32)  # matches pack_scene pad
    (scene_bar,) = pack_vjp((dtri, dsph, dcam_vec[0]))
    if return_primal:
        # replayed radiance (the vjp's primal) — for kernel-vs-replay tests
        return scene_bar, jnp.transpose(img[:, :rows, :cfg.width], (1, 2, 0))
    return scene_bar
