"""Analytic vector-op counts for the fused forward kernel — the basis of the
speed-of-light / utilization analysis in BASELINE.md.

The ray tracer does no matmuls: every hot loop is elementwise f32 on the VPU
(the MXU is idle by design — there is nothing to contract). The right
"speed of light" is therefore the VPU's vector-op issue rate, measured
empirically by ``bench.py --roofline`` with a chained-FMA Pallas kernel
(``_vpu_peak``), not the MXU TFLOP headline.

Counting rules (documented so the numbers are auditable):
* one vector op = one VPU instruction over a (8,128) tile lane:
  mul/add/sub/compare/select/max/min/neg/and/or = 1; fused mul-add = 1;
  recip/sqrt/divide = 1 (they issue as one slow op — this *undercounts*
  their latency, making the utilization figure conservative);
* scalar-unit work (per-triangle invariants in the shared-origin primary
  scan, SMEM loads, control) = 0: it overlaps the vector stream;
* counts are per *lane* = one AA ray of one pixel; a frame has
  H * W * aa_rays lanes.

Derived from the kernel structure in ``kernels/render_fwd.py`` (per-site
bodies: ``_nearest_hit_primary``, ``_lit_count``, ``_nearest_hit``); the
per-triangle figures below were hand-counted from those bodies and are
accurate to ~±15% (selects and mask plumbing dominate the uncertainty).
"""
from __future__ import annotations

import numpy as np

from .config import RenderConfig

# per-lane vector ops, hand-counted from kernels/render_fwd.py
PRIMARY_PER_TRI = 29       # shared-origin fast path (_nearest_hit_primary)
PRIMARY_PER_SPH = 28
PRIMARY_GATHER_PER_TRI = 8  # winner reconstruction (1 cmp + 7 selects)
SHADOW_FIXED_PER_TRI = 20  # per-triangle invariants (b, t_num, B2, B1)
SHADOW_PER_TRI_SAMPLE = 25  # division-free accept test per jittered ray
SHADOW_PER_SPH_SAMPLE = 30
SHADOW_JITTER_PER_SAMPLE = 38  # xorshift3 + crush3 + dir add + |d|^2
BOUNCE_PER_TRI = 100       # general-origin Cramer scan (_nearest_hit body)
BOUNCE_PER_SPH = 60
BOUNCE_FIXED = 90          # reflect + refract + renormalize + bookkeeping
RAYGEN_SHADE_FIXED = 80    # ray gen, Lambert, combine, AA mean, pack


def forward_ops(cfg: RenderConfig, n_tri: int, n_sph: int,
                bounce_tile_fracs=None) -> dict:
    """Vector-op breakdown for one forward frame.

    bounce_tile_fracs: per-bounce-step fraction of (8,128) tiles still
    active (the kernel's tile-level early exit, measured from residuals by
    ``bench.py --roofline``); defaults to the Cornell-like estimate
    (~14% of tiles hold a specular object, halving per step).
    """
    lanes = cfg.width * cfg.height * cfg.aa_rays
    S = cfg.shadow_samples
    primary = (n_tri * PRIMARY_PER_TRI + n_sph * PRIMARY_PER_SPH
               + n_tri * PRIMARY_GATHER_PER_TRI)
    shadow = (n_tri * (SHADOW_FIXED_PER_TRI + SHADOW_PER_TRI_SAMPLE * S)
              + n_sph * SHADOW_PER_SPH_SAMPLE * S
              + SHADOW_JITTER_PER_SAMPLE * S)
    if bounce_tile_fracs is None:
        bounce_tile_fracs = [0.14 * 0.5 ** b for b in range(cfg.bounces)]
    per_bounce = (BOUNCE_FIXED + n_tri * BOUNCE_PER_TRI
                  + n_sph * BOUNCE_PER_SPH)
    bounce = per_bounce * float(np.sum(bounce_tile_fracs[:cfg.bounces]))
    per_lane = primary + shadow + bounce + RAYGEN_SHADE_FIXED
    return {
        "lanes": lanes,
        "per_lane": {"primary": primary, "shadow": shadow,
                     "bounce": round(bounce, 1),
                     "fixed": RAYGEN_SHADE_FIXED},
        "total": lanes * per_lane,
    }


# per-lane vector ops of the path-replay backward kernel
# (kernels/render_bwd.py, dynamic-depth chain design), hand-counted to the
# same rules as the forward table. Reverse-mode factors: a jax.vjp over a
# straight-line block costs ~3x its primal (primal recompute + transpose).
BWD_GATHER_PER_TRI = 17      # per-object select-accumulate (_gather_row)
BWD_GATHER_PER_SPH = 8
BWD_F1 = 480                 # ray gen + _hit_from_row primal + vjp (3x ~160)
BWD_F3 = 240                 # _shade_tile primal + vjp (3x ~80)
BWD_SCATTER_PER_TRI = 2      # per-object any() test (masked-sum gate)
BWD_SCATTER_HIT = 150        # ~5 hit objects x 15 masked sums x ~2 ops/lane
BWD_STEP_FWD = 255           # _bounce_step + _hit_from_row + carry store
BWD_STEP_BWD = 760           # step vjp (3x) + carry load
BWD_FIXED = 80               # residual loads, id casts, liveness, img store


def backward_ops(cfg: RenderConfig, n_tri: int, n_sph: int,
                 bounce_tile_fracs=None) -> dict:
    """Vector-op breakdown for one backward pass of the fused kernel.

    The dynamic-depth chain executes each bounce step only on tiles still
    live there (sum of ``bounce_tile_fracs``), in BOTH the forward replay
    and the reverse sweep; dead tiles pay nothing per bounce. Same ±15-20%
    hand-count uncertainty as ``forward_ops``."""
    lanes = cfg.width * cfg.height * cfg.aa_rays
    gather = n_tri * BWD_GATHER_PER_TRI + n_sph * BWD_GATHER_PER_SPH
    scatter = n_tri * BWD_SCATTER_PER_TRI + BWD_SCATTER_HIT
    if bounce_tile_fracs is None:
        bounce_tile_fracs = [0.14 * 0.5 ** b for b in range(cfg.bounces)]
    live = float(np.sum(bounce_tile_fracs[:cfg.bounces]))
    per_step = (2 * gather              # regathered in fwd and reverse
                + BWD_STEP_FWD + BWD_STEP_BWD + scatter)
    per_lane = (gather + BWD_F1 + BWD_F3 + scatter   # primary site
                + live * per_step + BWD_FIXED)
    return {
        "lanes": lanes,
        "per_lane": {"prim": gather + BWD_F1 + BWD_F3 + scatter,
                     "chain": round(live * per_step, 1),
                     "fixed": BWD_FIXED},
        "total": lanes * per_lane,
    }


# ---------------------------------------------------------------------------
# Jaxpr op census: counts the vector work in the ACTUAL traced kernel
# (VERDICT r3 task 8 — replaces the ±15-20% hand counts with a mechanical
# census of the pallas kernel jaxpr, leaving only the loop/branch execution
# weights as measured inputs).
# ---------------------------------------------------------------------------

# elementwise primitives that issue as one VPU op per element
_ELEMWISE = {
    "add", "sub", "mul", "div", "sqrt", "rsqrt", "neg", "abs", "sign",
    "min", "max", "lt", "gt", "ge", "le", "eq", "ne", "and", "or", "not",
    "xor", "select_n", "shift_left", "shift_right_logical",
    "shift_right_arithmetic", "convert_element_type", "iota", "exp", "log",
    "floor", "ceil", "round", "rem", "clamp", "square",
    "add_any",   # transpose-of-duplicate accumulation: one vector add
}
_FREE = {
    # layout/metadata-only or scalar-unit work (counting rules above):
    "bitcast", "broadcast_in_dim", "reshape", "squeeze", "concatenate",
    "slice", "dynamic_slice", "dynamic_update_slice", "transpose",
    "pad", "rev", "program_id", "debug_callback", "stop_gradient", "copy",
    "get", "swap", "masked_load", "masked_swap", "addupdate",  # ref ops
    "dma_start", "dma_wait", "semaphore_signal", "semaphore_wait",
}
_REDUCE = {"reduce_sum", "reduce_max", "reduce_min", "reduce_and",
           "reduce_or", "reduce_prod", "argmin", "argmax"}


def _aval_elems(aval) -> int:
    n = 1
    for s in getattr(aval, "shape", ()):
        n *= int(s)
    return n


def census_jaxpr(jaxpr, weight: float, counts: dict,
                 while_weight: float, cond_weight: float) -> None:
    """Accumulate per-primitive element-op counts for one jaxpr.

    Scalars (shape ()) count zero — they ride the scalar unit alongside the
    vector stream, the same rule as the hand counts. scan bodies multiply
    by their static trip count; while bodies by ``while_weight`` (the
    measured execution count — e.g. expected live bounce steps per tile);
    cond branches by ``cond_weight`` (measured taken fraction)."""
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "scan":
            census_jaxpr(eqn.params["jaxpr"].jaxpr,
                         weight * eqn.params["length"], counts,
                         while_weight, cond_weight)
        elif name == "while":
            census_jaxpr(eqn.params["cond_jaxpr"].jaxpr,
                         weight * while_weight, counts,
                         while_weight, cond_weight)
            census_jaxpr(eqn.params["body_jaxpr"].jaxpr,
                         weight * while_weight, counts,
                         while_weight, cond_weight)
        elif name == "cond":
            for br in eqn.params["branches"]:
                census_jaxpr(br.jaxpr, weight * cond_weight, counts,
                             while_weight, cond_weight)
        elif name == "pallas_call":
            census_jaxpr(eqn.params["jaxpr"], weight, counts,
                         while_weight, cond_weight)
        elif name in ("jit", "closed_call", "core_call", "custom_jvp_call",
                      "custom_vjp_call", "custom_vjp_call_jaxpr",
                      "remat_call", "checkpoint", "pjit"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                census_jaxpr(getattr(inner, "jaxpr", inner), weight, counts,
                             while_weight, cond_weight)
        elif name in _ELEMWISE:
            elems = max(_aval_elems(v.aval) for v in eqn.outvars)
            if elems > 1:   # scalars ride the scalar unit
                counts[name] = counts.get(name, 0.0) + weight * elems
        elif name == "integer_pow":
            elems = max(_aval_elems(v.aval) for v in eqn.outvars)
            if elems > 1:   # x**k by square-and-multiply
                k = abs(int(eqn.params["y"]))
                cost = max(k.bit_length() - 1 + bin(k).count("1") - 1, 1)
                counts["integer_pow"] = (counts.get("integer_pow", 0.0)
                                         + weight * elems * cost)
        elif name in _REDUCE:
            elems = max(_aval_elems(v.aval) for v in eqn.invars
                        if hasattr(v, "aval"))
            if elems > 1:   # tree of N-1 combines
                counts[name] = counts.get(name, 0.0) + weight * elems
        elif name in _FREE:
            pass
        else:
            counts.setdefault("_unknown:" + name, 0.0)
            counts["_unknown:" + name] += weight * max(
                (_aval_elems(v.aval) for v in eqn.outvars), default=0)
        # keep a rough account of vector loads/stores for the record
        if name in ("get", "swap"):
            elems = max((_aval_elems(v.aval) for v in eqn.outvars),
                        default=0)
            if elems > 1:
                counts["_mem"] = counts.get("_mem", 0.0) + weight * elems


def _find_pallas_jaxpr(jaxpr):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            return eqn.params["jaxpr"]
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", v if hasattr(v, "eqns") else None)
            if inner is not None and hasattr(inner, "eqns"):
                r = _find_pallas_jaxpr(inner)
                if r is not None:
                    return r
    return None


def census_kernel_ops(trace_fn, example_scene, *, while_weight: float,
                      cond_weight: float = 1.0,
                      lanes_per_tile: int) -> dict:
    """Mechanical vector-op census of the pallas kernel inside
    ``trace_fn(scene)``: counts every elementwise primitive in the traced
    kernel jaxpr (exact — the Cornell scans unroll into it), with only the
    bounce while-loop weight (measured live steps per tile) and cond taken
    fraction supplied from residuals. Returns per-lane op counts; the
    uncertainty left is the op->VPU-instruction mapping (Mosaic may fuse a
    few selects/FMAs), well under the hand-count's ±15-20%."""
    import jax

    jx = jax.make_jaxpr(trace_fn)(example_scene)
    kj = _find_pallas_jaxpr(jx.jaxpr)
    if kj is None:
        raise ValueError("no pallas_call found in traced function")
    counts: dict = {}
    census_jaxpr(kj, 1.0, counts, while_weight, cond_weight)
    vector = sum(v for k, v in counts.items()
                 if not k.startswith("_"))
    unknown = sum(v for k, v in counts.items() if k.startswith("_unknown"))
    return {
        "per_lane": vector / lanes_per_tile,
        "per_lane_mem": counts.get("_mem", 0.0) / lanes_per_tile,
        "per_lane_slow": sum(counts.get(k, 0.0) for k in
                             ("div", "sqrt", "rsqrt")) / lanes_per_tile,
        "unknown_frac": unknown / max(vector, 1.0),
        "counts": {k: round(v) for k, v in sorted(
            counts.items(), key=lambda kv: -kv[1])[:12]},
    }


# ---------------------------------------------------------------------------
# Jaxpr critical path: the DEPENDENCY-depth companion to the op census
# (VERDICT r4 task 1 — "settle the backward ceiling question with a
# measurement, not an assertion"). For a kernel whose jaxpr has T counted
# vector ops and critical path D, the average DAG width P = T / D is the
# instruction-level parallelism an in-order VLIW VPU can schedule against op
# latency: time >= max(T / issue_rate, D * latency). A kernel with low P is
# latency-bound no matter how few ops it has — so its fair ceiling is a
# calibration chain with the SAME P, not the ILP-rich K=16 mix chain.
# ---------------------------------------------------------------------------


def _depth_jaxpr(jaxpr, in_depths, ctx, while_weight: float,
                 cond_weight: float, slow_cost: float = 1.0):
    """Longest dependency chain (in counted vector ops) through a jaxpr.

    Returns the depths of the jaxpr's outvars given ``in_depths`` for its
    invars, and tracks the global maximum over every intermediate in
    ``ctx["max"]``. Modeling rules (mirrors ``census_jaxpr``'s counting):
    counted elementwise ops add 1 to their operands' max depth; _FREE /
    scalar ops add 0 but still propagate; reductions add log2(N) (a combine
    tree — optimistic for TPU cross-lane shuffles, which serialize worse,
    so kernel P is if anything *over*-estimated and the derived ceiling
    conservative); scan/while bodies chain serially through their carry
    (delta per iteration x trip count / while_weight); cond takes the max
    branch delta x cond_weight; ref state (get/swap/addupdate) carries
    dependencies through the ref var's entry, modeling serial memory
    dependence through VMEM scratch."""
    from jax._src import core as jcore

    env = {}

    def read(v):
        if isinstance(v, jcore.Literal):
            return 0.0
        return env.get(v, 0.0)

    def write(v, d):
        env[v] = d
        if d > ctx["max"]:
            ctx["max"] = d

    for v, d in zip(jaxpr.invars, in_depths):
        env[v] = float(d)
    for v in jaxpr.constvars:
        env[v] = 0.0

    def body_delta(inner, n_in):
        """Per-iteration depth growth of a loop body, measured with zero
        input depths (the serial growth rate through the carry)."""
        sub = {"max": 0.0}
        _depth_jaxpr(inner, [0.0] * n_in, sub, while_weight, cond_weight,
                     slow_cost)
        return sub["max"]

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        ind = max([read(v) for v in eqn.invars], default=0.0)
        if name == "scan":
            inner = eqn.params["jaxpr"].jaxpr
            d = ind + eqn.params["length"] * body_delta(
                inner, len(inner.invars))
        elif name == "while":
            bj = eqn.params["body_jaxpr"].jaxpr
            cj = eqn.params["cond_jaxpr"].jaxpr
            d = ind + while_weight * (
                body_delta(bj, len(bj.invars))
                + body_delta(cj, len(cj.invars)))
        elif name == "cond":
            d = ind + cond_weight * max(
                body_delta(br.jaxpr, len(br.jaxpr.invars))
                for br in eqn.params["branches"])
        elif name == "pallas_call":
            inner = eqn.params["jaxpr"]
            outs = _depth_jaxpr(inner, [read(v) for v in eqn.invars],
                                ctx, while_weight, cond_weight, slow_cost)
            for v in eqn.outvars:
                write(v, ctx["max"])
            continue
        elif name in ("jit", "closed_call", "core_call", "custom_jvp_call",
                      "custom_vjp_call", "custom_vjp_call_jaxpr",
                      "remat_call", "checkpoint", "pjit"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is None:
                d = ind
            else:
                ij = getattr(inner, "jaxpr", inner)
                outs = _depth_jaxpr(ij, [read(v) for v in eqn.invars],
                                    ctx, while_weight, cond_weight,
                                    slow_cost)
                for v, od in zip(eqn.outvars, outs):
                    write(v, od)
                continue
        elif name in _ELEMWISE:
            elems = max(_aval_elems(v.aval) for v in eqn.outvars)
            cost = (slow_cost if name in ("div", "sqrt", "rsqrt") else 1.0)
            d = ind + (cost if elems > 1 else 0.0)
        elif name == "integer_pow":
            elems = max(_aval_elems(v.aval) for v in eqn.outvars)
            k = abs(int(eqn.params["y"]))
            d = ind + (max(k.bit_length() - 1, 1) if elems > 1 else 0.0)
        elif name in _REDUCE:
            elems = max((_aval_elems(v.aval) for v in eqn.invars
                         if hasattr(v, "aval")), default=1)
            d = ind + (float(np.ceil(np.log2(elems))) if elems > 1 else 0.0)
        elif name in _FREE:
            d = ind
            if name in ("swap", "addupdate", "masked_swap"):
                # writes carry their operand depth into the ref
                ref = eqn.invars[0]
                env[ref] = max(env.get(ref, 0.0), ind)
            elif name in ("get", "masked_load"):
                d = max(ind, env.get(eqn.invars[0], 0.0))
        else:   # unknown: assume one serial op (same rule as the census)
            elems = max((_aval_elems(v.aval) for v in eqn.outvars),
                        default=0)
            d = ind + (1.0 if elems > 1 else 0.0)
        for v in eqn.outvars:
            write(v, d)
    return [read(v) for v in jaxpr.outvars]


def census_critical_path(trace_fn, example_scene, *, while_weight: float,
                         cond_weight: float = 1.0,
                         slow_cost: float = 1.0) -> float:
    """Critical dependency-path length (counted vector ops) of the pallas
    kernel inside ``trace_fn(scene)``, per grid step. Pair with
    ``census_kernel_ops`` (same weights) to get the kernel's average DAG
    width P = ops / depth."""
    import jax

    jx = jax.make_jaxpr(trace_fn)(example_scene)
    kj = _find_pallas_jaxpr(jx.jaxpr)
    if kj is None:
        raise ValueError("no pallas_call found in traced function")
    ctx = {"max": 0.0}
    _depth_jaxpr(kj, [0.0] * len(kj.invars), ctx, while_weight, cond_weight,
                 slow_cost)
    return ctx["max"]


MIX_OPS_PER_ITER = 17   # jaxpr ops per element per iteration of the "mix"
                        # calibration chain below (count them in the body!)


VREG_ELEMS = 8 * 128   # one VPU vector register / instruction covers (8,128)


def _bwdmix_iter(accs, x):
    """One iteration of the BACKWARD-blend calibration chain: 17 jaxpr ops
    per element per accumulator, blended to the replay backward's census
    (~41% select, 24% mul, 18% add, 6% cmp, 4% neg, ~2% div/sqrt):
    7 sel + 4 mul + 3 add + 1 cmp + 1 neg + 1 {sub|div|sqrt} — the slow-op
    slot is div on 5 of K accumulators and sqrt on 1, matching the census
    fractions at K=16 (5/272 = 1.8%, 1/272 = .4%). Shared by the VPU-peak
    chains (``measure_vpu_peak``) and the structure twin
    (``build_bwd_structure_twin``) so both ceilings use the same blend."""
    import jax.numpy as jnp

    out = []
    h = np.float32(0.5)
    for ki, a in enumerate(accs):
        t1 = a * x                    # mul
        m1 = t1 < x                   # cmp
        w1 = jnp.where(m1, t1, a)     # select
        t2 = w1 * h                   # mul
        s1 = t2 + x                   # add
        w2 = jnp.where(m1, s1, t2)    # select
        n1 = -w2                      # neg
        w3 = jnp.where(m1, n1, s1)    # select
        s2 = w3 + t1                  # add
        w4 = jnp.where(m1, s2, w3)    # select
        t3 = w4 * x                   # mul
        w5 = jnp.where(m1, t3, w4)    # select
        s3 = w5 + t2                  # add
        w6 = jnp.where(m1, s3, w5)    # select
        t4 = w6 * h                   # mul
        if ki % 16 in (0, 3, 6, 9, 12):
            sl = s3 / (t4 + np.float32(1.125))   # div
        elif ki % 16 == 15:
            # abs+sqrt = 2 ops — this acc runs 18, so a 17-based per-iter
            # divisor understates the ceiling by <=0.4% at K=16
            sl = jnp.sqrt(jnp.abs(t4))
        else:
            sl = s3 - t4              # sub
        out.append(jnp.where(m1, sl, a))   # select (17)
    return tuple(out)


def measure_vpu_peak(iters: int = 20, ks=()) -> dict:
    """Empirical VPU f32 ceilings of this chip, in vector ops/s (FMA = 1 op).

    Pallas kernels of K *independent* chained op sequences per element on
    VMEM-resident (8,128) tiles, measured with the same slope-timed chained
    harness as bench.time_scalar_fn so tunneled host-fetch latency cancels.
    The headline {"fma", "add", "mix"} entries use K=16 — enough ILP to
    cover op latency (a single dependent chain measures latency instead);
    on a v5e the single-op chains land ~2.2e12 and ~2.8e12 ops/s.

    "mix" is the calibration ceiling for the jaxpr op census
    (``census_kernel_ops``): a chain whose op blend matches the render
    kernel's census distribution (~40% mul, ~20% compare, ~15% add/sub,
    bitwise/select/neg for the rest), COUNTED THE SAME WAY (jaxpr ops per
    element, MIX_OPS_PER_ITER per iteration). Whatever Mosaic fuses or
    co-issues applies to both the kernel and this chain, so
    census-ops/s(kernel) / census-ops/s(mix) is a like-for-like
    utilization — the residual uncertainty is the blend mismatch.

    ``ks``: extra accumulator counts to measure the mix chain at — the
    DEPENDENCY-MATCHED ceiling curve (VERDICT r4 task 1). Each K variant's
    DAG width P (vector instructions per critical-path step, computed by
    the same ``census_critical_path`` machinery used on the render kernels)
    scales with K, so measuring rate(K) maps out ceiling(P): the fair
    ceiling for a latency-bound kernel is the mix chain at ITS OWN P, not
    the ILP-rich K=16 chain. Results land in ``mix_k`` as
    {K: {"rate": ops/s, "P": width}}."""
    import time

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    H = W = 512
    INNER, K16 = 500, 16

    def make_kernel(mode: str, K: int):
        def kernel(x_ref, o_ref):
            x = x_ref[...]
            accs = [x * np.float32(1.0 + 1e-7 * k) for k in range(K)]

            def body(i, accs):
                if mode == "fma":
                    return tuple(a * x + np.float32(1e-7) for a in accs)
                if mode == "add":
                    return tuple(a + x for a in accs)
                if mode == "bwdmix":
                    return _bwdmix_iter(accs, x)
                # mix: MIX_OPS_PER_ITER (17) jaxpr ops per element, blended
                # to the render kernel's census profile:
                # 6 mul, 3 cmp, 2 add, 2 select, 1 sub, 1 neg, 1 and, 1 max
                out = []
                h = np.float32(0.5)
                for a in accs:
                    t1 = a * x                      # mul
                    t2 = t1 * x                     # mul
                    t3 = a * h                      # mul
                    s1 = t1 + t2                    # add
                    m1 = s1 >= t3                   # cmp
                    m2 = t2 < a                     # cmp
                    m3 = m1 & m2                    # and
                    d = t3 - t1                     # sub
                    n1 = -d                         # neg
                    w = jnp.where(m3, n1, t2)       # select
                    t4 = w * x                      # mul
                    t5 = t4 * h                     # mul
                    s2 = w + t5                     # add
                    m4 = s2 != x                    # cmp
                    t6 = jnp.maximum(s2, t4)        # max
                    out.append(jnp.where(m4, t6, a) * np.float32(0.999)
                               )    # select+mul (MIX_OPS_PER_ITER total)
                return tuple(out)

            accs = jax.lax.fori_loop(0, INNER, body, tuple(accs))
            out = accs[0]
            for a in accs[1:]:
                out = out + a
            o_ref[...] = out
        return kernel

    def runner(mode: str, K: int):
        kernel = make_kernel(mode, K)

        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(H // 8, W // 128),
                in_specs=[pl.BlockSpec((8, 128), lambda i, j: (i, j))],
                out_specs=pl.BlockSpec((8, 128), lambda i, j: (i, j)),
                out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            )(x)
        return run

    def rate(mode: str, K: int) -> float:
        run = runner(mode, K)

        def chain(n):
            @jax.jit
            def f(x):
                def body(i, x):
                    return run(x) * np.float32(1e-9) + x * np.float32(0.5)
                return jnp.sum(jax.lax.fori_loop(0, n, body, x))
            return f

        x = jnp.full((H, W), np.float32(0.001 if mode == "add" else 0.99999))
        f1, f2 = chain(iters), chain(2 * iters)

        def best(f):
            float(f(x))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(x))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dt = max(best(f2) - best(f1), 1e-9) / iters
        per_iter = (MIX_OPS_PER_ITER if mode in ("mix", "bwdmix") else 1)
        return H * W * INNER * K * per_iter / dt

    def chain_profile(mode: str, K: int) -> dict:
        """Census (T, D, P) of a calibration chain at K accumulators —
        computed by the SAME machinery applied to the render kernels, so P
        values are directly comparable."""
        run = runner(mode, K)
        x = jnp.zeros((H, W), jnp.float32)
        jx = jax.make_jaxpr(run)(x)
        kj = _find_pallas_jaxpr(jx.jaxpr)
        counts: dict = {}
        census_jaxpr(kj, 1.0, counts, 1.0, 1.0)
        t_elem = sum(v for k, v in counts.items() if not k.startswith("_"))
        ctx = {"max": 0.0}
        _depth_jaxpr(kj, [0.0] * len(kj.invars), ctx, 1.0, 1.0)
        depth = ctx["max"]
        return {"instrs": t_elem / VREG_ELEMS, "depth": depth,
                "P": t_elem / VREG_ELEMS / max(depth, 1.0)}

    def k_curve(mode: str, kvals) -> dict:
        return {K: {"rate": rate(mode, K),
                    **{k: round(v, 2)
                       for k, v in chain_profile(mode, K).items()}}
                for K in kvals}

    out = {"fma": rate("fma", K16), "add": rate("add", K16),
           "mix": rate("mix", K16), "bwdmix": rate("bwdmix", K16)}
    if ks:
        out["mix_k"] = k_curve("mix", ks)
        out["bwdmix_k"] = k_curve("bwdmix", ks)
    return out


def bounce_tile_fracs_from_residuals(res, bounces: int):
    """Exact per-step active-tile fractions from recorded bounce ids: a tile
    executes bounce step b iff any of its lanes is active there."""
    if bounces == 0:
        return []
    bid = np.asarray(res.bounce_id)   # [B, A, H, W]
    B, A, H, W = bid.shape
    hp, wp = -(-H // 8) * 8, -(-W // 128) * 128
    pad = np.full((B, A, hp, wp), -1, bid.dtype)
    pad[:, :, :H, :W] = bid
    tiles = pad.reshape(B, A, hp // 8, 8, wp // 128, 128)
    active = (tiles >= 0).any(axis=(1, 3, 5))     # [B, th, tw]
    return [float(a.mean()) for a in active]


# ---------------------------------------------------------------------------
# Structure-matched backward ceiling (VERDICT r4 task 1, closing measurement).
# The chain-matched ceiling above captures op BLEND and DAG WIDTH but not the
# replay backward's *structural* features — presence-bit while-loops, dynamic
# SMEM/VMEM indexing, the bounce chain's scratch write/read, the per-object
# RMW scatter — whose cost the jaxpr census cannot see (a dynamic gather is
# one "op" that stalls a VLIW pipeline for many). The twin below is a Pallas
# kernel with the replay backward's EXACT loop/memory structure, driven by
# the SAME residual data (real presence words, hit ids, bounce liveness), but
# with the vjp math replaced by bwdmix-blend calibration chains matched, by
# the same census/critical-path machinery, on THREE axes simultaneously:
#   1. total census ops per lane (the op count),
#   2. critical-path DEPTH per grid step (the serial-dependency length —
#      matching total ops alone gave the first twin ~2x the real kernel's
#      ILP width and an unfairly fast ceiling),
#   3. slow-op (div/sqrt/rsqrt) count AND placement: the real vjp's
#      reciprocals are dependency-fed (a div's result is consumed
#      immediately; measured ~16x a regular VPU op when fed), so the twin
#      places the real kernel's on-critical-path slow-op count on its
#      longest accumulator chain and spreads the rest across parallel
#      slots, matching the latency-weighted depth (slow_cost=16).
# Its measured time is the structural speed of light: this chip running
# exactly this dependency structure at the kernel's own op count and blend
# with zero algorithmic waste. Mirrors the differentiation of
# /root/reference/Source/kernels.cl:342-365 (the draw pipeline the replay
# backward transposes).
# ---------------------------------------------------------------------------




def build_bwd_structure_twin(scene, cfg, res, n_obj: int, *,
                             target_per_lane: float, target_depth: float,
                             target_wdepth: float, slow_per_lane: float,
                             live: float, lanes_per_tile: int,
                             slow_cost: float = 16.0,
                             target_avg_vregs: float = 0.0,
                             main_step_ratio: float = 1380.0 / 233.0) -> dict:
    """Structural twin of ``render_bwd._bwd_kernel`` (fast-scatter path).

    Mirrored structure at the real kernel's multiplicities: prim presence
    gather, traced-bound forward bounce chain with 30-row scratch writes,
    reverse chain with scratch reads + the verbatim presence-bit scatter
    (16 masked AA-reductions + one batched dynamic VMEM row RMW per present
    object), 21 dcam tile accumulates, 3 img writes — all driven by the
    REAL residuals (presence words, hit ids, bounce liveness).

    The calibration math is matched on three measured axes of the real
    backward (see the module comment): ``target_per_lane`` census ops,
    ``target_depth`` critical-path ops, and ``target_wdepth`` /
    ``slow_per_lane`` for dependency-fed div/sqrt/rsqrt placement. The
    main chain is PYTHON-UNROLLED (straight-line, like the real vjp code)
    with a per-iteration accumulator count solving the ops-vs-depth system,
    and a div schedule putting the real on-path slow-op count on slot 0's
    serial chain.

    Returns {"scalar_fn", ...meta}; ``scalar_fn(scene)`` is timeable by
    ``bench.time_scalar_fn``; meta carries achieved census/depth so the
    roofline artifact shows the match quality.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .kernels.render_bwd import _DEBRUIJN_LUT, CAM_COLS
    from .kernels.render_fwd import TILE_H, TILE_W

    F = jnp.float32
    A = cfg.aa_rays
    H, W = cfg.height, cfg.width
    assert H % TILE_H == 0 and W % TILE_W == 0, "twin assumes aligned dims"
    B = max(cfg.bounces, 1)
    K_STEP = 4        # step-vjp chain width (inside the live-weighted loop)
    SCR = 30          # chain scratch rows per step (= render_bwd._SCR_LEAVES)

    # --- residual-driven inputs (identical prep to render_replay_bwd) ---
    pid = jnp.asarray(res.prim_id, jnp.int32)             # (A, H, W)
    lit = jnp.asarray(res.lit_cnt, jnp.float32)
    if cfg.bounces > 0:
        bid = jnp.asarray(res.bounce_id, jnp.int32)       # (B, A, H, W)
    else:
        bid = jnp.full((1,) + pid.shape, -1, jnp.int32)
    ids_sites = (jnp.concatenate([pid[None], bid], axis=0)
                 if cfg.bounces > 0 else pid[None])
    sites = ids_sites.shape[0]
    r = ids_sites.reshape(sites, -1, H // TILE_H, TILE_H, W // TILE_W,
                          TILE_W)
    bits = jnp.where(r >= 0,
                     jnp.left_shift(jnp.int32(1), jnp.maximum(r, 0)),
                     jnp.int32(0))
    pres = jax.lax.reduce(bits, jnp.int32(0), jax.lax.bitwise_or,
                          (1, 3, 5)).reshape(sites, -1)
    tab = jnp.asarray(np.linspace(0.1, 0.9, 32 * 17, dtype=np.float32)
                      .reshape(32, 17))
    g0 = jnp.full((3, H, W), 1e-3, jnp.float32)

    def _iter_ops(a, x, use_div, with_mid=False):
        """One 17-op calibration body for ONE accumulator (bwdmix blend);
        the 17th op is div (dependency-fed: consumed next iteration) when
        scheduled, else sub."""
        h = np.float32(0.5)
        t1 = a * x                    # mul
        m1 = t1 < x                   # cmp
        w1 = jnp.where(m1, t1, a)     # select
        t2 = w1 * h                   # mul
        s1 = t2 + x                   # add
        w2 = jnp.where(m1, s1, t2)    # select
        n1 = -w2                      # neg
        w3 = jnp.where(m1, n1, s1)    # select
        s2 = w3 + t1                  # add
        w4 = jnp.where(m1, s2, w3)    # select
        t3 = w4 * x                   # mul
        w5 = jnp.where(m1, t3, w4)    # select
        s3 = w5 + t2                  # add
        w6 = jnp.where(m1, s3, w5)    # select
        t4 = w6 * h                   # mul
        if use_div:
            sl = s3 / (t4 + np.float32(1.125))   # div (slow slot)
        else:
            sl = s3 - t4              # sub
        out = jnp.where(m1, sl, a)    # select (17)
        return (out, s2) if with_mid else out

    def make_kernel(n_main, n_step, slots, div_sched, n_pool=0):
        """slots: accumulator count per unrolled main iteration;
        div_sched: per iteration, the set of slots whose 17th op is div;
        n_pool: snapshots of evolving accumulators kept LIVE to the end of
        the kernel (consumed by the img fold) — a pure live-range
        extension (zero extra chain ops) that matches the twin's average
        working set to the real kernel's measured occupancy (the vjp's
        stored residuals; see census_occupancy)."""

        def main_chain(xs, accs, pool, lo, hi):
            # Unrolled straight-line iterations lo..hi-1 (like the vjp).
            # Each iteration consumes a DIFFERENT gathered-row tile from
            # ``xs`` so the whole row stays live across the chain — the
            # real vjp keeps the gathered row + carries + cotangents live
            # throughout, and that register pressure is part of the
            # structure being mirrored.
            for it in range(lo, hi):
                x = xs[it % len(xs)]
                k = slots[it]
                accs = accs[:k] + [x * np.float32(1.0 + 1e-6 * (it + s))
                                   for s in range(len(accs), k)]
                outs = [_iter_ops(a, x, s in div_sched[it],
                                  with_mid=True)
                        for s, a in enumerate(accs[:k])]
                accs = [o[0] for o in outs]
                # live-range extension: these snapshots would otherwise
                # die within 1-2 iterations; recomputing one later needs
                # the whole chain, so the compiler must keep it resident
                for s in range(len(accs)):
                    if len(pool) < n_pool:
                        pool.append(accs[s])
                    if len(pool) < n_pool:
                        pool.append(outs[s][1])
            return accs

        def step_chain(x):
            accs = tuple(x * np.float32(1.0 + 1e-7 * s)
                         for s in range(K_STEP))
            return jax.lax.fori_loop(
                0, n_step, lambda t, a: _bwdmix_iter(a, x), accs)

        def kernel(tab_ref, pres_ref, lut_ref, g_ref, pid_ref, lit_ref,
                   bid_ref, dobj_ref, dcam_ref, img_ref, chain_scr):
            i, j = pl.program_id(0), pl.program_id(1)
            ncols = pl.num_programs(1)

            @pl.when((i == 0) & (j == 0))
            def _():
                dobj_ref[...] = jnp.zeros(dobj_ref.shape, F)
                dcam_ref[...] = jnp.zeros(dcam_ref.shape, F)

            pid_t = pid_ref[...]
            lit_t = lit_ref[...]
            g = (g_ref[0], g_ref[1], g_ref[2])

            def _lowbit_index(w):
                low = w & (-w)
                h = jax.lax.shift_right_logical(
                    low * jnp.int32(0x077CB531), jnp.int32(27)) & jnp.int32(31)
                return lut_ref[h]

            def gather(site, ids):
                zero_ = jnp.zeros(ids.shape, F)
                init = (zero_,) * 17

                def body(st):
                    w, flat = st
                    o = _lowbit_index(w)
                    m = ids == o
                    flat2 = tuple(jnp.where(m, tab_ref[o, c], flat[c])
                                  for c in range(17))
                    return (w & (w - 1), flat2)

                pres0 = pres_ref[site, i * ncols + j]
                _, flat = jax.lax.while_loop(lambda st: st[0] != 0, body,
                                             (pres0, init))
                return flat

            def scatter_site(site, dflat, ids):
                pres0 = pres_ref[site, i * ncols + j]

                def body(w):
                    o = _lowbit_index(w)
                    mf = (ids == o).astype(F)
                    upd = jnp.stack([jnp.sum(mf * dflat[c % len(dflat)],
                                             axis=0) for c in range(16)])
                    dobj_ref[pl.ds(o, 1)] = dobj_ref[pl.ds(o, 1)] + upd[None]
                    return w & (w - 1)

                jax.lax.while_loop(lambda w: w != 0, body, pres0)

            # prim gather + first half of the main (f1/f3-vjp) chain
            flat0 = gather(0, pid_t)
            x0 = flat0[0] + lit_t * F(1e-6) + g[0][None] * F(1e-3)
            xs = (x0,) + flat0[1:]
            pool = []
            accs = main_chain(xs, [x0], pool, 0, n_main // 2)
            a_mid = accs[0]

            n_live = jnp.int32(0)
            if cfg.bounces > 0:
                for b in range(B):
                    n_live += jnp.where(jnp.max(bid_ref[b]) >= 0, 1, 0
                                        ).astype(jnp.int32)

            # forward bounce chain: gather + 30-row scratch write per step
            def fbody(k, carr):
                ids_k = bid_ref[pl.ds(k, 1)][0]
                flat = gather(1 + k, ids_k)
                chain_scr[pl.ds(k, 1)] = jnp.stack(
                    list(flat) + [carr] * (SCR - 17))[None]
                return carr + flat[0]

            carr = jax.lax.fori_loop(0, n_live, fbody, a_mid)

            # reverse chain: scratch read + step-vjp chain + scatter
            def rbody(i2, dcarr):
                k = n_live - 1 - i2
                ids_k = bid_ref[pl.ds(k, 1)][0]
                scr = chain_scr[pl.ds(k, 1)][0]
                y = dcarr + scr[0]
                sa = step_chain(y)
                scatter_site(1 + k, sa, ids_k)
                return sa[0]

            dcarr = jax.lax.fori_loop(0, n_live, rbody, carr)

            # second half of the main chain + prim scatter + dcam + img
            accs = main_chain(xs, [dcarr + a_mid] + accs[1:], pool,
                              n_main // 2, n_main)
            scatter_site(0, accs, pid_t)
            for c in range(CAM_COLS):
                dcam_ref[c] = (dcam_ref[c] + accs[c % len(accs)][0]
                               + a_mid[0])
            pacc = accs[0]
            for e in pool:              # consume every pooled snapshot
                pacc = pacc + e
            for c in range(3):
                img_ref[c] = accs[c % len(accs)][0] + pacc[0] * F(1e-6)

        return kernel

    def make_call(n_main, n_step, slots, div_sched, n_pool=0):
        kernel = make_kernel(n_main, n_step, slots, div_sched, n_pool)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

        @jax.jit
        def call(g, pid_a, lit_a, bid_a, pres_a, lut_a, tab_a):
            outs = pl.pallas_call(
                kernel,
                grid=(H // TILE_H, W // TILE_W),
                in_specs=[
                    smem(), smem(), smem(),
                    pl.BlockSpec((3, TILE_H, TILE_W), lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((A, TILE_H, TILE_W), lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((A, TILE_H, TILE_W), lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((B, A, TILE_H, TILE_W),
                                 lambda i, j: (0, 0, i, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((n_obj, 16, TILE_H, TILE_W),
                                 lambda i, j: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((CAM_COLS, TILE_H, TILE_W),
                                 lambda i, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, TILE_H, TILE_W), lambda i, j: (0, i, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((n_obj, 16, TILE_H, TILE_W),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((CAM_COLS, TILE_H, TILE_W),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((3, H, W), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((B, SCR, A, TILE_H, TILE_W), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(tab_a, pres_a, lut_a, g, pid_a, lit_a, bid_a)
            dobj, dcam, img = outs
            return (jnp.sum(dobj) * F(1e-9) + jnp.sum(dcam) * F(1e-9)
                    + jnp.sum(img) * F(1e-9))
        return call

    lut = jnp.asarray(_DEBRUIJN_LUT)

    def scalar_for(n_main, n_step, slots, div_sched, n_pool=0):
        call = make_call(n_main, n_step, slots, div_sched, n_pool)

        def scalar_fn(s):
            g = g0 + s.light_pos[0] * F(1e-12)
            return call(g, pid, lit, bid, pres, lut, tab)
        return scalar_fn

    def census_at(n_main, n_step, slots, div_sched, n_pool=0):
        fn = scalar_for(n_main, n_step, slots, div_sched, n_pool)
        c = census_kernel_ops(fn, scene, while_weight=live,
                              lanes_per_tile=lanes_per_tile)["per_lane"]
        d = census_critical_path(fn, scene, while_weight=live)
        return c, d

    # --- sizing: depth first, then ops, then slow-op placement ---
    # structure-only probe (no main chain, one step iter)
    f0, d0 = census_at(0, 1, [], [])
    c2, _ = census_at(0, 3, [], [])
    c2 = (c2 - f0) / 2.0                       # census per step iteration
    # step iters from the hand-count main:step census share
    share_step = 1.0 / (1.0 + main_step_ratio)
    budget = max(target_per_lane - f0, 17.0)
    n_step = (max(1, round(budget * share_step / c2)) if c2 > 1e-9 else 1)
    budget -= n_step * c2
    # main iterations from the critical-path target (17 ops of depth each)
    n_main = max(2, round((target_depth - d0) / 17.0))
    # accumulator slots per iteration from the ops target
    total_slots = max(n_main, round(budget / 17.0))
    base, extra = divmod(total_slots, n_main)
    slots = [base + (1 if i < extra else 0) for i in range(n_main)]
    # slow-op schedule: the real on-path count rides slot 0's serial chain
    on_path = int(np.clip(round((target_wdepth - target_depth)
                                / max(slow_cost - 1.0, 1.0)), 0, n_main))
    n_slow = int(max(round(slow_per_lane), on_path))
    div_sched = [set() for _ in range(n_main)]
    for i in range(on_path):                   # evenly spread on slot 0
        div_sched[(i * n_main) // max(on_path, 1)].add(0)
    left = n_slow - on_path
    it = 0
    while left > 0:                            # rest on parallel slots
        for s in range(1, slots[it % n_main]):
            if left <= 0:
                break
            if s not in div_sched[it % n_main]:
                div_sched[it % n_main].add(s)
                left -= 1
        it += 1
        if it > 4 * n_main:
            break
    # working-set matching: pool snapshots until the twin's eqn-weighted
    # average occupancy reaches the real kernel's (see census_occupancy);
    # the pool's fold ops (one add per snapshot) are paid back out of the
    # chain-slot budget so the census target is preserved
    n_pool = 0
    occ_twin = None
    if target_avg_vregs > 0:
        base_occ = census_occupancy(
            scalar_for(n_main, n_step, slots, div_sched, 0), scene)
        n_pool = int(np.clip(
            round((target_avg_vregs - base_occ["avg_vregs"]) / 4.0),
            0, 2 * sum(slots)))
        total_slots = max(n_main, round((budget - n_pool) / 17.0))
        base, extra = divmod(total_slots, n_main)
        slots = [base + (1 if i < extra else 0) for i in range(n_main)]
        n_pool = min(n_pool, 2 * sum(slots))
        occ_twin = census_occupancy(
            scalar_for(n_main, n_step, slots, div_sched, n_pool), scene)
    achieved_c, achieved_d = census_at(n_main, n_step, slots, div_sched,
                                       n_pool)
    achieved_wd = census_critical_path(
        scalar_for(n_main, n_step, slots, div_sched, n_pool), scene,
        while_weight=live, slow_cost=slow_cost)
    return {"scalar_fn": scalar_for(n_main, n_step, slots, div_sched,
                                    n_pool),
            "n_main": int(n_main), "n_step": int(n_step),
            "slots": slots, "n_pool": n_pool,
            "avg_vregs": (occ_twin or {}).get("avg_vregs"),
            "target_avg_vregs": round(target_avg_vregs, 1),
            "divs": [sorted(d) for d in div_sched],
            "census_per_lane": round(achieved_c, 1),
            "target_per_lane": round(target_per_lane, 1),
            "depth": round(achieved_d, 1),
            "target_depth": round(target_depth, 1),
            "wdepth": round(achieved_wd, 1),
            "target_wdepth": round(target_wdepth, 1),
            "census_match": round(achieved_c / max(target_per_lane, 1e-9),
                                  4),
            "depth_match": round(achieved_d / max(target_depth, 1e-9), 4)}


def census_occupancy(trace_fn, example_scene) -> dict:
    """Live-value (working set) census of the pallas kernel inside
    ``trace_fn(scene)``: linear-scan liveness over the kernel jaxpr,
    counting non-Ref vector values in 4 KB vregs (elems/1024). ``avg`` is
    eqn-weighted mean occupancy at the TOP level of the kernel (loop and
    vjp subgraphs contribute their peak at their call point); ``peak``
    includes subgraph-internal spikes. Approximate — eqn-granularity, not
    cycle-granularity — but computed identically for the real kernel and
    its structure twin, so the COMPARISON is like-for-like. Used to size
    the twin's resident pool (working-set matching, r5)."""
    import jax
    from jax._src import core as jcore

    jx = jax.make_jaxpr(trace_fn)(example_scene)
    kj = _find_pallas_jaxpr(jx.jaxpr)
    if kj is None:
        raise ValueError("no pallas_call found in traced function")

    def vreg(v):
        if "Ref" in type(v.aval).__name__:
            return 0.0
        e = _aval_elems(v.aval)
        return e / 1024.0 if e > 1 else 0.0

    def scan(jaxpr, live_in):
        last_use = {}
        eqns = jaxpr.eqns
        for idx, eqn in enumerate(eqns):
            for v in eqn.invars:
                if not isinstance(v, jcore.Literal):
                    last_use[v] = idx
        for v in jaxpr.outvars:
            if not isinstance(v, jcore.Literal):
                last_use[v] = len(eqns)
        live = {v: vreg(v) for v in list(jaxpr.invars) + list(jaxpr.constvars)
                if v in last_use}
        cur = sum(live.values())
        peak = live_in + cur
        occ_sum = 0.0
        for idx, eqn in enumerate(eqns):
            name = eqn.primitive.name
            inner = None
            if name == "scan":
                inner = eqn.params["jaxpr"].jaxpr
            elif name == "while":
                inner = eqn.params["body_jaxpr"].jaxpr
            elif name == "cond":
                inner = eqn.params["branches"][0].jaxpr
            else:
                p = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
                if p is not None and hasattr(getattr(p, "jaxpr", p), "eqns"):
                    inner = getattr(p, "jaxpr", p)
            for v in eqn.outvars:
                if v in last_use:
                    live[v] = vreg(v)
                    cur += live[v]
            if inner is not None:
                ip, _, _ = scan(inner, live_in + cur)
                peak = max(peak, ip)
            peak = max(peak, live_in + cur)
            occ_sum += cur
            for v in list(eqn.invars) + list(eqn.outvars):
                if (not isinstance(v, jcore.Literal)
                        and last_use.get(v) == idx and v in live):
                    cur -= live.pop(v)
        return peak, occ_sum, len(eqns)

    peak, occ_sum, n = scan(kj, 0.0)
    return {"peak_vregs": round(peak, 1),
            "avg_vregs": round(occ_sum / max(n, 1), 1),
            "top_eqns": n}
