"""Tests for the roofline machinery in flops.py — the op census, the
critical-path (dependency depth) analysis, the occupancy (liveness)
census, and the backward structure-twin builder (VERDICT r4 task 1).

All of these only TRACE pallas kernels (jax.make_jaxpr — no execution),
so they run on the CPU suite; the twin's on-chip timing happens in
bench.py --roofline.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from uob_raytracer_tpu.flops import (census_critical_path,
                                     census_kernel_ops, census_occupancy)


def _tiny_pallas(kernel):
    """Wrap a (x_ref, o_ref) kernel over one (8,128) tile as fn(scene)."""
    def fn(_scene):
        x = jnp.ones((8, 128), jnp.float32)
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(x)
    return fn


def test_census_counts_known_kernel(cornell):
    # 5 muls + 3 adds per element -> exactly 8 census ops/lane
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        y = x
        for _ in range(5):
            y = y * x
        for _ in range(3):
            y = y + x
        o_ref[...] = y

    c = census_kernel_ops(_tiny_pallas(kernel), cornell,
                          while_weight=1.0, lanes_per_tile=8 * 128)
    assert c["per_lane"] == pytest.approx(8.0)
    assert c["unknown_frac"] == 0.0
    assert c["per_lane_slow"] == 0.0


def test_critical_path_serial_vs_parallel(cornell):
    # serial chain of 6 ops -> depth 6; 8 parallel ops + 3-level combine
    # tree -> depth 4 (same op-count ballpark, very different depth)
    def serial(x_ref, o_ref):
        x = x_ref[...]
        y = x
        for _ in range(6):
            y = y * x
        o_ref[...] = y

    def parallel(x_ref, o_ref):
        x = x_ref[...]
        parts = [x * np.float32(1.0 + i) for i in range(8)]   # depth 1
        while len(parts) > 1:                                 # +3 levels
            parts = [a + b for a, b in zip(parts[::2], parts[1::2])]
        o_ref[...] = parts[0]

    ds = census_critical_path(_tiny_pallas(serial), cornell,
                              while_weight=1.0)
    dp = census_critical_path(_tiny_pallas(parallel), cornell,
                              while_weight=1.0)
    assert ds == pytest.approx(6.0)
    assert dp == pytest.approx(4.0)


def test_critical_path_slow_cost_weights_divs(cornell):
    # chain: mul -> div -> mul. depth=3 unweighted; div costing 16 -> 18
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = (x * x) / (x + np.float32(2.0)) * x

    d1 = census_critical_path(_tiny_pallas(kernel), cornell,
                              while_weight=1.0)
    d16 = census_critical_path(_tiny_pallas(kernel), cornell,
                               while_weight=1.0, slow_cost=16.0)
    assert d16 - d1 == pytest.approx(15.0)


def test_census_occupancy_sees_resident_values(cornell):
    # hold K snapshots of an evolving chain live to the end: peak must
    # grow by ~1 vreg per extra snapshot ((8,128) f32 = 1 vreg)
    def make(n_hold):
        def kernel(x_ref, o_ref):
            x = x_ref[...]
            y = x
            held = []
            for i in range(12):
                y = y * x + np.float32(1e-6)
                if len(held) < n_hold:
                    held.append(y)
            for h in held:
                y = y + h
            o_ref[...] = y
        return kernel

    small = census_occupancy(_tiny_pallas(make(1)), cornell)
    big = census_occupancy(_tiny_pallas(make(10)), cornell)
    assert big["peak_vregs"] - small["peak_vregs"] == pytest.approx(9.0)
    assert big["avg_vregs"] > small["avg_vregs"]


def test_structure_twin_matches_targets(cornell):
    """The twin builder solves its chain sizes so the twin's own census
    and depth (counted by the same machinery) land on the requested
    targets. Build-only — tracing, no TPU execution."""
    import uob_raytracer_tpu as rt
    from uob_raytracer_tpu.flops import (bounce_tile_fracs_from_residuals,
                                         build_bwd_structure_twin)
    from uob_raytracer_tpu.kernels.render_fwd import render_fused_res

    cfg = rt.RenderConfig(width=128, height=16, aa_x=2, aa_y=2,
                          shadow_samples=2, bounces=1)
    _, _, res = render_fused_res(cornell, cfg)
    live = float(np.sum(bounce_tile_fracs_from_residuals(res, cfg.bounces)))
    twin = build_bwd_structure_twin(
        cornell, cfg, res, 28, target_per_lane=800.0, target_depth=200.0,
        target_wdepth=290.0, slow_per_lane=14.0, live=live,
        lanes_per_tile=cfg.aa_rays * 8 * 128, target_avg_vregs=100.0)
    # census within 10% of target; depth at least the target (the twin
    # may overshoot — conservative ceiling — but never undershoot by >10%)
    assert 0.9 < twin["census_match"] < 1.1
    assert twin["depth"] > 0.9 * twin["target_depth"]
    assert twin["wdepth"] > twin["depth"]          # divs are on the path
    assert twin["n_pool"] > 0                      # occupancy pool engaged
