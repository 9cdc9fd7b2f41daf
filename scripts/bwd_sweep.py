#!/usr/bin/env python
"""Diagnose where the fused backward's time goes as bounces grow.

Times fwd and fwd+bwd for the full_1024 workload at bounces in {0,1,2,4,10}
(plus the residual-recording forward alone) with the same dependency-chained
methodology as bench.py. Run on the real chip.
"""
import sys

import jax

sys.path.insert(0, ".")
import uob_raytracer_tpu as rt  # noqa: E402
from bench import _fwd_scalar, _step_scalar, _quads_for, time_scalar_fn  # noqa: E402

scene = rt.cornell_box()
quads = _quads_for(scene, "pallas")

for b in (0, 1, 2, 4, 10):
    cfg = rt.RenderConfig(width=1024, height=1024, aa_x=2, aa_y=2,
                          shadow_samples=10, bounces=b)
    dt_f = time_scalar_fn(_fwd_scalar(cfg, "pallas", quads), scene, 6)
    dt_s = time_scalar_fn(_step_scalar(cfg, "pallas", quads), scene, 4)

    # forward with residual recording (what the custom_vjp fwd actually runs)
    def res_scalar(s, cfg=cfg):
        # the pallas_call still materializes every residual output; summing
        # the image alone keeps the program scalar-valued for the timer
        from uob_raytracer_tpu.kernels.render_fwd import render_fused_res
        img, _, res = render_fused_res(s, cfg, quads=quads)
        return img.sum()

    dt_r = time_scalar_fn(jax.jit(res_scalar), scene, 6)
    print(f"b={b:2d}: fwd {dt_f*1e3:7.2f} ms | fwd+res {dt_r*1e3:7.2f} ms | "
          f"fwd+bwd {dt_s*1e3:7.2f} ms | bwd-only ~{(dt_s-dt_r)*1e3:7.2f} ms",
          flush=True)
