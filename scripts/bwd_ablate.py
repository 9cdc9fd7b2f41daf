#!/usr/bin/env python
"""Component ablation of the fused replay backward (bench evidence tool).

Times render_replay_bwd alone at the headline config with each
RAYTPU_BWD_ABLATE component zeroed (scatter / chain / dcam — see
kernels/render_bwd.py), using the same slope-timed methodology as bench.py.
Each setting retraces (ablate is a static argument), so one process can
sweep them all. Gradients are WRONG under ablation — bench use only.

Round-5 final numbers (v5e, 512^2 aa4 s10 b1; 75-pass timing windows),
after the division-lean vjp arithmetic, the presence-bit-loop
gather/scatter with the unified object table, and the pytree chain
carries. Components are non-additive: ablations free XLA/Mosaic to
reschedule what remains.

    none                0.39 ms     (r4: 0.52, r3: 1.91)
    -scatter            0.34
    -chain              0.31
    -dcam               0.38
    -scatter,dcam       0.23
    -all three          0.18        (the core f1/f3 vjp compute)
"""
import sys
import warnings

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from uob_raytracer_tpu.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import os  # noqa: E402

import uob_raytracer_tpu as rt  # noqa: E402
from bench import time_scalar_fn  # noqa: E402
from uob_raytracer_tpu.kernels.render_bwd import render_replay_bwd  # noqa: E402
from uob_raytracer_tpu.kernels.render_fwd import render_fused_res  # noqa: E402

warnings.filterwarnings("ignore")   # the intentional ablation warning

scene = rt.cornell_box()
cfg = rt.RenderConfig(width=512, height=512, aa_x=2, aa_y=2,
                      shadow_samples=10, bounces=1)
_, _, res = render_fused_res(scene, cfg)
res = jax.tree_util.tree_map(jax.device_put, res)
g0 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32) + 1e-3

for ab in ["", "scatter", "chain", "dcam", "scatter,dcam",
           "scatter,chain,dcam"]:
    os.environ["RAYTPU_BWD_ABLATE"] = ab

    def bwd_scalar(s):
        g = render_replay_bwd(s, cfg, res, g0)
        return sum(jnp.sum(x) * 1e-9 for x in jax.tree_util.tree_leaves(g))

    dt = time_scalar_fn(bwd_scalar, scene, 75)
    print(f"ablate={ab or 'none':>18s}: bwd {dt*1e3:.3f} ms "
          f"±{dt.spread:.0%}", flush=True)
os.environ.pop("RAYTPU_BWD_ABLATE", None)
