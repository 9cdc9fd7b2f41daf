#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line with the headline metric:

    rays/s/chip fwd+bwd (Cornell Box 512^2, 1 bounce)

(the BASELINE.json metric). Rays are *logical* reference-semantics ray-scene
queries: primary rays + per-shaded-ray shadow samples + bounce re-intersects,
counted from an instrumented forward pass — not padded/wavefront lanes.
Auxiliary numbers (forward-only rays/s, frame times, per-config breakdown)
go to stderr.

Usage: python bench.py [--width N] [--bounces N] [--samples N] [--iters N]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import uob_raytracer_tpu as rt
from uob_raytracer_tpu.ops.camera import gen_primary_rays
from uob_raytracer_tpu.ops.intersect import intersect, prepare_scene
from uob_raytracer_tpu.ops.shading import trace_specular
from uob_raytracer_tpu.render import render_image

TARGET_RAYS_PER_S = 1.0e9  # BASELINE.json north-star target on v5e


@functools.partial(jax.jit, static_argnames=("cfg",))
def _ray_count_stats(scene, cfg):
    ds = prepare_scene(scene)
    dirs, gid = gen_primary_rays(cfg, scene.yaw, scene.pitch)
    d = dirs.reshape(-1, 3)
    start = jnp.broadcast_to(ds.camera_pos, (d.shape[0], 3))
    h = intersect(ds, start, d)
    prim_diffuse = h.hit & (h.mat > 0)
    if cfg.bounces > 0:
        term = trace_specular(ds, cfg, h, d)
        n_bounce = term["bounce_rays"]
        shaded = prim_diffuse | term["term_valid"]
    else:
        n_bounce = jnp.int32(0)
        shaded = prim_diffuse
    return n_bounce, jnp.sum(shaded.astype(jnp.int32))


def logical_ray_count(scene, cfg) -> int:
    """Reference-semantics ray-query count for one frame: primary rays,
    shadow samples for every shaded ray (primary-diffuse or bounce-terminal,
    kernels.cl:313-340), and one re-intersect per live bounce iteration."""
    n_bounce, n_shaded = _ray_count_stats(scene, cfg)
    n_primary = cfg.width * cfg.height * cfg.aa_rays
    return n_primary + int(n_shaded) * cfg.shadow_samples + int(n_bounce)


def time_scalar_fn(scalar_fn, scene, iters: int) -> float:
    """Time ``scalar_fn(scene) -> f32 scalar`` per call, robustly.

    The per-iteration work is chained inside ONE jitted fori_loop — each
    iteration perturbs the scene by a value depending on the previous
    result, so XLA cannot hoist or deduplicate it — and the final scalar is
    fetched to the host, which forces completion even on backends whose
    block_until_ready is optimistic (the axon TPU tunnel).

    The host fetch itself costs a large FIXED latency on tunneled backends
    (~28 ms through axon, independent of the work inside the loop), so the
    per-iteration time is estimated as the SLOPE between an N-iteration and
    a 2N-iteration run: (T(2N) - T(N)) / N cancels every per-fetch constant
    and measures pure device throughput. Both points are re-measured three
    times and the minimum is used (scheduler noise is one-sided)."""
    import dataclasses

    def make_run(n):
        @jax.jit
        def run(s):
            def body(_, carry):
                acc, s2 = carry
                s3 = dataclasses.replace(
                    s2, light_pos=s2.light_pos + acc * 1e-12 + 1e-6)
                return acc + scalar_fn(s3), s3
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), s))
            return acc
        return run

    run1, run2 = make_run(iters), make_run(2 * iters)

    def best(run):
        float(run(scene))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(scene))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = best(run1), best(run2)
    return max(t2 - t1, 1e-9) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--bounces", type=int, default=1)
    p.add_argument("--samples", type=int, default=10)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--backend", default="auto")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of one fwd+bwd step "
                        "into DIR (view in TensorBoard/Perfetto)")
    args = p.parse_args()

    h = args.height or args.width
    cfg = rt.RenderConfig(width=args.width, height=h, aa_x=2, aa_y=2,
                          shadow_samples=args.samples, bounces=args.bounces)
    scene = rt.cornell_box()
    dev = jax.devices()[0]
    print(f"# device: {dev}, backend: {jax.default_backend()}",
          file=sys.stderr)

    rays = logical_ray_count(scene, cfg)
    print(f"# logical rays/frame: {rays:,} "
          f"({cfg.width}x{cfg.height} aa{cfg.aa_rays} "
          f"s{cfg.shadow_samples} b{cfg.bounces})", file=sys.stderr)

    # forward-only (fused Pallas kernel on accelerators)
    dt_fwd = time_scalar_fn(
        lambda s: jnp.mean(render_image(s, cfg, backend=args.backend)),
        scene, args.iters)
    print(f"# forward: {dt_fwd*1e3:.2f} ms/frame = {rays/dt_fwd:.3e} rays/s",
          file=sys.stderr)

    # forward+backward: gradient of a scalar image loss w.r.t. every scene
    # parameter (vertices, colors, light, camera)
    def loss_grad(s):
        v, g = jax.value_and_grad(
            lambda ss: jnp.mean(render_image(ss, cfg,
                                             backend=args.backend)))(s)
        # fold a bit of every gradient leaf into the timed scalar so the
        # whole backward pass is live
        return v + sum(jnp.sum(x) * 1e-12
                       for x in jax.tree_util.tree_leaves(g))

    dt_step = time_scalar_fn(loss_grad, scene, max(5, args.iters // 2))
    print(f"# fwd+bwd: {dt_step*1e3:.2f} ms/step = {rays/dt_step:.3e} rays/s",
          file=sys.stderr)

    if args.profile:
        with jax.profiler.trace(args.profile):
            jax.block_until_ready(jax.jit(loss_grad)(scene))
        print(f"# profiler trace written to {args.profile}", file=sys.stderr)

    value = rays / dt_step
    print(json.dumps({
        "metric": f"rays/s/chip fwd+bwd (Cornell Box {cfg.width}^2, "
                  f"{cfg.bounces} bounce)",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / TARGET_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()
