#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line with the headline metric:

    rays/s/chip fwd+bwd (Cornell Box 512^2, 1 bounce)

(the BASELINE.json metric), with per-BASELINE-config numbers embedded under
"configs". Rays are *logical* reference-semantics ray-scene queries: primary
rays + per-shaded-ray shadow samples + bounce re-intersects, counted from an
instrumented forward pass — not padded/wavefront lanes. Human-readable
breakdowns go to stderr.

Usage:
    python bench.py                     # headline + all five BASELINE configs
    python bench.py --headline-only     # just the headline metric
    python bench.py --config full_1024  # one named BASELINE config
    python bench.py --scaling           # dp-sharded scaling efficiency sweep
    python bench.py --profile DIR       # jax.profiler trace of one step
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

import uob_raytracer_tpu as rt
from uob_raytracer_tpu.config import baseline_configs
from uob_raytracer_tpu.ops.camera import gen_primary_rays
from uob_raytracer_tpu.ops.intersect import intersect, prepare_scene
from uob_raytracer_tpu.ops.shading import trace_specular
from uob_raytracer_tpu.render import render_image

TARGET_RAYS_PER_S = 1.0e9  # BASELINE.json north-star target on v5e


@functools.partial(jax.jit, static_argnames=("cfg",))
def _ray_count_stats(scene, cfg):
    # Chunk the [rays, tris] instrumented pass like render_flat does —
    # unchunked, XLA's (8,128)-tiled layout pads the [4M, 3] ray arrays 42x
    # and a 1024x1024 aa4 frame blows past HBM.
    from uob_raytracer_tpu.render import _pick_chunk_rows
    ds = prepare_scene(scene)
    dirs, gid = gen_primary_rays(cfg, scene.yaw, scene.pitch)
    A = dirs.shape[2]
    chunk_rows = _pick_chunk_rows(cfg)
    # large-scene guard: the instrumented jnp pass materializes [rays,
    # n_tri] intermediates — cap chunks at ~2^27 elements (0.5 GB f32)
    n_tri = scene.tri_v0.shape[0]
    while (chunk_rows > 8 and cfg.height % (chunk_rows // 2) == 0
           and chunk_rows * cfg.width * A * n_tri > 2 ** 27):
        chunk_rows //= 2
    n_chunks = cfg.height // chunk_rows
    d_flat = dirs.reshape(n_chunks, chunk_rows * cfg.width * A, 3)

    def per_chunk(d):
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

    if n_chunks == 1:
        return per_chunk(d_flat[0])
    nb, ns = jax.lax.map(per_chunk, d_flat)
    return jnp.sum(nb), jnp.sum(ns)


def logical_ray_count(scene, cfg) -> int:
    """Reference-semantics ray-query count for one frame: primary rays,
    shadow samples for every shaded ray (primary-diffuse or bounce-terminal,
    kernels.cl:313-340), and one re-intersect per live bounce iteration."""
    n_bounce, n_shaded = _ray_count_stats(scene, cfg)
    n_primary = cfg.width * cfg.height * cfg.aa_rays
    return n_primary + int(n_shaded) * cfg.shadow_samples + int(n_bounce)


# A slope is resolvable only when each timing point holds enough device
# work to stand clear of the tunnel's burst noise: the flag is on the
# per-POINT window (iters x per-call time), not the per-call time itself.
# r4 flagged cpu_ref_256 on a bare per-call floor even though its ~240
# chained frames put 30 ms of work in every timing point — which resolves
# the per-frame slope to a few percent just like any other config.
RESOLUTION_WINDOW_S = 8e-3


class Timing(float):
    """A p50 per-call time (seconds) carrying its run-to-run spread.

    Subclasses float so existing arithmetic (slope differences, rays/s)
    keeps working. ``spread`` is (max - min) / p50 over the slope
    estimates that survive outlier rejection; ``n_rejected`` counts the
    rejected ones and ``below_resolution`` marks measurements whose
    timed window was under the harness floor (RESOLUTION_WINDOW_S)."""

    def __new__(cls, p50: float, spread: float, window_s: float = 1.0,
                n_rejected: int = 0):
        self = super().__new__(cls, p50)
        self.spread = spread
        self.n_rejected = n_rejected
        self.below_resolution = window_s < RESOLUTION_WINDOW_S
        return self

    def ms_dict(self) -> dict:
        d = {"p50": round(self * 1e3, 4), "spread": round(self.spread, 4)}
        if self.n_rejected:
            d["outliers_rejected"] = self.n_rejected
        if self.below_resolution:
            d["below_resolution"] = True
        return d


def time_scalar_fn(scalar_fn, scene, iters: int,
                   n_estimates: int = 7) -> Timing:
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
    and measures pure device throughput. ``n_estimates`` independent slope
    estimates are taken, each from an adjacent interleaved (N, 2N) pair of
    min-of-2 timings so host drift hits both points of a pair alike.

    Robustness (r4 verdict: driver-host captures showed 16-30% spreads
    while quiet-host runs sat at <=8%): a non-quiet host injects occasional
    multi-ms bursts into single timing points, which shows up as a few
    wild slope estimates among tight ones. Estimates farther than
    3 x MAD-sigma (or 5% of the median, whichever is larger) from the
    median are rejected as burst-contaminated, and the reported p50/spread
    come from the surviving set (the rejection count is carried on the
    result — a capture that rejects most of its estimates is suspect and
    says so). The trip count is a traced argument, so every point shares
    one compiled program."""
    import dataclasses
    import statistics

    @jax.jit
    def run(s, n):
        def body(_, carry):
            acc, s2 = carry
            s3 = dataclasses.replace(
                s2, light_pos=s2.light_pos + acc * 1e-12 + 1e-6)
            return acc + scalar_fn(s3), s3
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), s))
        return acc

    def once(n):
        t0 = time.perf_counter()
        float(run(scene, n))
        return time.perf_counter() - t0

    float(run(scene, iters))       # compile + warm (same program for 2N)
    float(run(scene, 2 * iters))
    slopes = []
    for _ in range(n_estimates):
        t1 = min(once(iters) for _ in range(2))
        t2 = min(once(2 * iters) for _ in range(2))
        slopes.append(max(t2 - t1, 1e-9) / iters)
    p50, spread, n_rejected = robust_slope_stats(slopes)
    return Timing(p50, spread, window_s=p50 * iters,
                  n_rejected=n_rejected)


def robust_slope_stats(slopes) -> tuple:
    """(p50, spread, n_rejected) of a set of slope estimates under
    MAD-based burst rejection — the pure math of ``time_scalar_fn``,
    factored out so the rejection contract is unit-testable without a
    device (tests/test_bench_stats.py).

    Estimates farther than 3 MAD-sigma from the median are rejected as
    burst-contaminated; the 5%-of-median floor keeps legitimate
    few-percent scatter from being trimmed into a fake-tight spread. If
    rejection leaves fewer than 3 estimates (degenerate MAD, e.g. a
    bimodal set), the min and max are dropped instead and the rest kept —
    a capture that rejects most of its estimates is suspect, and says so
    through ``n_rejected``."""
    import statistics

    med = statistics.median(slopes)
    mad_sigma = 1.4826 * statistics.median(abs(s - med) for s in slopes)
    bound = max(3.0 * mad_sigma, 0.05 * med)
    kept = [s for s in slopes if abs(s - med) <= bound]
    if len(kept) < 3:              # degenerate MAD: keep the central
        kept = sorted(slopes)[1:-1] or list(slopes)   # estimates instead
    p50 = statistics.median(kept)
    spread = (max(kept) - min(kept)) / p50
    return p50, spread, len(slopes) - len(kept)


def _quads_for(scene, backend):
    """Quad-merged occlusion pairing (production default on the pallas
    path: halves the shadow scan on Cornell — see ops/quads.py)."""
    if backend == "jnp":
        return None
    from uob_raytracer_tpu.ops.quads import detect_shadow_quads
    return detect_shadow_quads(scene)


def _fwd_scalar(cfg, backend, quads=None):
    return lambda s: jnp.mean(render_image(s, cfg, backend=backend,
                                           shadow_quads=quads))


def _step_scalar(cfg, backend, quads=None):
    """Forward+backward: gradient of a scalar image loss w.r.t. every scene
    parameter (vertices, colors, light, camera); a bit of every gradient
    leaf is folded into the timed scalar so the whole backward stays live."""
    def loss_grad(s):
        v, g = jax.value_and_grad(
            lambda ss: jnp.mean(render_image(ss, cfg, backend=backend,
                                             shadow_quads=quads)))(s)
        return v + sum(jnp.sum(x) * 1e-12
                       for x in jax.tree_util.tree_leaves(g))
    return loss_grad


def assert_finite_grads(cfg, backend, quads, scene) -> None:
    """Evaluate the gradient once and require every leaf finite BEFORE any
    fwd+bwd timing is trusted: NaN-poisoned gradients make the chained
    bench silently CHEAPER (the scene perturbation goes NaN and later
    frames short-circuit) — the failure mode that corrupted the round-2
    numbers via the tangent-ray NaN bug."""
    import numpy as np
    g = jax.grad(lambda ss: jnp.mean(render_image(ss, cfg, backend=backend,
                                                  shadow_quads=quads)))(scene)
    bad = [f"Scene.{name}"
           for name, leaf in vars(g).items()
           if not bool(np.isfinite(np.asarray(leaf)).all())]
    if bad:
        raise AssertionError(
            f"non-finite gradient leaves {bad} — fwd+bwd timings would be "
            f"meaningless (NaN scenes render cheaper); refusing to bench")


def _rate(rays: int, dt: Timing):
    """rays/s from a Timing, or None when under the measurement floor."""
    return None if dt.below_resolution else round(rays / dt)


def _adaptive_iters(scalar_fn, scene, lo: int = 8, hi: int = 400,
                    target_s: float = 0.03) -> int:
    """Pick a chained-loop trip count so each timing point holds ~30 ms of
    device work: sub-ms frames at the default 7 iterations left the slope
    inside the tunnel's burst noise (r4 observed ±100%+ spreads on the
    aa1 512^2 configs while the >8 ms configs sat at ±7%)."""
    rough = time_scalar_fn(scalar_fn, scene, lo, n_estimates=2)
    return max(lo, min(hi, int(target_s / max(float(rough), 2e-5))))


def bench_config(name: str, cfg, scene, iters: int, backend: str) -> dict:
    rays = logical_ray_count(scene, cfg)
    quads = None if cfg.cpu_ref else _quads_for(scene, backend)
    assert_finite_grads(cfg, backend, quads, scene)
    fwd_fn = _fwd_scalar(cfg, backend, quads)
    step_fn = _step_scalar(cfg, backend, quads)
    # 9 slope estimates per reported config number (headline uses 7): the
    # per-config table is the BENCH contract, so give the MAD rejection
    # two more samples of headroom toward the <=10% spread budget
    dt_fwd = time_scalar_fn(fwd_fn, scene,
                            _adaptive_iters(fwd_fn, scene, lo=iters),
                            n_estimates=9)
    dt_step = time_scalar_fn(step_fn, scene,
                             _adaptive_iters(step_fn, scene,
                                             lo=max(4, iters // 2)),
                             n_estimates=9)
    out = {
        "rays_per_frame": rays,
        "grads_finite": True,
        "fwd_ms": dt_fwd.ms_dict(),
        "fwd_rays_s": _rate(rays, dt_fwd),
        "fwd_bwd_ms": dt_step.ms_dict(),
        "fwd_bwd_rays_s": _rate(rays, dt_step),
    }

    def _g(r):
        return "below measurement floor" if r is None else f"{r/1e9:.2f} G rays/s"
    print(f"# {name}: {cfg.width}x{cfg.height} aa{cfg.aa_rays} "
          f"s{cfg.shadow_samples} b{cfg.bounces} | {rays:,} rays | "
          f"fwd {out['fwd_ms']['p50']} ms ±{dt_fwd.spread:.0%} "
          f"({_g(out['fwd_rays_s'])}) | "
          f"fwd+bwd {out['fwd_bwd_ms']['p50']} ms ±{dt_step.spread:.0%} "
          f"({_g(out['fwd_bwd_rays_s'])})", file=sys.stderr)
    return out


def dense_scene(n_tri: int, seed: int = 1):
    """Cornell box + random small diffuse triangles inside it — the
    large-scene workload for the streamed (HBM-resident, DMA-blocked)
    kernel; same recipe as tests/test_pallas.py::_dense_scene."""
    import numpy as np

    from uob_raytracer_tpu.scene import add_triangles
    base = rt.cornell_box()
    rng = np.random.RandomState(seed)
    extra = n_tri - int(base.tri_v0.shape[0])
    c = (rng.uniform(-0.9, 0.9, (extra, 3)).astype(np.float32)
         * np.float32([1, 1, 0.3]))
    c[:, 2] -= 0.2
    verts = np.stack(
        [c, c + rng.uniform(0.01, 0.05, (extra, 3)).astype(np.float32),
         c + rng.uniform(0.01, 0.05, (extra, 3)).astype(np.float32)], axis=1)
    return add_triangles(base, verts, np.full((extra, 3), 0.6, np.float32),
                         np.ones((extra,), np.float32))


# the streamed large-scene benchmark config (VERDICT r3 task 7): 8k
# brute-force triangles through the DMA-blocked kernel at 128^2 aa4
STREAMED_BENCH_TRIS = 8192


def streamed_bench_cfg():
    return rt.RenderConfig(width=128, height=128, aa_x=2, aa_y=2,
                           shadow_samples=3, bounces=2)


def bench_crossover(iters: int = 8) -> dict:
    """SMEM-vs-streamed forward crossover curve (VERDICT r4 task 6):
    render dense scenes of growing triangle count through BOTH kernels —
    the whole-table-in-SMEM kernel and the HBM-streamed DMA-blocked one —
    wherever each compiles, so MAX_SMEM_TRIANGLES is set from data instead
    of a single anecdote. Kernel choice is pinned per measurement via
    RAYTPU_FORCE_KERNEL (read at trace time in render_fwd._use_streamed)."""
    import os

    cfg = streamed_bench_cfg()
    sizes = [26, 128, 256, 512, 768, 1024, 1536, 2048, 4096, 8192]
    points = []
    for n in sizes:
        scene = rt.cornell_box() if n == 26 else dense_scene(n)
        quads = _quads_for(scene, "pallas")
        rays = logical_ray_count(scene, cfg)
        row = {"n_tri": int(scene.tri_v0.shape[0]), "rays": rays}
        for mode in ("smem", "streamed"):
            os.environ["RAYTPU_FORCE_KERNEL"] = mode
            try:
                fn = _fwd_scalar(cfg, "pallas", quads)
                dt = time_scalar_fn(fn, scene,
                                    _adaptive_iters(fn, scene, lo=iters))
                row[mode] = dt.ms_dict()
                row[mode]["rays_s"] = _rate(rays, dt)
            except Exception as e:   # SMEM capacity: record, keep sweeping
                row[mode] = {"failed": f"{type(e).__name__}"}
                print(f"# crossover {n} {mode}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", file=sys.stderr)
            finally:
                os.environ.pop("RAYTPU_FORCE_KERNEL", None)
        points.append(row)

        def _fmt(v):
            return (f"{v['p50']} ms" if "p50" in v
                    else v.get("failed", "?"))
        print(f"# crossover {row['n_tri']:5d} tris: "
              f"smem {_fmt(row['smem'])} | streamed {_fmt(row['streamed'])}",
              file=sys.stderr)
    return {"config": f"{cfg.width}x{cfg.height} aa{cfg.aa_rays} "
                      f"s{cfg.shadow_samples} b{cfg.bounces}",
            "method": "forward, median-of-slope timing; kernel pinned via "
                      "RAYTPU_FORCE_KERNEL; quad-merged occlusion in both",
            "points": points}


def bench_scaling(scene, iters: int) -> dict:
    """dp-sharded fwd+bwd over 1..n_devices chips: per-chip scaling
    efficiency eff(N) = T(1) / (N * T(N)) at fixed total work (one frame).
    On a single-chip environment this exercises plumbing only (dp=1)."""
    from uob_raytracer_tpu.parallel import make_mesh, image_loss

    n_dev = len(jax.devices())
    dps = sorted({1, 2, n_dev} & set(range(1, n_dev + 1))) if n_dev > 1 else [1]
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    h = 512 if 512 % (8 * n_dev) == 0 else 8 * n_dev * (512 // (8 * n_dev) + 1)
    cfg = rt.RenderConfig(width=512, height=h, aa_x=2, aa_y=2,
                          shadow_samples=10, bounces=1)
    rays = logical_ray_count(scene, cfg)
    quads = _quads_for(scene, backend)   # per-shard headline kernel
    results = {}
    t1 = None
    for dp in dps:
        mesh = make_mesh(dp=dp, tp=1, devices=jax.devices()[:dp])

        def loss_grad(s, mesh=mesh):
            v, g = jax.value_and_grad(image_loss)(
                s, jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
                cfg, mesh, backend, quads)
            return v + sum(jnp.sum(x) * 1e-12
                           for x in jax.tree_util.tree_leaves(g))

        dt = time_scalar_fn(loss_grad, scene, iters)
        if t1 is None:
            t1 = dt
        eff = t1 / (dp * dt)
        results[f"dp{dp}"] = {"fwd_bwd_ms": round(dt * 1e3, 3),
                              "rays_s": round(rays / dt),
                              "efficiency": round(eff, 4)}
        print(f"# scaling dp={dp}: {dt*1e3:.2f} ms/step "
              f"({rays/dt:.3e} rays/s, efficiency {eff:.1%})",
              file=sys.stderr)
    return results


_MULTIHOST_WORKER = """
import dataclasses, json, sys, time
import numpy as np

num, pid, port, rows, iters = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3], int(sys.argv[4]),
                               int(sys.argv[5]))
import jax
if num > 1:
    from uob_raytracer_tpu.parallel import initialize_multihost
    initialize_multihost(coordinator=f"127.0.0.1:{port}", num_processes=num,
                         process_id=pid, timeout_s=60)
import jax.numpy as jnp
import uob_raytracer_tpu as rt
from uob_raytracer_tpu.parallel import make_mesh, image_loss

mesh = make_mesh(dp=len(jax.devices()))
dp = mesh.shape["dp"]
cfg = rt.RenderConfig(width=256, height=rows * dp, aa_x=2, aa_y=2,
                      shadow_samples=10, bounces=1)
scene = rt.cornell_box(as_numpy=True)   # identical on every process
target = np.zeros((cfg.height, cfg.width, 3), np.float32)

def loss_grad(s):
    v, g = jax.value_and_grad(image_loss)(s, target, cfg, mesh, "jnp")
    return v + sum(jnp.sum(x) * 1e-12 for x in jax.tree_util.tree_leaves(g))

@jax.jit
def run(s, n):
    def body(_, carry):
        acc, s2 = carry
        s3 = dataclasses.replace(
            s2, light_pos=s2.light_pos + acc * 1e-12 + 1e-6)
        return acc + loss_grad(s3), s3
    acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), s))
    return acc

def fetch(n):
    return float(np.asarray(run(scene, n).addressable_shards[0].data))

def best(n):
    fetch(n)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(n)
        ts.append(time.perf_counter() - t0)
    return min(ts)

dt = max(best(2 * iters) - best(iters), 1e-9) / iters
print(json.dumps({"pid": pid, "step_ms": dt * 1e3, "dp": dp}))
"""


def bench_multihost_sim(rows: int = 32, iters: int = 4,
                        dev_per_proc: int = 1) -> dict:
    """SIMULATED 2-host weak-scaling efficiency on virtual CPU devices.

    Baseline: one process, dp=dev_per_proc mesh. Scaled: two processes
    rendezvoused through jax.distributed (the DCN-analogue gloo/grpc
    backend), dp=2*dev_per_proc global mesh, same rows per shard. Efficiency
    = T_1proc / T_2proc at fixed per-device work. CAVEAT (printed and
    recorded): this measures the multi-process collective/runtime overhead
    of the sharded program on the CPU backend — NOT TPU ICI/DCN bandwidth;
    real-hardware efficiency needs a real pod slice."""
    import os
    import socket
    import subprocess
    import tempfile

    def env():
        e = dict(os.environ)
        e.pop("PALLAS_AXON_POOL_IPS", None)
        e["JAX_PLATFORMS"] = "cpu"
        e["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                          f"{dev_per_proc}")
        repo = os.path.dirname(os.path.abspath(__file__))
        e["PYTHONPATH"] = repo + os.pathsep + e.get("PYTHONPATH", "")
        return e

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_MULTIHOST_WORKER)
        script = f.name

    import shutil
    taskset = shutil.which("taskset")
    ncpu = os.cpu_count() or 1

    def run(num):
        # one core per process (when taskset exists): without pinning, each
        # XLA CPU client spans every core and two processes measure host
        # thrash, not collective overhead
        def argv(i):
            pin = ([taskset, "-c", str(i % ncpu)] if taskset else [])
            return pin + [sys.executable, script, str(num), str(i),
                          str(port), str(rows), str(iters)]
        procs = [subprocess.Popen(
            argv(i), env=env(), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True) for i in range(num)]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=600)
            if p.returncode != 0:
                raise RuntimeError(f"multihost-sim worker failed:\n{err}")
            outs.append(json.loads(out.splitlines()[-1]))
        return outs

    try:
        base = run(1)[0]
        scaled = run(2)
    finally:
        os.unlink(script)
    t1 = base["step_ms"]
    t2 = max(o["step_ms"] for o in scaled)
    eff = t1 / t2
    ncores = os.cpu_count()
    out = {"simulated": True,
           "note": "2-process weak scaling on virtual CPU devices; measures "
                   "multi-process collective + host-CPU contention overhead "
                   f"on a {ncores}-core host, NOT TPU ICI/DCN — a lower "
                   "bound on real-hardware efficiency",
           "host_cores": ncores,
           "per_proc_devices": dev_per_proc, "rows_per_shard": rows,
           "step_ms_1proc": round(t1, 3),
           "step_ms_2proc": round(t2, 3),
           "efficiency": round(eff, 4)}
    print(f"# multihost-sim: 1-proc dp{base['dp']} {t1:.1f} ms vs 2-proc "
          f"dp{scaled[0]['dp']} {t2:.1f} ms -> weak-scaling efficiency "
          f"{eff:.1%} (SIMULATED on CPU virtual devices, {ncores} host "
          f"cores)", file=sys.stderr)
    return out


_PROJECTION_WORKER = """
# Compile (not run) a sharded train step on a virtual-device CPU mesh and
# dump every collective in the optimized HLO with its payload.
# argv: dp tp   (dp*tp <= 8 virtual devices)
import json, re, sys
import os
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platform_name", "cpu")
import jax.numpy as jnp
import uob_raytracer_tpu as rt
from uob_raytracer_tpu.parallel import make_mesh, image_loss

dp, tp = int(sys.argv[1]), int(sys.argv[2])
if tp > 1:
    # tp: triangle-sharded large-scene step at the streamed bench workload's
    # RAY count (the per-ray pmin/tie/psum combine payload scales with rays,
    # not triangles — a small padded table compiles the same collectives)
    from bench import dense_scene, streamed_bench_cfg
    from uob_raytracer_tpu.parallel.mesh import pad_triangles
    cfg = streamed_bench_cfg()
    scene = pad_triangles(dense_scene(128), tp)
else:
    cfg = rt.RenderConfig(width=256, height=256, aa_x=2, aa_y=2,
                          shadow_samples=10, bounces=1)
    scene = rt.cornell_box()
mesh = make_mesh(dp=dp, tp=tp)
target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

def loss_grad(s):
    return jax.value_and_grad(image_loss)(s, target, cfg, mesh, "jnp")

txt = (jax.jit(loss_grad).lower(scene).compile().as_text())
DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "s8": 1, "u8": 1}
COLL = re.compile(r"\\ball-reduce\\(|\\ball-gather\\(|\\breduce-scatter\\(|"
                  r"\\bcollective-permute\\(|\\ball-to-all\\(")
SHAPE = re.compile(r"(\\w+)\\[([0-9,]*)\\]")
SINGLETON = re.compile(r"replica_groups=\\{(\\{\\d+\\},?)+\\}")
colls = []
for line in txt.splitlines():
    m = COLL.search(line)
    if m is None or "get-tuple-element" in line or "=" not in line:
        continue
    op = m.group(0).rstrip("(").strip()
    prefix = line.split(m.group(0))[0]
    total = 0
    shapes = []
    for dt, shape in SHAPE.findall(prefix):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for s in shape.split(","):
            if s:
                n *= int(s)
        total += n * DTYPE_BYTES[dt]
        shapes.append(f"{dt}[{shape}]")
    degenerate = bool(SINGLETON.search(line))   # per-device groups: no comm
    colls.append({"op": op, "shapes": shapes, "bytes": total,
                  "degenerate_groups": degenerate})
live = [c for c in colls if not c["degenerate_groups"]]
print(json.dumps({"collectives": colls,
                  "n_collectives": len(live),
                  "total_bytes": sum(c["bytes"] for c in live)}))
"""


def _hlo_collectives(dp: int, tp: int, timeout: int = 900) -> dict:
    """Compile the (dp, tp)-sharded train step on the virtual CPU mesh in a
    subprocess and return its live-collective census from the optimized
    HLO (see _PROJECTION_WORKER)."""
    import os
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_PROJECTION_WORKER)
        script = f.name
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # axon plugin stays unregistered
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.abspath(__file__))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    try:
        out = subprocess.run([sys.executable, script, str(dp), str(tp)],
                             env=env, capture_output=True, text=True,
                             timeout=timeout)
        if out.returncode != 0:
            raise RuntimeError(f"projection worker failed:\n{out.stderr}")
        return json.loads(out.stdout.splitlines()[-1])
    finally:
        os.unlink(script)


def bench_tp(iters: int = 8) -> dict:
    """TP production-path benchmark (VERDICT r4 task 4).

    (a) Measured single-chip throughput of the streamed partial-kernel
    pipeline (``kernels/partial.py`` via ``ops.intersect`` with
    tri_pass='pallas'; tp=1 so no collectives execute) against the fused
    streamed kernel, fwd and fwd+bwd, at the 8k-triangle bench workload.
    (b) The tp train step's compiled collective payload at tp=2/4 (virtual
    mesh — sharding determines the collective set) + projected efficiency
    against v5e ICI figures, with per-chip compute scaled by the shard's
    triangle count. The per-ray combine payload is identical for the jnp
    and partial-kernel triangle passes (tri_axis drives the collectives),
    so the CPU-compiled census stands in for the TPU program's."""
    import numpy as np

    from uob_raytracer_tpu.ops.camera import gen_primary_rays
    from uob_raytracer_tpu.ops.intersect import prepare_scene
    from uob_raytracer_tpu.ops.shading import shade

    cfg = streamed_bench_cfg()
    scene = dense_scene(STREAMED_BENCH_TRIS)
    rays = logical_ray_count(scene, cfg)
    A = cfg.aa_rays

    def partial_img(s):
        ds = prepare_scene(s)
        dirs, gid = gen_primary_rays(cfg, s.yaw, s.pitch)
        d_flat = dirs.reshape(-1, 3)
        gid_flat = jnp.repeat(gid.reshape(-1), A)
        start = jnp.broadcast_to(ds.camera_pos, (d_flat.shape[0], 3))
        colors = shade(ds, cfg, start, d_flat, gid_flat, None, "pallas")
        return colors.reshape(cfg.height, cfg.width, A, 3).sum(axis=2) / A

    def fwd_p(s):
        return jnp.mean(partial_img(s))

    def step_p(s):
        v, g2 = jax.value_and_grad(fwd_p)(s)
        return v + sum(jnp.sum(x) * 1e-12
                       for x in jax.tree_util.tree_leaves(g2))

    gp = jax.grad(fwd_p)(scene)
    bad = [n for n, leaf in vars(gp).items()
           if not bool(np.isfinite(np.asarray(leaf)).all())]
    assert not bad, f"non-finite tp-pipeline gradient leaves {bad}"

    quads = _quads_for(scene, "pallas")
    rows = {}
    for name, fn in [("partial_fwd", fwd_p), ("partial_fwd_bwd", step_p),
                     ("fused_fwd", _fwd_scalar(cfg, "pallas", quads)),
                     ("fused_fwd_bwd", _step_scalar(cfg, "pallas", quads))]:
        dt = time_scalar_fn(fn, scene, _adaptive_iters(fn, scene, lo=iters))
        rows[name] = dt.ms_dict()
        rows[name]["rays_s"] = _rate(rays, dt)
        print(f"# tp-bench {name}: {dt*1e3:.2f} ms ±{dt.spread:.0%}",
              file=sys.stderr)

    # (b) collective payload + efficiency projection at tp=2/4
    ici = {"bw_GBs": 200.0, "lat_us": 5.0}
    step1_ms = rows["partial_fwd_bwd"]["p50"]
    n_tri = STREAMED_BENCH_TRIS
    proj = {}
    for tp in (2, 4):
        hlo = _hlo_collectives(dp=1, tp=tp)
        payload = hlo["total_bytes"]
        n_coll = hlo["n_collectives"]
        t_comm_ms = (n_coll * ici["lat_us"] * 1e-3
                     + 2.0 * payload / (ici["bw_GBs"] * 1e9) * 1e3)
        # per-chip compute scales with the shard's triangle count; the
        # per-ray (scan-independent) part is taken from the fused kernel's
        # Cornell-scale time as a floor
        t_comp_ms = step1_ms * (26 + n_tri / tp) / (26 + n_tri)
        eff = (step1_ms / tp) / (t_comp_ms + t_comm_ms)
        proj[f"tp{tp}"] = {
            "n_collectives": n_coll, "payload_bytes": payload,
            "comm_ms": round(t_comm_ms, 4),
            "compute_ms_per_chip": round(t_comp_ms, 3),
            "strong_scaling_efficiency": round(eff, 4)}
        print(f"# tp-bench projection tp={tp}: {n_coll} collectives, "
              f"{payload} B -> comm {t_comm_ms:.3f} ms, compute "
              f"{t_comp_ms:.2f} ms -> efficiency {eff:.1%}",
              file=sys.stderr)
    return {
        "workload": f"{STREAMED_BENCH_TRIS} tris, {cfg.width}x{cfg.height} "
                    f"aa{cfg.aa_rays} s{cfg.shadow_samples} b{cfg.bounces}",
        "rays_per_frame": rays,
        "grads_finite": True,
        "measured_tp1": rows,
        "ici_model": ici,
        "projection": proj,
        "note": "tp combine traffic scales with rays (pmin/tie/psum per "
                "intersect+occlusion call), dp's with parameters (1.4 kB); "
                "at equal chip counts dp wins whenever the replicated "
                "table fits per-chip HBM — tp is the capacity escape hatch "
                "(a 19-col f32 table reaches 1 GB around 14 M triangles), "
                "not a throughput play.",
    }


def bench_multichip_projection(scene, step_ms: float | None = None) -> dict:
    """Hardware-defensible multi-chip efficiency projection (VERDICT r3
    task 4): count the ACTUAL collectives XLA inserts into one dp-sharded
    train step (compiled on an 8-virtual-device mesh — sharding, not
    backend, determines the collective set), take their payload bytes, and
    model them against public TPU v5e interconnect figures. The projection
    replaces the CPU-simulated 64-71% number (which measured gloo/grpc
    multi-process overhead, not ICI) as the claimable scaling story.

    Model (public figures, Google Cloud TPU docs + the jax-ml scaling
    book): v5e ICI ~1600 Gbit/s per chip aggregate (~200 GB/s), small
    all-reduce latency ~5 us per step within a slice; cross-host DCN
    ~25 GB/s per host with ~50 us latency. Collective time
    ~= latency + bytes/bandwidth (ring all-reduce moves ~2x bytes)."""
    hlo = _hlo_collectives(dp=8, tp=1)

    # per-step compute time per chip: the measured single-chip fwd+bwd step
    # (weak scaling: each chip keeps the full-frame row count of work)
    if step_ms is None:
        cfg = rt.RenderConfig(width=512, height=512, aa_x=2, aa_y=2,
                              shadow_samples=10, bounces=1)
        quads = _quads_for(scene, "pallas")
        step_ms = float(time_scalar_fn(
            _step_scalar(cfg, "pallas", quads), scene, 10)) * 1e3
        step_ms_source = "measured (this run, headline fwd+bwd step)"
    else:
        # off-TPU stand-in passed by the caller — make the stale-constant
        # risk visible in the artifact instead of silently baking it in
        step_ms_source = ("caller-supplied constant (NOT measured this "
                          "run; off-TPU stand-in)")

    payload = hlo["total_bytes"]
    n_coll = hlo["n_collectives"]
    # ring all-reduce traffic factor ~2x payload; latency per collective
    ici = {"bw_GBs": 200.0, "lat_us": 5.0}     # v5e ICI, public figures
    dcn = {"bw_GBs": 25.0, "lat_us": 50.0}     # per-host DCN
    def overhead_ms(link):
        return (n_coll * link["lat_us"] * 1e-3
                + 2.0 * payload / (link["bw_GBs"] * 1e9) * 1e3)
    t_ici, t_dcn = overhead_ms(ici), overhead_ms(dcn)
    eff_8chip = step_ms / (step_ms + t_ici)
    eff_2host = step_ms / (step_ms + t_dcn)
    out = {
        "hlo_collectives": hlo["collectives"][:16],
        "n_collectives": n_coll,
        "payload_bytes": payload,
        "step_ms_per_chip": round(step_ms, 3),
        "step_ms_source": step_ms_source,
        "model": {"ici": ici, "dcn": dcn,
                  "traffic_factor": "2x payload (ring all-reduce)"},
        "collective_overhead_ms": {"ici_8chip": round(t_ici, 5),
                                   "dcn_2host": round(t_dcn, 5)},
        "projected_efficiency": {"v5e_8chip_ici": round(eff_8chip, 4),
                                 "v5e_2host_dcn": round(eff_2host, 4)},
        "note": "projection from the compiled HLO collective set + public "
                "v5e interconnect figures; the CPU 2-process simulation "
                "(bench --multihost-sim) is a loose lower bound dominated "
                "by gloo/grpc latency that ICI does in microseconds",
    }
    print(f"# multichip projection: {n_coll} collectives/step, "
          f"{payload} B payload; step {step_ms:.2f} ms/chip -> "
          f"overhead ici {t_ici*1e3:.1f} us / dcn {t_dcn*1e3:.1f} us -> "
          f"projected efficiency 8-chip {eff_8chip:.2%}, "
          f"2-host {eff_2host:.2%}", file=sys.stderr)
    return out


def bench_roofline(scene, iters: int) -> dict:
    """Speed-of-light analysis of the fused kernels on this chip.

    Op counts come from a mechanical jaxpr CENSUS of the actual kernels
    (flops.census_kernel_ops — exact; only the bounce-loop weight and the
    scatter-gate taken fraction are measured inputs, both taken from
    recorded residuals), and the ceiling is a chained Pallas kernel whose
    op BLEND matches the census distribution, counted the same way — so
    whatever Mosaic fuses applies to both sides and the ratio is a
    like-for-like utilization (VERDICT r3 task 8). The legacy hand counts
    and single-op ceilings are reported alongside for continuity."""
    import numpy as np
    from uob_raytracer_tpu.flops import (VREG_ELEMS, backward_ops,
                                         bounce_tile_fracs_from_residuals,
                                         census_critical_path,
                                         census_kernel_ops, forward_ops,
                                         measure_vpu_peak)
    from uob_raytracer_tpu.kernels.render_bwd import render_replay_bwd
    from uob_raytracer_tpu.kernels.render_fwd import (TILE_H, TILE_W,
                                                      render_fused_raw,
                                                      render_fused_res)

    cfg = rt.RenderConfig(width=512, height=512, aa_x=2, aa_y=2,
                          shadow_samples=10, bounces=1)
    n_tri = scene.tri_v0.shape[0]
    n_sph = scene.sph_center.shape[0]
    n_obj = n_tri + n_sph
    _, _, res = render_fused_res(scene, cfg)
    fracs = bounce_tile_fracs_from_residuals(res, cfg.bounces)
    live = float(np.sum(fracs))
    lanes = cfg.width * cfg.height * cfg.aa_rays
    lanes_per_tile = cfg.aa_rays * TILE_H * TILE_W

    # scatter-gate taken fraction: mean (#distinct objects present per
    # (site, tile)) / n_obj over the recorded residual ids
    ids = np.asarray(res.prim_id)[None]
    if cfg.bounces > 0:
        ids = np.concatenate([ids, np.asarray(res.bounce_id)], axis=0)
    t = ids.reshape(ids.shape[0], cfg.aa_rays, cfg.height // TILE_H, TILE_H,
                    cfg.width // TILE_W, TILE_W)
    present = np.zeros(t.shape[:1] + (t.shape[2], t.shape[4], n_obj), bool)
    for o in range(n_obj):
        present[..., o] = (t == o).any(axis=(1, 3, 5))
    gate_frac = float(present.mean())

    census_f = census_kernel_ops(
        lambda s: render_fused_raw(s, cfg), scene,
        while_weight=live, lanes_per_tile=lanes_per_tile)
    g0 = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32) + 1e-3
    census_b = census_kernel_ops(
        lambda s: render_replay_bwd(s, cfg, res, g0), scene,
        while_weight=live, cond_weight=gate_frac,
        lanes_per_tile=lanes_per_tile)

    ops = forward_ops(cfg, n_tri, n_sph, fracs)          # legacy hand count
    bops = backward_ops(cfg, n_tri, n_sph, fracs)

    # dependency-matched ceiling (VERDICT r4 task 1): the kernels' DAG
    # width P = vector instructions / critical-path depth, from the same
    # jaxpr machinery as the op census; the fair ceiling for each kernel is
    # the mix chain at ITS OWN P (measured curve below), not the ILP-rich
    # K=16 chain — a low-P kernel is latency-bound, not wasting issue slots
    depth_f = census_critical_path(
        lambda s: render_fused_raw(s, cfg), scene, while_weight=live)
    depth_b = census_critical_path(
        lambda s: render_replay_bwd(s, cfg, res, g0), scene,
        while_weight=live, cond_weight=gate_frac)
    wdepth_b = census_critical_path(
        lambda s: render_replay_bwd(s, cfg, res, g0), scene,
        while_weight=live, cond_weight=gate_frac, slow_cost=16.0)
    p_fwd = census_f["per_lane"] * lanes_per_tile / VREG_ELEMS / depth_f
    p_bwd = census_b["per_lane"] * lanes_per_tile / VREG_ELEMS / depth_b

    dt = time_scalar_fn(_fwd_scalar(cfg, "pallas"), scene, iters)
    dt_step = time_scalar_fn(_step_scalar(cfg, "pallas"), scene,
                             max(4, iters // 2))
    dt_bwd = max(dt_step - dt, 1e-9)

    # --- structure-matched backward ceiling (VERDICT r4 task 1) ---
    # The twin mirrors the replay backward's loop/memory structure on the
    # REAL residuals and matches census ops, op blend, critical-path depth,
    # dependency-fed slow-op placement, and gathered-row liveness (see
    # flops.build_bwd_structure_twin). Both sides are timed DIRECTLY with
    # the same long-window scalar harness (75 chained passes/point), so the
    # ratio is a like-for-like structural utilization.
    from uob_raytracer_tpu.flops import (build_bwd_structure_twin,
                                         census_occupancy)
    res_dev = jax.tree_util.tree_map(jax.device_put, res)
    occ_b = census_occupancy(
        lambda s: render_replay_bwd(s, cfg, res, g0), scene)
    twin = build_bwd_structure_twin(
        scene, cfg, res_dev, n_obj,
        target_per_lane=census_b["per_lane"], target_depth=depth_b,
        target_wdepth=wdepth_b, slow_per_lane=census_b["per_lane_slow"],
        live=live, lanes_per_tile=lanes_per_tile,
        target_avg_vregs=occ_b["avg_vregs"])

    def _bwd_direct(s):
        g = render_replay_bwd(s, cfg, res_dev, g0)
        return sum(jnp.sum(x) * jnp.float32(1e-9)
                   for x in jax.tree_util.tree_leaves(g))

    dt_twin = time_scalar_fn(twin["scalar_fn"], scene, 75)
    dt_bwd_direct = time_scalar_fn(_bwd_direct, scene, 75)
    sutil = float(dt_twin) / float(dt_bwd_direct)
    peaks = measure_vpu_peak(ks=(1, 2, 4, 8, 16, 32))
    cen_f_total = census_f["per_lane"] * lanes
    cen_b_total = census_b["per_lane"] * lanes
    util = cen_f_total / dt / peaks["mix"]
    butil = cen_b_total / dt_bwd / peaks["mix"]

    def ceiling_at(curve: dict, p: float) -> float:
        """Interpolate a measured chain-rate curve at DAG width p
        (log-linear in P between measured K points; clamped at the ends)."""
        pts = sorted((v["P"], v["rate"]) for v in curve.values())
        if p <= pts[0][0]:
            return pts[0][1]
        for (p0, r0), (p1, r1) in zip(pts, pts[1:]):
            if p <= p1:
                f = (np.log(p) - np.log(p0)) / (np.log(p1) - np.log(p0))
                return float(r0 * (r1 / r0) ** f)
        return pts[-1][1]

    # fwd ceiling: forward-blend mix chain at the fwd kernel's own P;
    # bwd ceiling: BACKWARD-blend chain (41% select + div/sqrt slots,
    # measured the same way) at the bwd kernel's P
    ceil_f = ceiling_at(peaks["mix_k"], p_fwd)
    ceil_b = ceiling_at(peaks["bwdmix_k"], p_bwd)
    cutil_f = cen_f_total / dt / ceil_f
    cutil_b = cen_b_total / dt_bwd / ceil_b
    out = {
        "census": {
            "fwd_per_lane": round(census_f["per_lane"], 1),
            "bwd_per_lane": round(census_b["per_lane"], 1),
            "fwd_top_prims": census_f["counts"],
            "gate_taken_frac": round(gate_frac, 4),
            "unknown_frac": round(max(census_f["unknown_frac"],
                                      census_b["unknown_frac"]), 5),
        },
        "hand_count_per_lane": {"fwd": ops["per_lane"],
                                "bwd": bops["per_lane"]},
        "bounce_tile_fracs": [round(f, 4) for f in fracs],
        "frame_ms": dt.ms_dict(),
        "bwd_ms": round(dt_bwd * 1e3, 3),
        "achieved_census_ops_s": {"fwd": round(cen_f_total / dt),
                                  "bwd": round(cen_b_total / dt_bwd)},
        "vpu_peak_ops_s": {k: round(v) for k, v in peaks.items()
                           if not isinstance(v, dict)},
        "mix_chain_vs_parallelism": {
            str(k): {"P": v["P"], "rate": round(v["rate"])}
            for k, v in peaks["mix_k"].items()},
        "bwdmix_chain_vs_parallelism": {
            str(k): {"P": v["P"], "rate": round(v["rate"])}
            for k, v in peaks["bwdmix_k"].items()},
        "critical_path": {
            "method": "jaxpr DAG depth per grid step (census rules: "
                      "elemwise +1, reductions +log2N, loops serial "
                      "through carry x expected trips, ref state serial); "
                      "P = vector instrs (census elem-ops / 1024) / depth",
            "fwd": {"depth": round(depth_f, 1), "P": round(p_fwd, 2)},
            "bwd": {"depth": round(depth_b, 1), "P": round(p_bwd, 2)},
        },
        "vpu_utilization_vs_mix_chain": {"fwd": round(util, 4),
                                         "bwd": round(butil, 4)},
        "vpu_utilization_vs_chain_matched": {
            "method": "achieved census-ops/s vs a calibration chain with "
                      "the kernel's own op BLEND (fwd: mix; bwd: bwdmix — "
                      "41% select + div/sqrt slots) interpolated at the "
                      "kernel's own DAG width P",
            "fwd": round(cutil_f, 4), "bwd": round(cutil_b, 4),
            "ceiling_ops_s": {"fwd": round(ceil_f), "bwd": round(ceil_b)}},
        "vpu_utilization_vs_structure_twin": {
            "method": "measured time of a Pallas STRUCTURAL TWIN of the "
                      "replay backward (real presence words/ids/liveness, "
                      "verbatim presence-bit gather+scatter, chain scratch "
                      "traffic) with calibration math matched on census "
                      "ops, bwdmix blend, critical-path depth, "
                      "dependency-fed div/sqrt placement (slow_cost=16 "
                      "weighted depth) and gathered-row liveness, vs the "
                      "real backward timed by the same direct long-window "
                      "harness; residual gap = transpose working-set "
                      "spikes (measured: real peak ~1,070 live vregs vs "
                      "twin ~300) + scheduler efficiency on the irregular "
                      "vjp DAG",
            "bwd": round(sutil, 4),
            "twin_ms": round(float(dt_twin) * 1e3, 3),
            "bwd_ms_direct": round(float(dt_bwd_direct) * 1e3, 3),
            "twin_match": {k: twin[k] for k in
                           ("n_main", "n_step", "slots", "n_pool",
                            "avg_vregs", "target_avg_vregs",
                            "census_per_lane", "target_per_lane", "depth",
                            "target_depth", "wdepth", "target_wdepth")},
            "bwd_occupancy": occ_b,
            "bwd_wdepth": round(wdepth_b, 1),
            "bwd_slow_per_lane": round(census_b["per_lane_slow"], 1)},
    }
    print(f"# chain-matched: fwd P={p_fwd:.1f} ceiling "
          f"{ceil_f/1e12:.2f} T -> {cutil_f:.1%}; bwd P={p_bwd:.1f} "
          f"ceiling {ceil_b/1e12:.2f} T -> {cutil_b:.1%}", file=sys.stderr)
    print(f"# roofline fwd: census {cen_f_total/1e9:.2f} G ops/frame "
          f"({census_f['per_lane']:.0f}/lane; hand count said "
          f"{sum(v for v in ops['per_lane'].values()):.0f}), frame "
          f"{dt*1e3:.2f} ms -> {cen_f_total/dt/1e12:.2f} T census-ops/s "
          f"vs mix-chain ceiling {peaks['mix']/1e12:.2f} T = {util:.1%} "
          f"(single-op chains: fma {peaks['fma']/1e12:.2f}, add "
          f"{peaks['add']/1e12:.2f} T)", file=sys.stderr)
    print(f"# structure twin: {float(dt_twin)*1e3:.3f} ms vs bwd direct "
          f"{float(dt_bwd_direct)*1e3:.3f} ms -> {sutil:.1%} of the "
          f"structure-matched ceiling (census match "
          f"{twin['census_match']:.3f}, depth {twin['depth']:.0f} vs "
          f"{depth_b:.0f})", file=sys.stderr)
    print(f"# roofline bwd: census {cen_b_total/1e9:.2f} G ops/pass "
          f"({census_b['per_lane']:.0f}/lane), bwd {dt_bwd*1e3:.2f} ms -> "
          f"{cen_b_total/dt_bwd/1e12:.2f} T census-ops/s = {butil:.1%} of "
          f"the mix-chain ceiling (gate taken frac {gate_frac:.2%})",
          file=sys.stderr)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--bounces", type=int, default=1)
    p.add_argument("--samples", type=int, default=10)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--backend", default="auto")
    p.add_argument("--headline-only", action="store_true",
                   help="skip the per-BASELINE-config sweep")
    p.add_argument("--config", default=None, metavar="NAME",
                   help="bench one named BASELINE config and exit "
                        f"(one of: {', '.join(baseline_configs())})")
    p.add_argument("--scaling", action="store_true",
                   help="dp-sharded scaling sweep over available devices")
    p.add_argument("--crossover", action="store_true",
                   help="SMEM vs streamed forward kernel crossover curve "
                        "over triangle count (writes the measured basis of "
                        "MAX_SMEM_TRIANGLES)")
    p.add_argument("--multichip-projection", action="store_true",
                   help="count the compiled HLO collectives of a dp train "
                        "step and project 8-chip/2-host efficiency against "
                        "public v5e ICI/DCN figures")
    p.add_argument("--tp-bench", action="store_true",
                   help="measure the streamed partial-kernel (tp) pipeline "
                        "vs the fused kernel at 8k triangles and project "
                        "tp=2/4 scaling from the compiled collective set")
    p.add_argument("--multihost-sim", action="store_true",
                   help="SIMULATED 2-process weak-scaling efficiency on "
                        "virtual CPU devices (spawns subprocesses; "
                        "clearly-labeled stand-in for a real 2-host run)")
    p.add_argument("--roofline", action="store_true",
                   help="speed-of-light analysis: analytic vector-op count "
                        "vs the measured VPU ceiling")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of one fwd+bwd step "
                        "into DIR (view in TensorBoard/Perfetto)")
    args = p.parse_args()

    scene = rt.cornell_box()
    dev = jax.devices()[0]
    from uob_raytracer_tpu.cache import enable_compilation_cache
    cache = enable_compilation_cache()   # warm benches skip recompiles
    print(f"# device: {dev}, backend: {jax.default_backend()}, "
          f"n_devices: {len(jax.devices())}, compile_cache: {cache}",
          file=sys.stderr)

    if args.config:
        if args.config.startswith("streamed"):
            cfg = streamed_bench_cfg()
            scene = dense_scene(STREAMED_BENCH_TRIS)
        else:
            cfg = baseline_configs()[args.config]
        out = bench_config(args.config, cfg, scene, args.iters, args.backend)
        print(json.dumps({
            "metric": f"rays/s/chip fwd+bwd ({args.config})",
            "value": out["fwd_bwd_rays_s"], "unit": "rays/s",
            "vs_baseline": out["fwd_bwd_rays_s"] / TARGET_RAYS_PER_S}))
        return

    if args.roofline:
        res = bench_roofline(scene, args.iters)
        # NOTE: "value" here is a VPU-utilization fraction (target 1.0),
        # not a rays/s-vs-target ratio like the default bench output —
        # the metric string and the "roofline" payload carry the detail.
        u = res["vpu_utilization_vs_mix_chain"]["fwd"]
        print(json.dumps({
            "metric": "VPU utilization vs census-matched mix chain "
                      "(fused fwd kernel, 512^2 aa4 s10 b1; target 1.0)",
            "value": u, "unit": "fraction",
            "vs_baseline": u,
            "roofline": res}))
        return

    if args.crossover:
        res = bench_crossover(max(4, args.iters // 4))
        ok = [p for p in res["points"]
              if "p50" in p.get("smem", {}) and "p50" in p["streamed"]]
        # headline: worst smem/streamed ratio among sizes where both run
        # (>=1 means smem never loses below its capacity limit)
        adv = min((p["streamed"]["p50"] / p["smem"]["p50"] for p in ok),
                  default=0.0)
        print(json.dumps({
            "metric": "min streamed/smem fwd-time ratio below SMEM capacity "
                      "(>1 = SMEM kernel faster wherever it fits)",
            "value": round(adv, 3), "unit": "ratio", "vs_baseline": adv,
            "crossover": res}))
        return

    if args.multichip_projection:
        res = bench_multichip_projection(
            scene, step_ms=None if jax.default_backend() == "tpu" else 3.7)
        eff = res["projected_efficiency"]["v5e_2host_dcn"]
        print(json.dumps({
            "metric": "projected 2-host weak-scaling efficiency "
                      "(HLO collectives + v5e interconnect model)",
            "value": eff, "unit": "fraction",
            "vs_baseline": eff / 0.85,
            "multichip_projection": res}))
        return

    if args.tp_bench:
        res = bench_tp(max(4, args.iters // 4))
        r = res["measured_tp1"]["partial_fwd_bwd"].get("rays_s") or 0
        print(json.dumps({
            "metric": "rays/s/chip fwd+bwd (streamed partial tp pipeline, "
                      "8192 tris)",
            "value": r, "unit": "rays/s",
            "vs_baseline": r / TARGET_RAYS_PER_S,
            "tp_bench": res}))
        return

    if args.multihost_sim:
        res = bench_multihost_sim()
        print(json.dumps({
            "metric": "SIMULATED 2-process weak-scaling efficiency "
                      "(CPU virtual devices)",
            "value": res["efficiency"], "unit": "fraction",
            "vs_baseline": res["efficiency"] / 0.85,
            "multihost_sim": res}))
        return

    if args.scaling:
        res = bench_scaling(scene, max(4, args.iters // 4))
        last = list(res)[-1]
        print(json.dumps({
            "metric": f"dp scaling efficiency ({last})",
            "value": res[last]["efficiency"], "unit": "fraction",
            "vs_baseline": res[last]["efficiency"] / 0.85,
            "scaling": res}))
        return

    # --- headline: Cornell Box 512^2, AA4, 10 shadow samples, 1 bounce ---
    h = args.height or args.width
    cfg = rt.RenderConfig(width=args.width, height=h, aa_x=2, aa_y=2,
                          shadow_samples=args.samples, bounces=args.bounces)
    rays = logical_ray_count(scene, cfg)
    print(f"# logical rays/frame: {rays:,} "
          f"({cfg.width}x{cfg.height} aa{cfg.aa_rays} "
          f"s{cfg.shadow_samples} b{cfg.bounces})", file=sys.stderr)

    quads = _quads_for(scene, args.backend)
    assert_finite_grads(cfg, args.backend, quads, scene)
    dt_fwd = time_scalar_fn(_fwd_scalar(cfg, args.backend, quads), scene,
                            args.iters)
    print(f"# forward: {dt_fwd*1e3:.2f} ms/frame ±{dt_fwd.spread:.0%} = "
          f"{rays/dt_fwd:.3e} rays/s", file=sys.stderr)
    dt_step = time_scalar_fn(_step_scalar(cfg, args.backend, quads), scene,
                             max(5, args.iters // 2))
    print(f"# fwd+bwd: {dt_step*1e3:.2f} ms/step ±{dt_step.spread:.0%} = "
          f"{rays/dt_step:.3e} rays/s", file=sys.stderr)

    if args.profile:
        with jax.profiler.trace(args.profile):
            jax.block_until_ready(jax.jit(
                _step_scalar(cfg, args.backend))(scene))
        print(f"# profiler trace written to {args.profile}", file=sys.stderr)

    configs = {}
    if not args.headline_only:
        sweep = list(baseline_configs().items())
        sweep.append((f"streamed_{STREAMED_BENCH_TRIS}", streamed_bench_cfg()))
        for name, ccfg in sweep:
            cscene = (dense_scene(STREAMED_BENCH_TRIS)
                      if name.startswith("streamed_") else scene)
            try:
                configs[name] = bench_config(name, ccfg, cscene,
                                             max(4, args.iters // 4),
                                             args.backend)
            except Exception as e:  # keep the headline alive no matter what
                configs[name] = {"error": f"{type(e).__name__}: {e}"}
                print(f"# {name}: FAILED — {e}", file=sys.stderr)

    value = rays / dt_step
    out = {
        "metric": f"rays/s/chip fwd+bwd (Cornell Box {cfg.width}^2, "
                  f"{cfg.bounces} bounce)",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / TARGET_RAYS_PER_S,
        "fwd_ms": dt_fwd.ms_dict(),
        "fwd_bwd_ms": dt_step.ms_dict(),
        "grads_finite": True,
    }
    if configs:
        out["configs"] = configs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
