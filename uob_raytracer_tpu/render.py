"""Top-level render API: one jitted call per frame.

Replaces the reference's per-frame host choreography — rotation-matrix upload,
kernel-arg writes, NDRange enqueue, blocking readback
(``Source/skeleton.cpp:146-182``) — with a single traced function:
ray generation, primary intersection, shading and the wavefront bounce loop
all fuse under ``jax.jit``. The float image stays on device and is
differentiable w.r.t. every Scene leaf; the packed ARGB image reproduces the
reference's screen buffer.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .ops.camera import gen_primary_rays
from .ops.image import pack_argb
from .ops.intersect import prepare_scene
from .ops.shading import shade, shade_cpu_ref
from .scene import Scene


class RenderResult(NamedTuple):
    image: jax.Array   # float32 [H, W, 3]
    packed: jax.Array  # uint32 [H, W] ARGB8888


def _pick_chunk_rows(cfg: RenderConfig, target_rays: int = 1 << 18) -> int:
    """Largest divisor of H keeping rows*W*A near the target ray count per
    chunk (bounds peak memory of the [rays, triangles] broadcast)."""
    per_row = cfg.width * cfg.aa_rays
    want = max(1, target_rays // per_row)
    divs = [d for d in range(1, cfg.height + 1) if cfg.height % d == 0]
    return max(d for d in divs if d <= want) if any(d <= want for d in divs) else 1


def render_flat(scene: Scene, cfg: RenderConfig, chunk_rows: int | None = None):
    """Float radiance per AA ray, shaped [H, W, A, 3]. Traceable/differentiable."""
    ds = prepare_scene(scene)
    dirs, gid = gen_primary_rays(cfg, scene.yaw, scene.pitch)
    H, W = cfg.height, cfg.width
    A = dirs.shape[2]
    if chunk_rows is None:
        chunk_rows = _pick_chunk_rows(cfg)
    if H % chunk_rows:
        raise ValueError(
            f"chunk_rows={chunk_rows} must divide the image height {H}")
    n_chunks = H // chunk_rows
    rays_per_chunk = chunk_rows * W * A

    d_flat = dirs.reshape(n_chunks, rays_per_chunk, 3)
    gid_flat = jnp.repeat(gid.reshape(-1), A).reshape(n_chunks, rays_per_chunk)
    start = jnp.broadcast_to(ds.camera_pos, (rays_per_chunk, 3))

    def per_chunk(args):
        d_c, gid_c = args
        if cfg.cpu_ref:
            return shade_cpu_ref(ds, cfg, start, d_c)
        return shade(ds, cfg, start, d_c, gid_c)

    if n_chunks == 1:
        colors = per_chunk((d_flat[0], gid_flat[0]))[None]
    else:
        colors = jax.lax.map(per_chunk, (d_flat, gid_flat))
    return colors.reshape(H, W, A, 3)


def _render_image_jnp(scene: Scene, cfg: RenderConfig,
                      chunk_rows: int | None = None) -> jax.Array:
    """Float image [H, W, 3]: AA rays averaged (``kernels.cl:427``)."""
    colors = render_flat(scene, cfg, chunk_rows)
    return colors.sum(axis=2) / jnp.float32(colors.shape[2])


# --------------------------------------------------------------------------
# Pallas backend: fused forward kernel + path-replay backward.
# The forward kernel records each ray's discrete decisions (hit object ids
# per bounce, shadow lit counts); the backward differentiates the lean
# replay reconstruction (ops/replay.py) of the radiance with those decisions
# frozen — exact under the framework's piecewise-constant-visibility
# gradient semantics (SURVEY.md §7) and O(rays) instead of
# O(rays x triangles).
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _render_image_pallas(scene: Scene, cfg: RenderConfig,
                         quads=None) -> jax.Array:
    from .kernels import render_fused_raw
    img, _ = render_fused_raw(scene, cfg, quads=quads)
    return img


def _pallas_fwd(scene, cfg, quads):
    from .kernels.render_fwd import render_fused_res
    img, _, res = render_fused_res(scene, cfg, quads=quads)
    return img, (scene, res)


def _use_pallas_bwd(scene: Scene) -> bool:
    """Fused Pallas backward on TPU (any scene size: the SMEM-table kernel
    below MAX_SMEM_TRIANGLES, the streamed kernel above it); the jnp replay
    VJP on the CPU test backend, where XLA's fusion serves the same role.
    Override with UOB_RT_BWD=jnp|pallas."""
    import os
    mode = os.environ.get("UOB_RT_BWD", "auto")
    if mode == "jnp":
        return False
    if mode == "pallas":
        return True
    return jax.default_backend() == "tpu"


def _pallas_bwd(cfg, quads, saved, g):
    # quads affect only the forward occlusion scan; the backward replays
    # with the recorded lit counts frozen, so the pairing is irrelevant here
    scene, res = saved
    if _use_pallas_bwd(scene):
        from .kernels.render_bwd import render_replay_bwd
        return (render_replay_bwd(scene, cfg, res, g),)
    from .ops.replay import replay_forward
    _, vjp = jax.vjp(lambda s: replay_forward(s, cfg, res), scene)
    return vjp(g)


_render_image_pallas.defvjp(_pallas_fwd, _pallas_bwd)


# Row-band variant for dp-sharded launches: each shard renders rows
# [row0, row0+rows) of the logical image through the fused kernel — with the
# same quad-merged occlusion scan and path-replay backward as the
# single-chip headline kernel. row0 is a traced int32 scalar (a mesh
# axis_index), which carries a symbolic-zero (float0) cotangent; quads is a
# static pairing (hashable, nondiff).

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4))
def render_image_pallas_rows(scene: Scene, cfg: RenderConfig, row0,
                             rows: int, quads=None) -> jax.Array:
    from .kernels import render_fused_raw
    img, _ = render_fused_raw(scene, cfg, row0=row0, rows=rows, quads=quads)
    return img


def _pallas_rows_fwd(scene, cfg, row0, rows, quads):
    from .kernels.render_fwd import render_fused_res
    img, _, res = render_fused_res(scene, cfg, row0=row0, rows=rows,
                                   quads=quads)
    return img, (scene, row0, res)


def _pallas_rows_bwd(cfg, rows, quads, saved, g):
    # quads affect only the forward occlusion scan (see _pallas_bwd)
    import numpy as np
    scene, row0, res = saved
    if _use_pallas_bwd(scene):
        from .kernels.render_bwd import render_replay_bwd
        scene_bar = render_replay_bwd(scene, cfg, res, g, row0=row0,
                                      rows=rows)
    else:
        from .ops.replay import replay_forward
        _, vjp = jax.vjp(
            lambda s: replay_forward(s, cfg, res, row0=row0, rows=rows),
            scene)
        (scene_bar,) = vjp(g)
    return scene_bar, np.zeros((), dtype=jax.dtypes.float0)


render_image_pallas_rows.defvjp(_pallas_rows_fwd, _pallas_rows_bwd)


def _resolve_backend(backend: str, cfg: RenderConfig) -> str:
    if backend == "auto":
        return "pallas" if jax.default_backend() not in ("cpu",) else "jnp"
    return backend


def render_image(scene: Scene, cfg: RenderConfig,
                 chunk_rows: int | None = None,
                 backend: str = "auto", shadow_quads=None) -> jax.Array:
    """Differentiable float image [H, W, 3].

    backend: 'pallas' (fused TPU kernel forward, path-replay backward),
    'jnp' (pure-jnp pipeline), or 'auto' (pallas on accelerators, jnp on
    CPU). Every cfg mode — including cpu_ref — runs on either backend.

    shadow_quads: optional static pairing from
    ``ops.quads.detect_shadow_quads`` — merges paired triangles into
    parallelogram rows for the pallas occlusion scan (the dominant cost;
    ~2x fewer shadow rows on Cornell). Affects only boundary-epsilon
    sample rays vs the per-triangle scan (see ops/quads.py docstring)."""
    backend = _resolve_backend(backend, cfg)
    if backend == "pallas":
        # any scene size: small scenes use the whole-table SMEM kernel,
        # large ones the streamed (DMA-blocked) kernel
        return _render_image_pallas(scene, cfg, shadow_quads)
    return _render_image_jnp(scene, cfg, chunk_rows)


@functools.partial(jax.jit, static_argnames=("cfg", "chunk_rows", "backend",
                                             "shadow_quads"))
def _render_jit(scene: Scene, cfg: RenderConfig, chunk_rows, backend,
                shadow_quads=None):
    img = render_image(scene, cfg, chunk_rows, backend, shadow_quads)
    return RenderResult(image=img, packed=pack_argb(img))


def render(scene: Scene, cfg: RenderConfig,
           chunk_rows: int | None = None,
           backend: str = "auto",
           shadow_quads="auto") -> RenderResult:
    """Render a frame (jitted). Returns the float image and the packed
    ARGB8888 screen buffer.

    shadow_quads: "auto" detects parallelogram pairs on the concrete scene
    and uses the quad-merged occlusion scan (pallas backend only); None
    disables; or pass a pairing from ``ops.quads.detect_shadow_quads``.
    An explicitly passed pairing is re-validated against the scene's
    current vertices (``ops.quads.validate_shadow_quads``): a stale pairing
    on moved geometry raises instead of silently corrupting shadows."""
    backend = _resolve_backend(backend, cfg)
    if shadow_quads == "auto":
        if backend == "pallas" and not cfg.cpu_ref:
            from .ops.quads import detect_shadow_quads
            shadow_quads = detect_shadow_quads(scene)
        else:
            shadow_quads = None
    elif shadow_quads is not None:
        from .ops.quads import validate_shadow_quads
        validate_shadow_quads(scene, shadow_quads)
    return _render_jit(scene, cfg, chunk_rows, backend, shadow_quads)


def render_packed(scene: Scene, cfg: RenderConfig) -> jax.Array:
    return render(scene, cfg).packed
