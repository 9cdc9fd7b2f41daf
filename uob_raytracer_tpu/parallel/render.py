"""Sharded rendering: pixel rows over 'dp', optionally triangles over 'tp'.

One ``shard_map`` wraps the whole per-shard pipeline (ray gen slice ->
intersect -> shade -> bounce loop), so a frame is a single XLA program per
chip with collectives only where the triangle axis is sharded. The image
comes back sharded over rows; gathering it to the host is the analogue of
the reference's blocking screen-buffer readback (``skeleton.cpp:179-181``)
and stays off the hot loop in benchmarks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import RenderConfig
from ..ops.camera import gen_primary_rays
from ..ops.intersect import prepare_scene
from ..ops.shading import shade, shade_cpu_ref
from ..scene import Scene


def _scene_specs(scene: Scene, tp: bool) -> Scene:
    """PartitionSpec pytree for a Scene: triangles sharded over 'tp' (when
    enabled), everything else replicated."""
    tri = P("tp") if tp else P()
    return Scene(
        tri_v0=tri, tri_v1=tri, tri_v2=tri, tri_rgb=tri, tri_mat=tri,
        sph_center=P(), sph_r2=P(), sph_rgb=P(), sph_mat=P(),
        light_pos=P(), light_color=P(), indirect_light=P(),
        camera_pos=P(), yaw=P(), pitch=P(),
    )


def render_image_sharded(scene: Scene, cfg: RenderConfig, mesh: Mesh,
                         chunk_rows: int | None = None,
                         backend: str = "jnp",
                         shadow_quads=None) -> jax.Array:
    """Render the float image [H, W, 3] sharded over ``mesh``.

    Rows are split over 'dp'; if the mesh's 'tp' axis is larger than 1 the
    triangle arrays are sharded over it (pad first with
    ``mesh.pad_triangles``) and nearest-hit/occlusion results are combined
    with ICI collectives. Differentiable: gradients of replicated scene
    leaves are psum'd automatically by the shard_map transpose.

    backend='pallas' with tp == 1 runs the fused kernel per shard, each
    shard rendering its row band (path-replay backward included) — the
    production multi-chip path on TPU. With tp > 1 it runs the per-shard
    pipeline with the triangle scans in the streamed partial Pallas kernels
    (``kernels/partial.py``) combined over ICI — also differentiable: the
    partial kernels carry a path-replay custom_vjp whose triangle
    cotangents are segment-summed per shard and psum'd by the shard_map
    transpose, so tp training runs the production kernels end to end.

    shadow_quads: static quad pairing for the pallas occlusion scan, as in
    ``render.render_image`` — pass it so every shard runs the same
    quad-merged headline kernel as the single-chip path ("auto" detects on
    a concrete scene; traced scenes need an explicit pairing or None).
    """
    if backend == "pallas" and shadow_quads == "auto":
        from ..ops.quads import detect_shadow_quads
        shadow_quads = detect_shadow_quads(scene)
    elif shadow_quads == "auto":
        shadow_quads = None
    if shadow_quads is not None:
        from ..ops.quads import validate_shadow_quads
        validate_shadow_quads(scene, shadow_quads)
    tp = mesh.shape["tp"] > 1
    tri_axis = "tp" if tp else None
    n_dp = mesh.shape["dp"]
    H, W = cfg.height, cfg.width
    if H % n_dp:
        raise ValueError(f"height {H} not divisible by dp={n_dp}")
    if tp and scene.tri_v0.shape[0] % mesh.shape["tp"]:
        raise ValueError("triangle count not divisible by tp; use pad_triangles")
    rows_per_shard = H // n_dp
    # tp>1 + pallas: the jnp per-shard pipeline with its triangle scans
    # routed through the streamed partial kernels (kernels/partial.py) and
    # the pmin/tie/psum combine over ICI — the production large-scene path,
    # forward AND backward (path-replay custom_vjp on the partial kernels).
    tri_pass = "jnp"
    if backend == "pallas" and tp:
        backend, tri_pass = "jnp", "pallas"
    if backend == "pallas":
        if rows_per_shard % 8:
            raise ValueError(f"rows per shard ({rows_per_shard}) must be a "
                             f"multiple of the 8-row kernel tile")
        from ..render import render_image_pallas_rows

        def body_pallas(scene_rep):
            row0 = (jax.lax.axis_index("dp") * rows_per_shard).astype(
                jnp.int32)
            return render_image_pallas_rows(scene_rep, cfg, row0,
                                            rows_per_shard, shadow_quads)

        fn = shard_map(body_pallas, mesh=mesh,
                       in_specs=(_scene_specs(scene, False),),
                       out_specs=P("dp"), check_vma=False)
        return fn(scene)

    dirs, gid = gen_primary_rays(cfg, scene.yaw, scene.pitch)
    A = dirs.shape[2]

    def body(scene_shard, dirs_s, gid_s):
        ds = prepare_scene(scene_shard)
        if tp:
            t_local = scene_shard.tri_v0.shape[0]
            ds = ds._replace(
                tri_offset=(jax.lax.axis_index("tp") * t_local).astype(jnp.int32))
        d_flat = dirs_s.reshape(-1, 3)
        gid_flat = jnp.repeat(gid_s.reshape(-1), A)
        start = jnp.broadcast_to(ds.camera_pos, (d_flat.shape[0], 3))
        if cfg.cpu_ref:
            colors = shade_cpu_ref(ds, cfg, start, d_flat)
        else:
            colors = shade(ds, cfg, start, d_flat, gid_flat, tri_axis,
                           tri_pass)
        img = colors.reshape(rows_per_shard, W, A, 3)
        return img.sum(axis=2) / jnp.float32(A)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(_scene_specs(scene, tp), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    return fn(scene, dirs, gid)
