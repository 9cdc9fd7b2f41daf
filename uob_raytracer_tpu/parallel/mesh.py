"""Device meshes for the ray tracer.

The reference is single-device: its only parallelism is SPMD over pixels on
one GPU (``Source/skeleton.cpp:170-172``, 1024x1024 NDRange in 128x4 groups),
and its only "communication" is host<->device buffer traffic. Here scaling is
expressed the TPU way — a ``jax.sharding.Mesh`` plus ``shard_map``:

* ``dp`` (data parallel): pixel rows sharded across chips; the scene is
  replicated, mirroring the reference's per-work-group local-memory copy of
  the whole scene (``kernels.cl:374-376``).
* ``tp`` (tensor parallel): the triangle axis sharded across chips for
  scenes too large to replicate; nearest-hit results are combined with
  pmin/psum collectives over ICI (see ops/intersect.py).

PP/SP/EP have no analogue in a per-pixel ray tracer and are deliberately
absent (SURVEY.md §2f): the bounce chain is the only sequential dimension and
it stays local to each ray.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh

from ..scene import Scene


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a ('dp', 'tp') mesh. Defaults: all devices on dp."""
    if devices is None:
        devices = jax.devices()
    if dp is None:
        dp = len(devices) // tp
    n = dp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def pad_triangles(scene: Scene, multiple: int) -> Scene:
    """Pad the triangle axis to a multiple (for even tp sharding) with
    degenerate triangles: zero-area (all vertices coincident) so every
    intersection test rejects them (detA == 0), diffuse material so the
    glass-skip shadow rule is unaffected."""
    t = scene.tri_v0.shape[0]
    pad = (-t) % multiple
    if pad == 0:
        return scene
    import jax.numpy as jnp
    zpad3 = jnp.zeros((pad, 3), scene.tri_v0.dtype)
    return dataclasses.replace(
        scene,
        tri_v0=jnp.concatenate([scene.tri_v0, zpad3]),
        tri_v1=jnp.concatenate([scene.tri_v1, zpad3]),
        tri_v2=jnp.concatenate([scene.tri_v2, zpad3]),
        tri_rgb=jnp.concatenate([scene.tri_rgb, zpad3]),
        tri_mat=jnp.concatenate([scene.tri_mat,
                                 jnp.ones((pad,), scene.tri_mat.dtype)]),
    )
