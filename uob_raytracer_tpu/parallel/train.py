"""Differentiable rendering as a training loop: the piece the reference
never had. Fits scene parameters (vertices, materials, light, camera) to a
target image by gradient descent through the sharded renderer.

The gradient flow is the north-star design: pixels/tiles sharded over chips,
scene replicated, and the backward pass's parameter gradients all-reduced
over ICI — the psum is inserted by the shard_map transpose and overlapped by
XLA's latency-hiding scheduler.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import RenderConfig
from ..scene import Scene
from .render import render_image_sharded

# Scene leaves that may receive gradient updates in the demo optimizer.
# (Vertices, materials, light and camera — the BASELINE config-5 parameter
# set. Pass a subset to train_step for well-conditioned fits: a single SGD
# learning rate across parameter types is rarely appropriate.)
TRAINABLE = ("tri_v0", "tri_v1", "tri_v2", "tri_rgb", "light_pos",
             "light_color", "camera_pos", "yaw", "pitch")


def image_loss(scene: Scene, target: jax.Array, cfg: RenderConfig,
               mesh: Mesh, backend: str = "jnp") -> jax.Array:
    img = render_image_sharded(scene, cfg, mesh, backend=backend)
    return jnp.mean(jnp.square(img - target))


class TrainOut(NamedTuple):
    scene: Scene
    loss: jax.Array


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "lr", "trainable",
                                    "backend"))
def train_step(scene: Scene, target: jax.Array, cfg: RenderConfig,
               mesh: Mesh, lr: float = 1e-2,
               trainable: tuple[str, ...] = TRAINABLE,
               backend: str = "jnp") -> TrainOut:
    """One SGD step on the selected scene leaves."""
    loss, grads = jax.value_and_grad(image_loss)(scene, target, cfg, mesh,
                                                 backend)

    def update(path, p, g):
        name = path[0].name if hasattr(path[0], "name") else str(path[0])
        if name in trainable:
            return p - jnp.float32(lr) * g
        return p

    new_scene = jax.tree_util.tree_map_with_path(update, scene, grads)
    return TrainOut(scene=new_scene, loss=loss)
