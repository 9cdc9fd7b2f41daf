"""Distributed tests on the 8-virtual-CPU-device mesh (SURVEY.md §4):
sharded render == single-device render; triangle (tp) sharding == replicated;
gradients through shard_map match unsharded gradients."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uob_raytracer_tpu import RenderConfig, cornell_box, render
from uob_raytracer_tpu.parallel import (
    make_mesh, pad_triangles, render_image_sharded, train_step, image_loss,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

CFG = RenderConfig(width=64, height=64, aa_x=2, aa_y=2, shadow_samples=4,
                   bounces=3)


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


def test_dp_sharded_matches_single(scene):
    # Sharded and single-device renders are separately compiled XLA programs:
    # different fusion choices mean different FMA contraction, which can flip
    # marginal visibility comparisons — so boundary-aware comparison, exactly
    # as against the NumPy oracle.
    from conftest import assert_images_match
    mesh = make_mesh(dp=8, tp=1)
    img_s = np.asarray(jax.jit(render_image_sharded,
                               static_argnames=("cfg", "mesh"))(scene, CFG, mesh))
    img_1 = np.asarray(render(scene, CFG, chunk_rows=CFG.height).image)
    assert_images_match(img_s, img_1, tight=1e-6, outlier_frac=0.01,
                        what="dp-sharded vs single")


def test_dp_sharded_pallas_matches_single(scene):
    """The production multi-chip path: fused Pallas kernel per dp shard
    (row-band launch, interpret mode on the CPU mesh) == the single-device
    fused kernel."""
    from conftest import assert_images_match
    mesh = make_mesh(dp=8, tp=1)    # 64 rows / 8 shards = 8-row bands
    img_s = np.asarray(jax.jit(
        render_image_sharded,
        static_argnames=("cfg", "mesh", "backend"))(
            scene, CFG, mesh, backend="pallas"))
    img_1 = np.asarray(render(scene, CFG, backend="pallas").image)
    # same kernel, same math, different launch geometry: exact equality up
    # to boundary flips from the padded-canvas crop
    assert_images_match(img_s, img_1, tight=1e-6, outlier_frac=0.01,
                        what="dp-sharded pallas vs single pallas")


def test_sharded_pallas_grads_match_unsharded(scene):
    """Gradients through the sharded Pallas path (fused fwd kernel + replay
    VJP + shard_map-transpose psum) == the unsharded Pallas-path gradients."""
    from uob_raytracer_tpu.render import render_image
    cfg = RenderConfig(width=32, height=32, aa_x=1, aa_y=1,
                       shadow_samples=2, bounces=1)
    mesh = make_mesh(dp=4, tp=1)    # 8 rows per shard (kernel tile height)
    target = jnp.zeros((32, 32, 3), jnp.float32)

    def loss_single(s):
        img = render_image(s, cfg, backend="pallas")
        return jnp.mean(jnp.square(img - target))

    g_sharded = jax.jit(
        jax.grad(image_loss),
        static_argnames=("cfg", "mesh", "backend"))(
            scene, target, cfg, mesh, backend="pallas")
    g_single = jax.grad(loss_single)(scene)
    for name in ("light_pos", "light_color", "tri_v0", "tri_rgb",
                 "camera_pos", "yaw"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_sharded, name)),
            np.asarray(getattr(g_single, name)),
            rtol=1e-4, atol=1e-6, err_msg=name)
    assert np.abs(np.asarray(g_sharded.light_pos)).max() > 0
    assert np.abs(np.asarray(g_sharded.tri_v0)).max() > 0


@pytest.mark.slow
def test_sharded_pallas_bwd_kernel(scene, monkeypatch):
    """Force the fused Pallas *backward* kernel (UOB_RT_BWD=pallas,
    interpret mode) under shard_map: grads match the jnp-replay route."""
    monkeypatch.setenv("UOB_RT_BWD", "pallas")
    cfg = RenderConfig(width=16, height=16, aa_x=1, aa_y=1,
                       shadow_samples=2, bounces=1)
    mesh = make_mesh(dp=2, tp=1)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    g_k = jax.jit(
        jax.grad(image_loss),
        static_argnames=("cfg", "mesh", "backend"))(
            scene, target, cfg, mesh, backend="pallas")
    monkeypatch.setenv("UOB_RT_BWD", "jnp")
    g_j = jax.grad(image_loss, argnums=0)(scene, target, cfg, mesh,
                                          backend="pallas")
    for name in ("light_pos", "tri_v0", "tri_rgb"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_k, name)), np.asarray(getattr(g_j, name)),
            rtol=1e-4, atol=1e-6, err_msg=name)


def test_tp_sharded_matches_replicated(scene):
    from conftest import assert_images_match
    mesh = make_mesh(dp=2, tp=4)
    padded = pad_triangles(scene, 4)          # 26 -> 28 triangles
    img_tp = np.asarray(jax.jit(render_image_sharded,
                                static_argnames=("cfg", "mesh"))(padded, CFG, mesh))
    img_1 = np.asarray(render(scene, CFG, chunk_rows=CFG.height).image)
    assert_images_match(img_tp, img_1, tight=1e-5, outlier_frac=0.01,
                        what="tp-sharded vs replicated")


def test_padding_is_invisible(scene):
    padded = pad_triangles(scene, 16)         # 26 -> 32, degenerate pad
    img_p = np.asarray(render(padded, CFG).image)
    img = np.asarray(render(scene, CFG).image)
    np.testing.assert_allclose(img_p, img, atol=1e-6)


def test_sharded_grads_match_unsharded(scene):
    cfg = RenderConfig(width=32, height=32, aa_x=1, aa_y=1,
                       shadow_samples=2, bounces=1)
    mesh = make_mesh(dp=8, tp=1)
    target = jnp.zeros((32, 32, 3), jnp.float32)

    def loss_unsharded(s):
        img = render(s, cfg, chunk_rows=32).image
        return jnp.mean(jnp.square(img - target))

    g_sharded = jax.jit(jax.grad(image_loss),
                        static_argnames=("cfg", "mesh"))(scene, target, cfg, mesh)
    g_single = jax.grad(loss_unsharded)(scene)
    for name in ("light_pos", "tri_v0", "tri_rgb", "camera_pos"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_sharded, name)),
            np.asarray(getattr(g_single, name)),
            atol=1e-5, err_msg=name)
    # Gradients are nonzero where they should be
    assert np.abs(np.asarray(g_sharded.light_pos)).max() > 0
    assert np.abs(np.asarray(g_sharded.tri_rgb)).max() > 0


def test_train_step_reduces_loss(scene):
    cfg = RenderConfig(width=32, height=32, aa_x=1, aa_y=1,
                       shadow_samples=2, bounces=0)
    mesh = make_mesh(dp=8, tp=1)
    # Target: the same scene with the light moved; fitting should reduce loss.
    target_scene = dataclasses.replace(
        scene, light_pos=jnp.array([0.3, -0.5, -0.7]))
    target = render_image_sharded(target_scene, cfg, mesh)
    s, losses = scene, []
    for _ in range(8):
        s, loss = train_step(s, target, cfg, mesh, lr=0.5,
                             trainable=("light_pos",))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # the light should have moved toward the target x=0.3
    assert float(s.light_pos[0]) > 0.02


def test_multihost_single_process_noop(monkeypatch):
    from uob_raytracer_tpu.parallel import initialize_multihost
    monkeypatch.delenv("RAYTPU_COORDINATOR", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert initialize_multihost() is False
