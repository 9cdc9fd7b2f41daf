"""Path-replay backward tests: the fused kernel's decision residuals +
the lean differentiable reconstruction must reproduce the forward image and
the full-autodiff gradients (ops/replay.py)."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uob_raytracer_tpu import RenderConfig, cornell_box
from uob_raytracer_tpu.kernels.render_fwd import render_fused_res
from uob_raytracer_tpu.ops.replay import replay_forward
from uob_raytracer_tpu.render import _render_image_jnp

ON_TPU = bool(os.environ.get("RAYTPU_TEST_TPU"))
CFG = RenderConfig(width=128, height=16, shadow_samples=6, bounces=6)


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


@pytest.fixture(scope="module")
def rendered(scene):
    return render_fused_res(scene, CFG, interpret=not ON_TPU)


def test_residual_shapes_and_ranges(scene, rendered):
    _, _, res = rendered
    T = scene.tri_v0.shape[0]
    S = scene.sph_center.shape[0]
    pid = np.asarray(res.prim_id)
    assert pid.shape == (CFG.aa_rays, CFG.height, CFG.width)
    assert pid.min() >= -1 and pid.max() < T + S
    lit = np.asarray(res.lit_cnt)
    assert lit.min() >= 0 and lit.max() <= CFG.shadow_samples
    assert res.bounce_id.shape == (CFG.bounces, CFG.aa_rays, CFG.height,
                                   CFG.width)
    # specular primaries exist (the spheres) and produce bounce records
    assert (np.asarray(res.bounce_id)[0] >= 0).any()


def test_replay_matches_kernel_forward(scene, rendered):
    img, _, res = rendered
    rep = replay_forward(scene, CFG, res)
    np.testing.assert_allclose(np.asarray(rep), np.asarray(img), atol=2e-5)


def test_replay_grads_match_full_autodiff(scene, rendered):
    _, _, res = rendered

    def loss_replay(s):
        return jnp.mean(replay_forward(s, CFG, res))

    def loss_full(s):
        return jnp.mean(_render_image_jnp(s, CFG, chunk_rows=CFG.height))

    g_r = jax.grad(loss_replay)(scene)
    g_f = jax.grad(loss_full)(scene)
    # TPU 1e-2: the two pipelines are separately compiled programs — on the
    # real chip their different FMA/fusion choices shift the
    # ill-conditioned sphere-quadratic gradients at the sub-percent level
    # (TPU-suite runs measured sph_center 2.5e-3, sph_r2 6.3e-3 relative).
    # On CPU the drift justification doesn't apply and the pipelines agree
    # much tighter, so keep the stricter 2e-3 oracle there.
    tol = 1e-2 if ON_TPU else 2e-3
    for f in dataclasses.fields(g_r):
        a = np.asarray(getattr(g_r, f.name))
        b = np.asarray(getattr(g_f, f.name))
        scale = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / scale < tol, f.name
        assert np.isfinite(a).all(), f.name


def test_replay_weights_fresnel(scene):
    cfg = dataclasses.replace(CFG, fresnel=True)
    img, _, res = render_fused_res(scene, cfg, interpret=not ON_TPU)
    rep = replay_forward(scene, cfg, res)
    np.testing.assert_allclose(np.asarray(rep), np.asarray(img), atol=5e-4)


@pytest.mark.skipif(not ON_TPU, reason="compiled custom_vjp needs TPU")
def test_custom_vjp_end_to_end(scene):
    from uob_raytracer_tpu.render import render_image

    def loss(s):
        return jnp.mean(render_image(s, CFG, backend="pallas"))

    g = jax.jit(jax.grad(loss))(scene)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(g.light_pos)).max() > 0


def test_row_band_rendering_and_replay(scene):
    """Row-band launches (the dp-sharded pallas path): band renders equal
    the corresponding rows of the full frame, and the row-aware replay
    reconstructs them."""
    import jax.numpy as jnp
    from uob_raytracer_tpu.kernels.render_fwd import render_fused_raw
    cfg = RenderConfig(width=128, height=32, shadow_samples=2, bounces=2)
    full, _ = render_fused_raw(scene, cfg, interpret=not ON_TPU)
    for row0, rows in [(0, 16), (8, 24)]:   # aligned + tile-offset bands
        band, _ = render_fused_raw(scene, cfg, interpret=not ON_TPU,
                                   row0=jnp.int32(row0), rows=rows)
        np.testing.assert_array_equal(np.asarray(band),
                                      np.asarray(full)[row0:row0 + rows])
    band, _, res = render_fused_res(scene, cfg, interpret=not ON_TPU,
                                    row0=jnp.int32(16), rows=16)
    rep = replay_forward(scene, cfg, res, row0=jnp.int32(16), rows=16)
    np.testing.assert_allclose(np.asarray(rep), np.asarray(band), atol=2e-5)
