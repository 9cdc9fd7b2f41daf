"""Integration tests: full jnp renders vs the NumPy oracle across the
baseline configurations (SURVEY.md §4 golden strategy)."""
import numpy as np
import pytest

from uob_raytracer_tpu import RenderConfig, cornell_box, render
from uob_raytracer_tpu.config import ShadingModel, baseline_configs
from uob_raytracer_tpu.reference.oracle import render_oracle, pack_argb_np
from conftest import assert_images_match

SIZE = 96  # small enough for fast CPU tests; covers every feature


def small(cfg: RenderConfig, **over) -> RenderConfig:
    import dataclasses
    return dataclasses.replace(cfg, width=SIZE, height=SIZE, **over)


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


def test_full_pipeline_vs_oracle(scene):
    cfg = small(RenderConfig())
    ref = render_oracle(scene, cfg)
    out = render(scene, cfg)
    assert_images_match(out.image, ref, what="full pipeline")
    # Packed image: identical except boundary pixels.
    packed_ref = pack_argb_np(ref)
    packed = np.asarray(out.packed)
    frac = (packed != packed_ref).mean()
    assert frac <= 0.005


def test_cpu_ref_mode(scene):
    cfg = RenderConfig(width=128, height=128, cpu_ref=True)
    host_scene = cornell_box(spheres=False, shading=ShadingModel.HOST)
    ref = render_oracle(host_scene, cfg)
    out = render(host_scene, cfg, backend="jnp")
    assert_images_match(out.image, ref, what="cpu_ref")
    assert np.asarray(out.image).max() > 0.1  # actually rendered something
    # the fused Pallas kernel implements the same CPU-ref semantics
    # (VERDICT r2 item 2): unnormalized rays, hard shadow, no material logic
    out_p = render(host_scene, cfg, backend="pallas")
    assert_images_match(out_p.image, ref, what="cpu_ref pallas")


def test_cpu_ref_pallas_grads_match_jnp(scene):
    """cpu_ref gradients via the Pallas forward + replay backward == the
    jnp pipeline's autodiff gradients."""
    import jax
    import jax.numpy as jnp
    cfg = RenderConfig(width=64, height=32, cpu_ref=True)
    host_scene = cornell_box(spheres=False, shading=ShadingModel.HOST)

    def loss(s, backend):
        from uob_raytracer_tpu.render import render_image
        return jnp.mean(render_image(s, cfg, backend=backend))

    g_p = jax.grad(lambda s: loss(s, "pallas"))(host_scene)
    g_j = jax.grad(lambda s: loss(s, "jnp"))(host_scene)
    for name in ("light_pos", "light_color",
                 "indirect_light", "camera_pos", "yaw"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_p, name)), np.asarray(getattr(g_j, name)),
            rtol=2e-3, atol=1e-6, err_msg=name)
    # Per-triangle grads: pixels on a coplanar same-color pair's shared
    # diagonal (e.g. the back wall) may resolve to either triangle per
    # backend — invisible in the image, but the gradient lands on the other
    # half. Demand near-equality almost everywhere, boundedness at
    # boundaries.
    for name in ("tri_v0", "tri_rgb"):
        a, b = np.asarray(getattr(g_p, name)), np.asarray(getattr(g_j, name))
        close = np.abs(a - b) <= 1e-6 + 2e-3 * np.abs(b)
        assert close.mean() >= 0.9, f"{name}: {(~close).sum()} outliers"
        np.testing.assert_allclose(a, b, rtol=0.2, atol=1e-6,
                                   err_msg=f"{name} (boundary bound)")
        assert np.abs(a).max() > 0


def test_soft_shadow_config(scene):
    cfg = small(baseline_configs()["soft_shadows_512"])
    ref = render_oracle(scene, cfg)
    out = render(scene, cfg)
    assert_images_match(out.image, ref, what="soft shadows 16spp")


def test_mirror_config(scene):
    cfg = small(baseline_configs()["mirror_512"])
    ref = render_oracle(scene, cfg)
    out = render(scene, cfg)
    assert_images_match(out.image, ref, what="mirror 2 bounces")


def test_glass_fresnel_config(scene):
    cfg = small(baseline_configs()["glass_fresnel_512"])
    ref = render_oracle(scene, cfg)
    out = render(scene, cfg)
    assert_images_match(out.image, ref, what="glass fresnel 4 bounces")


def test_quirk_nan_tir_mode_cornell(scene):
    # In the Cornell scene TIR is physically unreachable: a homogeneous
    # sphere entered from air refracts to <= the critical angle, and the exit
    # incidence equals the internal angle, so quirk and fixed modes agree.
    cfg = small(RenderConfig(quirk_nan_tir=True))
    ref = render_oracle(scene, cfg)
    out = render(scene, cfg)
    assert_images_match(out.image, ref, what="quirk TIR")
    fixed = render(scene, small(RenderConfig()))
    np.testing.assert_array_equal(np.asarray(fixed.image),
                                  np.asarray(out.image))


def _tir_scene():
    """Two glass planes + a diffuse catcher wall, arranged so a straight-in
    ray refracts through plane 1 (medium -> glass) and meets plane 2 at 50
    degrees > the 41.1-degree critical angle: guaranteed TIR."""
    import jax.numpy as jnp
    from uob_raytracer_tpu.scene import Scene
    c50, s50 = np.cos(np.deg2rad(50)), np.sin(np.deg2rad(50))
    a = np.array([0.0, 1.0, 0.0], np.float32)
    b = np.array([c50, 0.0, s50], np.float32)
    c0 = np.array([0.0, 0.0, 0.5], np.float32)
    g2_v0 = c0 - 3 * a - 3 * b
    tris = np.array([
        # glass plane z=0
        [[-5, -5, 0], [5, -5, 0], [0, 5, 0]],
        # tilted glass plane through (0,0,0.5)
        [g2_v0, g2_v0 + 12 * a, g2_v0 + 12 * b],
        # diffuse catcher at x=2
        [[2, -20, -20], [2, 20, -20], [2, 0, 20]],
    ], dtype=np.float32)
    rgb = np.array([[0, 0, 0], [0, 0, 0], [0.8, 0.2, 0.1]], np.float32)
    mat = np.array([-1.0, -1.0, 1.0], np.float32)
    z3 = np.zeros((0, 3), np.float32)
    z1 = np.zeros((0,), np.float32)
    return Scene(
        tri_v0=jnp.asarray(tris[:, 0]), tri_v1=jnp.asarray(tris[:, 1]),
        tri_v2=jnp.asarray(tris[:, 2]), tri_rgb=jnp.asarray(rgb),
        tri_mat=jnp.asarray(mat),
        sph_center=jnp.asarray(z3), sph_r2=jnp.asarray(z1),
        sph_rgb=jnp.asarray(z3), sph_mat=jnp.asarray(z1),
        light_pos=jnp.array([0.0, -3.0, 0.5]),
        light_color=jnp.array([16.0, 16.0, 16.0]),
        indirect_light=jnp.array([0.5, 0.5, 0.5]),
        camera_pos=jnp.array([0.0, 0.0, -2.0]),
        yaw=jnp.float32(0.0), pitch=jnp.float32(0.0),
    )


def test_quirk_nan_tir_fires_on_tir_scene():
    import jax.numpy as jnp
    from uob_raytracer_tpu.ops.intersect import prepare_scene, intersect
    from uob_raytracer_tpu.ops.shading import shade
    scene = _tir_scene()
    ds = prepare_scene(scene)
    d = jnp.array([[0.0, 0.0, 1.0]])
    start = jnp.array([[0.0, 0.0, -2.0]])
    gid = jnp.array([0], jnp.uint32)
    primary = intersect(ds, start, d)
    assert float(primary.mat[0]) == -1.0  # hit glass plane 1
    fixed = np.asarray(shade(
        ds, RenderConfig(width=8, height=8), start, d, gid))[0]
    quirk = np.asarray(shade(
        ds, RenderConfig(width=8, height=8, quirk_nan_tir=True),
        start, d, gid))[0]
    assert np.all(quirk == 0.0)          # reference NaN-TIR: black
    assert fixed.max() > 0.05            # fixed TIR: reflected to the wall
    # Oracle agrees in both modes.
    from uob_raytracer_tpu.reference import oracle as orc
    sc = orc._to_np_scene(scene)
    h = orc._intersect(sc, np.asarray(start), np.asarray(d))
    o_fixed = orc._secondary_light(sc, RenderConfig(width=8, height=8), h,
                                   np.asarray(d), np.asarray(gid))[0]
    o_quirk = orc._secondary_light(
        sc, RenderConfig(width=8, height=8, quirk_nan_tir=True), h,
        np.asarray(d), np.asarray(gid))[0]
    np.testing.assert_allclose(fixed, o_fixed, atol=1e-5)
    np.testing.assert_allclose(quirk, o_quirk, atol=1e-5)


def test_chunking_invariance(scene):
    cfg = small(RenderConfig(bounces=2, shadow_samples=4))
    a = np.asarray(render(scene, cfg, chunk_rows=SIZE).image)
    b = np.asarray(render(scene, cfg, chunk_rows=SIZE // 4).image)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_determinism(scene):
    cfg = small(RenderConfig(bounces=2))
    a = np.asarray(render(scene, cfg).image)
    b = np.asarray(render(scene, cfg).image)
    np.testing.assert_array_equal(a, b)


def test_light_and_camera_move_change_image(scene):
    import dataclasses
    import jax.numpy as jnp
    cfg = small(RenderConfig(bounces=0, shadow_samples=2))
    base = np.asarray(render(scene, cfg).image)
    moved = dataclasses.replace(scene, light_pos=jnp.array([0.4, -0.5, -0.7]))
    img2 = np.asarray(render(moved, cfg).image)
    assert np.abs(base - img2).max() > 0.01
    rot = dataclasses.replace(scene, yaw=jnp.float32(0.2))
    img3 = np.asarray(render(rot, cfg).image)
    assert np.abs(base - img3).max() > 0.01
    ref = render_oracle(rot, cfg)  # oracle agrees under rotation too
    assert_images_match(img3, ref, what="rotated camera")
