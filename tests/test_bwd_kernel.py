"""Fused Pallas backward kernel (kernels/render_bwd.py) vs the jnp replay
VJP (ops/replay.py) — same decision residuals, same gradient.

Tolerances: pixels whose path re-enters a sphere after the first bounce
(glass interior) traverse a double refraction whose derivative contains
1/(2*sqrt(k)) terms near total internal reflection — genuinely
ill-conditioned in float32, so two valid float realizations of the same
math diverge at the percent level there. Everything else must agree to
float32 noise.
"""
import dataclasses

import jax
import jax.numpy as jnp
import pytest

import uob_raytracer_tpu as rt
from uob_raytracer_tpu.kernels.render_bwd import render_replay_bwd
from uob_raytracer_tpu.kernels.render_fwd import render_fused_res
from uob_raytracer_tpu.ops.replay import replay_forward


def _grads(scene, cfg, res, g):
    _, vjp = jax.vjp(lambda s: replay_forward(s, cfg, res), scene)
    (ref,) = vjp(g)
    got = render_replay_bwd(scene, cfg, res, g, interpret=True)
    return ref, got


def _assert_leafwise(ref, got, rtol):
    for f in dataclasses.fields(ref):
        a = jnp.asarray(getattr(ref, f.name))
        b = jnp.asarray(getattr(got, f.name))
        if not a.size:
            continue
        err = float(jnp.max(jnp.abs(a - b)))
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        assert err <= rtol * scale, (
            f"{f.name}: rel err {err / scale:.2e} > {rtol:g}")


@pytest.mark.parametrize("kw", [
    dict(bounces=0),
    dict(bounces=1),
    # the 2-bounce interpret-mode cases take ~2 min each: slow-marked so the
    # default suite stays fast (scripts/test.sh runs everything)
    pytest.param(dict(bounces=2, fresnel=True), marks=pytest.mark.slow),
    pytest.param(dict(bounces=2, quirk_nan_tir=True),
                 marks=pytest.mark.slow),
])
def test_bwd_kernel_matches_jnp_replay(kw):
    cfg = rt.RenderConfig(width=128, height=8, aa_x=2, aa_y=2,
                          shadow_samples=4, **kw)
    scene = rt.cornell_box()
    img, _, res = render_fused_res(scene, cfg, interpret=True)
    g = jax.random.normal(jax.random.PRNGKey(0), img.shape, jnp.float32)

    if kw["bounces"] >= 2:
        # exact away from the glass interior; percent-level (conditioning)
        # on the double-refraction pixels
        glass = (res.bounce_id >= scene.tri_v0.shape[0]).any(axis=(0, 1))
        ref, got = _grads(scene, cfg, res, g * ~glass[:, :, None])
        _assert_leafwise(ref, got, 1e-4)
        ref, got = _grads(scene, cfg, res, g)
        _assert_leafwise(ref, got, 0.15)
    else:
        ref, got = _grads(scene, cfg, res, g)
        _assert_leafwise(ref, got, 1e-4)


def test_bwd_kernel_row_band():
    """The dp-sharded row-band launch: gradient of rows [row0, row0+rows)
    equals the jnp replay restricted to the same band."""
    cfg = rt.RenderConfig(width=128, height=16, aa_x=1, aa_y=2,
                          shadow_samples=2, bounces=1)
    scene = rt.cornell_box()
    row0, rows = 8, 8
    img, _, res = render_fused_res(scene, cfg, interpret=True,
                                   row0=row0, rows=rows)
    g = jax.random.normal(jax.random.PRNGKey(1), img.shape, jnp.float32)
    _, vjp = jax.vjp(
        lambda s: replay_forward(s, cfg, res, row0=row0, rows=rows), scene)
    (ref,) = vjp(g)
    got = render_replay_bwd(scene, cfg, res, g, row0=row0, rows=rows,
                            interpret=True)
    _assert_leafwise(ref, got, 1e-4)


def test_streamed_bwd_kernel_matches_jnp_replay():
    """>MAX_SMEM_TRIANGLES scenes route the backward through the streamed
    kernel (HBM triangle table DMA-blocked through SMEM for the gathers,
    per-lane triangle cotangents segment-summed outside): the gradient must
    equal the jnp replay VJP, kernel-for-fallback."""
    from test_pallas import _dense_scene
    from uob_raytracer_tpu.kernels.render_fwd import _use_streamed

    scene = _dense_scene(600)
    assert _use_streamed(scene)
    cfg = rt.RenderConfig(width=128, height=8, aa_x=1, aa_y=1,
                          shadow_samples=2, bounces=1)
    img, _, res = render_fused_res(scene, cfg, interpret=True)
    g = jax.random.normal(jax.random.PRNGKey(2), img.shape, jnp.float32)
    ref, got = _grads(scene, cfg, res, g)
    _assert_leafwise(ref, got, 1e-4)


@pytest.mark.slow
def test_bwd_kernel_primal_matches_replay():
    """The kernel's replayed radiance (the vjp primal) equals
    replay_forward — the two implementations compute the same function."""
    cfg = rt.RenderConfig(width=128, height=16, aa_x=2, aa_y=2,
                          shadow_samples=4, bounces=2)
    scene = rt.cornell_box()
    img, _, res = render_fused_res(scene, cfg, interpret=True)
    g = jnp.zeros(img.shape, jnp.float32)
    _, primal = render_replay_bwd(scene, cfg, res, g, interpret=True,
                                  return_primal=True)
    ref = replay_forward(scene, cfg, res)
    assert float(jnp.max(jnp.abs(primal - ref))) < 1e-4
