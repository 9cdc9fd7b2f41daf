"""NaN / out-of-bounds instrumentation (SURVEY.md §4, §5 race-detection row).

JAX is functional, so data races are impossible by construction; the debug
tooling promised by the survey is ``checkify`` (NaN + OOB-index checks
compiled into the graph) and the ``jax_debug_nans`` CI mode wired in
conftest.py / scripts/test.sh --nan-check. These tests run the jnp pipeline
under full checkify instrumentation and assert it is NaN/OOB-free — the
double-where guards in ops/ are what keeps it so (a clamped sqrt alone
would trip float_checks in the backward).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from uob_raytracer_tpu import RenderConfig, cornell_box
from uob_raytracer_tpu.render import render_image

CFG = RenderConfig(width=64, height=16, aa_x=2, aa_y=2, shadow_samples=3,
                   bounces=3)


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


def test_forward_checkify_clean(scene):
    """Full jnp forward under float (NaN/inf) checks. (index_checks cannot
    instrument this graph: checkify's gather rule trips on the pipeline's
    0-d scan carries — a checkify limitation, not an OOB; OOB-freedom is
    structural here since every gather index is a clamped argmin result.)"""
    f = checkify.checkify(
        lambda s: render_image(s, CFG, backend="jnp"),
        errors=checkify.float_checks)
    err, img = jax.jit(f)(scene)
    err.throw()   # raises on any NaN/inf anywhere in the graph
    assert bool(jnp.isfinite(img).all())


def test_grad_checkify_clean(scene):
    """The backward pass is NaN-free under instrumentation too — this is
    the guard for the where-guard idiom (naive sqrt/div would produce
    inf * 0 cotangents)."""
    def loss(s):
        return jnp.mean(render_image(s, CFG, backend="jnp"))

    f = checkify.checkify(jax.grad(loss), errors=checkify.float_checks)
    err, g = jax.jit(f)(scene)
    err.throw()
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


import os


@pytest.mark.skipif(bool(os.environ.get("RAYTPU_DEBUG_NANS")),
                    reason="jax_debug_nans aborts at the seeded NaN before "
                           "checkify can report it — the mode working")
def test_checkify_catches_seeded_nan(scene):
    """Sanity: the instrumentation actually fires (a NaN smuggled into the
    scene is reported, not silently propagated into a black pixel)."""
    import dataclasses
    bad = dataclasses.replace(
        scene, light_pos=scene.light_pos.at[0].set(jnp.float32(jnp.nan)))
    f = checkify.checkify(
        lambda s: render_image(s, CFG, backend="jnp"),
        errors=checkify.float_checks)
    err, _ = jax.jit(f)(bad)
    with pytest.raises(Exception):
        err.throw()
