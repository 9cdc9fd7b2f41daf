"""Golden-image regression tests: the NumPy oracle is the parity anchor for
everything else, so the oracle itself is pinned byte-for-byte against
checked-in goldens (any semantic drift in the reference math shows up here
first). The jnp/pallas renderers are compared through the boundary-aware
tolerance (conftest.assert_images_match)."""
import os

import numpy as np
import pytest

from uob_raytracer_tpu import RenderConfig, cornell_box, render
from uob_raytracer_tpu.config import ShadingModel
from uob_raytracer_tpu.reference.oracle import render_oracle, pack_argb_np
from conftest import assert_images_match

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def test_oracle_matches_golden_full():
    g = np.load(os.path.join(GOLDEN_DIR, "cornell_64_full.npz"))
    img = render_oracle(cornell_box(as_numpy=True),
                        RenderConfig(width=64, height=64))
    np.testing.assert_array_equal(img, g["image"])
    np.testing.assert_array_equal(pack_argb_np(img), g["packed"])


def test_oracle_matches_golden_cpuref():
    g = np.load(os.path.join(GOLDEN_DIR, "cornell_64_cpuref.npz"))
    scene = cornell_box(spheres=False, shading=ShadingModel.HOST,
                        as_numpy=True)
    img = render_oracle(scene, RenderConfig(width=64, height=64,
                                            cpu_ref=True))
    np.testing.assert_array_equal(img, g["image"])


def test_renderer_matches_golden():
    g = np.load(os.path.join(GOLDEN_DIR, "cornell_64_full.npz"))
    out = render(cornell_box(), RenderConfig(width=64, height=64))
    assert_images_match(out.image, g["image"], what="render vs golden")
