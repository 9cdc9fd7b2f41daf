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


ASSETS = os.path.join(os.path.dirname(GOLDEN_DIR), os.pardir, "assets")


def _ico_scene(as_numpy: bool):
    """Cornell + the bundled 20-triangle OBJ asset — the end-to-end OBJ
    showcase path (the reference loads a bunny OBJ the same way,
    ``Source/skeleton.cpp:102-103`` + ``Source/Loader.cpp:11-59``)."""
    import dataclasses
    from uob_raytracer_tpu import add_triangles, load_obj
    scene = cornell_box(as_numpy=as_numpy)
    verts, rgb, mat = load_obj(os.path.join(ASSETS, "ico.obj"),
                               mat_code=1.0)
    if as_numpy:
        return dataclasses.replace(
            scene,
            tri_v0=np.concatenate([scene.tri_v0, verts[:, 0]]),
            tri_v1=np.concatenate([scene.tri_v1, verts[:, 1]]),
            tri_v2=np.concatenate([scene.tri_v2, verts[:, 2]]),
            tri_rgb=np.concatenate([scene.tri_rgb, rgb]),
            tri_mat=np.concatenate([scene.tri_mat, mat]))
    return add_triangles(scene, verts, rgb, mat)


def test_obj_scene_oracle_matches_golden():
    g = np.load(os.path.join(GOLDEN_DIR, "cornell_ico_64.npz"))
    img = render_oracle(_ico_scene(as_numpy=True),
                        RenderConfig(width=64, height=64))
    np.testing.assert_array_equal(img, g["image"])


def test_obj_scene_renderer_matches_golden():
    """End-to-end: load_obj -> add_triangles -> full renderer vs golden."""
    g = np.load(os.path.join(GOLDEN_DIR, "cornell_ico_64.npz"))
    out = render(_ico_scene(as_numpy=False),
                 RenderConfig(width=64, height=64))
    assert_images_match(out.image, g["image"], what="obj render vs golden")


def test_save_bmp_byte_golden(tmp_path):
    """``save_bmp`` byte-compared against a checked-in golden: pins the
    32-bpp BITMAPINFOHEADER layout and the bottom-up B,G,R,A pixel order of
    ``SDL_SaveBMP`` (``Source/SDLauxiliary.h:24-54``), not just the magic
    and size."""
    g = np.load(os.path.join(GOLDEN_DIR, "cornell_64_full.npz"))
    from uob_raytracer_tpu.ops.image import save_bmp
    out = tmp_path / "frame.bmp"
    save_bmp(str(out), g["packed"])
    want = open(os.path.join(GOLDEN_DIR, "cornell_64_full.bmp"), "rb").read()
    assert out.read_bytes() == want
