"""Oracle self-consistency: the vectorized NumPy oracle vs the scalar C++
oracle (two independent implementations of the reference semantics; both are
built with FP contraction off, so agreement is expected to be bit-exact or
within a final-rounding ULP)."""
import numpy as np
import pytest

from uob_raytracer_tpu import RenderConfig, cornell_box
from uob_raytracer_tpu.config import ShadingModel
from uob_raytracer_tpu.reference.oracle import render_oracle
from uob_raytracer_tpu.reference.cpp_oracle import render_cpp_oracle


@pytest.fixture(scope="module")
def scene():
    return cornell_box(as_numpy=True)


def test_numpy_vs_cpp_full(scene):
    cfg = RenderConfig(width=64, height=64)
    a = render_oracle(scene, cfg)
    b = render_cpp_oracle(scene, cfg)
    mismatch = (np.abs(a - b).max(axis=-1) > 1e-6).mean()
    assert mismatch < 0.002, f"numpy vs C++ oracle differ on {mismatch:.2%} px"
    np.testing.assert_allclose(a, b, atol=0.35)  # boundary pixels bounded


def test_numpy_vs_cpp_cpu_ref():
    scene = cornell_box(spheres=False, shading=ShadingModel.HOST, as_numpy=True)
    cfg = RenderConfig(width=64, height=64, cpu_ref=True)
    a = render_oracle(scene, cfg)
    b = render_cpp_oracle(scene, cfg)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_numpy_vs_cpp_quirk_tir(scene):
    cfg = RenderConfig(width=48, height=48, quirk_nan_tir=True)
    a = render_oracle(scene, cfg)
    b = render_cpp_oracle(scene, cfg)
    mismatch = (np.abs(a - b).max(axis=-1) > 1e-6).mean()
    assert mismatch < 0.002


def test_oracle_image_sane(scene):
    cfg = RenderConfig(width=64, height=64)
    img = render_oracle(scene, cfg)
    assert np.isfinite(img).all()
    assert img.max() > 0.5 and img.min() >= 0.0
    # mirror sphere region shows reflected content; glass region nonblack
    assert img.mean() > 0.1


def test_cpp_obj_loader_matches_python(tmp_path):
    from uob_raytracer_tpu import load_obj
    from uob_raytracer_tpu.reference.cpp_oracle import load_obj_cpp
    p = tmp_path / "two.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 1\n"
                 "f 1 2 3\nf 2 3 4\n")
    v_py, _, _ = load_obj(str(p))
    v_cpp = load_obj_cpp(str(p))
    np.testing.assert_array_equal(v_py, v_cpp)
