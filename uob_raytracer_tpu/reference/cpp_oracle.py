"""ctypes wrapper for the scalar C++ oracle (reference/cpp/oracle.cpp).

Builds the shared library on first use (g++ is part of the environment).
The C++ oracle is an independent scalar implementation of the reference
semantics used to cross-check the vectorized NumPy oracle.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..config import RenderConfig
from ..scene import Scene

_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_LIB = os.path.join(_DIR, "liboracle.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "oracle.cpp")
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    _lib = ctypes.CDLL(_LIB)
    return _lib


def _fp(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def render_cpp_oracle(scene: Scene, cfg: RenderConfig) -> np.ndarray:
    """Render the float image [H, W, 3] with the scalar C++ oracle."""
    lib = _load()
    s = {k: _fp(getattr(scene, k)) for k in (
        "tri_v0", "tri_v1", "tri_v2", "tri_rgb", "tri_mat",
        "sph_center", "sph_r2", "sph_rgb", "sph_mat",
        "light_pos", "light_color", "indirect_light", "camera_pos")}
    T = s["tri_v0"].shape[0]
    S = s["sph_center"].shape[0]
    out = np.zeros((cfg.height, cfg.width, 3), dtype=np.float32)
    c_fp = ctypes.POINTER(ctypes.c_float)
    p = lambda a: a.ctypes.data_as(c_fp)
    yaw = float(np.asarray(scene.yaw))
    pitch = float(np.asarray(scene.pitch))
    if cfg.cpu_ref:
        rc = lib.oracle_render_cpu_ref(
            p(s["tri_v0"]), p(s["tri_v1"]), p(s["tri_v2"]),
            p(s["tri_rgb"]), p(s["tri_mat"]), ctypes.c_int(T),
            p(s["light_pos"]), p(s["light_color"]), p(s["indirect_light"]),
            p(s["camera_pos"]),
            ctypes.c_float(yaw), ctypes.c_float(pitch),
            ctypes.c_int(cfg.width), ctypes.c_int(cfg.height),
            ctypes.c_float(cfg.effective_focal),
            ctypes.c_float(cfg.cpu_ref_bias), p(out))
    else:
        rc = lib.oracle_render_gpu(
            p(s["tri_v0"]), p(s["tri_v1"]), p(s["tri_v2"]),
            p(s["tri_rgb"]), p(s["tri_mat"]), ctypes.c_int(T),
            p(s["sph_center"]), p(s["sph_r2"]), p(s["sph_rgb"]),
            p(s["sph_mat"]), ctypes.c_int(S),
            p(s["light_pos"]), p(s["light_color"]), p(s["indirect_light"]),
            p(s["camera_pos"]),
            ctypes.c_float(yaw), ctypes.c_float(pitch),
            ctypes.c_int(cfg.width), ctypes.c_int(cfg.height),
            ctypes.c_int(cfg.aa_x), ctypes.c_int(cfg.aa_y),
            ctypes.c_int(cfg.shadow_samples),
            ctypes.c_float(cfg.light_spread), ctypes.c_int(cfg.bounces),
            ctypes.c_float(cfg.effective_focal), ctypes.c_float(cfg.bias),
            ctypes.c_int(1 if cfg.quirk_nan_tir else 0), p(out))
    if rc != 0:
        raise RuntimeError(f"C++ oracle failed with code {rc}")
    return out


def load_obj_cpp(path: str, scale: float = 1.5,
                 translate=(-0.4, 1.15, -0.7)) -> np.ndarray:
    """Native OBJ loader (C++, mirrors Source/Loader.cpp transforms).
    Returns triangle vertices [T, 3, 3] float32."""
    lib = _load()
    t = _fp(np.asarray(translate, dtype=np.float32))
    c_fp = ctypes.POINTER(ctypes.c_float)
    n = lib.oracle_load_obj(path.encode(), ctypes.c_float(scale),
                            t.ctypes.data_as(c_fp), None, 0)
    if n < 0:
        raise IOError(f"oracle_load_obj failed with code {n} for {path}")
    out = np.zeros((n, 3, 3), dtype=np.float32)
    got = lib.oracle_load_obj(path.encode(), ctypes.c_float(scale),
                              t.ctypes.data_as(c_fp),
                              out.ctypes.data_as(c_fp), n)
    assert got == n
    return out
