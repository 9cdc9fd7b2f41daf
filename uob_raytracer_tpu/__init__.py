"""uob_raytracer_tpu — a TPU-native differentiable ray tracer.

A from-scratch JAX/Pallas framework with the capabilities of the reference
OpenCL ray tracer (harrywaugh/UOB_Raytracer): per-pixel camera rays over the
Cornell Box plus analytic spheres, supersampled anti-aliasing, jittered
soft shadows, mirror reflection and medium-tracked refraction — plus what the
reference never had: gradients of pixels w.r.t. scene parameters and
multi-chip scaling via shard_map.
"""
from .config import RenderConfig, ShadingModel, baseline_configs  # noqa: F401
from .scene import (  # noqa: F401
    Scene, cornell_box, load_obj, add_triangles, compute_normals, animate_light,
)
from .render import render, render_image, render_packed  # noqa: F401

__version__ = "0.1.0"
