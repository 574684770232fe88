"""opencl_ray_tracer_tpu — a TPU-native differentiable path tracer.

Brand-new framework with the capabilities of WillBurland/OpenCL-Ray-Tracer
(reference at /root/reference), redesigned for TPU:

- Scene = SoA pytree dataclasses (the differentiable parameters), replacing
  the host<->device ABI structs (reference src/cpp/opencl_objects/).
- Compute path = XLA-compiled jnp + Pallas/Mosaic kernels, replacing the
  OpenCL C megakernel (src/opencl/gpu_kernel.cl).
- Parallelism = jax.sharding Mesh + shard_map/pjit over image tiles and
  samples with ICI collectives, replacing the sequential host block loop
  (src/cpp/main.cpp:229-269).
- Counter-based RNG (order/sharding invariant), replacing the stateful LCG.
- Differentiable end-to-end: gradients of pixels w.r.t. sphere geometry,
  materials and camera for inverse rendering.
"""

from .config import README_BENCH, REFERENCE_DEFAULTS, RenderConfig
from .scene import (BoundingBoxes, Camera, Scene, Sky, Spheres, Triangles,
                    book_cover_scene, flagship_scene, materials,
                    readme_scene, reference_scene, scene_from_json,
                    scene_to_json)
from .tracer import render, render_and_grad, render_rows
from .tracer.soft import render_soft
from .optimize import fit_scene

__version__ = "0.1.0"

__all__ = [
    "RenderConfig", "REFERENCE_DEFAULTS", "README_BENCH",
    "Scene", "Camera", "Spheres", "Triangles", "BoundingBoxes", "Sky",
    "materials", "readme_scene", "reference_scene", "book_cover_scene",
    "flagship_scene",
    "scene_from_json", "scene_to_json",
    "render", "render_rows", "render_and_grad", "render_soft", "fit_scene",
]
