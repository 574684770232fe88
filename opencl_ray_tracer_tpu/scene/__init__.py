"""Scene data model: pytree dataclasses (SoA jnp arrays).

This layer replaces the reference's L1 host<->device ABI structs
(``src/cpp/opencl_objects/``, mirrored at ``gpu_kernel.cl:3-69``).  The whole
scene is one JAX pytree — the differentiable parameter container for inverse
rendering.
"""

from __future__ import annotations

import dataclasses

import jax

from .camera import Camera, camera_frame, make_rays
from .geometry import BoundingBoxes, Spheres, Triangles
from .sky import Sky, sky_colour, direction_to_uv
from . import materials


@dataclasses.dataclass(frozen=True)
class Scene:
    camera: Camera
    spheres: Spheres
    triangles: Triangles
    boxes: BoundingBoxes
    sky: Sky


jax.tree_util.register_dataclass(
    Scene,
    data_fields=["camera", "spheres", "triangles", "boxes", "sky"],
    meta_fields=[],
)

from .presets import (  # noqa: E402
    flagship_scene, readme_scene, reference_scene, book_cover_scene)
from .builder import scene_from_json, scene_to_json  # noqa: E402

__all__ = [
    "Scene", "Camera", "Spheres", "Triangles", "BoundingBoxes", "Sky",
    "camera_frame", "make_rays", "sky_colour", "direction_to_uv",
    "materials", "readme_scene", "reference_scene", "book_cover_scene",
    "flagship_scene",
    "scene_from_json", "scene_to_json",
]
