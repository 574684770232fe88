"""Differentiable look-at camera.

Reproduces the reference camera model exactly:

- ``CalculateCamera`` (``src/cpp/opencl_objects/cl_camera.cpp:3-44``):
  FoV -> viewport, (u, v, w) basis, lower-left corner, defocus-disc vectors.
  Including the reference's quirk that **aperture is given in degrees** and
  converted to radians (``cl_camera.cpp:6``), with
  ``defocusRadius = focusDist * tan(aperture_rad / 2)`` (``:27``).
- Device-side ``GetRay`` (``gpu_kernel.cl:559-578``): pinhole when
  aperture <= 0, otherwise origin jittered on the defocus disc.

Unlike the reference (which bakes derived vectors into a POD struct on the
host), the pytree stores only the *user parameters*; derived quantities are
recomputed inside jit so gradients flow to look_from/look_at/vfov/etc.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..rng import in_unit_disk_from_uniforms

# The reference's pi literal.  Plain Python float, NOT a jnp array: a
# module-level jnp constant materializes on whatever backend is active at
# import time and every later lowering would fetch it from that device.
_DEG = float(3.141592654 / 180.0)


@dataclasses.dataclass(frozen=True)
class Camera:
    """Differentiable camera parameters (all f32 scalars / (3,) vectors)."""

    look_from: jnp.ndarray
    look_at: jnp.ndarray
    vup: jnp.ndarray
    vfov_deg: jnp.ndarray      # vertical field of view, degrees
    aspect_ratio: jnp.ndarray
    focus_dist: jnp.ndarray
    aperture_deg: jnp.ndarray  # reference quirk: aperture in DEGREES

    @staticmethod
    def create(look_from, look_at, vup=(0.0, 1.0, 0.0), vfov_deg=60.0,
               aspect_ratio=16.0 / 9.0, focus_dist=2.0,
               aperture_deg=1.2) -> "Camera":
        f32 = jnp.float32
        return Camera(
            jnp.asarray(look_from, f32), jnp.asarray(look_at, f32),
            jnp.asarray(vup, f32), f32(vfov_deg), f32(aspect_ratio),
            f32(focus_dist), f32(aperture_deg))


jax.tree_util.register_dataclass(
    Camera,
    data_fields=["look_from", "look_at", "vup", "vfov_deg", "aspect_ratio",
                 "focus_dist", "aperture_deg"],
    meta_fields=[],
)


def _unit(v):
    return v / jnp.linalg.norm(v)


def camera_frame(cam: Camera):
    """Derived camera quantities (CalculateCamera, cl_camera.cpp:3-44).

    Returns dict with origin, horizontal, vertical, lower_left_corner,
    defocus_disc_u, defocus_disc_v, aperture_rad.
    """
    aperture = cam.aperture_deg * _DEG          # cl_camera.cpp:6
    theta = cam.vfov_deg * _DEG                 # cl_camera.cpp:9
    h = jnp.tan(theta / 2.0)
    viewport_h = 2.0 * h * cam.focus_dist       # cl_camera.cpp:11
    viewport_w = cam.aspect_ratio * viewport_h

    w = _unit(cam.look_from - cam.look_at)      # cl_camera.cpp:15-17
    u = _unit(jnp.cross(cam.vup, w))
    v = jnp.cross(w, u)

    horizontal = u * viewport_w                 # cl_camera.cpp:20-21
    vertical = v * viewport_h
    lower_left = (cam.look_from - horizontal / 2.0 - vertical / 2.0
                  - w * cam.focus_dist)         # cl_camera.cpp:24

    defocus_radius = cam.focus_dist * jnp.tan(aperture / 2.0)  # :27
    return dict(
        origin=cam.look_from,
        horizontal=horizontal,
        vertical=vertical,
        lower_left_corner=lower_left,
        defocus_disc_u=u * defocus_radius,
        defocus_disc_v=v * defocus_radius,
        aperture_rad=aperture,
    )


def make_rays(cam: Camera, uu, vv, lens_u1, lens_u2):
    """Generate camera rays (GetRay, gpu_kernel.cl:559-578).

    uu, vv: (...,) viewport coordinates in [0,1] (v = 0 at the image bottom,
    matching the reference's bottom-up framebuffer).
    lens_u1/u2: (...,) uniforms for the defocus-disc sample.
    Returns (origin, direction), each (..., 3); direction NOT normalized
    (matching the reference).
    """
    f = camera_frame(cam)
    p = in_unit_disk_from_uniforms(lens_u1, lens_u2)  # (..., 3)
    lens_offset = (f["defocus_disc_u"] * p[..., 0:1]
                   + f["defocus_disc_v"] * p[..., 1:2])
    # aperture <= 0 -> pinhole (gpu_kernel.cl:563-566)
    origin = jnp.where(f["aperture_rad"] > 0.0,
                       f["origin"] + lens_offset,
                       jnp.broadcast_to(f["origin"], lens_offset.shape))
    target = (f["lower_left_corner"]
              + f["horizontal"] * uu[..., None]
              + f["vertical"] * vv[..., None])
    return origin, target - origin
