"""Scene geometry as SoA pytree dataclasses.

TPU-native replacement for the reference's array-of-structs host<->device ABI
(``src/cpp/opencl_objects/*`` mirrored byte-for-byte at
``gpu_kernel.cl:3-69``).  On TPU the natural layout is structure-of-arrays
jnp arrays: each field is a contiguous (N,) or (N,3) array, registered as a
JAX pytree so the whole scene is a differentiable parameter container that
moves through jit/grad/shard_map untouched.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import materials as mat


def _register(cls, data_fields):
    jax.tree_util.register_dataclass(
        cls,
        data_fields=list(data_fields),
        meta_fields=[f.name for f in dataclasses.fields(cls)
                     if f.name not in data_fields],
    )
    return cls


@dataclasses.dataclass(frozen=True)
class Spheres:
    """SoA sphere batch: reference ``cl_sphere.hpp:7-13``.

    center: (N,3) f32; radius: (N,) f32; albedo: (N,3) f32;
    fuzz/ior: (N,) f32; mat_type: (N,) i32.
    """

    center: jnp.ndarray
    radius: jnp.ndarray
    albedo: jnp.ndarray
    fuzz: jnp.ndarray
    ior: jnp.ndarray
    mat_type: jnp.ndarray

    @property
    def count(self) -> int:
        return self.center.shape[0]

    @staticmethod
    def empty() -> "Spheres":
        z = jnp.zeros((0,), jnp.float32)
        return Spheres(jnp.zeros((0, 3), jnp.float32), z,
                       jnp.zeros((0, 3), jnp.float32), z, z,
                       jnp.zeros((0,), jnp.int32))

    @staticmethod
    def from_list(entries: Sequence[tuple]) -> "Spheres":
        """entries: (center(3,), radius, albedo(3,), fuzz, ior, mat_type)."""
        if not entries:
            return Spheres.empty()
        c, r, a, f, i, t = zip(*entries)
        return Spheres(
            jnp.asarray(np.array(c), jnp.float32),
            jnp.asarray(np.array(r), jnp.float32),
            jnp.asarray(np.array(a), jnp.float32),
            jnp.asarray(np.array(f), jnp.float32),
            jnp.asarray(np.array(i), jnp.float32),
            jnp.asarray(np.array(t), jnp.int32),
        )


_register(Spheres, ["center", "radius", "albedo", "fuzz", "ior", "mat_type"])


@dataclasses.dataclass(frozen=True)
class Triangles:
    """SoA triangle batch: reference ``cl_triangle.hpp:7-14``.

    p0/p1/p2: (T,3) f32 vertices; albedo (T,3); fuzz/ior (T,);
    mat_type (T,) i32; box_id (T,) i32 — index of the bounding box gating
    this triangle (``gpu_kernel.cl:378-380``).
    """

    p0: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    albedo: jnp.ndarray
    fuzz: jnp.ndarray
    ior: jnp.ndarray
    mat_type: jnp.ndarray
    box_id: jnp.ndarray

    @property
    def count(self) -> int:
        return self.p0.shape[0]

    @staticmethod
    def empty() -> "Triangles":
        v = jnp.zeros((0, 3), jnp.float32)
        z = jnp.zeros((0,), jnp.float32)
        zi = jnp.zeros((0,), jnp.int32)
        return Triangles(v, v, v, v, z, z, zi, zi)

    @staticmethod
    def from_vertices(tri_verts, albedo, fuzz, ior, mat_type, box_id=0) -> "Triangles":
        """tri_verts: (T,3,3) array of triangle corners; one shared material
        (matching the reference's fixed-material-per-mesh, utility.cpp:99)."""
        tv = jnp.asarray(tri_verts, jnp.float32)
        t = tv.shape[0]
        ones = jnp.ones((t,), jnp.float32)
        return Triangles(
            tv[:, 0], tv[:, 1], tv[:, 2],
            jnp.broadcast_to(jnp.asarray(albedo, jnp.float32), (t, 3)),
            ones * jnp.float32(fuzz),
            ones * jnp.float32(ior),
            jnp.full((t,), mat_type, jnp.int32),
            jnp.full((t,), box_id, jnp.int32),
        )


_register(Triangles, ["p0", "p1", "p2", "albedo", "fuzz", "ior",
                      "mat_type", "box_id"])


@dataclasses.dataclass(frozen=True)
class BoundingBoxes:
    """AABB batch: reference ``cl_bounding_box.hpp:6-11``.

    box_min/box_max: (B,3) f32.  The reference's 1-level BVH-lite gates the
    triangle loop behind a slab test per box (``gpu_kernel.cl:374-391``).
    """

    box_min: jnp.ndarray
    box_max: jnp.ndarray

    @property
    def count(self) -> int:
        return self.box_min.shape[0]

    @staticmethod
    def empty() -> "BoundingBoxes":
        v = jnp.zeros((0, 3), jnp.float32)
        return BoundingBoxes(v, v)

    @staticmethod
    def single(box_min, box_max) -> "BoundingBoxes":
        return BoundingBoxes(
            jnp.asarray(box_min, jnp.float32)[None],
            jnp.asarray(box_max, jnp.float32)[None])


_register(BoundingBoxes, ["box_min", "box_max"])
