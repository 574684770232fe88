"""Intersection math vs closed-form cases (HitSphere gpu_kernel.cl:455-487,
HitTriangle :489-532, HitBoundingBox :534-555, HitAnything :358-394)."""

import jax.numpy as jnp
import numpy as np

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.scene import (BoundingBoxes, Camera, Scene, Sky,
                                         Spheres, Triangles, materials as mat)
from opencl_ray_tracer_tpu.tracer.intersect import (
    BIG, closest_hit, hit_aabbs, hit_spheres, hit_triangles_chunk)


def _scene(spheres=None, tris=None, boxes=None):
    return Scene(Camera.create((0, 0, 0), (0, 0, -1)),
                 spheres or Spheres.empty(),
                 tris or Triangles.empty(),
                 boxes or BoundingBoxes.empty(),
                 Sky.gradient())


def test_sphere_hit_head_on():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    c = jnp.array([[0.0, 0.0, -3.0]])
    r = jnp.array([1.0])
    t = hit_spheres(o, d, c, r, 1e-3)
    np.testing.assert_allclose(np.asarray(t), [[2.0]], atol=1e-6)


def test_sphere_near_far_root_selection():
    # Origin inside the sphere: near root is negative -> far root returned.
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    c = jnp.array([[0.0, 0.0, 0.0]])
    r = jnp.array([2.0])
    t = hit_spheres(o, d, c, r, 1e-3)
    np.testing.assert_allclose(np.asarray(t), [[2.0]], atol=1e-6)


def test_sphere_miss_and_behind():
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])  # miss; sphere behind
    c = jnp.array([[0.0, 0.0, -3.0]])
    r = jnp.array([1.0])
    t = np.asarray(hit_spheres(o, d, c, r, 1e-3))
    assert (t >= BIG).all()


def test_sphere_tmin_respects_reference_inclusive_bound():
    # Root exactly t_min is accepted (reference rejects only root < tMin).
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    c = jnp.array([[0.0, 0.0, -2.0]])
    r = jnp.array([1.0])
    t = hit_spheres(o, d, c, r, 1.0)
    np.testing.assert_allclose(np.asarray(t), [[1.0]], atol=1e-6)


def test_triangle_barycentric_hit_and_normal():
    p0 = jnp.array([[0.0, 0.0, -2.0]])
    p1 = jnp.array([[2.0, 0.0, -2.0]])
    p2 = jnp.array([[0.0, 2.0, -2.0]])
    o = jnp.array([[0.5, 0.5, 0.0], [1.9, 1.9, 0.0]])  # inside; outside u+v>1
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    gate = jnp.ones((2, 1), bool)
    t = np.asarray(hit_triangles_chunk(o, d, p0, p1, p2, 1e-3, gate))
    np.testing.assert_allclose(t[0], [2.0], atol=1e-6)
    assert t[1] >= BIG


def test_triangle_parallel_cull():
    p0 = jnp.array([[0.0, 0.0, -2.0]])
    p1 = jnp.array([[1.0, 0.0, -2.0]])
    p2 = jnp.array([[0.0, 1.0, -2.0]])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])  # parallel to the triangle plane
    gate = jnp.ones((1, 1), bool)
    t = np.asarray(hit_triangles_chunk(o, d, p0, p1, p2, 1e-3, gate))
    assert (t >= BIG).all()


def test_aabb_slab():
    bmin = jnp.array([[-1.0, -1.0, -3.0]])
    bmax = jnp.array([[1.0, 1.0, -2.0]])
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, -2.5]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    hit = np.asarray(hit_aabbs(o, d, bmin, bmax))
    assert hit[0, 0] and not hit[1, 0]
    assert hit[2, 0]  # origin inside the box


def test_aabb_axis_aligned_ray_zero_component():
    # d has exact zeros -> inf * 0 NaNs must not leak (fmin/fmax semantics).
    bmin = jnp.array([[-1.0, -1.0, -3.0]])
    bmax = jnp.array([[1.0, 1.0, -2.0]])
    o = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = np.asarray(hit_aabbs(o, d, bmin, bmax))
    assert hit[0, 0]
    assert not hit[1, 0]  # parallel ray outside the slab


def test_closest_hit_picks_nearest_and_sets_material():
    spheres = Spheres.from_list([
        ((0.0, 0.0, -5.0), 1.0, (0.1, 0.2, 0.3), 0.0, 0.0, mat.LAMBERTIAN),
        ((0.0, 0.0, -2.5), 0.5, (0.9, 0.8, 0.7), 0.3, 0.0, mat.METAL),
    ])
    sc = _scene(spheres=spheres)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = closest_hit(sc, o, d, 1e-3)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h.albedo[0]), [0.9, 0.8, 0.7],
                               atol=1e-6)
    assert int(h.mat_type[0]) == mat.METAL
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)
    assert bool(h.front_face[0])


def test_closest_hit_sphere_vs_triangle_and_gating():
    # A triangle in front of a sphere, with its AABB; a second ray whose
    # path misses the AABB must not see the triangle.
    spheres = Spheres.from_list([
        ((0.0, 0.0, -5.0), 1.0, (0.1, 0.2, 0.3), 0.0, 0.0, mat.LAMBERTIAN)])
    tris = Triangles.from_vertices(
        np.array([[[-1.0, -1.0, -2.0], [1.0, -1.0, -2.0], [0.0, 1.5, -2.0]]],
                 np.float32),
        albedo=(0.5, 0.5, 0.5), fuzz=0.0, ior=0.0, mat_type=mat.LAMBERTIAN,
        box_id=0)
    boxes = BoundingBoxes.single((-1, -1, -2.01), (1, 1.5, -1.99))
    sc = _scene(spheres=spheres, tris=tris, boxes=boxes)
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    h = closest_hit(sc, o, d, 1e-3)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, atol=1e-5)
    assert not bool(h.hit[1])  # outside AABB -> no triangle, no sphere


def test_closest_hit_triangle_front_face_flip():
    tris = Triangles.from_vertices(
        np.array([[[-1.0, -1.0, -2.0], [1.0, -1.0, -2.0], [0.0, 1.5, -2.0]]],
                 np.float32),
        albedo=(0.5, 0.5, 0.5), fuzz=0.0, ior=0.0, mat_type=mat.LAMBERTIAN,
        box_id=0)
    boxes = BoundingBoxes.single((-1, -1, -2.01), (1, 1.5, -1.99))
    sc = _scene(tris=tris, boxes=boxes)
    # Hit from both sides: normal must always face the ray.
    o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -4.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    h = closest_hit(sc, o, d, 1e-3)
    assert bool(h.hit[0]) and bool(h.hit[1])
    assert float(jnp.sum(h.normal[0] * d[0])) < 0
    assert float(jnp.sum(h.normal[1] * d[1])) < 0


def test_many_triangles_chunked_fold():
    # > TRI_CHUNK triangles to exercise the scan fold + padding.
    n = 700
    rng = np.random.default_rng(1)
    base = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    base[:, 2] = -10.0  # all in z=-10 plane
    tv = np.stack([base,
                   base + np.array([0.3, 0, 0], np.float32),
                   base + np.array([0, 0.3, 0], np.float32)], axis=1)
    # plus one known triangle right in front of the origin ray
    known = np.array([[[-1, -1, -2], [1, -1, -2], [0, 1.5, -2]]], np.float32)
    tv = np.concatenate([tv, known])
    tris = Triangles.from_vertices(tv, albedo=(1, 1, 1), fuzz=0.0, ior=0.0,
                                   mat_type=mat.LAMBERTIAN, box_id=0)
    boxes = BoundingBoxes.single((-6, -6, -10.5), (6, 6, -1.5))
    sc = _scene(tris=tris, boxes=boxes)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    h = closest_hit(sc, o, d, 1e-3)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, atol=1e-5)
