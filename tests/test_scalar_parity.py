"""Scalar-reference parity: a straight-line pure-Python transcription of the
reference's control flow (RayColour / scatter / HitAnything semantics,
gpu_kernel.cl:266-451), driven by the SAME pcg4d counter draws as the
vectorized tracer — per-ray radiance must agree to fp tolerance.

This is the SURVEY.md §4 "scalar Python re-implementation" oracle: it checks
the vectorized/branchless estimator against an implementation whose shape
matches the C code one-to-one (sequential ifs, early returns), so any
masking/select mistake in the vector path shows up as a mismatch."""

import math

import jax.numpy as jnp
import numpy as np

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu import rng as _rng
from opencl_ray_tracer_tpu.scene import materials as mat
from opencl_ray_tracer_tpu.tracer.estimator import trace


def _draws(seed, pixel, sample, slot):
    return [float(x) for x in _rng.uniform4(seed, np.uint32(pixel),
                                            np.uint32(sample),
                                            np.uint32(slot))]


def _unit(v):
    n = math.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2)
    return (v[0] / n, v[1] / n, v[2] / n)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _unit_vec_from(u1, u2):
    z = 2 * u1 - 1
    phi = 2 * math.pi * u2
    r = math.sqrt(max(0.0, 1 - z * z))
    return (r * math.cos(phi), r * math.sin(phi), z)


def _in_sphere_from(u1, u2, u3):
    d = _unit_vec_from(u1, u2)
    rad = u3 ** (1.0 / 3.0)
    return _scale(d, rad)


def scalar_ray_colour(scene, o, d, pixel, sample, seed, max_depth,
                      t_min=1e-3):
    """Sequential transcription of RayColour (gpu_kernel.cl:266-348)."""
    spheres = scene.spheres
    n = spheres.count
    centers = np.asarray(spheres.center)
    radii = np.asarray(spheres.radius)
    albedo = np.asarray(spheres.albedo)
    fuzz = np.asarray(spheres.fuzz)
    ior = np.asarray(spheres.ior)
    types = np.asarray(spheres.mat_type)

    colour = [1.0, 1.0, 1.0]
    depth = 0
    while depth < max_depth:
        # HitAnything: closest-so-far over spheres (gpu_kernel.cl:358-372)
        closest = math.inf
        hit_i = -1
        for i in range(n):
            oc = _sub(o, centers[i])
            a = _dot(d, d)
            half_b = _dot(oc, d)
            c = _dot(oc, oc) - radii[i] ** 2
            disc = half_b * half_b - a * c
            if disc < 0:
                continue
            sq = math.sqrt(disc)
            root = (-half_b - sq) / a
            if root < t_min or closest < root:
                root = (-half_b + sq) / a
                if root < t_min or closest < root:
                    continue
            closest = root
            hit_i = i
        if hit_i < 0:
            break  # miss -> sky

        p = _add(o, _scale(d, closest))
        outward = _scale(_sub(p, centers[hit_i]), 1.0 / radii[hit_i])
        front = _dot(d, outward) < 0
        normal = outward if front else _scale(outward, -1.0)

        u = _draws(seed, pixel, sample, 4 + depth * 2)
        u2 = _draws(seed, pixel, sample, 5 + depth * 2)
        t = int(types[hit_i])
        if t == mat.LAMBERTIAN:
            rv = _unit_vec_from(u[0], u[1])
            sd = _add(normal, rv)
            if all(abs(c) < 1e-8 for c in sd):
                sd = normal
            o, d = p, sd
            colour = [colour[k] * albedo[hit_i][k] for k in range(3)]
        elif t == mat.METAL:
            ud = _unit(d)
            refl = _sub(ud, _scale(normal, 2 * _dot(ud, normal)))
            fv = _in_sphere_from(u[2], u[3], u2[0])
            sd = _add(refl, _scale(fv, float(fuzz[hit_i])))
            if _dot(sd, normal) <= 0:
                return (0.0, 0.0, 0.0)  # absorbed (gpu_kernel.cl:309)
            o, d = p, sd
            colour = [colour[k] * albedo[hit_i][k] for k in range(3)]
        elif t == mat.DIELECTRIC:
            ratio = (1.0 / float(ior[hit_i])) if front else float(ior[hit_i])
            ud = _unit(d)
            cos_t = min(_dot(_scale(ud, -1.0), normal), 1.0)
            sin_t = math.sqrt(max(0.0, 1 - cos_t * cos_t))
            r0 = ((1 - ratio) / (1 + ratio)) ** 2
            refl = r0 + (1 - r0) * (1 - cos_t) ** 5
            if ratio * sin_t > 1.0 or refl > u2[1]:
                sd = _sub(ud, _scale(normal, 2 * _dot(ud, normal)))
            else:
                r_perp = _scale(_add(ud, _scale(normal, cos_t)), ratio)
                par = -math.sqrt(abs(1 - _dot(r_perp, r_perp)))
                sd = _add(r_perp, _scale(normal, par))
            o, d = p, sd
            # attenuation = (1,1,1)
        else:  # EMISSIVE (gpu_kernel.cl:326-329)
            return tuple(colour[k] * albedo[hit_i][k] for k in range(3))
        depth += 1

    if depth == max_depth:
        return (0.0, 0.0, 0.0)  # gpu_kernel.cl:337-340

    # miss -> throughput * gradient sky (gpu_kernel.cl:342-347)
    ud = _unit(d)
    tt = 0.5 * (ud[1] + 1.0)
    sky = [(1 - tt) * 1.0 + tt * c for c in (0.5, 0.7, 1.0)]
    return tuple(colour[k] * sky[k] for k in range(3))


def test_scalar_vs_vectorized_trace():
    scene = ort.readme_scene()
    n_rays = 48
    rs = np.random.default_rng(0)
    o = np.zeros((n_rays, 3), np.float32)
    d = np.stack([rs.uniform(-1.2, 1.2, n_rays),
                  rs.uniform(-0.6, 1.0, n_rays),
                  -np.ones(n_rays)], axis=1).astype(np.float32)
    pixel_ids = np.arange(n_rays, dtype=np.int32) * 37  # arbitrary ids
    seed, sample, depth = 9, 3, 8

    vec = np.asarray(trace(scene, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(pixel_ids), jnp.int32(sample),
                           jnp.uint32(seed), depth, early_stop=False))
    mism = 0
    for i in range(n_rays):
        want = scalar_ray_colour(scene, tuple(o[i]), tuple(d[i]),
                                 int(pixel_ids[i]), sample, seed, depth)
        if not np.allclose(vec[i], want, atol=5e-4):
            mism += 1
    # fp-boundary flips can differ on a ray or two; bulk must agree
    assert mism <= 1, f"{mism}/{n_rays} rays disagree"


def test_scalar_vs_vectorized_reference_scene():
    scene = ort.reference_scene()  # all 4 materials
    n_rays = 48
    rs = np.random.default_rng(5)
    o = np.tile(np.array([[-1.3, 0.2, 0.5]], np.float32), (n_rays, 1))
    target = (np.array([0.2, 0.0, -1.5])
              + rs.uniform(-1.0, 1.0, (n_rays, 3)) * [1.5, 0.8, 1.0])
    d = (target - o).astype(np.float32)
    pixel_ids = np.arange(n_rays, dtype=np.int32) * 101
    seed, sample, depth = 2, 0, 6

    vec = np.asarray(trace(scene, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(pixel_ids), jnp.int32(sample),
                           jnp.uint32(seed), depth, early_stop=False))
    mism = 0
    for i in range(n_rays):
        want = scalar_ray_colour(scene, tuple(o[i]), tuple(d[i]),
                                 int(pixel_ids[i]), sample, seed, depth)
        if not np.allclose(vec[i], want, atol=5e-4):
            mism += 1
    assert mism <= 2, f"{mism}/{n_rays} rays disagree"
