"""Scatter math vs the reference BRDFs (gpu_kernel.cl:398-451)."""

import jax.numpy as jnp
import numpy as np

from opencl_ray_tracer_tpu.scene import materials as mat
from opencl_ray_tracer_tpu.tracer.scatter import (
    reflect, reflectance, refract, scatter)


def _one(mat_type, d, normal, front_face=True, albedo=(0.5, 0.6, 0.7),
         fuzz=0.0, ior=1.5, u=None):
    r = 1
    u = jnp.asarray(u if u is not None else np.full((1, 8), 0.5), jnp.float32)
    return scatter(jnp.asarray([d], jnp.float32),
                   jnp.asarray([normal], jnp.float32),
                   jnp.asarray([front_face]),
                   jnp.asarray([albedo], jnp.float32),
                   jnp.full((r,), fuzz, jnp.float32),
                   jnp.full((r,), ior, jnp.float32),
                   jnp.full((r,), mat_type, jnp.int32), u)


def test_reflect_formula():
    v = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(reflect(v, n)), [[1.0, 1.0, 0.0]],
                               atol=1e-6)


def test_reflectance_schlick_values():
    # r0 = ((1-1.5)/(1+1.5))^2 = 0.04; cos=1 -> 0.04; cos=0 -> 1.0.
    np.testing.assert_allclose(float(reflectance(jnp.float32(1.0), 1.5)),
                               0.04, atol=1e-6)
    np.testing.assert_allclose(float(reflectance(jnp.float32(0.0), 1.5)),
                               1.0, atol=1e-6)


def test_refract_snell():
    # Normal incidence: direction unchanged by refraction.
    uv = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = np.asarray(refract(uv, n, jnp.array([1.0 / 1.5])))
    np.testing.assert_allclose(out, [[0.0, -1.0, 0.0]], atol=1e-6)
    # 45 degrees air->glass: sin(theta_t) = sin(45)/1.5.
    uv = jnp.array([[np.sqrt(0.5), -np.sqrt(0.5), 0.0]])
    out = np.asarray(refract(uv, n, jnp.array([1.0 / 1.5])))[0]
    sin_t = abs(out[0]) / np.linalg.norm(out)
    np.testing.assert_allclose(sin_t, np.sqrt(0.5) / 1.5, atol=1e-5)


def test_lambertian_distribution_and_attenuation():
    rng = np.random.default_rng(0)
    n = 2000
    u = rng.uniform(size=(n, 8)).astype(np.float32)
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    sc = scatter(d, normal, jnp.ones(n, bool),
                 jnp.tile(jnp.array([[0.5, 0.6, 0.7]]), (n, 1)),
                 jnp.zeros(n), jnp.zeros(n),
                 jnp.full((n,), mat.LAMBERTIAN, jnp.int32), jnp.asarray(u))
    dirs = np.asarray(sc.direction)
    # normal + unit vector: every scatter is within the upper hemisphere
    # closure |dir - n| = 1.
    np.testing.assert_allclose(
        np.linalg.norm(dirs - np.array([0, 0, 1.0]), axis=1), 1.0, atol=1e-5)
    assert not np.asarray(sc.absorbed).any()
    np.testing.assert_allclose(np.asarray(sc.attenuation)[0], [0.5, 0.6, 0.7],
                               atol=1e-6)


def test_metal_perfect_mirror_zero_fuzz():
    sc = _one(mat.METAL, d=(1.0, -1.0, 0.0), normal=(0.0, 1.0, 0.0))
    got = np.asarray(sc.direction)[0]
    want = np.array([1.0, 1.0, 0.0]) / np.sqrt(2.0)  # reflect of unit(d)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert not bool(sc.absorbed[0])


def test_metal_absorb_below_horizon():
    # Large fuzz can push the scattered ray below the surface -> absorbed
    # (gpu_kernel.cl:422: dot(scattered, normal) > 0 required).
    found_absorbed = False
    for seed in range(10):
        rng = np.random.default_rng(seed)
        u = rng.uniform(size=(1, 8)).astype(np.float32)
        sc = _one(mat.METAL, d=(1.0, -0.05, 0.0), normal=(0.0, 1.0, 0.0),
                  fuzz=1.0, u=u)
        dot = float(np.sum(np.asarray(sc.direction)[0] * [0, 1, 0]))
        assert bool(sc.absorbed[0]) == (dot <= 0)
        found_absorbed |= bool(sc.absorbed[0])
    assert found_absorbed


def test_dielectric_total_internal_reflection():
    # Inside glass (front_face=False, ratio=ior=1.5), grazing incidence:
    # ratio*sin > 1 -> must reflect regardless of the uniform.
    u = np.zeros((1, 8), np.float32)
    u[0, 5] = 0.999  # would choose refract if reflectance were the reason
    d = (np.sqrt(0.9), -np.sqrt(0.1), 0.0)
    sc = _one(mat.DIELECTRIC, d=d, normal=(0.0, 1.0, 0.0), front_face=False,
              ior=1.5, u=u)
    got = np.asarray(sc.direction)[0]
    want = np.asarray(reflect(jnp.asarray([d]) / np.linalg.norm(d),
                              jnp.asarray([[0.0, 1.0, 0.0]])))[0]
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc.attenuation)[0], [1, 1, 1],
                               atol=0)


def test_dielectric_refracts_when_allowed():
    u = np.zeros((1, 8), np.float32)
    u[0, 5] = 0.999  # reflectance(normal incidence)=0.04 < 0.999 -> refract
    sc = _one(mat.DIELECTRIC, d=(0.0, -1.0, 0.0), normal=(0.0, 1.0, 0.0),
              front_face=True, ior=1.5, u=u)
    np.testing.assert_allclose(np.asarray(sc.direction)[0], [0, -1, 0],
                               atol=1e-5)


def test_emissive_flag():
    sc = _one(mat.EMISSIVE, d=(0.0, -1.0, 0.0), normal=(0.0, 1.0, 0.0))
    assert bool(sc.emitted[0])
