"""Counter-based RNG: determinism, uniformity, sampler distributions."""

import jax.numpy as jnp
import numpy as np

from opencl_ray_tracer_tpu import rng


def test_uniform4_deterministic_and_order_invariant():
    pix = jnp.arange(1000, dtype=jnp.uint32)
    a1 = rng.uniform4(7, pix, 3, 5)[0]
    a2 = rng.uniform4(7, pix[::-1], 3, 5)[0][::-1]
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_uniform4_range_and_mean():
    pix = jnp.arange(20000, dtype=jnp.uint32)
    draws = np.concatenate([np.asarray(x) for x in
                            rng.uniform4(0, pix, 0, 0)])
    assert draws.min() >= 0.0 and draws.max() < 1.0
    assert abs(draws.mean() - 0.5) < 5e-3
    assert abs(np.var(draws) - 1.0 / 12.0) < 1e-3


def test_streams_decorrelated():
    pix = jnp.arange(10000, dtype=jnp.uint32)
    a = np.asarray(rng.uniform4(0, pix, 0, 0)[0])
    b = np.asarray(rng.uniform4(0, pix, 1, 0)[0])  # next sample stream
    c = np.asarray(rng.uniform4(1, pix, 0, 0)[0])  # different seed
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.05
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.05


def test_unit_vector_is_unit_and_isotropic():
    n = 40000
    u = np.random.default_rng(0).uniform(size=(2, n)).astype(np.float32)
    v = np.asarray(rng.unit_vector_from_uniforms(jnp.asarray(u[0]),
                                                 jnp.asarray(u[1])))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    assert np.abs(v.mean(axis=0)).max() < 0.02
    # each coordinate of a uniform direction has variance 1/3
    assert np.abs(v.var(axis=0) - 1.0 / 3.0).max() < 0.01


def test_in_unit_sphere_radius_distribution():
    n = 40000
    u = np.random.default_rng(1).uniform(size=(3, n)).astype(np.float32)
    p = np.asarray(rng.in_unit_sphere_from_uniforms(*map(jnp.asarray, u)))
    r = np.linalg.norm(p, axis=1)
    assert r.max() <= 1.0 + 1e-6
    # uniform ball: E[r] = 3/4
    assert abs(r.mean() - 0.75) < 0.01


def test_in_unit_disk():
    n = 40000
    u = np.random.default_rng(2).uniform(size=(2, n)).astype(np.float32)
    p = np.asarray(rng.in_unit_disk_from_uniforms(jnp.asarray(u[0]),
                                                  jnp.asarray(u[1])))
    assert np.abs(p[:, 2]).max() == 0.0
    r = np.linalg.norm(p[:, :2], axis=1)
    assert r.max() <= 1.0 + 1e-6
    # uniform disk: E[r] = 2/3
    assert abs(r.mean() - 2.0 / 3.0) < 0.01
