"""Estimator semantics: the image-changing quirks of pixel_colour
(gpu_kernel.cl:624-647) and RayColour termination (gpu_kernel.cl:266-348)."""

import jax
import jax.numpy as jnp
import numpy as np

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.scene import (BoundingBoxes, Camera, Scene, Sky,
                                         Spheres, Triangles, materials as mat)
from opencl_ray_tracer_tpu.tracer.estimator import accumulate_sample, trace


def _scene(spheres, sky=None, camera=None):
    return Scene(camera or Camera.create((0, 0, 0), (0, 0, -1)),
                 spheres, Triangles.empty(), BoundingBoxes.empty(),
                 sky or Sky.gradient())


def test_accumulate_clamp_before_average():
    # A 3.0 radiance sample contributes 1.0 (clamped), not 3.0
    # (gpu_kernel.cl:632-638).
    acc = jnp.zeros((1, 3))
    out = accumulate_sample(acc, jnp.full((1, 3), 3.0), "running_sum", True)
    np.testing.assert_allclose(np.asarray(out), 1.0)
    out = accumulate_sample(acc, jnp.full((1, 3), -2.0), "running_sum", True)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_accumulate_nan_running_sum_policy():
    # NaN channel -> running-sum channel value (gpu_kernel.cl:640-642):
    # sample sequence [0.5, NaN, 0.25] sums to 0.5 + 0.5 + 0.25.
    acc = jnp.zeros((1, 3))
    acc = accumulate_sample(acc, jnp.full((1, 3), 0.5), "running_sum", True)
    acc = accumulate_sample(acc, jnp.full((1, 3), np.nan), "running_sum", True)
    acc = accumulate_sample(acc, jnp.full((1, 3), 0.25), "running_sum", True)
    np.testing.assert_allclose(np.asarray(acc), 1.25)


def test_accumulate_nan_zero_policy():
    acc = jnp.zeros((1, 3))
    acc = accumulate_sample(acc, jnp.full((1, 3), 0.5), "zero", True)
    acc = accumulate_sample(acc, jnp.full((1, 3), np.nan), "zero", True)
    np.testing.assert_allclose(np.asarray(acc), 0.5)


def _trace_one(scene, o, d, max_depth=4, early_stop=False):
    return np.asarray(trace(
        scene, jnp.asarray([o], jnp.float32), jnp.asarray([d], jnp.float32),
        jnp.array([0], jnp.int32), jnp.int32(0), jnp.uint32(0),
        max_depth, early_stop=early_stop))[0]


def test_miss_returns_gradient_sky():
    sc = _scene(Spheres.empty())
    got = _trace_one(sc, (0, 0, 0), (0, 1, 0))
    np.testing.assert_allclose(got, [0.5, 0.7, 1.0], atol=1e-6)  # t=1 -> blue
    got = _trace_one(sc, (0, 0, 0), (1, 0, 0))
    np.testing.assert_allclose(got, [0.75, 0.85, 1.0], atol=1e-6)  # t=0.5


def test_emissive_returns_throughput_times_albedo():
    spheres = Spheres.from_list([
        ((0.0, 0.0, -2.0), 0.5, (2.0, 3.0, 4.0), 0.0, 0.0, mat.EMISSIVE)])
    sc = _scene(spheres)
    got = _trace_one(sc, (0, 0, 0), (0, 0, -1))
    np.testing.assert_allclose(got, [2.0, 3.0, 4.0], atol=1e-6)


def test_depth_exhaustion_returns_black():
    # Two parallel mirrors: the ray ping-pongs forever -> black at any depth.
    spheres = Spheres.from_list([
        ((0.0, 0.0, -1e4), 1e4 - 10.0, (1.0, 1.0, 1.0), 0.0, 0.0, mat.METAL),
        ((0.0, 0.0, 1e4), 1e4 - 10.0, (1.0, 1.0, 1.0), 0.0, 0.0, mat.METAL)])
    sc = _scene(spheres)
    got = _trace_one(sc, (0, 0, 0), (0, 0, -1), max_depth=6)
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_lambertian_multiplies_albedo():
    spheres = Spheres.from_list([
        ((0.0, 0.0, -2.0), 0.5, (0.5, 0.25, 0.125), 0.0, 0.0,
         mat.LAMBERTIAN)])
    sc = _scene(spheres)
    got = _trace_one(sc, (0, 0, 0), (0, 0, -1), max_depth=8)
    # one diffuse bounce then (almost surely) sky: radiance <= albedo * sky
    assert (got <= np.array([0.5, 0.25, 0.125]) * 1.0 + 1e-6).all()
    assert got.max() > 0.0


def test_early_stop_matches_scan():
    sc = ort.readme_scene()
    n = 256
    rng = np.random.default_rng(0)
    o = np.zeros((n, 3), np.float32)
    d = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.3, 1, n),
                  -np.ones(n)], axis=1).astype(np.float32)
    args = (sc, jnp.asarray(o), jnp.asarray(d),
            jnp.arange(n, dtype=jnp.int32), jnp.int32(0), jnp.uint32(0), 12)
    a = np.asarray(trace(*args, early_stop=False))
    b = np.asarray(trace(*args, early_stop=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_render_deterministic_same_seed():
    sc = ort.readme_scene()
    cfg = ort.RenderConfig(width=32, height=18, spp=2, max_depth=4)
    a = np.asarray(ort.render(sc, cfg, seed=5))
    b = np.asarray(ort.render(sc, cfg, seed=5))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(ort.render(sc, cfg, seed=6))
    assert np.abs(a - c).max() > 0  # different seed -> different noise


def test_render_row_chunking_equivalent():
    sc = ort.readme_scene()
    cfg = ort.RenderConfig(width=32, height=18, spp=2, max_depth=4)
    a = np.asarray(ort.render(sc, cfg, seed=1))
    b = np.asarray(ort.render(sc, cfg.replace(row_chunk=6), seed=1))
    np.testing.assert_array_equal(a, b)


def test_hdr_sky_lookup():
    # 2x4 HDR "image": distinct colours; ray +x maps to u=0.5 -> x=2.
    img = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    sc = _scene(Spheres.empty(), sky=Sky.hdr(img))
    got = _trace_one(sc, (0, 0, 0), (1.0, 0.0, 0.0))
    # u = 0.5, v = 0.5 -> x = 2, y = 1
    np.testing.assert_allclose(got, img[1, 2], atol=1e-5)
