"""MXU matmul-form triangle intersection vs the direct Moller-Trumbore
fold — including on the reference's actual 15,329-triangle F1 car mesh."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.io import load_obj
from opencl_ray_tracer_tpu.scene import (BoundingBoxes, Triangles,
                                         materials as mat)
from opencl_ray_tracer_tpu.tracer.intersect import closest_hit
from opencl_ray_tracer_tpu.tracer.mesh_accel import make_mm_hit_fn
from opencl_ray_tracer_tpu.tracer.render import render_rows


def _tri_scene(n_random=50, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-2, 2, size=(n_random, 3)).astype(np.float32)
    base[:, 2] = rng.uniform(-4, -2, n_random)
    tv = np.stack([base,
                   base + rng.uniform(0.1, 0.6, (n_random, 3)).astype(np.float32),
                   base + rng.uniform(0.1, 0.6, (n_random, 3)).astype(np.float32)],
                  axis=1)
    tris = Triangles.from_vertices(tv, albedo=(0.7, 0.5, 0.3), fuzz=0.1,
                                   ior=0.0, mat_type=mat.METAL, box_id=0)
    boxes = BoundingBoxes.single((-3, -3, -5), (3, 3, -1))
    return dataclasses.replace(ort.readme_scene(), triangles=tris,
                               boxes=boxes)


def _rays(n=256, seed=1):
    rng = np.random.default_rng(seed)
    o = np.zeros((n, 3), np.float32)
    d = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                  -np.ones(n)], axis=1).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_mm_matches_direct_random_triangles():
    scene = _tri_scene()
    o, d = _rays()
    want = closest_hit(scene, o, d, 1e-3)
    got = make_mm_hit_fn(scene)(o, d)
    hit_w = np.asarray(want.hit)
    np.testing.assert_array_equal(np.asarray(got.hit), hit_w)
    np.testing.assert_allclose(np.asarray(got.t)[hit_w],
                               np.asarray(want.t)[hit_w], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.mat_type)[hit_w],
                                  np.asarray(want.mat_type)[hit_w])
    # normals agree where the same triangle won
    same = hit_w & (np.abs(np.asarray(got.t) - np.asarray(want.t)) < 1e-5)
    np.testing.assert_allclose(np.asarray(got.normal)[same],
                               np.asarray(want.normal)[same], atol=1e-4)


def _f1_mm_body():
    tris, aabb = load_obj("/root/reference/src/assets/models/f1_car.obj",
                          scale=(0.15, 0.15, 0.15),
                          translate=(0.0, -0.5, -1.0))
    scene = ort.reference_scene(mesh_tris=tris, mesh_aabb=aabb)
    # camera-style rays toward the car
    rng = np.random.default_rng(2)
    n = 128
    o = np.tile(np.array([[-1.3, 0.2, 0.5]], np.float32), (n, 1))
    target = np.array([0.0, -0.2, -1.0]) + rng.uniform(-0.6, 0.6, (n, 3))
    d = (target - o).astype(np.float32)
    o, d = jnp.asarray(o), jnp.asarray(d)
    want = closest_hit(scene, o, d, 1e-3)
    got = make_mm_hit_fn(scene)(o, d)
    hit_w = np.asarray(want.hit)
    assert hit_w.sum() > 10  # rays actually reach the mesh
    np.testing.assert_array_equal(np.asarray(got.hit), hit_w)
    np.testing.assert_allclose(np.asarray(got.t)[hit_w],
                               np.asarray(want.t)[hit_w], rtol=2e-4)


def test_mm_f1_car_mesh():
    """Runs in a SUBPROCESS: compiling the 15,329-triangle scalar oracle
    deterministically segfaults XLA:CPU's compiler when the process
    already carries most of the suite's compiled state (reproduced 3x at
    the same test with both halves of the suite passing in isolation —
    an upstream compiler bug, not a framework one)."""
    import os
    import subprocess
    import sys
    here = os.path.abspath(__file__)
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy\n"
        f"m = runpy.run_path({here!r}, run_name='_f1_sub')\n"
        "m['_f1_mm_body']()\n"
        "print('OK')\n")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=900,
                       env=env,
                       cwd=os.path.dirname(os.path.dirname(here)))
    assert r.returncode == 0 and "OK" in r.stdout, \
        f"rc={r.returncode}\n{r.stdout[-500:]}\n{r.stderr[-2000:]}"


def test_mm_render_equivalent():
    scene = _tri_scene(n_random=20)
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           early_stop=False)
    ref = np.asarray(render_rows(scene, cfg, jnp.int32(0), cfg.height,
                                 jnp.uint32(0)))
    got = np.asarray(render_rows(scene, cfg, jnp.int32(0), cfg.height,
                                 jnp.uint32(0),
                                 hit_fn=make_mm_hit_fn(scene)))
    diff = np.abs(got - ref)
    assert (diff > 1e-3).mean() < 0.01
    assert abs(got.mean() - ref.mean()) < 2e-3


def test_mm_no_triangles_passthrough():
    scene = ort.readme_scene()
    o, d = _rays(64)
    want = closest_hit(scene, o, d, 1e-3)
    got = make_mm_hit_fn(scene)(o, d)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t))
