"""Winner-only differentiable hit (tracer/diffhit.py): values identical to
the brute-force fold, gradients matching (and NaN-free where brute-force
autodiff of the full fold is not), backward cost independent of scene
size."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.io.obj import parse_obj
from opencl_ray_tracer_tpu.io.procgen import make_torus_obj
from opencl_ray_tracer_tpu.scene import (BoundingBoxes, Camera, Scene, Sky,
                                         Spheres, Triangles,
                                         materials as mat)
from opencl_ray_tracer_tpu.tracer.diffhit import make_grad_hit_fn
from opencl_ray_tracer_tpu.tracer.intersect import closest_hit
from opencl_ray_tracer_tpu.tracer.render import (render_and_grad,
                                                 render_grad_sampled)

LOSS = lambda img: jnp.mean(img ** 2)
CFG = ort.RenderConfig(width=24, height=16, spp=3, max_depth=4)


def _mesh_scene():
    tris, aabb = parse_obj(make_torus_obj(8, 6), scale=(0.5, 0.5, 0.5),
                           translate=(0.3, 0.0, -1.6))
    return ort.reference_scene(mesh_tris=tris, mesh_aabb=aabb)


def test_hitinfo_values_match_closest_hit():
    scene = _mesh_scene()
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(0, 1.5, (500, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (500, 3)).astype(np.float32))
    ref = closest_hit(scene, o, d, 1e-3)
    got = make_grad_hit_fn(scene, 1e-3)(o, d)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    m = np.asarray(ref.hit)
    # fp reassociation between the chunked fold and the per-winner
    # recompute: ~1e-4 relative
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=3e-4)
    np.testing.assert_allclose(np.asarray(got.normal)[m],
                               np.asarray(ref.normal)[m], atol=3e-4)
    np.testing.assert_array_equal(np.asarray(got.mat_type)[m],
                                  np.asarray(ref.mat_type)[m])


def test_sphere_grads_match_brute_force():
    scene = ort.readme_scene()
    l1, g1 = render_and_grad(scene, CFG, LOSS, fast_hit=False)
    l2, g2 = render_and_grad(scene, CFG, LOSS, fast_hit=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for leaf in ("center", "radius", "albedo"):
        np.testing.assert_allclose(
            np.asarray(getattr(g1.spheres, leaf)),
            np.asarray(getattr(g2.spheres, leaf)), rtol=0.05, atol=3e-5)


def test_mesh_grads_finite_and_match_where_brute_is():
    """Brute-force autodiff of the triangle fold produces NaN vertex
    gradients (inf/NaN leak through unselected where branches); the
    winner-only path must be finite and agree wherever brute-force is."""
    scene = _mesh_scene()
    l1, g1 = render_and_grad(scene, CFG, LOSS, fast_hit=False)
    l2, g2 = render_and_grad(scene, CFG, LOSS, fast_hit=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for leaf in ("p0", "p1", "p2"):
        a = np.asarray(getattr(g1.triangles, leaf))
        b = np.asarray(getattr(g2.triangles, leaf))
        assert np.isfinite(b).all(), leaf
        ok = np.isfinite(a)
        np.testing.assert_allclose(a[ok], b[ok], rtol=0.05, atol=3e-5)


def test_triangle_vertex_gradient_matches_fd():
    """FD oracle for mesh-vertex gradients (interior pixels of a quad)."""
    quad = np.array([
        [[-3.0, -3.0, -2.0], [3.0, -3.0, -2.0], [3.0, 3.0, -2.0]],
        [[-3.0, -3.0, -2.0], [3.0, 3.0, -2.0], [-3.0, 3.0, -2.0]],
    ], np.float32)
    cam = Camera.create((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), vfov_deg=60.0,
                        aspect_ratio=1.5, focus_dist=1.0, aperture_deg=0.0)
    tris = Triangles.from_vertices(quad, albedo=(0.6, 0.5, 0.4), fuzz=0.0,
                                   ior=0.0, mat_type=mat.LAMBERTIAN)
    boxes = BoundingBoxes.single((-3.1, -3.1, -2.1), (3.1, 3.1, -1.9))
    scene = Scene(cam, Spheres.empty(), tris, boxes, Sky.gradient())
    cfg = ort.RenderConfig(width=24, height=16, spp=4, max_depth=3,
                           early_stop=False)

    def loss_of_p2(p2):
        s = dataclasses.replace(
            scene, triangles=dataclasses.replace(scene.triangles, p2=p2))
        from opencl_ray_tracer_tpu.tracer.render import render_rows
        from opencl_ray_tracer_tpu.tracer.diffhit import make_grad_hit_fn
        img = render_rows(s, cfg, jnp.int32(0), cfg.height, jnp.uint32(0),
                          hit_fn=make_grad_hit_fn(s, cfg.t_min))
        # central pixels only: away from quad edges and the diagonal crease
        return jnp.mean(img[5:10, 4:10])

    p2 = scene.triangles.p2
    g = jax.grad(loss_of_p2)(p2)
    # perturb the z of triangle 0's third vertex: tilts the plane smoothly
    e = jnp.zeros_like(p2).at[0, 2].set(1.0)
    eps = 1e-3
    fd = float((loss_of_p2(p2 + eps * e) - loss_of_p2(p2 - eps * e))
               / (2 * eps))
    ad = float(jnp.sum(g * e))
    assert np.isfinite(np.asarray(g)).all()
    assert abs(fd - ad) < 2e-3 + 0.05 * abs(fd), (fd, ad)


def test_sampled_grad_matches_direct():
    scene = ort.readme_scene()
    l2, g2 = render_and_grad(scene, CFG, LOSS, fast_hit=True)
    l3, img3, g3 = render_grad_sampled(scene, CFG, LOSS, spp_chunk=2,
                                       row_chunk=8)
    np.testing.assert_allclose(float(l3), float(l2), rtol=1e-5)
    for leaf in ("center", "radius", "albedo"):
        np.testing.assert_allclose(
            np.asarray(getattr(g3.spheres, leaf)),
            np.asarray(getattr(g2.spheres, leaf)), rtol=0.05, atol=3e-5)


def test_pallas_winner_backend_interpret():
    """The Pallas winner search (stop-gradded fused kernel) must give the
    same gradients as the jnp winner search."""
    scene = _mesh_scene()
    from opencl_ray_tracer_tpu.tracer.clusters import plan_for_scene
    plan = plan_for_scene(scene, 128)
    l1, img1, g1 = render_grad_sampled(scene, CFG, LOSS, spp_chunk=3,
                                       row_chunk=16, winner_backend="jnp")
    # force the pallas winner path (interpret mode on CPU)
    import opencl_ray_tracer_tpu.tracer.render as r
    l2, img2, g2 = render_grad_sampled(scene, CFG, LOSS, spp_chunk=3,
                                       row_chunk=16,
                                       winner_backend="pallas")
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1.triangles.p0),
                               np.asarray(g2.triangles.p0),
                               rtol=0.05, atol=3e-5)
    np.testing.assert_allclose(np.asarray(g1.spheres.center),
                               np.asarray(g2.spheres.center),
                               rtol=0.05, atol=3e-5)
