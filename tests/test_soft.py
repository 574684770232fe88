"""Soft-visibility renderer: convergence to hard render, correct-sign
silhouette gradients, and end-to-end sphere-position recovery (the geometry
half of BASELINE.json config 5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.optimize import fit_scene
from opencl_ray_tracer_tpu.tracer.render import render_rows
from opencl_ray_tracer_tpu.tracer.soft import render_soft

CFG = ort.RenderConfig(width=48, height=27, spp=4, max_depth=4,
                       early_stop=False)


def _hard(scene, cfg=CFG, seed=0):
    return render_rows(scene, cfg, jnp.int32(0), cfg.height, jnp.uint32(seed))


def test_soft_converges_to_hard_at_high_beta():
    scene = ort.readme_scene()
    hard = np.asarray(_hard(scene))
    soft = np.asarray(render_soft(scene, CFG, seed=0, beta=50000.0))
    # identical RNG stream -> same samples; differences only at silhouette
    # pixels (a vanishing fraction as beta -> inf) and dielectric-free here.
    close = np.isclose(soft, hard, atol=5e-2).mean()
    assert close > 0.93, close
    assert abs(soft.mean() - hard.mean()) < 0.01


def test_soft_center_gradient_has_correct_sign():
    # The configuration where hard gradients failed (verified wrong-sign in
    # the hard renderer): sphere 1 displaced +0.1 in x; d loss / d x must be
    # positive (moving further away increases loss).
    scene = ort.readme_scene()
    target = _hard(scene, seed=99)

    def loss_of_center(c):
        s = dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, center=c))
        img = render_soft(s, CFG, seed=99, beta=40.0)
        return jnp.mean((img - target) ** 2)

    c0 = scene.spheres.center.at[1, 0].add(0.1)
    g = jax.grad(loss_of_center)(c0)
    assert float(g[1, 0]) > 0, np.asarray(g)
    # and the displaced-axis gradient dominates that sphere's row
    assert abs(float(g[1, 0])) > abs(float(g[1, 1]))


def test_recover_sphere_position():
    cfg = ort.RenderConfig(width=48, height=27, spp=2, max_depth=3,
                           early_stop=False)
    true_scene = ort.readme_scene()
    target = _hard(true_scene, cfg, seed=42)

    bad = true_scene.spheres.center.at[1, 0].add(0.12)
    init = dataclasses.replace(
        true_scene,
        spheres=dataclasses.replace(true_scene.spheres, center=bad))

    mask = np.zeros((5, 3), np.float32)
    mask[1] = 1.0  # optimize only the displaced sphere's center
    fitted, losses = fit_scene(target, init, cfg,
                               param_paths=("spheres.center",),
                               steps=60, learning_rate=4e-3, seed=5,
                               soft=True, beta=40.0,
                               param_mask={"spheres.center": mask})
    err0 = 0.12
    err1 = abs(float(fitted.spheres.center[1, 0])
               - float(true_scene.spheres.center[1, 0]))
    assert err1 < 0.4 * err0, (err0, err1, losses[::15])
    # masked-out spheres must not move at all
    drift = np.abs(np.asarray(fitted.spheres.center)
                   - np.asarray(true_scene.spheres.center))
    drift[1] = 0
    assert drift.max() == 0.0, drift


def _triangle_scene(shift_x=0.0):
    from opencl_ray_tracer_tpu.scene import (BoundingBoxes, Camera, Scene,
                                             Sky, Spheres, Triangles,
                                             materials as mat)
    tv = np.array([
        [[-0.6 + shift_x, -0.5, -1.5], [0.6 + shift_x, -0.5, -1.5],
         [0.0 + shift_x, 0.6, -1.5]],
    ], np.float32)
    tris = Triangles.from_vertices(tv, albedo=(0.7, 0.3, 0.2), fuzz=0.0,
                                   ior=0.0, mat_type=mat.LAMBERTIAN)
    boxes = BoundingBoxes.single((-2.0, -1.0, -1.6), (2.0, 1.0, -1.4))
    cam = Camera.create((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), vfov_deg=70.0,
                        aspect_ratio=48.0 / 27.0, focus_dist=1.0,
                        aperture_deg=0.0)
    return Scene(cam, Spheres.empty(), tris, boxes, Sky.gradient())


def test_soft_triangle_converges_to_hard():
    scene = _triangle_scene()
    hard = np.asarray(_hard(scene))
    soft = np.asarray(render_soft(scene, CFG, seed=0, beta=50000.0))
    close = np.isclose(soft, hard, atol=5e-2).mean()
    assert close > 0.93, close
    assert abs(soft.mean() - hard.mean()) < 0.01


def test_soft_triangle_vertex_silhouette_gradient_matches_fd():
    """Silhouette-dominated loss: moving a vertex changes pixel COVERAGE (a
    step under hard visibility).  The soft renderer's vertex gradient must
    match central finite differences of the soft forward (VERDICT round-1
    item 6 / BASELINE config 5 beyond spheres)."""
    scene = _triangle_scene()
    target = _hard(_triangle_scene(shift_x=0.15), seed=7)
    beta = 40.0

    def loss_of_p(p_all):
        import dataclasses as dc
        tris = dc.replace(scene.triangles, p0=p_all[0][None],
                          p1=p_all[1][None], p2=p_all[2][None])
        s = dc.replace(scene, triangles=tris)
        img = render_soft(s, CFG, seed=7, beta=beta)
        return jnp.mean((img - target) ** 2)

    p_all = jnp.stack([scene.triangles.p0[0], scene.triangles.p1[0],
                       scene.triangles.p2[0]])
    g = jax.grad(loss_of_p)(p_all)
    assert np.isfinite(np.asarray(g)).all()
    # FD on the apex vertex x (pure silhouette motion)
    eps = 1e-3
    e = jnp.zeros_like(p_all).at[2, 0].set(1.0)
    fd = float((loss_of_p(p_all + eps * e) - loss_of_p(p_all - eps * e))
               / (2 * eps))
    ad = float(jnp.sum(g * e))
    assert abs(fd - ad) < 2e-3 + 0.05 * abs(fd), (fd, ad)
    # and the gradient actually pulls the triangle toward the target
    assert ad < 0.0, ad
