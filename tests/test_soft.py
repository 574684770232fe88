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
