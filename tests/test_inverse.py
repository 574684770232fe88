"""Inverse rendering smoke: recover a perturbed sphere albedo + position
from a target image by gradient descent (BASELINE.json config 5)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.optimize import extract_params, fit_scene, insert_params


def test_param_extract_insert_roundtrip():
    sc = ort.readme_scene()
    p = extract_params(sc, ["spheres.albedo", "camera.look_from"])
    sc2 = insert_params(sc, {k: v + 1.0 for k, v in p.items()})
    np.testing.assert_allclose(np.asarray(sc2.spheres.albedo),
                               np.asarray(sc.spheres.albedo) + 1.0)
    np.testing.assert_allclose(np.asarray(sc2.camera.look_from),
                               np.asarray(sc.camera.look_from) + 1.0)
    # untouched fields unchanged
    np.testing.assert_allclose(np.asarray(sc2.spheres.center),
                               np.asarray(sc.spheres.center))


def test_recover_albedo():
    cfg = ort.RenderConfig(width=48, height=27, spp=4, max_depth=4)
    true_scene = ort.readme_scene()
    target = ort.render(true_scene, cfg.replace(early_stop=False), seed=123)

    # perturb the center sphere's albedo
    bad_albedo = true_scene.spheres.albedo.at[1].set(
        jnp.array([0.2, 0.9, 0.9]))
    init = dataclasses.replace(
        true_scene,
        spheres=dataclasses.replace(true_scene.spheres, albedo=bad_albedo))

    fitted, losses = fit_scene(target, init, cfg,
                               param_paths=("spheres.albedo",),
                               steps=50, learning_rate=5e-2, seed=7)
    # The optimizer can only reach the Monte Carlo noise floor (independent
    # seeds each step); assert it got there.
    floor = float(jnp.mean((ort.render(true_scene, cfg, seed=1)
                            - ort.render(true_scene, cfg, seed=2)) ** 2))
    assert losses[-1] < max(1.5 * floor, 0.3 * losses[0]), (losses[-1], floor)
    got = np.asarray(fitted.spheres.albedo[1])
    want = np.asarray(true_scene.spheres.albedo[1])
    # red channel saturates through the sample clamp (albedo 1.0 partially
    # unidentifiable); green/blue recover tightly.
    assert np.abs(got[1:] - want[1:]).max() < 0.1, (got, want)
    assert got[0] > 0.7


def test_fit_scene_pallas_step_matches_jnp():
    """One fit step through the megakernel fwd+bwd path vs the jnp scan
    path: same loss and same parameter update to kernel tolerance (the
    pallas path's forward is the megakernel and its backward replays the
    identical sample stream — counter RNG)."""
    cfg = ort.RenderConfig(width=32, height=16, spp=4, max_depth=4,
                           nan_policy="zero")
    true_scene = ort.readme_scene()
    target = ort.render(true_scene, cfg.replace(early_stop=False), seed=3)

    bad_albedo = true_scene.spheres.albedo.at[1].set(
        jnp.array([0.3, 0.8, 0.5]))
    init = dataclasses.replace(
        true_scene,
        spheres=dataclasses.replace(true_scene.spheres, albedo=bad_albedo))

    kw = dict(param_paths=("spheres.albedo", "camera.look_from"),
              steps=1, learning_rate=1e-2, seed=5,
              sample_new_noise=False)
    fit_p, loss_p = fit_scene(target, init, cfg, grad_backend="pallas",
                              pallas_interpret=True, **kw)
    fit_j, loss_j = fit_scene(target, init, cfg, grad_backend="jnp", **kw)

    assert abs(loss_p[0] - loss_j[0]) < 5e-4, (loss_p, loss_j)
    np.testing.assert_allclose(np.asarray(fit_p.spheres.albedo),
                               np.asarray(fit_j.spheres.albedo), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fit_p.camera.look_from),
                               np.asarray(fit_j.camera.look_from),
                               atol=2e-4)


def test_fit_scene_pallas_converges():
    """Multi-step pallas fit drives the loss down (one compilation serves
    every step: conservative specialization keeps fold masks valid as the
    fitted values drift)."""
    cfg = ort.RenderConfig(width=32, height=16, spp=4, max_depth=4,
                           nan_policy="zero")
    true_scene = ort.readme_scene()
    target = ort.render(true_scene, cfg.replace(early_stop=False), seed=9)

    bad_albedo = true_scene.spheres.albedo.at[1].set(
        jnp.array([0.2, 0.9, 0.9]))
    init = dataclasses.replace(
        true_scene,
        spheres=dataclasses.replace(true_scene.spheres, albedo=bad_albedo))

    fitted, losses = fit_scene(target, init, cfg,
                               param_paths=("spheres.albedo",),
                               steps=20, learning_rate=5e-2, seed=11,
                               grad_backend="pallas",
                               pallas_interpret=True)
    assert losses[-1] < 0.5 * losses[0], losses


def test_fit_scene_pallas_mesh_scene():
    """Pallas fit of sphere albedo in a scene CONTAINING a mesh (triangle
    geometry held fixed by the mesh grad kernel) matches the jnp fit step."""
    from opencl_ray_tracer_tpu.io.obj import parse_obj
    from opencl_ray_tracer_tpu.io.procgen import make_torus_obj

    tris, aabb = parse_obj(make_torus_obj(6, 4), scale=(0.5, 0.5, 0.5),
                           translate=(0.3, 0.0, -1.6))
    true_scene = ort.reference_scene(mesh_tris=tris, mesh_aabb=aabb)
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           nan_policy="zero")
    target = ort.render(true_scene, cfg.replace(early_stop=False), seed=2)

    bad_albedo = true_scene.spheres.albedo.at[1].set(
        jnp.array([0.3, 0.8, 0.5]))
    init = dataclasses.replace(
        true_scene,
        spheres=dataclasses.replace(true_scene.spheres, albedo=bad_albedo))

    kw = dict(param_paths=("spheres.albedo",), steps=1,
              learning_rate=1e-2, seed=5, sample_new_noise=False)
    fit_p, loss_p = fit_scene(target, init, cfg, grad_backend="pallas",
                              pallas_interpret=True, **kw)
    fit_j, loss_j = fit_scene(target, init, cfg, grad_backend="jnp", **kw)
    assert abs(loss_p[0] - loss_j[0]) < 5e-4, (loss_p, loss_j)
    np.testing.assert_allclose(np.asarray(fit_p.spheres.albedo),
                               np.asarray(fit_j.spheres.albedo), atol=3e-4)


def test_fit_scene_pallas_hdr_scene():
    """Pallas fit of sphere albedo under an HDR sky (two-pass HDR
    backward; sky image + triangle geometry held fixed) decreases the
    loss and matches the jnp step."""
    from opencl_ray_tracer_tpu.io.hdr import tone_map
    from opencl_ray_tracer_tpu.io.procgen import make_sky_image
    from opencl_ray_tracer_tpu.scene import Sky

    true_scene = dataclasses.replace(
        ort.readme_scene(), sky=Sky.hdr(tone_map(make_sky_image(64, 32))))
    cfg = ort.RenderConfig(width=32, height=16, spp=3, max_depth=4,
                           nan_policy="zero")
    target = ort.render(true_scene, cfg.replace(early_stop=False), seed=2)

    bad_albedo = true_scene.spheres.albedo.at[1].set(
        jnp.array([0.3, 0.8, 0.5]))
    init = dataclasses.replace(
        true_scene,
        spheres=dataclasses.replace(true_scene.spheres, albedo=bad_albedo))

    kw = dict(param_paths=("spheres.albedo",), steps=1,
              learning_rate=1e-2, seed=5, sample_new_noise=False)
    fit_p, loss_p = fit_scene(target, init, cfg, grad_backend="pallas",
                              pallas_interpret=True, **kw)
    fit_j, loss_j = fit_scene(target, init, cfg, grad_backend="jnp", **kw)
    assert abs(loss_p[0] - loss_j[0]) < 5e-4, (loss_p, loss_j)
    np.testing.assert_allclose(np.asarray(fit_p.spheres.albedo),
                               np.asarray(fit_j.spheres.albedo), atol=3e-4)


def test_fit_scene_checkpoint_resume(tmp_path):
    """An interrupted fit resumed from its checkpoint must reproduce the
    uninterrupted run exactly (step-indexed seeds; atomic npz of
    params + optax state + loss history)."""
    import numpy as np

    import opencl_ray_tracer_tpu as ort
    from opencl_ray_tracer_tpu.optimize import fit_scene

    true_scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=3)
    target = ort.render(true_scene, cfg.replace(early_stop=False), seed=2)
    bad = true_scene.spheres.albedo.at[1].set(
        jnp.array([0.3, 0.8, 0.5]))
    init = dataclasses.replace(
        true_scene,
        spheres=dataclasses.replace(true_scene.spheres, albedo=bad))
    kw = dict(param_paths=("spheres.albedo",), learning_rate=1e-2,
              seed=5, sample_new_noise=True, grad_backend="jnp")

    full, losses_full = fit_scene(target, init, cfg, steps=6, **kw)

    ck = str(tmp_path / "fit.npz")
    # "interrupted": run only 3 steps, checkpointing every step
    fit_scene(target, init, cfg, steps=3, checkpoint_path=ck,
              checkpoint_every=1, **kw)
    # resume to the full 6 with the same arguments
    resumed, losses_res = fit_scene(target, init, cfg, steps=6,
                                    checkpoint_path=ck,
                                    checkpoint_every=1, **kw)
    assert losses_res == losses_full, (losses_res, losses_full)
    np.testing.assert_array_equal(np.asarray(resumed.spheres.albedo),
                                  np.asarray(full.spheres.albedo))
