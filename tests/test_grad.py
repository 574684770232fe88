"""Gradient correctness: autodiff pixel gradients vs central finite
differences (the BASELINE.json metric).

The renderer with a fixed seed is a deterministic function of the scene
parameters (common random numbers), so FD matches autodiff wherever no
*discrete event* (hit/miss, metal absorb, reflect/refract choice) flips
inside the FD interval.  Autodiff-through-argmin sees only the interior
derivative (SURVEY.md §7 hard part (a)), so:

- Material-albedo FD runs on the full README scene (albedo is smooth
  everywhere: it never changes any discrete event).
- Geometry/camera FD runs on a single-Lambertian-sphere scene over interior
  pixel masks: a convex Lambertian sphere alone under the sky has *no*
  secondary discontinuities (a diffuse bounce off a convex body cannot
  re-hit it), so the estimator is smooth on the mask.
- Fuzz FD runs at the scatter() surface (smooth); through a full render its
  FD is dominated by discrete absorb flips at any usable epsilon.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.scene import (BoundingBoxes, Camera, Scene, Sky,
                                         Spheres, Triangles, materials as mat)
from opencl_ray_tracer_tpu.tracer.render import render_rows
from opencl_ray_tracer_tpu.tracer.scatter import scatter

CFG = ort.RenderConfig(width=48, height=27, spp=4, max_depth=5,
                       early_stop=False)


def _render(scene, cfg=CFG):
    return render_rows(scene, cfg, jnp.int32(0), cfg.height, jnp.uint32(0))


def _fd(f, x0, eps):
    return (f(x0 + eps) - f(x0 - eps)) / (2.0 * eps)


def _set_sphere_field(scene, field, value):
    spheres = dataclasses.replace(scene.spheres, **{field: value})
    return dataclasses.replace(scene, spheres=spheres)


def _single_sphere_scene():
    spheres = Spheres.from_list([
        ((0.0, 0.0, -2.0), 0.6, (0.6, 0.4, 0.3), 0.0, 0.0, mat.LAMBERTIAN)])
    cam = Camera.create((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), vfov_deg=60.0,
                        aspect_ratio=48.0 / 27.0, focus_dist=1.0,
                        aperture_deg=0.0)
    return Scene(cam, spheres, Triangles.empty(), BoundingBoxes.empty(),
                 Sky.gradient())


def _interior_mask(scene, sphere_idx, cfg, margin=0.9):
    """Pixels whose primary ray passes well inside the sphere silhouette."""
    from opencl_ray_tracer_tpu.scene import camera_frame
    f = camera_frame(scene.camera)
    w, h = cfg.width, cfg.height
    uu = (np.arange(w) + 0.5) / w
    vv = (np.arange(h) + 0.5) / h
    d = (np.asarray(f["lower_left_corner"])
         + np.asarray(f["horizontal"]) * uu[None, :, None]
         + np.asarray(f["vertical"]) * vv[:, None, None]
         - np.asarray(f["origin"]))
    o = np.asarray(f["origin"])
    c = np.asarray(scene.spheres.center[sphere_idx]) - o
    r = float(scene.spheres.radius[sphere_idx])
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    proj = dn @ c
    dist2 = (c @ c) - proj ** 2
    return (proj > 0) & (dist2 < (margin * r) ** 2)


def test_albedo_gradient_matches_fd():
    scene = ort.readme_scene()

    def loss_of_albedo(albedo):
        return jnp.mean(_render(_set_sphere_field(scene, "albedo", albedo)))

    a0 = scene.spheres.albedo
    g = jax.grad(loss_of_albedo)(a0)
    for (i, c) in [(0, 1), (1, 0), (3, 2)]:
        e = jnp.zeros_like(a0).at[i, c].set(1.0)
        fd = float(_fd(lambda t: loss_of_albedo(a0 + t * e), 0.0, 1e-3))
        ad = float(g[i, c])
        assert abs(fd - ad) < 3e-4 + 0.02 * abs(fd), (i, c, fd, ad)
        assert ad > 0.0  # more albedo -> brighter


def test_fuzz_gradient_matches_fd_at_scatter_surface():
    n = 64
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(size=(n, 8)).astype(np.float32))
    d = jnp.tile(jnp.asarray([[0.6, -0.8, 0.0]], jnp.float32), (n, 1))
    normal = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))

    def out_of_fuzz(fz):
        sc = scatter(d, normal, jnp.ones(n, bool),
                     jnp.full((n, 3), 0.8), jnp.full((n,), fz),
                     jnp.zeros(n), jnp.full((n,), mat.METAL, jnp.int32), u)
        # keep clear of the absorb discontinuity: only non-absorbed lanes
        keep = ~sc.absorbed
        return jnp.sum(jnp.where(keep[:, None], sc.direction, 0.0))

    g = float(jax.grad(out_of_fuzz)(jnp.float32(0.3)))
    fd = float(_fd(lambda t: out_of_fuzz(jnp.float32(t)), 0.3, 1e-3))
    assert abs(fd - g) < 1e-3 + 1e-3 * abs(fd), (fd, g)


def test_fuzz_gradient_through_render_is_finite():
    scene = ort.readme_scene()

    def loss_of_fuzz(fuzz):
        return jnp.mean(_render(_set_sphere_field(scene, "fuzz", fuzz)))

    g = np.asarray(jax.grad(loss_of_fuzz)(scene.spheres.fuzz))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_center_gradient_interior_pixels():
    scene = _single_sphere_scene()
    mask = jnp.asarray(_interior_mask(scene, 0, CFG))
    assert int(mask.sum()) > 10
    c0 = scene.spheres.center

    def loss_of_center(center):
        img = _render(_set_sphere_field(scene, "center", center))
        return jnp.sum(img * mask[:, :, None]) / jnp.sum(mask)

    g = jax.grad(loss_of_center)(c0)
    for axis in (0, 2):
        e = jnp.zeros_like(c0).at[0, axis].set(1.0)
        fd = float(_fd(lambda t: loss_of_center(c0 + t * e), 0.0, 1e-3))
        ad = float(g[0, axis])
        assert abs(fd - ad) < 2e-3 + 0.05 * abs(fd), (axis, fd, ad)
    assert np.abs(np.asarray(g)).max() > 1e-5


def test_radius_gradient_interior_pixels():
    scene = _single_sphere_scene()
    mask = jnp.asarray(_interior_mask(scene, 0, CFG))
    r0 = scene.spheres.radius

    def loss_of_radius(radius):
        img = _render(_set_sphere_field(scene, "radius", radius))
        return jnp.sum(img * mask[:, :, None]) / jnp.sum(mask)

    g = jax.grad(loss_of_radius)(r0)
    fd = float(_fd(lambda t: loss_of_radius(r0 + t * jnp.ones_like(r0)),
                   0.0, 1e-3))
    ad = float(g[0])
    assert abs(fd - ad) < 2e-3 + 0.05 * abs(fd), (fd, ad)


def test_camera_gradient_matches_fd():
    scene = _single_sphere_scene()
    mask = jnp.asarray(_interior_mask(scene, 0, CFG))

    def loss_of_look_from(look_from):
        cam = dataclasses.replace(scene.camera, look_from=look_from)
        img = _render(dataclasses.replace(scene, camera=cam))
        return jnp.sum(img * mask[:, :, None]) / jnp.sum(mask)

    lf0 = scene.camera.look_from
    g = jax.grad(loss_of_look_from)(lf0)
    e = jnp.zeros_like(lf0).at[2].set(1.0)
    fd = float(_fd(lambda t: loss_of_look_from(lf0 + t * e), 0.0, 1e-3))
    ad = float(g[2])
    assert abs(fd - ad) < 2e-3 + 0.05 * abs(fd), (fd, ad)
    assert np.isfinite(np.asarray(g)).all()


def test_render_and_grad_api():
    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=32, height=18, spp=2, max_depth=4)
    target = jnp.zeros((18, 32, 3))
    loss, grads = ort.render_and_grad(
        scene, cfg, lambda img: jnp.mean((img - target) ** 2))
    assert float(loss) > 0
    leaves = [l for l in jax.tree.leaves(grads)
              if np.asarray(l).dtype.kind == "f"]  # skip int float0 grads
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert np.abs(np.asarray(grads.spheres.albedo)).max() > 0
    assert np.abs(np.asarray(grads.camera.look_from)).max() > 0


def test_no_nan_gradients_all_materials():
    # The reference scene exercises lambertian+metal+dielectric+emissive;
    # gradients through every parameter leaf must be finite.
    scene = ort.reference_scene()
    cfg = ort.RenderConfig(width=32, height=18, spp=2, max_depth=6)
    loss, grads = ort.render_and_grad(scene, cfg, jnp.mean)
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        arr = np.asarray(leaf)
        if arr.dtype.kind != "f":  # float0 cotangents of int leaves
            continue
        assert np.isfinite(arr).all(), (path, arr)
