"""Pallas backward megakernel (kernels/megagrad.py) vs jnp autodiff.

The oracle is the scan-path VJP (tracer/render.render_and_grad), itself
FD-verified in tests/test_grad.py.  Comparisons run the kernel in
interpret mode on CPU.  Path-tracing gradients through long specular
chains are ill-conditioned in f32 (two *jnp* autodiff variants disagree
at ~1e-1 relative on fuzzy-metal scenes at depth 8 — measured), so scenes
here keep depths moderate and tolerances are per-leaf scaled.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.kernels.megagrad import (render_grad_scene,
                                                    render_grad_tables,
                                                    supports_grad)
from opencl_ray_tracer_tpu.scene import Sky
from opencl_ray_tracer_tpu.tracer.render import (render_and_grad,
                                                 render_grad_sampled)

LOSS = lambda im: jnp.mean(im ** 2)


def _grad_pair(scene, cfg, seed):
    _, gref = render_and_grad(scene, cfg, LOSS, seed=seed)
    img = ort.render(scene, cfg, seed=seed)
    _, g_img = jax.value_and_grad(LOSS)(img)
    g = render_grad_scene(scene, cfg, g_img, seed=seed, interpret=True)
    return g, gref


def _assert_close(g, gref, rtol):
    leaves = [
        ("spheres.center", g.spheres.center, gref.spheres.center),
        ("spheres.radius", g.spheres.radius, gref.spheres.radius),
        ("spheres.albedo", g.spheres.albedo, gref.spheres.albedo),
        ("spheres.fuzz", g.spheres.fuzz, gref.spheres.fuzz),
        ("spheres.ior", g.spheres.ior, gref.spheres.ior),
        ("camera.look_from", g.camera.look_from, gref.camera.look_from),
        ("camera.look_at", g.camera.look_at, gref.camera.look_at),
        ("camera.vfov_deg", g.camera.vfov_deg, gref.camera.vfov_deg),
        ("camera.aperture_deg", g.camera.aperture_deg,
         gref.camera.aperture_deg),
        ("camera.focus_dist", g.camera.focus_dist, gref.camera.focus_dist),
        ("sky.const_colour", g.sky.const_colour, gref.sky.const_colour),
    ]
    for name, a, b in leaves:
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(float(np.abs(b).max()), 1e-6)
        err = float(np.abs(a - b).max()) / scale
        assert err < rtol, f"{name}: relerr {err:.3e} (scale {scale:.2e})"


def test_reference_scene_gradient_sky():
    scene = ort.reference_scene()
    cfg = ort.RenderConfig(width=64, height=48, spp=4, max_depth=6,
                           backend="jnp", nan_policy="zero")
    assert supports_grad(scene, cfg)
    g, gref = _grad_pair(scene, cfg, seed=3)
    _assert_close(g, gref, rtol=5e-3)


def test_reference_scene_const_sky():
    scene = ort.reference_scene()
    scene = dc.replace(scene, sky=Sky.constant((0.6, 0.7, 0.9)))
    cfg = ort.RenderConfig(width=64, height=48, spp=4, max_depth=6,
                           backend="jnp", nan_policy="zero")
    g, gref = _grad_pair(scene, cfg, seed=7)
    _assert_close(g, gref, rtol=1e-3)
    # constant-sky colour gradients are real (sky is a scene parameter)
    assert float(np.abs(np.asarray(gref.sky.const_colour)).max()) > 0


def test_readme_scene_no_aperture():
    scene = ort.readme_scene()
    cam0 = dc.replace(scene.camera, aperture_deg=jnp.float32(0.0))
    scene = dc.replace(scene, camera=cam0)
    cfg = ort.RenderConfig(width=80, height=44, spp=3, max_depth=5,
                           backend="jnp", nan_policy="zero")
    g, gref = _grad_pair(scene, cfg, seed=13)
    # fuzzy-metal chains are chaotic in f32; keep a loose envelope and
    # additionally require directional agreement of the full gradient
    _assert_close(g, gref, rtol=8e-2)
    va = np.concatenate([np.asarray(g.spheres.center).ravel(),
                         np.asarray(g.spheres.albedo).ravel(),
                         np.asarray(g.spheres.radius).ravel()])
    vb = np.concatenate([np.asarray(gref.spheres.center).ravel(),
                         np.asarray(gref.spheres.albedo).ravel(),
                         np.asarray(gref.spheres.radius).ravel()])
    cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
    assert cos > 0.9999, f"gradient direction cos {cos}"


def test_emissive_clamp_gradient():
    """Clamp-before-average subgradients: an emissive sphere with albedo
    pushing samples past 1.0 must zero those channels' gradients the same
    way in kernel and jnp paths."""
    scene = ort.reference_scene()
    sp = scene.spheres
    alb = np.asarray(sp.albedo).copy()
    em = int(np.argmax(np.asarray(sp.mat_type) == 3))
    alb[em] = (2.5, 0.9, 2.5)  # R/B clamp, G does not
    scene = dc.replace(scene, spheres=dc.replace(
        sp, albedo=jnp.asarray(alb)))
    cfg = ort.RenderConfig(width=48, height=32, spp=4, max_depth=4,
                           backend="jnp", nan_policy="zero")
    g, gref = _grad_pair(scene, cfg, seed=17)
    _assert_close(g, gref, rtol=5e-3)


def test_grad_sampled_dispatch_matches_jnp():
    """render_grad_sampled with grad_backend='pallas' (interpret) equals
    the jnp chunked path."""
    scene = ort.reference_scene()
    cfg = ort.RenderConfig(width=64, height=48, spp=4, max_depth=6,
                           backend="jnp", nan_policy="zero")
    l1, img1, g1 = render_grad_sampled(scene, cfg, LOSS, seed=5,
                                       grad_backend="jnp")
    l2, img2, g2 = render_grad_sampled(scene, cfg, LOSS, seed=5,
                                       grad_backend="pallas")
    assert np.allclose(l1, l2)
    assert np.allclose(img1, img2)
    for name in ("center", "radius", "albedo", "fuzz", "ior"):
        a = np.asarray(getattr(g1.spheres, name))
        b = np.asarray(getattr(g2.spheres, name))
        scale = max(float(np.abs(a).max()), 1e-6)
        assert float(np.abs(a - b).max()) / scale < 5e-3, name


def test_large_sphere_count():
    """>32 spheres exercises the winner-only reverse bounce (the full-loop
    vjp's O(n_spheres) residuals overflow scoped VMEM at 100 spheres) and
    the halved gradient tile."""
    rng = np.random.default_rng(42)
    n = 40
    centers = np.stack([rng.uniform(-3, 3, n),
                        rng.uniform(0.3, 0.8, n),
                        rng.uniform(-3, 3, n)], axis=1)
    radii = rng.uniform(0.2, 0.45, n)
    albedo = rng.uniform(0.1, 0.9, (n, 3))
    mat_type = rng.integers(0, 2, n)  # lambertian / metal
    fuzz = rng.uniform(0.0, 0.3, n)
    base = ort.reference_scene()
    sp = base.spheres
    scene = dc.replace(base, spheres=dc.replace(
        sp,
        center=jnp.asarray(centers, jnp.float32),
        radius=jnp.asarray(radii, jnp.float32),
        albedo=jnp.asarray(albedo, jnp.float32),
        mat_type=jnp.asarray(mat_type, jnp.int32),
        fuzz=jnp.asarray(fuzz, jnp.float32),
        ior=jnp.full((n,), 1.5, jnp.float32)))
    cfg = ort.RenderConfig(width=48, height=32, spp=2, max_depth=4,
                           backend="jnp", nan_policy="zero")
    assert supports_grad(scene, cfg)
    g, gref = _grad_pair(scene, cfg, seed=23)
    _assert_close(g, gref, rtol=2e-2)


def test_pallas_grad_failure_falls_back(monkeypatch):
    """A Pallas grad-kernel failure (e.g. scoped-VMEM overflow on an
    unswept shape) degrades to the jnp VJP under grad_backend="auto" and
    propagates under "pallas"."""
    import opencl_ray_tracer_tpu.kernels.megagrad as mg

    def boom(*a, **k):
        raise RuntimeError("synthetic mosaic failure")

    monkeypatch.setattr(mg, "render_grad_scene", boom)
    scene = ort.reference_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=3,
                           backend="pallas", nan_policy="zero")
    with pytest.warns(UserWarning, match="falling back"):
        loss, img, grads = render_grad_sampled(scene, cfg, LOSS, seed=5,
                                               grad_backend="auto")
    assert np.isfinite(float(loss))
    assert float(np.abs(np.asarray(grads.spheres.center)).max()) > 0
    with pytest.raises(RuntimeError, match="synthetic"):
        render_grad_sampled(scene, cfg, LOSS, seed=5,
                            grad_backend="pallas")


def test_tables_sample_window():
    """Sample-windowed table grads sum to the full-spp table grads (the
    sharded / chunked entry point)."""
    scene = ort.reference_scene()
    cfg = ort.RenderConfig(width=32, height=32, spp=4, max_depth=4,
                           backend="jnp", nan_policy="zero")
    g_img = jnp.ones((32, 32, 3), jnp.float32)
    gc_full, gs_full = render_grad_tables(scene, cfg, g_img, seed=9,
                                          interpret=True)
    gc_a, gs_a = render_grad_tables(scene, cfg, g_img, seed=9,
                                    sample_base=0, n_samples=2,
                                    interpret=True)
    gc_b, gs_b = render_grad_tables(scene, cfg, g_img, seed=9,
                                    sample_base=2, n_samples=2,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(gc_a + gc_b),
                               np.asarray(gc_full), rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gs_a + gs_b),
                               np.asarray(gs_full), rtol=2e-4, atol=1e-7)


# ---- mesh variant: triangle scenes (geometry held fixed) ----

def _mesh_scene(sky=None, mesh_material=None):
    from opencl_ray_tracer_tpu.io.obj import parse_obj
    from opencl_ray_tracer_tpu.io.procgen import make_torus_obj
    from opencl_ray_tracer_tpu.scene import Triangles
    tris, aabb = parse_obj(make_torus_obj(6, 4), scale=(0.5, 0.5, 0.5),
                           translate=(0.3, 0.0, -1.6))
    scene = ort.reference_scene(mesh_tris=tris, mesh_aabb=aabb, sky=sky)
    if mesh_material is not None:
        scene = dc.replace(
            scene, triangles=Triangles.from_vertices(
                np.asarray(tris), box_id=0, **mesh_material))
    return scene


def _mesh_grad_pair(scene, cfg, seed):
    """Mesh oracle: the jnp wavefront VJP (render_grad_sampled's jnp
    backend — mesh-capable), vs the mesh backward kernel."""
    _, _, gref = render_grad_sampled(scene, cfg, LOSS, seed=seed,
                                     grad_backend="jnp")
    img = ort.render(scene, cfg, seed=seed)
    _, g_img = jax.value_and_grad(LOSS)(img)
    g = render_grad_scene(scene, cfg, g_img, seed=seed, interpret=True)
    return g, gref


def _assert_tri_mat_close(g, gref, rtol):
    """Per-triangle MATERIAL cotangents (real since round 5) vs the jnp
    VJP; exact at the uniform-material primal supports_grad_mesh
    requires."""
    for name in ("albedo", "fuzz", "ior"):
        a = np.asarray(getattr(g.triangles, name))
        b = np.asarray(getattr(gref.triangles, name))
        scale = max(float(np.abs(b).max()), 1e-9)
        err = float(np.abs(a - b).max()) / scale
        assert err < rtol, \
            f"triangles.{name}: relerr {err:.3e} (scale {scale:.2e})"


def _assert_tri_close(g, gref, rtol):
    for name in ("p0", "p1", "p2"):
        a = np.asarray(getattr(g.triangles, name))
        b = np.asarray(getattr(gref.triangles, name))
        scale = max(float(np.abs(b).max()), 1e-9)
        err = float(np.abs(a - b).max()) / scale
        assert err < rtol, \
            f"triangles.{name}: relerr {err:.3e} (scale {scale:.2e})"


def test_sphere_grad_ladder_matches_plain():
    """The sphere tail ladder (capped round 0 + packed continuation +
    lax.cond overflow fallback) must reproduce the plain kernel: exact
    in all three regimes (huge cap = bitwise; real continuation; forced
    overflow -> fallback)."""
    from opencl_ray_tracer_tpu.kernels.megagrad import (
        _grad_tables_inner, _grad_tables_laddered)
    from opencl_ray_tracer_tpu.kernels.megakernel import (_camera_table,
                                                          _sphere_table,
                                                          specialize_flags)
    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=8, max_depth=6,
                           nan_policy="zero")
    flags = specialize_flags(scene)
    cam, sph = _camera_table(scene), _sphere_table(scene)
    g = jnp.linspace(0, 1, 16 * 32 * 3).reshape(16, 32, 3
                                                ).astype(jnp.float32)
    args = (cam, sph, 5, scene.sky.kind, cfg, g, jnp.int32(3),
            jnp.int32(0), 8, flags, True)
    gc_p, gs_p = _grad_tables_inner(*args)
    for r0, denom, tag in ((99, 2, "huge cap"), (1, 2, "continuation"),
                           (1, 512, "overflow fallback")):
        gc, gs = _grad_tables_laddered(*args, r0=r0, denom=denom)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_p),
                                   rtol=1e-5, atol=1e-8, err_msg=tag)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_p),
                                   rtol=1e-5, atol=1e-8, err_msg=tag)
    # sharded row blocks: pix_base offsets flow into the packed state's
    # GLOBAL pixel ids (the ladder runs per shard in render_grad_sharded)
    g_lo, g_hi = g[:8], g[8:]
    base_args = (cam, sph, 5, scene.sky.kind, cfg)
    tail = (jnp.int32(3), jnp.int32(0), 8, flags, True)
    gc_a, gs_a = _grad_tables_laddered(
        *base_args, g_lo, *tail, r0=1, denom=2,
        pix_base=jnp.int32(0), full_height=16)
    gc_b, gs_b = _grad_tables_laddered(
        *base_args, g_hi, *tail, r0=1, denom=2,
        pix_base=jnp.int32(8 * 32), full_height=16)
    np.testing.assert_allclose(np.asarray(gc_a + gc_b), np.asarray(gc_p),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gs_a + gs_b), np.asarray(gs_p),
                               rtol=1e-4, atol=1e-7)


def test_sphere_grad_ladder_f32_pixel_id_guard():
    """Global pixel ids ride the packed continuation state as f32; images
    whose global pixel count can exceed 2^24 must statically fall back to
    the uncapped kernel (identical results) instead of corrupting ids."""
    from opencl_ray_tracer_tpu.kernels.megagrad import (
        _grad_tables_inner, _grad_tables_laddered)
    from opencl_ray_tracer_tpu.kernels.megakernel import (_camera_table,
                                                          _sphere_table,
                                                          specialize_flags)
    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=4, max_depth=4,
                           nan_policy="zero")
    flags = specialize_flags(scene)
    cam, sph = _camera_table(scene), _sphere_table(scene)
    g = jnp.ones((16, 32, 3), jnp.float32)
    # a row block of a virtual image taller than 2^24/width pixels
    big_h = 2 ** 24 // 32 + 64
    kw = dict(pix_base=jnp.int32(32 * (big_h - 16)), full_height=big_h)
    args = (cam, sph, 5, scene.sky.kind, cfg, g, jnp.int32(3),
            jnp.int32(0), 4, flags, True)
    gc_l, gs_l = _grad_tables_laddered(*args, r0=1, denom=2, **kw)
    gc_p, gs_p = _grad_tables_inner(*args, **kw)
    np.testing.assert_array_equal(np.asarray(gc_l), np.asarray(gc_p))
    np.testing.assert_array_equal(np.asarray(gs_l), np.asarray(gs_p))


def test_mesh_scene_grads_match_jnp():
    from opencl_ray_tracer_tpu.kernels.megagrad import supports_grad_mesh
    scene = _mesh_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           nan_policy="zero")
    assert supports_grad_mesh(scene, cfg)
    g, gref = _mesh_grad_pair(scene, cfg, seed=0)
    _assert_close(g, gref, 5e-4)
    # triangle VERTEX cotangents are real (plane-cotangent accumulation)
    # and must match the jnp wavefront VJP's interior derivatives
    assert float(np.abs(np.asarray(g.triangles.p0)).max()) > 0.0
    _assert_tri_close(g, gref, 5e-4)
    # ... and so are per-triangle MATERIAL cotangents (round 5)
    assert float(np.abs(np.asarray(gref.triangles.albedo)).max()) > 1e-6
    _assert_tri_mat_close(g, gref, 5e-4)


def test_mesh_scene_metal_const_sky():
    from opencl_ray_tracer_tpu.scene import materials as mat
    scene = _mesh_scene(sky=Sky.constant((0.3, 0.5, 0.8)),
                        mesh_material=dict(albedo=(0.8, 0.7, 0.3),
                                           fuzz=0.2, ior=0.0,
                                           mat_type=mat.METAL))
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           nan_policy="zero")
    g, gref = _mesh_grad_pair(scene, cfg, seed=3)
    _assert_close(g, gref, 5e-3)


def test_mesh_grad_sampled_explicit_pallas():
    """render_grad_sampled(grad_backend='pallas') routes mesh scenes to
    the mesh kernel (auto keeps jnp because triangle cotangents differ)."""
    scene = _mesh_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           nan_policy="zero", backend="jnp")
    loss_p, _, g = render_grad_sampled(scene, cfg, LOSS, seed=1,
                                       grad_backend="pallas")
    loss_j, _, gref = render_grad_sampled(scene, cfg, LOSS, seed=1,
                                          grad_backend="jnp")
    assert abs(float(loss_p) - float(loss_j)) < 1e-6
    _assert_close(g, gref, 5e-4)


def test_mesh_only_scene_no_spheres():
    """Triangles-only scene (0 spheres): camera gradients flow through
    mesh bounces; empty sphere table degrades cleanly."""
    from opencl_ray_tracer_tpu.kernels.megagrad import supports_grad_mesh
    from opencl_ray_tracer_tpu.scene import Spheres
    scene = dc.replace(_mesh_scene(), spheres=Spheres.empty())
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           nan_policy="zero")
    assert supports_grad_mesh(scene, cfg)
    img = ort.render(scene, cfg, seed=0)
    _, g_img = jax.value_and_grad(LOSS)(img)
    g = render_grad_scene(scene, cfg, g_img, seed=0, interpret=True)
    _, _, gref = render_grad_sampled(scene, cfg, LOSS, seed=0,
                                     grad_backend="jnp")
    for name in ("look_from", "look_at", "vfov_deg"):
        a = np.asarray(getattr(g.camera, name))
        b = np.asarray(getattr(gref.camera, name))
        scale = max(float(np.abs(b).max()), 1e-8)
        assert float(np.abs(a - b).max()) / scale < 1e-4, name


# ---- HDR-sky variant (two-pass: emit dirs -> lookup -> consume) ----

def _hdr_sky():
    from opencl_ray_tracer_tpu.io.hdr import tone_map
    from opencl_ray_tracer_tpu.io.procgen import make_sky_image
    return Sky.hdr(tone_map(make_sky_image(64, 32)))


def test_hdr_sphere_scene_grads_match_jnp():
    """Sphere scene under an HDR sky: albedo gradients are the live
    signal (the nearest-texel lookup has zero direction-derivative, so
    interior geometry gradients are genuinely ~0 in BOTH backends —
    agreement on that is part of the check)."""
    from opencl_ray_tracer_tpu.kernels.megagrad import supports_grad_hdr
    scene = dc.replace(ort.readme_scene(), sky=_hdr_sky())
    cfg = ort.RenderConfig(width=32, height=16, spp=3, max_depth=4,
                           nan_policy="zero")
    assert supports_grad_hdr(scene, cfg)
    img = ort.render(scene, cfg, seed=0)
    _, g_img = jax.value_and_grad(LOSS)(img)
    g = render_grad_scene(scene, cfg, g_img, seed=0, interpret=True)
    _, _, gref = render_grad_sampled(scene, cfg, LOSS, seed=0,
                                     grad_backend="jnp")
    a = np.asarray(g.spheres.albedo)
    b = np.asarray(gref.spheres.albedo)
    assert float(np.abs(b).max()) > 1e-3          # real signal
    assert float(np.abs(a - b).max()) / float(np.abs(b).max()) < 1e-4
    for name in ("center", "radius", "fuzz", "ior"):
        assert float(np.abs(np.asarray(getattr(g.spheres, name))
                            - np.asarray(getattr(gref.spheres, name))
                            ).max()) < 1e-6, name
    # the sky IMAGE cotangent is real since round 5 (per-texel scatter
    # of thr * g_pixel from the emit pass) and must match the jnp VJP's
    # environment-map gradient texel-for-texel
    sa = np.asarray(g.sky.image)
    sb = np.asarray(gref.sky.image)
    assert float(np.abs(sb).max()) > 1e-6         # real signal
    assert float(np.abs(sa - sb).max()) / float(np.abs(sb).max()) < 1e-4


def test_hdr_mesh_scene_multi_window():
    """The reference default-scene SHAPE (spheres + mesh + HDR sky) with
    spp > GRAD_HDR_SPP_CHUNK (two emit/consume window pairs)."""
    from opencl_ray_tracer_tpu.kernels.megagrad import (GRAD_HDR_SPP_CHUNK,
                                                        supports_grad_hdr)
    scene = _mesh_scene(sky=_hdr_sky())
    spp = GRAD_HDR_SPP_CHUNK + 3
    cfg = ort.RenderConfig(width=32, height=16, spp=spp, max_depth=4,
                           nan_policy="zero")
    assert supports_grad_hdr(scene, cfg)
    img = ort.render(scene, cfg, seed=0)
    _, g_img = jax.value_and_grad(LOSS)(img)
    g = render_grad_scene(scene, cfg, g_img, seed=0, interpret=True)
    _, _, gref = render_grad_sampled(scene, cfg, LOSS, seed=0,
                                     grad_backend="jnp")
    a = np.asarray(g.spheres.albedo)
    b = np.asarray(gref.spheres.albedo)
    assert float(np.abs(b).max()) > 1e-3
    assert float(np.abs(a - b).max()) / float(np.abs(b).max()) < 1e-4
    # vertex cotangents flow through the HDR consume pass too
    _assert_tri_close(g, gref, 5e-4)
    # sky-image cotangents accumulate correctly across windows.  Mesh
    # silhouettes admit cross-backend discrete flips (a 1-ulp t
    # difference reroutes one sample's miss to a different texel), so
    # the tolerance is a few flipped-sample quanta, not fp noise.
    sa = np.asarray(g.sky.image)
    sb = np.asarray(gref.sky.image)
    assert float(np.abs(sb).max()) > 1e-6
    assert float(np.abs(sa - sb).max()) / float(np.abs(sb).max()) < 5e-3
    # but the bulk of texels agree to fp noise
    agree = (np.abs(sa - sb) <= 1e-6).mean()
    assert agree > 0.999, agree


def test_fit_scene_triangle_vertices_pallas():
    """fit_scene can fit triangles.p0 with grad_backend='pallas': vertex
    gradients from the mesh backward kernel drive a real optimization
    step (VERDICT r3 item 5)."""
    scene = _mesh_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           nan_policy="zero")
    target = ort.render(scene, cfg, seed=7)
    # perturb the mesh and fit it back toward the target
    bad = dc.replace(scene, triangles=dc.replace(
        scene.triangles, p0=scene.triangles.p0 + 0.02))
    fitted, history = ort.fit_scene(
        target, bad, cfg, ["triangles.p0"], steps=4,
        learning_rate=5e-3, grad_backend="pallas", pallas_interpret=True,
        seed=7, sample_new_noise=False)
    assert history[-1] < history[0], history
    moved = np.abs(np.asarray(fitted.triangles.p0)
                   - np.asarray(bad.triangles.p0)).max()
    assert moved > 0.0


def test_fit_scene_sky_image_pallas():
    """fit_scene can fit the HDR environment map (sky.image) with
    grad_backend='pallas': per-texel sky cotangents from the emit pass
    drive a real descent (VERDICT r4 item 3)."""
    scene = dc.replace(ort.readme_scene(), sky=_hdr_sky())
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           nan_policy="zero")
    target = ort.render(scene, cfg, seed=7)
    bad = dc.replace(scene, sky=dc.replace(
        scene.sky, image=jnp.clip(scene.sky.image * 0.7, 0.0, 0.999)))
    fitted, history = ort.fit_scene(
        target, bad, cfg, ["sky.image"], steps=4,
        learning_rate=2e-2, grad_backend="pallas", pallas_interpret=True,
        seed=7, sample_new_noise=False)
    assert history[-1] < history[0], history
    moved = np.abs(np.asarray(fitted.sky.image)
                   - np.asarray(bad.sky.image)).max()
    assert moved > 0.0


def test_mesh_grad_ladder_matches_plain():
    """The mesh tail ladder (capped rounds + packed continuation over
    the 2-D-tiled mesh dispatch + lax.cond overflow fallback) must
    reproduce the plain mesh kernel in all three regimes."""
    from opencl_ray_tracer_tpu.kernels.megagrad import (
        _grad_tables_mesh_inner, _grad_tables_mesh_laddered)
    from opencl_ray_tracer_tpu.kernels.megakernel import _sphere_table
    from opencl_ray_tracer_tpu.kernels.megamesh import (
        MESH_CHUNK, _mesh_camera_table, _mesh_tables,
        specialize_mesh_flags)
    from opencl_ray_tracer_tpu.tracer.clusters import plan_for_scene

    scene = _mesh_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=8, max_depth=4,
                           nan_policy="zero")
    plan = plan_for_scene(scene, MESH_CHUNK)
    mf = specialize_mesh_flags(scene)
    cam, sph = _mesh_camera_table(scene), _sphere_table(scene)
    w_flat, aabb, boxes, n_chunks, chunk, bids = _mesh_tables(scene, plan)
    mesh = (n_chunks, chunk, bids, max(1, scene.boxes.count), mf[5])
    g = jnp.linspace(0, 1, 16 * 32 * 3).reshape(16, 32, 3
                                                ).astype(jnp.float32)
    args = (cam, sph, w_flat, aabb, boxes, mesh, scene.spheres.count,
            scene.sky.kind, cfg, g, jnp.int32(3), jnp.int32(0), 8,
            mf[:5], True)
    gc_p, gs_p, gt_p = _grad_tables_mesh_inner(*args)
    for levels, tag in ((((99, 2),), "huge cap"),
                       (((1, 2), (1, 4)), "3-level continuation"),
                       (((1, 512),), "overflow fallback")):
        gc, gs, gt = _grad_tables_mesh_laddered(*args, levels=levels)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_p),
                                   rtol=1e-5, atol=1e-8, err_msg=tag)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_p),
                                   rtol=1e-5, atol=1e-7, err_msg=tag)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_p),
                                   rtol=1e-5, atol=1e-7, err_msg=tag)


def test_hdr_fused_pipeline_matches():
    """render_grad_sampled(grad_backend='pallas') on an HDR scene runs
    the FUSED pipeline (no separate forward render: the emit pass
    reconstructs the image).  Image must match the jnp tracer as closely
    as the megamesh deferred-sky render does, and gradients must match
    the jnp VJP."""
    from opencl_ray_tracer_tpu.kernels.megagrad import GRAD_HDR_SPP_CHUNK
    scene = _mesh_scene(sky=_hdr_sky())
    spp = GRAD_HDR_SPP_CHUNK + 2
    cfg = ort.RenderConfig(width=32, height=16, spp=spp, max_depth=4,
                           nan_policy="zero")
    l_f, img_f, g_f = render_grad_sampled(scene, cfg, LOSS, seed=0,
                                          grad_backend="pallas")
    l_j, img_j, g_j = render_grad_sampled(scene, cfg, LOSS, seed=0,
                                          grad_backend="jnp")
    # image: same estimator, different accumulation structure — fp noise
    # plus a vanishing fraction of discrete-event flips
    d = np.abs(np.asarray(img_f) - np.asarray(img_j))
    assert (d > 1e-3).mean() < 0.01, (d > 1e-3).mean()
    assert abs(float(l_f) - float(l_j)) < 1e-4
    a = np.asarray(g_f.spheres.albedo)
    b = np.asarray(g_j.spheres.albedo)
    assert float(np.abs(b).max()) > 1e-3
    assert float(np.abs(a - b).max()) / float(np.abs(b).max()) < 5e-3
    sa = np.asarray(g_f.sky.image)
    sb = np.asarray(g_j.sky.image)
    assert float(np.abs(sb).max()) > 1e-6
    assert float(np.abs(sa - sb).max()) / float(np.abs(sb).max()) < 5e-3


def test_hdr_emit_consume_ladders_match_plain():
    """The HDR emit/consume tail ladders (single-round caps + packed
    continuations + scatter-back merge) must reproduce the plain
    uncapped passes: dirs/thrs exactly (selected values are identical),
    sums to fp tolerance."""
    from opencl_ray_tracer_tpu.kernels.megagrad import (
        _hdr_consume_laddered, _hdr_consume_window, _hdr_emit_laddered,
        _hdr_emit_window)
    from opencl_ray_tracer_tpu.kernels.megakernel import _sphere_table
    from opencl_ray_tracer_tpu.kernels.megamesh import (
        MESH_CHUNK, _mesh_camera_table, _mesh_tables,
        specialize_mesh_flags)
    from opencl_ray_tracer_tpu.scene import sky_colour
    from opencl_ray_tracer_tpu.tracer.clusters import plan_for_scene

    scene = _mesh_scene(sky=_hdr_sky())
    # bound = 3*32+1 = 97 > 64 slots: the ladder path is live
    cfg = ort.RenderConfig(width=32, height=16, spp=3, max_depth=32,
                           nan_policy="zero")
    plan = plan_for_scene(scene, MESH_CHUNK)
    mf = specialize_mesh_flags(scene)
    cam, sph = _mesh_camera_table(scene), _sphere_table(scene)
    w_flat, aabb, boxes, n_chunks, chunk, bids = _mesh_tables(scene, plan)
    mesh = (n_chunks, chunk, bids, max(1, scene.boxes.count), mf[5])
    e_args = (cam, sph, w_flat, aabb, boxes, mesh, scene.spheres.count,
              cfg, 16, 32, jnp.int32(5), jnp.int32(0), 3, mf[:5], True)
    d_p, t_p, e_p = _hdr_emit_window(*e_args)
    d_l, t_l, e_l = _hdr_emit_laddered(*e_args)
    np.testing.assert_array_equal(np.asarray(d_l), np.asarray(d_p))
    np.testing.assert_array_equal(np.asarray(t_l), np.asarray(t_p))
    np.testing.assert_allclose(np.asarray(e_l), np.asarray(e_p),
                               atol=1e-6)

    hp, wp = d_p.shape[1], d_p.shape[2]
    d_v = d_p.reshape(3, 3, hp, wp).transpose(0, 2, 3, 1)
    sky_rows = jax.lax.stop_gradient(
        sky_colour(scene.sky, d_v).transpose(0, 3, 1, 2)
        .reshape(9, hp, wp))
    g = jnp.linspace(0, 1, 16 * 32 * 3).reshape(16, 32, 3
                                                ).astype(jnp.float32)
    c_args = (cam, sph, w_flat, aabb, boxes, mesh, scene.spheres.count,
              cfg, g, jnp.int32(5), jnp.int32(0), 3, mf[:5], True,
              sky_rows)
    gc_p, gs_p, gt_p = _hdr_consume_window(*c_args)
    gc_l, gs_l, gt_l = _hdr_consume_laddered(*c_args)
    np.testing.assert_allclose(np.asarray(gc_l), np.asarray(gc_p),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gs_l), np.asarray(gs_p),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gt_l), np.asarray(gt_p),
                               rtol=1e-5, atol=1e-7)


def test_over_128_sphere_grads():
    """> 128 spheres (here 132): the fast-acc reverse accumulates into a
    multi-lane-group table, lifting the old 128-lane cap (VERDICT r4
    item 5).  Gradients must match the jnp VJP.

    Deliberately tiny (all-Lambertian, 16x8, 1 spp, depth 2): the
    kernel's per-sphere unrolls make XLA:CPU interpret-mode compiles of
    big-n variants take tens of minutes (a 136-sphere mixed-material
    variant measured ~20 min; this shape compiles in a few).  GRAD_MAX
    coverage at 256 is a trace-size statement, not a new code path —
    every lane-group beyond the first exercises the same fold/OH code
    this test covers."""
    rng = np.random.default_rng(7)
    n = 132
    centers = np.stack([rng.uniform(-4, 4, n),
                        rng.uniform(0.3, 0.8, n),
                        rng.uniform(-4, 4, n)], axis=1)
    # the beyond-lane-128 spheres must be VISIBLE for their signal
    # assertion below: park them right on the camera's look-at axis
    centers[128:] = [(0.2, 0.0, -1.5), (0.0, 0.3, -1.2),
                     (0.5, 0.2, -1.8), (-0.3, 0.1, -1.4)]
    base = ort.reference_scene()
    sp = base.spheres
    scene = dc.replace(base, spheres=dc.replace(
        sp,
        center=jnp.asarray(centers, jnp.float32),
        radius=jnp.asarray(rng.uniform(0.2, 0.4, n), jnp.float32),
        albedo=jnp.asarray(rng.uniform(0.1, 0.9, (n, 3)), jnp.float32),
        mat_type=jnp.zeros((n,), jnp.int32),
        fuzz=jnp.zeros((n,), jnp.float32),
        ior=jnp.ones((n,), jnp.float32)))
    cfg = ort.RenderConfig(width=16, height=8, spp=1, max_depth=2,
                           backend="jnp", nan_policy="zero")
    assert supports_grad(scene, cfg)
    g, gref = _grad_pair(scene, cfg, seed=29)
    _assert_close(g, gref, rtol=2e-2)
    # spheres beyond lane 128 carry real signal
    a = np.asarray(g.spheres.albedo)
    assert float(np.abs(a[128:]).max()) > 0.0
