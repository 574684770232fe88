"""Multi-device sharding on 8 virtual CPU devices (SURVEY.md §4):
tile-sharded render must be BIT-IDENTICAL to single-device (counter RNG);
sample sharding allclose; geometry ring exact; sharded grads psum correctly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu import parallel as par
from opencl_ray_tracer_tpu.scene import (BoundingBoxes, Triangles,
                                         materials as mat)
from opencl_ray_tracer_tpu.tracer.intersect import closest_hit
from opencl_ray_tracer_tpu.tracer.render import render_rows

CFG = ort.RenderConfig(width=32, height=16, spp=8, max_depth=4,
                       early_stop=False)


def _single(scene, cfg=CFG, seed=0):
    return np.asarray(render_rows(scene, cfg, jnp.int32(0), cfg.height,
                                  jnp.uint32(seed)))


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_tile_sharded_bit_identical():
    scene = ort.readme_scene()
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    img = np.asarray(par.render_sharded_jit(scene, CFG, mesh, seed=0))
    ref = _single(scene)
    np.testing.assert_array_equal(img, ref)


def test_tile_x_sample_sharded_close():
    scene = ort.readme_scene()
    mesh = par.make_mesh(n_tile=4, n_sample=2)
    img = np.asarray(par.render_sharded_jit(scene, CFG, mesh, seed=0))
    ref = _single(scene)
    # same global sample ids, different accumulation grouping -> fp-level
    # differences only (and NaN-policy grouping, absent in this scene).
    np.testing.assert_allclose(img, ref, atol=1e-5)


def test_sample_only_sharding():
    scene = ort.readme_scene()
    mesh = par.make_mesh(n_tile=1, n_sample=8)
    img = np.asarray(par.render_sharded_jit(scene, CFG, mesh, seed=0))
    np.testing.assert_allclose(img, _single(scene), atol=1e-5)


def _mesh_scene():
    # a couple of triangles + the readme spheres
    tv = np.array([
        [[-1.5, -0.2, -1.6], [-0.5, -0.2, -1.6], [-1.0, 0.8, -1.6]],
        [[0.5, -0.2, -1.4], [1.5, -0.2, -1.4], [1.0, 0.8, -1.4]],
        [[-0.5, -0.4, -0.9], [0.5, -0.4, -0.9], [0.0, 0.4, -0.9]],
    ], np.float32)
    tris = Triangles.from_vertices(tv, albedo=(0.8, 0.6, 0.2), fuzz=0.2,
                                   ior=0.0, mat_type=mat.METAL, box_id=0)
    boxes = BoundingBoxes.single((-1.6, -0.5, -1.7), (1.6, 0.9, -0.8))
    base = ort.readme_scene()
    return dataclasses.replace(base, triangles=tris, boxes=boxes)


def test_geometry_ring_matches_replicated():
    scene = _mesh_scene()
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    n = 8

    padded = par.shard_triangles(scene.triangles, n)
    scene_sharded = dataclasses.replace(scene, triangles=padded)

    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(0)
    r = 64
    o = jnp.asarray(np.zeros((r, 3), np.float32))
    d = jnp.asarray(np.stack([rng.uniform(-1.5, 1.5, r),
                              rng.uniform(-0.5, 1, r),
                              -np.ones(r)], axis=1).astype(np.float32))

    # shard triangles over the tile axis explicitly
    tri_spec = jax.tree.map(lambda _: P(par.TILE_AXIS), padded)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), tri_spec), out_specs=P(), check_vma=False)
    def ring_hit(o, d, tris_local):
        local_scene = dataclasses.replace(scene, triangles=tris_local)
        hit_fn = par.ring_hit_fn(local_scene, par.TILE_AXIS)
        h = hit_fn(o, d)
        return h

    got = jax.jit(ring_hit)(o, d, padded)
    want = closest_hit(scene, o, d, 1e-3)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    np.testing.assert_allclose(np.asarray(got.t)[np.asarray(want.hit)],
                               np.asarray(want.t)[np.asarray(want.hit)],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.mat_type),
                                  np.asarray(want.mat_type))


def test_geometry_ring_mm_large_mesh_render_matches():
    """MXU-path ring (ring_hit_fn_mm) on a >=10k-triangle mesh: an
    8-shard render vs the replicated single-device matmul-intersection
    render.

    Tolerance model: the min-fold over a partition equals the global min
    and the per-triangle matmul columns are chunk-layout independent
    (verified bitwise in isolation), but XLA fuses fma differently across
    program STRUCTURES — measured: even eager-vs-jit of the identical
    sphere closest_hit differs on ~35% of rays at 1 ulp — so cross-
    structure bit-identity is unattainable on principle.  The check is
    therefore: identical hit masks, t within the shared-edge candidate
    gap (see below), and the rendered image equal except for a bounded
    fraction of discrete-boundary flips."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from opencl_ray_tracer_tpu.io.obj import parse_obj
    from opencl_ray_tracer_tpu.io.procgen import make_torus_obj
    from opencl_ray_tracer_tpu.tracer.mesh_accel import make_mm_hit_fn

    tv, aabb = parse_obj(make_torus_obj(80, 63), scale=(0.5, 0.5, 0.5),
                         translate=(0.3, 0.0, -1.6))
    assert tv.shape[0] >= 10000, tv.shape
    scene = ort.reference_scene(mesh_tris=np.asarray(tv), mesh_aabb=aabb)
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           early_stop=False)

    n = 8
    mesh = par.make_mesh(n_tile=n, n_sample=1)
    padded = par.shard_triangles(scene.triangles, n)
    tri_spec = jax.tree.map(lambda _: P(par.TILE_AXIS), padded)
    rows_per = cfg.height // n

    # --- HitInfo-level agreement on primary rays ---
    rng = np.random.default_rng(1)
    r = 4096
    o = jnp.zeros((r, 3), jnp.float32)
    d = jnp.asarray(np.stack([rng.uniform(-0.6, 1.2, r),
                              rng.uniform(-0.6, 0.6, r),
                              -np.ones(r)], axis=1).astype(np.float32))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), tri_spec),
             out_specs=P(), check_vma=False)
    def ring(o, d, tris_local):
        local = dataclasses.replace(scene, triangles=tris_local)
        return par.ring_hit_fn_mm(local, par.TILE_AXIS)(o, d)

    got = ring(o, d, padded)
    want_h = make_mm_hit_fn(scene)(o, d)
    np.testing.assert_array_equal(np.asarray(got.hit),
                                  np.asarray(want_h.hit))
    # rays through shared mesh edges hit BOTH adjacent triangles
    # (inclusive barycentric bounds) at near-equal t; ulp noise flips
    # which wins, and the returned t then differs by the candidates' gap
    # (measured <= 3.4e-6 relative), not by arithmetic noise.
    m = np.asarray(want_h.hit)
    np.testing.assert_allclose(np.asarray(got.t)[m],
                               np.asarray(want_h.t)[m], rtol=1e-5)

    # --- full render: flips bounded, everything else tiny ---
    @partial(shard_map, mesh=mesh, in_specs=(tri_spec,),
             out_specs=P(par.TILE_AXIS, None, None), check_vma=False)
    def rr(tris_local):
        local = dataclasses.replace(scene, triangles=tris_local)
        hit = par.ring_hit_fn_mm(local, par.TILE_AXIS)
        ti = jax.lax.axis_index(par.TILE_AXIS)
        return render_rows(scene, cfg, ti * rows_per, rows_per,
                           jnp.uint32(0), hit_fn=hit)

    img = np.asarray(jax.jit(rr)(padded))
    want = np.asarray(render_rows(scene, cfg, jnp.int32(0), cfg.height,
                                  jnp.uint32(0),
                                  hit_fn=make_mm_hit_fn(scene)))
    diff = np.abs(img - want)
    assert (diff > 1e-3).mean() < 0.005, (diff > 1e-3).mean()
    assert (diff <= 1e-6).mean() > 0.97


def test_render_sharded_geometry_ring_api():
    """render_sharded(geometry_ring=True): triangles sharded over the
    tile axis + the MXU ring as a first-class option, vs the replicated
    matmul render (same fma-fusion tolerance model as above)."""
    from opencl_ray_tracer_tpu.tracer.mesh_accel import make_mm_hit_fn
    scene = _mesh_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=4, max_depth=4,
                           early_stop=False)
    mesh = par.make_mesh(n_tile=4, n_sample=2)
    img = np.asarray(par.render_sharded(scene, cfg, mesh, seed=0,
                                        geometry_ring=True))
    want = np.asarray(render_rows(scene, cfg, jnp.int32(0), cfg.height,
                                  jnp.uint32(0),
                                  hit_fn=make_mm_hit_fn(scene)))
    diff = np.abs(img - want)
    assert (diff > 1e-3).mean() < 0.01, (diff > 1e-3).mean()
    assert abs(img.mean() - want.mean()) < 2e-3


def test_sharded_train_step_matches_single_device_grads():
    scene = ort.readme_scene()
    cfg = CFG
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    target = jnp.zeros((cfg.height, cfg.width, 3))

    def insert(p):
        return dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres,
                                               albedo=p["albedo"]))

    loss_fn = lambda img, tgt: jnp.mean((img - tgt) ** 2)

    # single-device reference gradient
    def obj(p):
        img = render_rows(insert(p), cfg, jnp.int32(0), cfg.height,
                          jnp.uint32(0))
        return loss_fn(img, target)

    params = {"albedo": scene.spheres.albedo}
    ref_loss, ref_grad = jax.value_and_grad(obj)(params)

    opt = optax.sgd(0.0)  # lr 0: step returns loss without moving params
    step = par.make_train_step(cfg, mesh, opt, loss_fn, insert, seed=0)
    _, _, loss = step(params, opt.init(params), target, jnp.uint32(0))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)

    # now compare grads via one sgd step with lr 1
    opt1 = optax.sgd(1.0)
    step1 = par.make_train_step(cfg, mesh, opt1, loss_fn, insert, seed=0)
    new_params, _, _ = step1(params, opt1.init(params), target, jnp.uint32(0))
    shard_grad = np.asarray(params["albedo"] - new_params["albedo"])
    np.testing.assert_allclose(shard_grad, np.asarray(ref_grad["albedo"]),
                               atol=1e-7)


def test_checkpoint_resume_identical(tmp_path):
    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=8, max_depth=4,
                           nan_policy="zero")
    p1 = str(tmp_path / "a.npz")
    p2 = str(tmp_path / "b.npz")

    full = par.render_checkpointed(scene, cfg, p1, seed=0, chunk_spp=8)

    # interrupted run: 4 samples, then resume for the rest
    par.render_checkpointed(scene, cfg.replace(spp=4), p2, seed=0,
                            chunk_spp=2)
    resumed = par.render_checkpointed(scene, cfg, p2, seed=0, chunk_spp=2)
    np.testing.assert_allclose(np.asarray(resumed), np.asarray(full),
                               atol=1e-6)


def test_checkpoint_matches_plain_render_running_sum(tmp_path):
    """Chunked/checkpointed rendering now seeds each chunk with the prior
    running sum (acc0), so it reproduces render() exactly even under the
    reference's running-sum NaN policy (ADVICE round 1)."""
    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=24, height=12, spp=6, max_depth=4,
                           nan_policy="running_sum")
    plain = ort.render(scene, cfg, seed=0)
    ck = par.render_checkpointed(scene, cfg, str(tmp_path / "c.npz"),
                                 seed=0, chunk_spp=2)
    np.testing.assert_allclose(np.asarray(ck), np.asarray(plain), atol=1e-6)


def test_mesh_describe():
    mesh = par.make_mesh(n_tile=4, n_sample=2)
    s = par.describe(mesh)
    assert "tile" in s and "4" in s


def test_pallas_sharded_bit_identical():
    # megakernel per shard (interpret mode), global pixel offsets: must be
    # bit-identical to the single-invocation megakernel.
    from opencl_ray_tracer_tpu.kernels.megakernel import render_pallas
    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=128, height=8 * 64, spp=2, max_depth=4)
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    img_s = np.asarray(par.render_sharded(scene, cfg, mesh, 0,
                                          use_pallas=True,
                                          pallas_interpret=True))
    img_1 = np.asarray(render_pallas(scene, cfg, seed=0, interpret=True))
    np.testing.assert_array_equal(img_s, img_1)


def test_megamesh_sharded_matches_single():
    # fused mesh/HDR kernel per shard with row offsets.  Unlike the sphere
    # megakernel (everything inside one Pallas kernel -> bit-identical),
    # megamesh builds weight tables and runs the HDR-sky epilogue in jnp,
    # which XLA fuses differently under shard_map vs standalone jit:
    # agreement is to 1 ulp, not bitwise.
    from opencl_ray_tracer_tpu.io.hdr import tone_map
    from opencl_ray_tracer_tpu.io.obj import parse_obj
    from opencl_ray_tracer_tpu.io.procgen import make_sky_image, make_torus_obj
    from opencl_ray_tracer_tpu.kernels.megamesh import render_pallas_mesh
    from opencl_ray_tracer_tpu.scene import Sky

    tris, aabb = parse_obj(make_torus_obj(10, 6), scale=(0.5, 0.5, 0.5),
                           translate=(0.3, 0.0, -1.6))
    scene = ort.reference_scene(
        mesh_tris=tris, mesh_aabb=aabb,
        sky=Sky.hdr(tone_map(make_sky_image(32, 16))))
    cfg = ort.RenderConfig(width=64, height=8 * 16, spp=2, max_depth=4)
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    img_s = np.asarray(par.render_sharded(scene, cfg, mesh, 0,
                                          use_pallas=True,
                                          pallas_interpret=True))
    img_1 = np.asarray(render_pallas_mesh(scene, cfg, seed=0,
                                          interpret=True))
    np.testing.assert_allclose(img_s, img_1, atol=1e-7)


def test_sharded_pallas_grad_matches_single_device():
    """render_grad_sharded (backward megakernel per tile shard + psum of
    table cotangents) vs the single-device kernel grads.  Accumulation
    order differs (per-shard psum vs sequential tile loop), so f32
    reduction tolerance, not bit-identity."""
    from opencl_ray_tracer_tpu.kernels.megagrad import render_grad_scene

    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=4, max_depth=4,
                           backend="jnp", nan_policy="zero")
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    loss_fn = lambda im: jnp.mean(im ** 2)

    loss, img, g = par.render_grad_sharded(scene, cfg, loss_fn, mesh,
                                           seed=0, pallas_interpret=True)

    img_ref = ort.render(scene, cfg, seed=0)
    _, g_img = jax.value_and_grad(loss_fn)(img_ref)
    g_ref = render_grad_scene(scene, cfg, g_img, seed=0, interpret=True)

    # forward went through the megakernel (pallas_interpret): megakernel
    # tolerance vs the jnp reference, not bit-identity
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               rtol=0, atol=5e-5)
    for name in ("center", "radius", "albedo", "fuzz", "ior"):
        a = np.asarray(getattr(g.spheres, name))
        b = np.asarray(getattr(g_ref.spheres, name))
        scale = max(float(np.abs(b).max()), 1e-6)
        assert float(np.abs(a - b).max()) / scale < 1e-4, name
    for name in ("look_from", "look_at", "vfov_deg"):
        a = np.asarray(getattr(g.camera, name))
        b = np.asarray(getattr(g_ref.camera, name))
        scale = max(float(np.abs(b).max()), 1e-6)
        assert float(np.abs(a - b).max()) / scale < 1e-4, name


def test_sharded_pallas_train_step_matches_jnp_step():
    """make_train_step(grad_backend='pallas'): megakernel fwd + backward
    megakernel bwd per shard vs the jnp shard_map autodiff step — same
    loss and same sgd(1.0) update to kernel tolerance."""
    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=4, max_depth=4,
                           nan_policy="zero")
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    target = jnp.zeros((cfg.height, cfg.width, 3))

    def insert(p):
        return dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres,
                                               albedo=p["albedo"]))

    loss_fn = lambda img, tgt: jnp.mean((img - tgt) ** 2)
    params = {"albedo": scene.spheres.albedo}

    opt = optax.sgd(1.0)
    step_j = par.make_train_step(cfg, mesh, opt, loss_fn, insert, seed=0)
    pj, _, loss_j = step_j(params, opt.init(params), target, jnp.uint32(0))

    step_p = par.make_train_step(cfg, mesh, opt, loss_fn, insert, seed=0,
                                 grad_backend="pallas",
                                 template_scene=scene,
                                 pallas_interpret=True)
    pp, _, loss_p = step_p(params, opt.init(params), target, jnp.uint32(0))

    assert abs(float(loss_p) - float(loss_j)) < 5e-4
    g_j = np.asarray(params["albedo"] - pj["albedo"])
    g_p = np.asarray(params["albedo"] - pp["albedo"])
    scale = max(float(np.abs(g_j).max()), 1e-6)
    assert float(np.abs(g_p - g_j).max()) / scale < 1e-3


def _torus_scene():
    from opencl_ray_tracer_tpu.io.obj import parse_obj
    from opencl_ray_tracer_tpu.io.procgen import make_torus_obj
    tris, aabb = parse_obj(make_torus_obj(6, 4), scale=(0.5, 0.5, 0.5),
                           translate=(0.3, 0.0, -1.6))
    return ort.reference_scene(mesh_tris=tris, mesh_aabb=aabb)


def test_sharded_mesh_grad_matches_single_device():
    """render_grad_sharded on a MESH scene: per-shard mesh backward
    kernel + psum'd table cotangents vs the single-device mesh kernel."""
    from opencl_ray_tracer_tpu.kernels.megagrad import render_grad_scene

    scene = _torus_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           backend="jnp", nan_policy="zero")
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    loss_fn = lambda im: jnp.mean(im ** 2)

    loss, img, g = par.render_grad_sharded(scene, cfg, loss_fn, mesh,
                                           seed=0, pallas_interpret=True)

    img_ref = ort.render(scene, cfg, seed=0)
    _, g_img = jax.value_and_grad(loss_fn)(img_ref)
    g_ref = render_grad_scene(scene, cfg, g_img, seed=0, interpret=True)

    for name in ("center", "radius", "albedo"):
        a = np.asarray(getattr(g.spheres, name))
        b = np.asarray(getattr(g_ref.spheres, name))
        scale = max(float(np.abs(b).max()), 1e-6)
        assert float(np.abs(a - b).max()) / scale < 1e-4, name
    # triangle vertex cotangents are real (round 4) and must psum to the
    # single-device kernel's values
    for name in ("p0", "p1", "p2"):
        a = np.asarray(getattr(g.triangles, name))
        b = np.asarray(getattr(g_ref.triangles, name))
        assert float(np.abs(b).max()) > 0.0, name
        scale = max(float(np.abs(b).max()), 1e-9)
        assert float(np.abs(a - b).max()) / scale < 1e-4, name


def test_sharded_mesh_grad_ladder_under_shard_map():
    """The mesh tail ladder (round 5) under shard_map: max_depth puts
    the bound past one ring round, so each shard runs the capped-round +
    packed-continuation levels (including the nonzero compaction and the
    lax.cond fallback plumbing) inside the mesh — must still match the
    single-device laddered kernel."""
    from opencl_ray_tracer_tpu.kernels.megagrad import (
        _mesh_ladder_applicable, render_grad_scene)

    scene = _torus_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=24,
                           backend="jnp", nan_policy="zero")
    assert _mesh_ladder_applicable(cfg)
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    loss_fn = lambda im: jnp.mean(im ** 2)

    loss, img, g = par.render_grad_sharded(scene, cfg, loss_fn, mesh,
                                           seed=2, pallas_interpret=True)
    img_ref = ort.render(scene, cfg, seed=2)
    _, g_img = jax.value_and_grad(loss_fn)(img_ref)
    g_ref = render_grad_scene(scene, cfg, g_img, seed=2, interpret=True)
    # depth-24 fuzzy-metal chains are fp-chaotic (module docstring of
    # test_megagrad), and the sharded ladder accumulates in a different
    # order — tolerances are an envelope, not fp noise
    for name in ("center", "albedo"):
        a = np.asarray(getattr(g.spheres, name))
        b = np.asarray(getattr(g_ref.spheres, name))
        scale = max(float(np.abs(b).max()), 1e-6)
        assert float(np.abs(a - b).max()) / scale < 5e-3, name
    a = np.asarray(g.triangles.p0)
    b = np.asarray(g_ref.triangles.p0)
    assert float(np.abs(b).max()) > 0.0
    assert float(np.abs(a - b).max()) / max(float(np.abs(b).max()),
                                            1e-9) < 5e-3


def test_sharded_pallas_train_step_mesh_template():
    """make_train_step(grad_backend='pallas') with a triangle template:
    megamesh fwd + mesh backward kernel, vs the jnp autodiff step."""
    scene = _torus_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           nan_policy="zero")
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    target = jnp.zeros((cfg.height, cfg.width, 3))

    def insert(p):
        return dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres,
                                               albedo=p["albedo"]))

    loss_fn = lambda img, tgt: jnp.mean((img - tgt) ** 2)
    params = {"albedo": scene.spheres.albedo}

    opt = optax.sgd(1.0)
    step_j = par.make_train_step(cfg, mesh, opt, loss_fn, insert, seed=0)
    pj, _, loss_j = step_j(params, opt.init(params), target, jnp.uint32(0))

    step_p = par.make_train_step(cfg, mesh, opt, loss_fn, insert, seed=0,
                                 grad_backend="pallas",
                                 template_scene=scene,
                                 pallas_interpret=True)
    pp, _, loss_p = step_p(params, opt.init(params), target, jnp.uint32(0))

    assert abs(float(loss_p) - float(loss_j)) < 5e-4
    g_j = np.asarray(params["albedo"] - pj["albedo"])
    g_p = np.asarray(params["albedo"] - pp["albedo"])
    scale = max(float(np.abs(g_j).max()), 1e-6)
    assert float(np.abs(g_p - g_j).max()) / scale < 1e-3


def test_sharded_hdr_grad_matches_single_device():
    """render_grad_sharded on an HDR-sky scene (two-pass emit/consume per
    shard) vs the single-device HDR kernel."""
    from opencl_ray_tracer_tpu.io.hdr import tone_map
    from opencl_ray_tracer_tpu.io.procgen import make_sky_image
    from opencl_ray_tracer_tpu.kernels.megagrad import render_grad_scene
    from opencl_ray_tracer_tpu.scene import Sky

    scene = dataclasses.replace(
        ort.readme_scene(), sky=Sky.hdr(tone_map(make_sky_image(64, 32))))
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           backend="jnp", nan_policy="zero")
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    loss_fn = lambda im: jnp.mean(im ** 2)

    loss, img, g = par.render_grad_sharded(scene, cfg, loss_fn, mesh,
                                           seed=0, pallas_interpret=True)

    img_ref = ort.render(scene, cfg, seed=0)
    _, g_img = jax.value_and_grad(loss_fn)(img_ref)
    g_ref = render_grad_scene(scene, cfg, g_img, seed=0, interpret=True)

    a = np.asarray(g.spheres.albedo)
    b = np.asarray(g_ref.spheres.albedo)
    scale = max(float(np.abs(b).max()), 1e-6)
    assert scale > 1e-4          # live signal
    assert float(np.abs(a - b).max()) / scale < 1e-4
    # sky-image cotangents are REAL since round 5; the sharded psum'd
    # scatter must match the single-device scatter
    sa = np.asarray(g.sky.image)
    sb = np.asarray(g_ref.sky.image)
    assert float(np.abs(sb).max()) > 1e-6
    assert float(np.abs(sa - sb).max()) / float(np.abs(sb).max()) < 1e-4


def test_sharded_pallas_train_step_hdr_template():
    """make_train_step(grad_backend='pallas') with an HDR-sky template:
    megamesh HDR fwd + two-pass HDR bwd per shard, vs the jnp step."""
    from opencl_ray_tracer_tpu.io.hdr import tone_map
    from opencl_ray_tracer_tpu.io.procgen import make_sky_image
    from opencl_ray_tracer_tpu.scene import Sky

    scene = dataclasses.replace(
        ort.readme_scene(), sky=Sky.hdr(tone_map(make_sky_image(64, 32))))
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           nan_policy="zero")
    mesh = par.make_mesh(n_tile=8, n_sample=1)
    target = jnp.zeros((cfg.height, cfg.width, 3))

    def insert(p):
        return dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres,
                                               albedo=p["albedo"]))

    loss_fn = lambda img, tgt: jnp.mean((img - tgt) ** 2)
    params = {"albedo": scene.spheres.albedo}

    opt = optax.sgd(1.0)
    step_j = par.make_train_step(cfg, mesh, opt, loss_fn, insert, seed=0)
    pj, _, loss_j = step_j(params, opt.init(params), target, jnp.uint32(0))

    step_p = par.make_train_step(cfg, mesh, opt, loss_fn, insert, seed=0,
                                 grad_backend="pallas",
                                 template_scene=scene,
                                 pallas_interpret=True)
    pp, _, loss_p = step_p(params, opt.init(params), target, jnp.uint32(0))

    assert abs(float(loss_p) - float(loss_j)) < 5e-4
    g_j = np.asarray(params["albedo"] - pj["albedo"])
    g_p = np.asarray(params["albedo"] - pp["albedo"])
    scale = max(float(np.abs(g_j).max()), 1e-6)
    assert float(np.abs(g_p - g_j).max()) / scale < 1e-3


def test_checkpoint_kernel_rate_matches_and_resumes(tmp_path):
    """render_checkpointed routes megakernel-scope scenes through the
    Pallas raw-sum/acc0 window mode (kernel-rate checkpointing): chunked
    + resumed runs must reproduce the monolithic kernel render to the
    mean-epilogue ulp, under the running-sum NaN policy."""
    from opencl_ray_tracer_tpu.kernels.megakernel import render_pallas
    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=6, max_depth=4,
                           nan_policy="running_sum", backend="pallas")
    mono = np.asarray(render_pallas(scene, cfg, seed=1, interpret=True))
    ck = par.render_checkpointed(scene, cfg, str(tmp_path / "k.npz"),
                                 seed=1, chunk_spp=2)
    np.testing.assert_allclose(np.asarray(ck), mono, atol=1e-6)
    # interrupted at 2 samples, then resumed
    par.render_checkpointed(scene, cfg.replace(spp=2),
                            str(tmp_path / "k2.npz"), seed=1, chunk_spp=2)
    resumed = par.render_checkpointed(scene, cfg,
                                      str(tmp_path / "k2.npz"),
                                      seed=1, chunk_spp=2)
    np.testing.assert_allclose(np.asarray(resumed), mono, atol=1e-6)
