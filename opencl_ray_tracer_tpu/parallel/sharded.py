"""Sharded rendering and training steps (shard_map over the device mesh).

The TPU-native replacement for the reference's entire L2 runtime
(``main.cpp:229-269``): image tiles and sample batches are mesh axes, the
scene pytree is replicated (it is small — KBs to ~1 MB, like the
reference's 12 cl::Buffers, ``main.cpp:162-173``), radiance is pmean-reduced
over the sample axis, and scene-parameter gradients are psum-reduced over
the whole mesh by shard_map's transpose of the replicated inputs — the
collectives ride ICI and XLA overlaps them with the backward pass.

Determinism: the counter RNG is keyed on (global pixel id, global sample
id), so a tile-sharded render is bit-identical to the single-device render.
Sample sharding applies the running-sum NaN policy per shard (mean of equal
shard means == global mean; exact bitwise identity holds when spp-per-shard
== spp, i.e. n_sample == 1) — tested in tests/test_sharding.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..scene import Scene
from ..tracer.render import render_rows
from .mesh import SAMPLE_AXIS, TILE_AXIS


def _check(cfg: RenderConfig, mesh):
    n_tile = mesh.shape[TILE_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    assert cfg.height % n_tile == 0, \
        f"height {cfg.height} not divisible by tile axis {n_tile}"
    assert cfg.spp % n_sample == 0, \
        f"spp {cfg.spp} not divisible by sample axis {n_sample}"
    return n_tile, n_sample


def render_sharded(scene: Scene, cfg: RenderConfig, mesh, seed: int = 0,
                   hit_fn_factory=None, use_pallas: bool = False,
                   pallas_interpret: bool = False,
                   geometry_ring: bool = False):
    """Render the full image over the mesh; returns (H,W,3) committed to a
    row-sharded layout.  hit_fn_factory(scene) -> hit_fn optionally installs
    a custom closest-hit (the geometry ring, parallel/ring.py).

    use_pallas routes each shard's row block through the megakernel
    (spheres + gradient/const sky scenes; sample axis must be 1 — the
    wavefront kernel owns the whole sample loop).

    geometry_ring=True shards the TRIANGLES over the tile axis and
    intersects them with the rotating MXU matmul ring
    (``ring.ring_hit_fn_mm``) — the first-class path for meshes that
    exceed one chip's HBM.  Rays stay resident; triangle feature tables
    ride ``ppermute`` around the ICI ring.  Mutually exclusive with
    use_pallas / hit_fn_factory."""
    n_tile, n_sample = _check(cfg, mesh)
    if geometry_ring:
        assert not use_pallas and hit_fn_factory is None, \
            "geometry_ring is its own intersection path"
        assert scene.triangles.count > 0, "geometry_ring needs triangles"
        import dataclasses as _dc

        from ..scene import Triangles
        from .ring import ring_hit_fn_mm, shard_triangles
        tris_padded = shard_triangles(scene.triangles, n_tile)
        rows_per_r = cfg.height // n_tile
        spp_per_r = cfg.spp // n_sample
        # the replicated scene drops the full triangle soup (the whole
        # point: per shard only 1/n of it is resident at a time)
        scene_rep = _dc.replace(scene, triangles=Triangles.empty())
        tri_spec = jax.tree.map(lambda _: P(TILE_AXIS), tris_padded)

        @functools.partial(
            shard_map, mesh=mesh, in_specs=(P(), tri_spec),
            out_specs=P(TILE_AXIS, None, None), check_vma=False)
        def _render_ring(scene_in, tris_local):
            ti = jax.lax.axis_index(TILE_AXIS)
            si = jax.lax.axis_index(SAMPLE_AXIS)
            local = _dc.replace(scene_in, triangles=tris_local)
            hit_fn = ring_hit_fn_mm(local, TILE_AXIS)
            img = render_rows(scene_in, cfg, ti * rows_per_r, rows_per_r,
                              jnp.uint32(seed),
                              sample_offset=si * spp_per_r,
                              spp=spp_per_r, hit_fn=hit_fn)
            return jax.lax.pmean(img, SAMPLE_AXIS)

        return _render_ring(scene_rep, tris_padded)
    rows_per = cfg.height // n_tile
    spp_per = cfg.spp // n_sample
    pallas_kind = None
    if use_pallas:
        assert n_sample == 1, "pallas sharded render: sample axis must be 1"
        from ..kernels.megakernel import specialize_flags, supports
        from ..kernels.megamesh import (MESH_CHUNK, specialize_mesh_flags,
                                        supports_mesh)
        # flags/plan need a concrete scene; inside shard_map it is traced.
        # megamesh first (it also owns large sphere-only scenes), matching
        # render()'s dispatch.
        if supports_mesh(scene, cfg):
            pallas_kind = "mesh"
            pallas_flags = specialize_mesh_flags(scene)
            from ..tracer.clusters import plan_for_scene
            mesh_plan = plan_for_scene(scene, MESH_CHUNK)
        else:
            assert supports(scene, cfg), \
                "pallas sharded render: unsupported scene"
            pallas_kind = "sphere"
            pallas_flags = specialize_flags(scene)
            mesh_plan = None

    def _make_render(mesh_schedule):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(),),
            out_specs=(P(TILE_AXIS, None, None), P(TILE_AXIS)),
            check_vma=False)
        def _render(scene):
            ti = jax.lax.axis_index(TILE_AXIS)
            si = jax.lax.axis_index(SAMPLE_AXIS)
            ok = jnp.ones((1,), bool)
            if pallas_kind == "sphere":
                from ..kernels.megakernel import render_pallas_inner
                return render_pallas_inner(
                    scene, cfg, seed, pallas_interpret, pallas_flags,
                    rows_per, ti * (rows_per * cfg.width)), ok
            if pallas_kind == "mesh":
                # trace-safe capacity fallback: a compaction overflow
                # re-renders this shard in one uncapped round via
                # lax.cond, sound even under an outer jit (the ok flag
                # returned here is then informational only).
                from ..kernels.megamesh import render_pallas_mesh_safe
                img = render_pallas_mesh_safe(
                    scene, cfg, seed, pallas_interpret, pallas_flags,
                    mesh_plan, rows_per, ti * (rows_per * cfg.width),
                    schedule=mesh_schedule)
                return img, ok
            hit_fn = hit_fn_factory(scene) if hit_fn_factory else None
            img = render_rows(scene, cfg, ti * rows_per, rows_per,
                              jnp.uint32(seed), sample_offset=si * spp_per,
                              spp=spp_per, hit_fn=hit_fn)
            # mean over the sample axis (each shard holds a disjoint global
            # sample window of equal size).
            return jax.lax.pmean(img, SAMPLE_AXIS), ok
        return _render

    img, _oks = _make_render(None)(scene)
    return img


def render_sharded_jit(scene: Scene, cfg: RenderConfig, mesh, seed: int = 0):
    fn = jax.jit(lambda s: render_sharded(s, cfg, mesh, seed))
    return fn(scene)


def render_grad_sharded(scene: Scene, cfg: RenderConfig, loss_fn, mesh,
                        seed: int = 0, pallas_interpret: bool = False):
    """Sharded forward+backward via the Pallas backward megakernel:
    (loss, image, scene-gradients).

    Each tile shard runs the backward megakernel (kernels/megagrad.py) on
    its row block of the image cotangent with its global pixel offset;
    the (camera, sphere) table cotangents are psum-reduced over the whole
    mesh (the ICI all-reduce the reference has no analog for) and chained
    through the differentiable table builders once, replicated.  Scene
    scope = megagrad.supports_grad, or supports_grad_mesh for triangle
    scenes (triangle VERTEX cotangents are real — per-shard plane
    cotangents psum-reduced then chained through the plane builder; the
    per-triangle MATERIAL fields stay fixed, see supports_grad_mesh in
    kernels/megagrad.py).  Sample axis must be 1 (the wavefront kernel
    owns the whole sample loop).  Per-shard accumulation order differs
    from the single-chip kernel's sequential tile loop, so gradients
    match single-chip to f32 reduction tolerance (the image itself stays
    bit-identical — counter RNG)."""
    from ..kernels.megagrad import (GRAD_HDR_SPP_CHUNK, _grad_tables_inner,
                                    _grad_tables_hdr_window,
                                    _grad_tables_mesh_inner, supports_grad,
                                    supports_grad_hdr, supports_grad_mesh)
    from ..kernels.megakernel import (_camera_table, _sphere_table,
                                      specialize_flags)
    from ..scene.sky import KIND_HDR, Sky

    n_tile, n_sample = _check(cfg, mesh)
    assert n_sample == 1, "sharded grad: sample axis must be 1"
    has_tris = scene.triangles.count > 0
    is_hdr = scene.sky.kind == KIND_HDR
    rows_per = cfg.height // n_tile
    n_spheres = scene.spheres.count
    sky_kind = scene.sky.kind
    if has_tris or is_hdr:
        assert (supports_grad_hdr(scene, cfg) if is_hdr
                else supports_grad_mesh(scene, cfg)), \
            "scene outside mesh/HDR grad-kernel scope"
        from ..kernels.megamesh import (MESH_CHUNK, _mesh_camera_table,
                                        _mesh_tables, specialize_mesh_flags)
        from ..tracer.clusters import plan_for_scene
        plan = plan_for_scene(scene, MESH_CHUNK)
        mflags = specialize_mesh_flags(scene)
        flags = mflags[:5]
        m_type = mflags[5]
    else:
        assert supports_grad(scene, cfg), "scene outside megagrad scope"
        flags = specialize_flags(scene)

    # the forward kernels cap at 128 spheres while the BACKWARD covers
    # GRAD_MAX_SPHERES=256; beyond-forward-scope scenes render their
    # image on the jnp path and still get the kernel-rate backward
    from ..kernels.megakernel import supports as _fwd_supports
    from ..kernels.megamesh import supports_mesh as _fwd_supports_mesh
    use_pallas = ((jax.default_backend() == "tpu" or pallas_interpret)
                  and (_fwd_supports_mesh(scene, cfg)
                       or _fwd_supports(scene, cfg)))
    img = render_sharded(scene, cfg, mesh, seed, use_pallas=use_pallas,
                         pallas_interpret=pallas_interpret)
    loss, g_img = jax.value_and_grad(loss_fn)(img)

    def build(s):
        if has_tris or is_hdr:
            return _mesh_camera_table(s), _sphere_table(s)
        return _camera_table(s), _sphere_table(s)

    (cam_tab, sph_tab), build_vjp = jax.vjp(build, scene)

    if has_tris or is_hdr:
        w_flat, aabb, boxes, n_chunks, chunk, bids = _mesh_tables(
            jax.lax.stop_gradient(scene), plan)
        mesh_static = (n_chunks, chunk, bids, max(1, scene.boxes.count),
                       m_type)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(),
                      P(TILE_AXIS, None, None)),
            out_specs=(P(), P(), P(), P()), check_vma=False)
        def _grad(cam_t, sph_t, w_t, aabb_t, box_t, sky_img, g):
            ti = jax.lax.axis_index(TILE_AXIS)
            g_sky = jnp.zeros_like(sky_img)
            if is_hdr:
                sky_obj = Sky.hdr(sky_img)
                gcam = jnp.zeros((1, 128), jnp.float32)
                gsph = jnp.zeros_like(sph_t)
                from ..kernels.megagrad import N_GTRI
                gtri = jnp.zeros((N_GTRI, max(1, n_chunks) * chunk),
                                 jnp.float32)
                for s_base in range(0, cfg.spp, GRAD_HDR_SPP_CHUNK):
                    spp_c = min(GRAD_HDR_SPP_CHUNK, cfg.spp - s_base)
                    gc, gs, gt, gk = _grad_tables_hdr_window(
                        cam_t, sph_t, w_t, aabb_t, box_t, mesh_static,
                        n_spheres, sky_obj, cfg, g, jnp.int32(seed),
                        jnp.int32(s_base), spp_c, flags, pallas_interpret,
                        row_base=ti * rows_per, full_height=cfg.height)
                    gcam = gcam + gc
                    gsph = gsph + gs
                    gtri = gtri + gt
                    g_sky = g_sky + gk
            else:
                from ..kernels.megagrad import (
                    _grad_tables_mesh_laddered, _mesh_ladder_applicable)
                m_tables = (_grad_tables_mesh_laddered
                            if _mesh_ladder_applicable(cfg)
                            else _grad_tables_mesh_inner)
                gcam, gsph, gtri = m_tables(
                    cam_t, sph_t, w_t, aabb_t, box_t, mesh_static,
                    n_spheres, sky_kind, cfg, g, jnp.int32(seed),
                    jnp.int32(0), cfg.spp, flags, pallas_interpret,
                    row_base=ti * rows_per, full_height=cfg.height)
            gcam = jax.lax.psum(gcam, (TILE_AXIS, SAMPLE_AXIS))
            gsph = jax.lax.psum(gsph, (TILE_AXIS, SAMPLE_AXIS))
            gtri = jax.lax.psum(gtri, (TILE_AXIS, SAMPLE_AXIS))
            g_sky = jax.lax.psum(g_sky, (TILE_AXIS, SAMPLE_AXIS))
            return gcam, gsph, gtri, g_sky

        gcam, gsph, gtri, g_sky = _grad(
            cam_tab, sph_tab, w_flat, aabb, boxes,
            jax.lax.stop_gradient(scene.sky.image),
            g_img / jnp.float32(cfg.spp))
        (s_bar,) = build_vjp((gcam, gsph))
        if has_tris and n_chunks > 0:
            from ..kernels.megagrad import _add_tri_cots
            s_bar = _add_tri_cots(s_bar, scene, plan, gtri)
        if is_hdr:
            import dataclasses as _dc
            s_bar = _dc.replace(
                s_bar, sky=_dc.replace(s_bar.sky,
                                       image=s_bar.sky.image + g_sky))
        return loss, img, s_bar

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(TILE_AXIS, None, None)),
        out_specs=(P(), P()), check_vma=False)
    def _grad(cam_t, sph_t, g):
        ti = jax.lax.axis_index(TILE_AXIS)
        from ..kernels.megagrad import (GRAD_LADDER_MIN_SPP,
                                        _grad_tables_laddered)
        tables = (_grad_tables_laddered
                  if cfg.spp >= GRAD_LADDER_MIN_SPP
                  else _grad_tables_inner)
        gcam, gsph = tables(
            cam_t, sph_t, n_spheres, sky_kind, cfg, g,
            jnp.int32(seed), jnp.int32(0), cfg.spp, flags,
            pallas_interpret,
            pix_base=ti * (rows_per * cfg.width),
            full_height=cfg.height)
        gcam = jax.lax.psum(gcam, (TILE_AXIS, SAMPLE_AXIS))
        gsph = jax.lax.psum(gsph, (TILE_AXIS, SAMPLE_AXIS))
        return gcam, gsph

    # the kernel accumulates raw per-sample contributions; the image is
    # their mean, so the cotangent carries 1/spp (as render_grad_scene)
    gcam, gsph = _grad(cam_tab, sph_tab, g_img / jnp.float32(cfg.spp))
    (s_bar,) = build_vjp((gcam, gsph))
    return loss, img, s_bar


def make_train_step(cfg: RenderConfig, mesh, optimizer, loss_fn,
                    insert_params, seed: int = 0, hit_fn_factory=None,
                    grad_backend: str = "jnp", template_scene=None,
                    pallas_interpret: bool = False):
    """Sharded inverse-rendering train step.

    insert_params(params) -> Scene.  Returns jitted
    step(params, opt_state, target, step_seed) -> (params, opt_state, loss).
    Scene params are replicated; their gradients are psum-reduced across the
    mesh by the shard_map transpose automatically.

    grad_backend="pallas" runs each shard's forward AND backward through
    the megakernels (kernels/megakernel.py + megagrad.py) with the table
    cotangents psum-reduced over the mesh — kernel-rate fwd+bwd training.
    Requires template_scene (a concrete Scene with the same static
    structure insert_params produces: counts, material types, sky kind)
    for the value-independent kernel specialization, sample axis 1, and a
    scene inside megagrad scope (spheres + gradient/const sky).
    """
    dcfg = cfg.replace(early_stop=False)
    if grad_backend == "pallas":
        return _make_train_step_pallas(cfg, mesh, optimizer, loss_fn,
                                       insert_params, template_scene,
                                       pallas_interpret)

    def step(params, opt_state, target, step_seed):
        def objective(p):
            scene = insert_params(p)
            n_tile, n_sample = _check(dcfg, mesh)
            rows_per = dcfg.height // n_tile
            spp_per = dcfg.spp // n_sample

            @functools.partial(
                shard_map, mesh=mesh, in_specs=(P(), P()),
                out_specs=P(TILE_AXIS, None, None), check_vma=False)
            def _render(scene, sd):
                ti = jax.lax.axis_index(TILE_AXIS)
                si = jax.lax.axis_index(SAMPLE_AXIS)
                hit_fn = hit_fn_factory(scene) if hit_fn_factory else None
                img = render_rows(scene, dcfg, ti * rows_per, rows_per,
                                  sd, sample_offset=si * spp_per,
                                  spp=spp_per, hit_fn=hit_fn)
                return jax.lax.pmean(img, SAMPLE_AXIS)

            return loss_fn(_render(scene, step_seed), target)

        loss, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def _make_train_step_pallas(cfg, mesh, optimizer, loss_fn, insert_params,
                            template_scene, pallas_interpret):
    """Megakernel fwd + backward-megakernel bwd per tile shard; table
    cotangents psum over the mesh, chained through the differentiable
    table builders and insert_params once, replicated.  Templates with
    triangles use the mesh kernels: triangle VERTEX params (p0/p1/p2)
    get real psum-reduced gradients; per-triangle MATERIAL fields are
    held fixed (must not be fitted params)."""
    from ..kernels.megagrad import (GRAD_HDR_SPP_CHUNK, _grad_tables_inner,
                                    _grad_tables_hdr_window,
                                    _grad_tables_mesh_inner, supports_grad,
                                    supports_grad_hdr, supports_grad_mesh)
    from ..kernels.megakernel import (_camera_table, _sphere_table,
                                      render_pallas_inner, specialize_flags)
    from ..scene.sky import KIND_HDR, Sky

    assert template_scene is not None, \
        "grad_backend='pallas' needs template_scene"
    gcfg = cfg.replace(early_stop=False, nan_policy="zero")
    is_hdr = template_scene.sky.kind == KIND_HDR
    has_tris = template_scene.triangles.count > 0 or is_hdr
    n_tile, n_sample = _check(gcfg, mesh)
    assert n_sample == 1, "pallas train step: sample axis must be 1"
    rows_per = gcfg.height // n_tile
    n_spheres = template_scene.spheres.count
    sky_kind = template_scene.sky.kind
    interp = pallas_interpret or jax.default_backend() != "tpu"

    if has_tris:
        assert (supports_grad_hdr(template_scene, gcfg) if is_hdr
                else supports_grad_mesh(template_scene, gcfg)), \
            "template scene outside mesh/HDR grad-kernel scope"
        from ..kernels.megamesh import (MESH_CHUNK, _mesh_camera_table,
                                        _mesh_tables,
                                        render_pallas_mesh_inner,
                                        specialize_mesh_flags)
        from ..tracer.clusters import plan_for_scene
        plan = plan_for_scene(template_scene, MESH_CHUNK)
        mflags = specialize_mesh_flags(template_scene, conservative=True)
        flags = mflags[:5]
        m_type = mflags[5]

        @functools.partial(
            shard_map, mesh=mesh, in_specs=(P(), P()),
            out_specs=P(TILE_AXIS, None, None), check_vma=False)
        def _fwd(scene, sd):
            ti = jax.lax.axis_index(TILE_AXIS)
            return render_pallas_mesh_inner(
                scene, gcfg, sd, interp, mflags, plan, rows_per,
                ti * (rows_per * gcfg.width))

        def build(s):
            return _mesh_camera_table(s), _sphere_table(s)
    else:
        assert supports_grad(template_scene, gcfg), \
            "template scene outside megagrad scope"
        # the train step's forward runs the megakernel, whose scope caps
        # at 128 spheres (the backward alone goes to 256)
        assert template_scene.spheres.count <= 128, \
            "pallas train step needs forward-kernel scope (<=128 spheres)"
        flags = specialize_flags(template_scene, conservative=True)

        @functools.partial(
            shard_map, mesh=mesh, in_specs=(P(), P()),
            out_specs=P(TILE_AXIS, None, None), check_vma=False)
        def _fwd(scene, sd):
            ti = jax.lax.axis_index(TILE_AXIS)
            return render_pallas_inner(
                scene, gcfg, sd, interp, flags, rows_per,
                ti * (rows_per * gcfg.width))

        def build(s):
            return _camera_table(s), _sphere_table(s)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(TILE_AXIS, None, None), P()),
        out_specs=(P(), P()), check_vma=False)
    def _bwd(cam_t, sph_t, g, sd):
        ti = jax.lax.axis_index(TILE_AXIS)
        from ..kernels.megagrad import (GRAD_LADDER_MIN_SPP,
                                        _grad_tables_laddered)
        tables = (_grad_tables_laddered
                  if gcfg.spp >= GRAD_LADDER_MIN_SPP
                  else _grad_tables_inner)
        gcam, gsph = tables(
            cam_t, sph_t, n_spheres, sky_kind, gcfg, g,
            jnp.int32(sd), jnp.int32(0), gcfg.spp, flags, interp,
            pix_base=ti * (rows_per * gcfg.width),
            full_height=gcfg.height)
        gcam = jax.lax.psum(gcam, (TILE_AXIS, SAMPLE_AXIS))
        gsph = jax.lax.psum(gsph, (TILE_AXIS, SAMPLE_AXIS))
        return gcam, gsph

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(),
                  P(TILE_AXIS, None, None), P()),
        out_specs=(P(), P(), P(), P()), check_vma=False)
    def _bwd_mesh(cam_t, sph_t, w_t, aabb_t, box_t, sky_img, g, sd):
        ti = jax.lax.axis_index(TILE_AXIS)
        g_sky = jnp.zeros_like(sky_img)
        if is_hdr:
            sky_obj = Sky.hdr(sky_img)
            gcam = jnp.zeros((1, 128), jnp.float32)
            gsph = jnp.zeros_like(sph_t)
            from ..kernels.megagrad import N_GTRI
            gtri = jnp.zeros((N_GTRI, max(1, n_chunks) * chunk),
                             jnp.float32)
            for s_base in range(0, gcfg.spp, GRAD_HDR_SPP_CHUNK):
                spp_c = min(GRAD_HDR_SPP_CHUNK, gcfg.spp - s_base)
                gc, gs, gt, gk = _grad_tables_hdr_window(
                    cam_t, sph_t, w_t, aabb_t, box_t, mesh_static,
                    n_spheres, sky_obj, gcfg, g, jnp.int32(sd),
                    jnp.int32(s_base), spp_c, flags, interp,
                    row_base=ti * rows_per, full_height=gcfg.height)
                gcam = gcam + gc
                gsph = gsph + gs
                gtri = gtri + gt
                g_sky = g_sky + gk
        else:
            from ..kernels.megagrad import (
                _grad_tables_mesh_laddered, _mesh_ladder_applicable)
            m_tables = (_grad_tables_mesh_laddered
                        if _mesh_ladder_applicable(gcfg)
                        else _grad_tables_mesh_inner)
            gcam, gsph, gtri = m_tables(
                cam_t, sph_t, w_t, aabb_t, box_t, mesh_static,
                n_spheres, sky_kind, gcfg, g, jnp.int32(sd),
                jnp.int32(0), gcfg.spp, flags, interp,
                row_base=ti * rows_per, full_height=gcfg.height)
        gcam = jax.lax.psum(gcam, (TILE_AXIS, SAMPLE_AXIS))
        gsph = jax.lax.psum(gsph, (TILE_AXIS, SAMPLE_AXIS))
        gtri = jax.lax.psum(gtri, (TILE_AXIS, SAMPLE_AXIS))
        g_sky = jax.lax.psum(g_sky, (TILE_AXIS, SAMPLE_AXIS))
        return gcam, gsph, gtri, g_sky

    if has_tris:
        w_flat0, aabb0, boxes0, n_chunks, chunk, bids = _mesh_tables(
            jax.lax.stop_gradient(template_scene), plan)
        mesh_static = (n_chunks, chunk, bids,
                       max(1, template_scene.boxes.count), m_type)

    def step(params, opt_state, target, step_seed):
        scene = insert_params(params)
        img = _fwd(scene, step_seed)
        loss, g_img = jax.value_and_grad(
            lambda im: loss_fn(im, target))(img)
        (cam_tab, sph_tab), build_vjp = jax.vjp(build, scene)
        # the kernel accumulates raw per-sample contributions; the image
        # is their mean, so the cotangent carries 1/spp
        if has_tris:
            w_flat, aabb, boxes, _, _, _ = _mesh_tables(
                jax.lax.stop_gradient(scene), plan)
            gcam, gsph, gtri, g_sky = _bwd_mesh(
                cam_tab, sph_tab, w_flat, aabb, boxes,
                jax.lax.stop_gradient(scene.sky.image),
                g_img / jnp.float32(gcfg.spp), step_seed)
        else:
            gcam, gsph = _bwd(cam_tab, sph_tab,
                              g_img / jnp.float32(gcfg.spp), step_seed)
        (s_bar,) = build_vjp((gcam, gsph))
        if has_tris and scene.triangles.count > 0 and n_chunks > 0:
            from ..kernels.megagrad import _add_tri_cots
            s_bar = _add_tri_cots(s_bar, scene, plan, gtri)
        if is_hdr:
            import dataclasses as _dc
            s_bar = _dc.replace(
                s_bar, sky=_dc.replace(s_bar.sky,
                                       image=s_bar.sky.image + g_sky))
        _, ins_vjp = jax.vjp(insert_params, params)
        (p_bar,) = ins_vjp(s_bar)
        updates, opt_state = optimizer.update(p_bar, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(step)
