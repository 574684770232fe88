"""Fused mesh/HDR megakernel vs the jnp tracer (interpret mode on CPU).

Same tolerance model as test_megakernel.py: identical RNG streams, so only
pixels whose samples cross a discrete event boundary under ~1-ulp
reassociation may flip, a vanishing fraction.
"""

import dataclasses

import numpy as np

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.io.hdr import tone_map
from opencl_ray_tracer_tpu.io.obj import parse_obj
from opencl_ray_tracer_tpu.io.procgen import make_sky_image, make_torus_obj
from opencl_ray_tracer_tpu.kernels.megamesh import (render_pallas_mesh,
                                                    supports_mesh)
from opencl_ray_tracer_tpu.scene import Sky


def _hdr_sky():
    return Sky.hdr(tone_map(make_sky_image(64, 32)))


def _mesh_scene(sky=None):
    tris, aabb = parse_obj(make_torus_obj(12, 8), scale=(0.5, 0.5, 0.5),
                           translate=(0.3, 0.0, -1.6))
    return ort.reference_scene(mesh_tris=tris, mesh_aabb=aabb, sky=sky)


def _compare(scene, cfg, seed=0, frac=0.005):
    assert supports_mesh(scene, cfg)
    img_p = np.asarray(render_pallas_mesh(scene, cfg, seed=seed,
                                          interpret=True))
    img_j = np.asarray(ort.render(scene, cfg, seed=seed))
    diff = np.abs(img_p - img_j)
    flipped = (diff > 1e-3).mean()
    assert flipped < frac, f"{flipped:.4%} pixels flipped"
    assert (diff <= 1e-4).mean() > 1.0 - 2 * frac
    assert abs(img_p.mean() - img_j.mean()) < 2e-3
    return img_p


def test_mesh_gradient_sky():
    cfg = ort.RenderConfig(width=48, height=32, spp=3, max_depth=5)
    img = _compare(_mesh_scene(), cfg)
    assert not np.isnan(img).any()


def test_spheres_hdr_sky():
    scene = dataclasses.replace(ort.readme_scene(), sky=_hdr_sky())
    cfg = ort.RenderConfig(width=48, height=32, spp=3, max_depth=5)
    _compare(scene, cfg)


def test_mesh_hdr_sky_reference_default_shape():
    # the reference main.cpp scene shape: 8 spheres + mesh + HDR skybox
    scene = _mesh_scene(sky=_hdr_sky())
    cfg = ort.RenderConfig(width=48, height=32, spp=3, max_depth=5)
    _compare(scene, cfg)


def test_hdr_spp_chunking():
    # spp > HDR_SPP_CHUNK forces multiple dispatches with sample offsets
    scene = dataclasses.replace(ort.readme_scene(), sky=_hdr_sky())
    cfg = ort.RenderConfig(width=32, height=16, spp=11, max_depth=4)
    _compare(scene, cfg)


def test_mesh_const_sky():
    scene = _mesh_scene(sky=Sky.constant((0.2, 0.4, 0.6)))
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4)
    _compare(scene, cfg)


def test_supports_predicate():
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4)
    assert not supports_mesh(ort.readme_scene(), cfg)  # megakernel's turf
    # ... except at high spp, where the multi-round tail compaction wins
    # even for tiny sphere counts
    assert supports_mesh(ort.readme_scene(),
                         dataclasses.replace(cfg, spp=64))
    assert supports_mesh(_mesh_scene(), cfg)
    # large sphere-only scenes route here (2-D tiles + multi-round beat
    # the linear-tile megakernel)
    assert supports_mesh(ort.book_cover_scene(), cfg)
    # untone-mapped sky (values > 1) must fall back to the jnp path: the
    # per-sample clamp would no longer be a no-op for deferred misses
    import jax.numpy as jnp
    bright = dataclasses.replace(
        ort.readme_scene(), sky=Sky.hdr(jnp.full((4, 8, 3), 3.0)))
    assert not supports_mesh(bright, cfg)


def test_render_dispatch_routes_mesh_scene():
    # cfg.backend="pallas" forces the fused kernel through render()
    scene = _mesh_scene(sky=_hdr_sky())
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           backend="pallas")
    img_p = np.asarray(ort.render(scene, cfg, seed=0))
    img_j = np.asarray(ort.render(scene, cfg.replace(backend="jnp"), seed=0))
    assert np.abs(img_p - img_j).mean() < 1e-3


def _uncapped(cfg):
    return ((cfg.spp * cfg.max_depth + 1, 1),)


def test_two_round_tail_compaction_matches_single_pass():
    """Iteration cap + compacted continuation must reproduce the
    single-pass image exactly (same draws, split accumulators)."""
    scene = _mesh_scene(sky=_hdr_sky())
    cfg = ort.RenderConfig(width=48, height=32, spp=3, max_depth=16)
    single = np.asarray(render_pallas_mesh(scene, cfg, seed=1,
                                           interpret=True,
                                           schedule=_uncapped(cfg)))
    two = np.asarray(render_pallas_mesh(scene, cfg, seed=1, interpret=True,
                                        schedule=((5, 1), (999, 1))))
    np.testing.assert_allclose(two, single, atol=1e-6)


def test_multi_round_compaction_matches():
    """Three capped rounds + uncapped finisher == single pass, including
    the default-derived schedule."""
    scene = _mesh_scene(sky=_hdr_sky())
    cfg = ort.RenderConfig(width=48, height=32, spp=3, max_depth=16)
    single = np.asarray(render_pallas_mesh(scene, cfg, seed=2,
                                           interpret=True,
                                           schedule=_uncapped(cfg)))
    multi = np.asarray(render_pallas_mesh(
        scene, cfg, seed=2, interpret=True,
        schedule=((4, 1), (4, 1), (4, 1), (999, 1))))
    np.testing.assert_allclose(multi, single, atol=1e-6)
    default = np.asarray(render_pallas_mesh(scene, cfg, seed=2,
                                            interpret=True))
    np.testing.assert_allclose(default, single, atol=1e-6)


def test_multi_round_gradient_sky_matches():
    scene = _mesh_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=12)
    single = np.asarray(render_pallas_mesh(scene, cfg, seed=2,
                                           interpret=True,
                                           schedule=_uncapped(cfg)))
    multi = np.asarray(render_pallas_mesh(scene, cfg, seed=2,
                                          interpret=True,
                                          schedule=((3, 1), (3, 1),
                                                    (999, 1))))
    np.testing.assert_allclose(multi, single, atol=1e-6)


def test_book_cover_routes_to_megamesh_and_matches():
    """100-sphere scene through this kernel (multi-round schedule) must be
    bit-identical to the megakernel's fold (same math, same draws)."""
    from opencl_ray_tracer_tpu.kernels.megakernel import render_pallas
    scene = ort.book_cover_scene()
    cfg = ort.RenderConfig(width=48, height=32, spp=2, max_depth=6)
    assert supports_mesh(scene, cfg)
    img_m = np.asarray(render_pallas_mesh(scene, cfg, seed=5,
                                          interpret=True))
    img_k = np.asarray(render_pallas(scene, cfg, seed=5, interpret=True))
    np.testing.assert_allclose(img_m, img_k, atol=1e-6)


def test_chunk_gated_sphere_fold_matches():
    """The chunk-gated sphere fold (disabled by default; see
    SPHERE_GATE_MIN) must agree with the plain fold."""
    import opencl_ray_tracer_tpu.kernels.megamesh as mm
    scene = ort.book_cover_scene()
    cfg = ort.RenderConfig(width=48, height=32, spp=2, max_depth=5)
    plain = np.asarray(render_pallas_mesh(scene, cfg, seed=9,
                                          interpret=True))
    old = mm.SPHERE_GATE_MIN
    mm.SPHERE_GATE_MIN = 8
    try:
        gated = np.asarray(render_pallas_mesh(scene, cfg, seed=9,
                                              interpret=True))
    finally:
        mm.SPHERE_GATE_MIN = old
    np.testing.assert_allclose(gated, plain, atol=1e-6)


def test_compaction_overflow_falls_back():
    """A schedule whose capacity can't hold the survivors must trip the
    ok flag, and the public API must re-render soundly (single uncapped
    round)."""
    import jax.numpy as jnp
    import opencl_ray_tracer_tpu.kernels.megamesh as mm
    from opencl_ray_tracer_tpu.tracer.clusters import plan_for_scene
    scene = _mesh_scene()
    # 2 padded tiles (hp=128) so a denom-2 compaction has real capacity
    # pressure: after 1 iteration nearly all 10240 live lanes survive,
    # far more than the 8192-lane round-1 capacity.
    cfg = ort.RenderConfig(width=128, height=80, spp=2, max_depth=10)
    bad = ((1, 1), (999, 2))
    plan = plan_for_scene(scene, mm.MESH_CHUNK)
    flags = mm.specialize_mesh_flags(scene)
    _, ok = mm.render_pallas_mesh_inner(
        scene, cfg, jnp.int32(1), True, flags, plan, cfg.height,
        jnp.int32(0), schedule=bad, return_ok=True)
    assert not bool(ok), "expected a capacity overflow"
    import warnings as _w
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        via_public = np.asarray(render_pallas_mesh(scene, cfg, seed=1,
                                                   interpret=True,
                                                   schedule=bad))
    assert any("compaction round overflowed" in str(c.message)
               for c in caught), "fallback must warn (diagnosability)"
    single = np.asarray(render_pallas_mesh(scene, cfg, seed=1,
                                           interpret=True,
                                           schedule=_uncapped(cfg)))
    np.testing.assert_allclose(via_public, single, atol=1e-6)


def test_compaction_overflow_fallback_under_jit():
    """The lax.cond fallback (render_pallas_mesh_safe) must repair a
    capacity overflow even when the whole render is inside an outer jit
    (where the ok flag is a tracer and the eager re-render is
    unreachable) — the silent-path-drop scenario from round 3."""
    import jax
    import jax.numpy as jnp
    import opencl_ray_tracer_tpu.kernels.megamesh as mm
    from opencl_ray_tracer_tpu.tracer.clusters import plan_for_scene
    scene = _mesh_scene()
    cfg = ort.RenderConfig(width=128, height=80, spp=2, max_depth=10)
    bad = ((1, 1), (999, 2))      # overflows (see the eager test above)
    plan = plan_for_scene(scene, mm.MESH_CHUNK)
    flags = mm.specialize_mesh_flags(scene)

    @jax.jit
    def jitted(s, seed):
        return mm.render_pallas_mesh_safe(
            s, cfg, seed, True, flags, plan, cfg.height, jnp.int32(0),
            schedule=bad)

    img = np.asarray(jitted(scene, jnp.int32(1)))
    single = np.asarray(render_pallas_mesh(scene, cfg, seed=1,
                                           interpret=True,
                                           schedule=_uncapped(cfg)))
    np.testing.assert_allclose(img, single, atol=1e-6)
    # and on a non-overflowing schedule the cond must keep the ladder path
    good = np.asarray(jax.jit(lambda s: mm.render_pallas_mesh_safe(
        s, cfg, jnp.int32(1), True, flags, plan, cfg.height,
        jnp.int32(0)))(scene))
    np.testing.assert_allclose(good, single, atol=1e-6)


def test_count_fires_instrumentation_smoke():
    """count_fires=True returns (img, ok, fire_rounds) regardless of
    return_ok, with per-round (tiles, 6) int32 counter dumps whose
    iteration tallies are positive, and must not perturb the image."""
    import jax.numpy as jnp
    import opencl_ray_tracer_tpu.kernels.megamesh as mm
    from opencl_ray_tracer_tpu.tracer.clusters import plan_for_scene
    scene = _mesh_scene()
    cfg = ort.RenderConfig(width=48, height=32, spp=2, max_depth=6)
    plan = plan_for_scene(scene, mm.MESH_CHUNK)
    flags = mm.specialize_mesh_flags(scene)
    img, ok, fires = mm.render_pallas_mesh_inner(
        scene, cfg, jnp.int32(0), True, flags, plan, cfg.height,
        jnp.int32(0), return_ok=False, count_fires=True)
    assert bool(ok)
    assert isinstance(fires, list) and len(fires) >= 1
    for fr in fires:
        fr = np.asarray(fr)
        assert fr.ndim == 2 and fr.shape[1] == 6
        assert np.all(fr == np.round(fr))       # integral f32 counters
    # total iterations across round 0's tiles must be positive
    assert int(np.asarray(fires[0])[:, 0].sum()) > 0
    plain = np.asarray(render_pallas_mesh(scene, cfg, seed=0,
                                          interpret=True))
    np.testing.assert_allclose(np.asarray(img), plain, atol=1e-6)


def test_small_sphere_high_spp_ladder():
    """README scene (5 spheres) at spp >= 64: routes through this kernel's
    high-spp multi-round compaction ladder.

    Tolerance model: at spp=64 the per-pixel mean accumulates 64 samples'
    ~1-ulp reassociation drifts, so the per-pixel flip fraction vs the jnp
    tracer scales ~linearly with spp and the default frac=0.5% (calibrated
    for spp=2-3) no longer applies. The true invariant (measured in round
    3's post-mortem) is that the ladder is *bitwise* equal to the untouched
    sphere megakernel on this config — assert that, plus mean radiance vs
    the jnp tracer within one sample quantum."""
    from opencl_ray_tracer_tpu.kernels.megakernel import render_pallas
    cfg = ort.RenderConfig(width=32, height=16, spp=64, max_depth=6)
    scene = ort.readme_scene()
    assert supports_mesh(scene, cfg)
    img_m = np.asarray(render_pallas_mesh(scene, cfg, seed=0,
                                          interpret=True))
    img_k = np.asarray(render_pallas(scene, cfg, seed=0, interpret=True))
    np.testing.assert_allclose(img_m, img_k, atol=1e-6)
    img_j = np.asarray(ort.render(scene, cfg, seed=0))
    assert abs(img_m.mean() - img_j.mean()) < 1.0 / cfg.spp
    assert not np.isnan(img_m).any()


def test_mesh_sample_window_raw_sum():
    """Windowed raw-sum mesh renders (sample_offset + acc0 + mean=False —
    the kernel-rate checkpoint path) sum to the monolithic mesh render
    (fp addition order differs: the compaction ladder already accumulates
    out of sample order)."""
    scene = _mesh_scene()
    cfg = ort.RenderConfig(width=48, height=32, spp=4, max_depth=4,
                           nan_policy="zero")
    mono = np.asarray(render_pallas_mesh(scene, cfg, seed=2,
                                         interpret=True))
    acc = np.zeros((32, 48, 3), np.float32)
    for s0, n in ((0, 1), (1, 2), (3, 1)):
        acc = np.asarray(render_pallas_mesh(
            scene, cfg.replace(spp=n), seed=2, interpret=True,
            sample_offset=s0, mean=False, acc0=acc))
    np.testing.assert_allclose(acc / cfg.spp, mono, atol=2e-6)
