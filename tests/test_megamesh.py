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
    assert supports_mesh(_mesh_scene(), cfg)
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


def test_two_pass_tail_compaction_matches_single_pass():
    """Pass-1 iteration cap + compacted continuation must reproduce the
    single-pass image exactly (same draws, split accumulators)."""
    import opencl_ray_tracer_tpu.kernels.megamesh as mm
    scene = _mesh_scene(sky=_hdr_sky())
    cfg = ort.RenderConfig(width=48, height=32, spp=3, max_depth=16)
    single = np.asarray(render_pallas_mesh(scene, cfg, seed=1,
                                           interpret=True))
    old = (mm.PASS1_ITER_FACTOR, mm.PASS1_ITER_SLACK, mm.COMPACT_FRACTION)
    mm.PASS1_ITER_FACTOR, mm.PASS1_ITER_SLACK = 1, 2   # force the cap low
    mm.COMPACT_FRACTION = 1                             # full capacity
    try:
        two = np.asarray(render_pallas_mesh(scene, cfg, seed=1,
                                            interpret=True))
    finally:
        (mm.PASS1_ITER_FACTOR, mm.PASS1_ITER_SLACK,
         mm.COMPACT_FRACTION) = old
    np.testing.assert_allclose(two, single, atol=1e-6)


def test_two_pass_gradient_sky_matches():
    import opencl_ray_tracer_tpu.kernels.megamesh as mm
    scene = _mesh_scene()
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=12)
    single = np.asarray(render_pallas_mesh(scene, cfg, seed=2,
                                           interpret=True))
    old = (mm.PASS1_ITER_FACTOR, mm.PASS1_ITER_SLACK, mm.COMPACT_FRACTION)
    mm.PASS1_ITER_FACTOR, mm.PASS1_ITER_SLACK = 1, 2
    mm.COMPACT_FRACTION = 1
    try:
        two = np.asarray(render_pallas_mesh(scene, cfg, seed=2,
                                            interpret=True))
    finally:
        (mm.PASS1_ITER_FACTOR, mm.PASS1_ITER_SLACK,
         mm.COMPACT_FRACTION) = old
    np.testing.assert_allclose(two, single, atol=1e-6)
