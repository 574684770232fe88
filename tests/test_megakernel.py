"""Pallas megakernel vs the jnp reference tracer (interpret mode on CPU).

Both backends draw the same pcg4d counter-RNG streams, so images agree
sample-for-sample up to fp reassociation; only pixels whose samples cross a
discrete event boundary (hit/miss, absorb) under ~1-ulp differences may
deviate by O(1/spp) — asserted to be a vanishing fraction.
"""

import dataclasses

import numpy as np
import pytest

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.kernels import megakernel_supports, render_pallas
from opencl_ray_tracer_tpu.scene import Sky, materials as mat


def _compare(scene, cfg, seed=0, frac=0.005):
    img_p = np.asarray(render_pallas(scene, cfg, seed=seed, interpret=True))
    img_j = np.asarray(ort.render(scene, cfg, seed=seed))
    diff = np.abs(img_p - img_j)
    # discrete-event flips under fp reassociation: a vanishing fraction
    flipped = (diff > 1e-3).mean()
    assert flipped < frac, f"{flipped:.4%} pixels flipped"
    # the bulk of pixels agree to fp noise
    assert (diff <= 1e-4).mean() > 1.0 - 2 * frac
    assert abs(img_p.mean() - img_j.mean()) < 2e-3
    return img_p


def test_readme_scene_matches_jnp():
    cfg = ort.RenderConfig(width=64, height=36, spp=4, max_depth=6)
    img = _compare(ort.readme_scene(), cfg)
    assert not np.isnan(img).any()


def test_reference_spheres_all_materials():
    # 8 spheres incl. dielectric + emissive (gradient sky stand-in).
    cfg = ort.RenderConfig(width=48, height=32, spp=4, max_depth=6)
    _compare(ort.reference_scene(), cfg)


def test_const_sky():
    scene = dataclasses.replace(ort.readme_scene(),
                                sky=Sky.constant((0.2, 0.4, 0.6)))
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4)
    _compare(scene, cfg)


def test_nan_zero_policy_and_no_clamp():
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           nan_policy="zero", clamp_samples=False)
    _compare(ort.readme_scene(), cfg)


def test_book_cover_100_spheres():
    cfg = ort.RenderConfig(width=48, height=32, spp=2, max_depth=4)
    _compare(ort.book_cover_scene(), cfg, frac=0.01)


def test_supports_predicate():
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4)
    assert megakernel_supports(ort.readme_scene(), cfg)
    import jax.numpy as jnp
    hdr_scene = dataclasses.replace(
        ort.readme_scene(), sky=Sky.hdr(jnp.ones((4, 8, 3))))
    assert not megakernel_supports(hdr_scene, cfg)


def test_non_multiple_of_tile_resolution():
    # width*height not a multiple of the 2048-pixel tile: padded tail.
    cfg = ort.RenderConfig(width=50, height=30, spp=2, max_depth=4)
    _compare(ort.readme_scene(), cfg)


def test_grouped_sphere_fold_matches():
    """The grouped fold (off by default — see SPHERE_GROUP_MIN) must agree
    with the plain loop; exercised by lowering the threshold."""
    import opencl_ray_tracer_tpu.kernels.megakernel as mk
    old = mk.SPHERE_GROUP_MIN
    mk.SPHERE_GROUP_MIN = 8
    try:
        cfg = ort.RenderConfig(width=48, height=32, spp=2, max_depth=4)
        _compare(ort.book_cover_scene(), cfg, frac=0.01)
    finally:
        mk.SPHERE_GROUP_MIN = old


def test_sample_window_raw_sum_matches_monolithic():
    """Windowed raw-sum renders (sample_offset + acc0 + mean=False — the
    kernel-rate checkpoint path) reproduce the monolithic kernel render
    bit-for-bit, including under the running-sum NaN policy (acc0 seeds
    the policy's running sum across windows)."""
    scene = ort.readme_scene()
    for policy in ("zero", "running_sum"):
        cfg = ort.RenderConfig(width=32, height=16, spp=6, max_depth=4,
                               nan_policy=policy)
        mono = np.asarray(render_pallas(scene, cfg, seed=3,
                                        interpret=True))
        acc = np.zeros((16, 32, 3), np.float32)
        for s0, n in ((0, 2), (2, 3), (5, 1)):
            acc = np.asarray(render_pallas(
                scene, cfg.replace(spp=n), seed=3, interpret=True,
                sample_offset=s0, mean=False, acc0=acc))
        # the kernel's mean epilogue multiplies by the f32 reciprocal
        np.testing.assert_array_equal(acc * np.float32(1.0 / cfg.spp),
                                      mono)
