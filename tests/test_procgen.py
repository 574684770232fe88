"""Procedural assets: generated OBJ/HDR load correctly and render."""

import os

import numpy as np

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.io import load_hdr, parse_obj, tone_map
from opencl_ray_tracer_tpu.io.procgen import (make_sky_image,
                                              make_torus_obj,
                                              make_uv_sphere_obj,
                                              write_test_assets)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_uv_sphere_mesh_valid():
    tris, (mn, mx) = parse_obj(make_uv_sphere_obj())
    assert tris.shape[0] > 100
    # every vertex on the unit sphere
    np.testing.assert_allclose(np.linalg.norm(tris.reshape(-1, 3), axis=1),
                               1.0, atol=1e-5)
    np.testing.assert_allclose(mn, [-1, -1, -1], atol=0.05)
    np.testing.assert_allclose(mx, [1, 1, 1], atol=0.05)


def test_torus_slash_faces_parse():
    tris, _ = parse_obj(make_torus_obj())
    assert tris.shape[0] == 24 * 12 * 2
    r_major, r_minor = 1.0, 0.35
    # each vertex within the torus shell radius bounds
    xz = np.linalg.norm(tris.reshape(-1, 3)[:, [0, 2]], axis=1)
    assert (xz > r_major - r_minor - 1e-4).all()
    assert (xz < r_major + r_minor + 1e-4).all()


def test_sky_hdr_roundtrip(tmp_path):
    paths = write_test_assets(str(tmp_path))
    img = load_hdr(paths["sky"])
    assert img.shape == (128, 256, 3)
    assert img.max() > 5.0  # genuinely HDR (sun)
    tm = tone_map(img)
    assert tm.max() <= 1.0


def test_mesh_demo_scene_renders():
    scene = ort.scene_from_json(os.path.join(REPO, "scenes",
                                             "mesh_demo.json"))
    assert scene.triangles.count == 24 * 12 * 2
    cfg = ort.RenderConfig(width=48, height=27, spp=2, max_depth=4)
    img = np.asarray(ort.render(scene, cfg))
    assert not np.isnan(img).any()
    assert img.mean() > 0.05


def test_readme_bench_scene_json_matches_preset():
    scene = ort.scene_from_json(os.path.join(REPO, "scenes",
                                             "readme_bench.json"))
    preset = ort.readme_scene()
    np.testing.assert_allclose(np.asarray(scene.spheres.center),
                               np.asarray(preset.spheres.center))
    cfg = ort.RenderConfig(width=32, height=18, spp=2, max_depth=3)
    a = np.asarray(ort.render(scene, cfg, seed=0))
    b = np.asarray(ort.render(preset, cfg, seed=0))
    np.testing.assert_array_equal(a, b)


def test_hdr_sky_render():
    import dataclasses
    from opencl_ray_tracer_tpu.scene import Sky
    sky_img = tone_map(make_sky_image(64, 32))
    scene = dataclasses.replace(ort.readme_scene(), sky=Sky.hdr(sky_img))
    cfg = ort.RenderConfig(width=32, height=18, spp=2, max_depth=3)
    img = np.asarray(ort.render(scene, cfg))
    assert not np.isnan(img).any()
    assert img.mean() > 0.05
