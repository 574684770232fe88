"""CLI end-to-end (the reference's executable surface, main.cpp:13)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from opencl_ray_tracer_tpu.io import read_bmp


def _run(args, cwd):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    return subprocess.run(
        [sys.executable, "-m", "opencl_ray_tracer_tpu.cli", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=600)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_info():
    r = _run(["info"], REPO)
    assert r.returncode == 0, r.stderr
    assert "Device information" in r.stdout


def test_cli_render_bmp(tmp_path):
    out = str(tmp_path / "out.bmp")
    r = _run(["render", "--scene", "readme", "--width", "64", "--height",
              "36", "--spp", "2", "--max-depth", "3", "--cpu",
              "-o", out], REPO)
    assert r.returncode == 0, r.stderr
    assert "camera samples/s" in r.stdout
    img = read_bmp(out)
    assert img.shape == (36, 64, 3)
    assert img.mean() > 10  # not black


def test_cli_render_reference_default_scene(tmp_path):
    """--scene reference is the reference binary's default render
    (main.cpp:118-133): mesh + 8 spheres + HDR skybox, auto-resolved from
    assets — one command, no hand assembly."""
    out = str(tmp_path / "out.bmp")
    r = _run(["render", "--scene", "reference", "--width", "64",
              "--height", "36", "--spp", "2", "--max-depth", "3", "--cpu",
              "-o", out], REPO)
    assert r.returncode == 0, r.stderr
    img = read_bmp(out)
    assert img.shape == (36, 64, 3)
    assert img.mean() > 10


def test_flagship_scene_contents():
    import opencl_ray_tracer_tpu as ort
    from opencl_ray_tracer_tpu.scene.sky import KIND_HDR

    scene = ort.flagship_scene()
    assert scene.spheres.count == 8
    assert scene.triangles.count > 0          # f1_car.obj or torus fallback
    assert scene.boxes.count >= 1
    assert scene.sky.kind == KIND_HDR
    assert float(np.asarray(scene.sky.image).max()) <= 1.0  # tone-mapped


def test_cli_render_json_scene_png(tmp_path):
    scene = tmp_path / "scene.json"
    scene.write_text("""{
      "camera": {"look_from": [0,0,0], "look_at": [0,0,-1],
                 "vfov_deg": 90, "aspect_ratio": 1.7777,
                 "focus_dist": 1.0, "aperture_deg": 0},
      "spheres": [{"center": [0,0,-2], "radius": 0.5,
                   "albedo": [0.9,0.1,0.1], "material": "lambertian"}],
      "sky": {"kind": "gradient"}
    }""")
    out = str(tmp_path / "out.png")
    r = _run(["render", "--scene", str(scene), "--width", "64", "--height",
              "36", "--spp", "2", "--max-depth", "3", "--cpu",
              "-o", out], REPO)
    assert r.returncode == 0, r.stderr
    data = open(out, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_render_with_checkpoint_and_progress(tmp_path):
    out = str(tmp_path / "out.bmp")
    ckpt = str(tmp_path / "ckpt.npz")
    prog = str(tmp_path / "progress.png")
    r = _run(["render", "--scene", "readme", "--width", "64", "--height",
              "36", "--spp", "4", "--max-depth", "3", "--cpu",
              "--checkpoint", ckpt, "--chunk-spp", "2",
              "--progress-image", prog, "-o", out], REPO)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(ckpt)
    assert os.path.exists(prog)
    assert "Rendered 4 / 4 samples" in r.stderr


def test_cli_render_progress_without_checkpoint(tmp_path):
    # plain render + --progress-image: the per-row-block growing image
    # (reference main.cpp:263-265), no checkpoint file involved
    out = str(tmp_path / "out.png")
    prog = str(tmp_path / "progress.png")
    r = _run(["render", "--scene", "readme", "--width", "64", "--height",
              "32", "--spp", "2", "--max-depth", "3", "--cpu",
              "--progress-image", prog, "-o", out], REPO)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(prog)
    assert "Rendered 32 / 32" in r.stderr


def test_progressive_render_matches_plain():
    import numpy as np
    import opencl_ray_tracer_tpu as ort

    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=48, height=24, spp=2, max_depth=3)
    plain = np.asarray(ort.render(scene, cfg, seed=0))
    calls = []
    prog = np.asarray(ort.render(
        scene, cfg, seed=0,
        progress=lambda done, total, img: calls.append((done, total))))
    np.testing.assert_allclose(prog, plain, atol=1e-6)
    assert calls[-1][0] == calls[-1][1] == 24
    assert len(calls) >= 2


def test_progress_reporter_bmp(tmp_path):
    """--progress-image foo.bmp mirrors the reference's BMP-polling
    progress contract exactly (main.cpp:263-265): the reporter writes a
    valid BMP (not PNG) when the path ends in .bmp."""
    import io as _io

    import numpy as np

    from opencl_ray_tracer_tpu.utils import ProgressReporter

    p = str(tmp_path / "prog.bmp")
    rep = ProgressReporter(p, every_s=0.0, stream=_io.StringIO())
    img = np.zeros((4, 8, 3), np.float32)
    rep(1, 2, img)
    data = open(p, "rb").read()
    assert data[:2] == b"BM"
