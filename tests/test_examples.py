"""Smoke tests for the examples/ scripts (the user-facing demo surface).

Each runs in a subprocess at a tiny configuration — the point is bit-rot
prevention (API drift breaks examples silently otherwise), not coverage.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=900, devices=1):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count"
                          f"={devices}")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
        env=env)


def test_inverse_rendering_example(tmp_path):
    r = _run("inverse_rendering.py", "--steps", "2", "--size", "32",
             "--out", str(tmp_path / "inv"))
    assert r.returncode == 0, r.stderr[-2000:]


def test_fit_mesh_vertices_example():
    r = _run("fit_mesh_vertices.py", "--cpu", "--steps", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "recovered shear" in r.stdout


def test_multichip_render_example(tmp_path):
    r = _run("multichip_render.py", "--cpu", "--width", "64", "--height",
             "32", "--spp", "2", "--sample-axis", "2",
             "--out", str(tmp_path / "mc.png"), devices=4)
    assert r.returncode == 0, r.stderr[-2000:]


def test_reference_scene_render_example(tmp_path):
    r = _run("reference_scene_render.py", "--small",
             "-o", str(tmp_path / "ref.png"))
    assert r.returncode == 0, r.stderr[-2000:]


def test_fit_sky_image_example():
    r = _run("fit_sky_image.py", "--cpu", "--steps", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "recovered gain" in r.stdout
