"""Golden-image regression tests (SURVEY.md §4).

The pure-jnp CPU render is the oracle (the reference's own OpenCL output is
not bit-reproducible — its RNG is seeded from ``srand(time(NULL))``,
main.cpp:18, and its samplers are rejection-based).  Fixtures were rendered
at a fixed seed and committed; any estimator change that alters the image
shows up here.  Tolerances are tight-but-not-bitwise: XLA CPU codegen may
reassociate across jax versions.
"""

import os

import numpy as np
import pytest

import opencl_ray_tracer_tpu as ort

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CASES = {
    "readme_64x36": (ort.readme_scene,
                     ort.RenderConfig(width=64, height=36, spp=8,
                                      max_depth=8)),
    "reference_64x36": (ort.reference_scene,
                        ort.RenderConfig(width=64, height=36, spp=8,
                                         max_depth=8)),
    "cover_64x36": (ort.book_cover_scene,
                    ort.RenderConfig(width=64, height=36, spp=4,
                                     max_depth=6)),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    scene_fn, cfg = CASES[name]
    want = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))["img"]
    got = np.asarray(ort.render(scene_fn(), cfg, seed=42))
    assert got.shape == want.shape
    # identical RNG streams: differences can only be fp-level
    diff = np.abs(got - want)
    assert (diff > 1e-4).mean() < 0.002, diff.max()
    assert abs(got.mean() - want.mean()) < 1e-4


def test_golden_u8_stability():
    # After gamma-2 8-bit quantization the readme golden must be exact.
    from opencl_ray_tracer_tpu.io import tonemap_u8
    scene_fn, cfg = CASES["readme_64x36"]
    want = tonemap_u8(np.load(os.path.join(GOLDEN_DIR,
                                           "readme_64x36.npz"))["img"])
    got = tonemap_u8(np.asarray(ort.render(scene_fn(), cfg, seed=42)))
    mismatch = (want != got).mean()
    assert mismatch < 0.001, mismatch
