"""Native C++ IO vs the pure-Python reference implementations.

The native library is optional (built with ``make -C native``); these tests
skip when it's absent and otherwise require byte/ulp-level agreement with
the Python loaders on the same inputs — including the reference's actual
f1_car.obj asset.
"""

import os
import subprocess

import numpy as np
import pytest

from opencl_ray_tracer_tpu.io import hdr as hdr_py
from opencl_ray_tracer_tpu.io import obj as obj_py
from opencl_ray_tracer_tpu.io import bmp as bmp_py
from opencl_ray_tracer_tpu.io import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _have_native():
    return native._lib() is not None


pytestmark = pytest.mark.skipif(not _have_native(),
                                reason="native lib not built")


def test_obj_native_matches_python(tmp_path):
    text = ("v 1 2 3\nv 4 5 6\nv 7 8 9\nv -1 -2 -3\n"
            "f 1 2 3\nf 1/11/21 2/12/22 4/14/24\n")
    p = tmp_path / "m.obj"
    p.write_text(text)
    want_tris, (wmn, wmx) = obj_py.parse_obj(text, scale=(2, 2, 2),
                                             translate=(1, 0, 0))
    got = native.load_obj_native(str(p), (2, 2, 2), (1, 0, 0))
    assert got is not None
    got_tris, (gmn, gmx) = got
    np.testing.assert_array_equal(got_tris, want_tris)
    np.testing.assert_array_equal(gmn, wmn)
    np.testing.assert_array_equal(gmx, wmx)


def test_obj_native_f1_car():
    path = "/root/reference/src/assets/models/f1_car.obj"
    with open(path) as f:
        text = f.read()
    want_tris, (wmn, wmx) = obj_py.parse_obj(
        text, scale=(0.15, 0.15, 0.15), translate=(0.0, -0.5, -1.0))
    got_tris, (gmn, gmx) = native.load_obj_native(
        path, (0.15, 0.15, 0.15), (0.0, -0.5, -1.0))
    assert got_tris.shape == want_tris.shape == (15329, 3, 3)
    np.testing.assert_allclose(got_tris, want_tris, atol=0)
    np.testing.assert_allclose(gmn, wmn, atol=0)
    np.testing.assert_allclose(gmx, wmx, atol=0)


def test_hdr_native_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 4, size=(6, 9, 3)) ** 2).astype(np.float32)
    data = hdr_py.encode_hdr(img)
    p = tmp_path / "t.hdr"
    p.write_bytes(data)
    want = hdr_py.decode_hdr(data)
    got = native.load_hdr_native(str(p))
    assert got is not None
    np.testing.assert_array_equal(got, want)


def test_hdr_native_old_rle(tmp_path):
    w, h = 5, 1
    header = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
              + f"-Y {h} +X {w}\n".encode())
    scan = bytes([128, 64, 32, 128]) + bytes([1, 1, 1, 4])
    p = tmp_path / "o.hdr"
    p.write_bytes(header + scan)
    want = hdr_py.decode_hdr(header + scan)
    got = native.load_hdr_native(str(p))
    np.testing.assert_array_equal(got, want)


def test_bmp_native_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(7, 5, 3), dtype=np.uint8)
    p_native = tmp_path / "n.bmp"
    assert native.write_bmp_native(str(p_native), img)
    want = bmp_py.encode_bmp(img)
    got = p_native.read_bytes()
    assert got == want  # byte-identical files


def test_native_missing_file_returns_none():
    assert native.load_obj_native("/nonexistent.obj", (1, 1, 1),
                                  (0, 0, 0)) is None
    assert native.load_hdr_native("/nonexistent.hdr") is None
