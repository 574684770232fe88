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


def _hdr_header(w, h):
    return (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
            + f"-Y {h} +X {w}\n".encode())


def _decode_both(tmp_path, data):
    p = tmp_path / "f.hdr"
    p.write_bytes(data)
    py = hdr_py.decode_hdr(data)
    nat = native.load_hdr_native(str(p))
    assert nat is not None
    np.testing.assert_array_equal(py, nat)
    return py


def test_hdr_adversarial_narrow_width_forces_old_rle(tmp_path):
    # width < MINELEN(8): old-RLE even when bytes look like a new-RLE
    # header (hdrloader.cpp:122-123)
    w, h = 4, 2
    line = bytes([2, 2, 0, 4]) + bytes([10, 20, 30, 140]) * 3
    img = _decode_both(tmp_path, _hdr_header(w, h) + line * h)
    # first pixel is the literal (2,2,0,4): exponent 4 -> tiny values
    assert img.shape == (2, 4, 3)
    np.testing.assert_allclose(
        img[0, 1], np.array([10, 20, 30]) * 2.0 ** (140 - 136))


def test_hdr_adversarial_mixed_mode_seeding(tmp_path):
    # (2, G!=2, ...) first record: literal first pixel with R forced to 2,
    # rest old-RLE (hdrloader.cpp:131-136)
    w, h = 8, 1
    first = bytes([2, 7, 9, 130])
    rest = bytes([1, 1, 1, 7])  # repeat the seeded pixel 7 times
    img = _decode_both(tmp_path, _hdr_header(w, h) + first + rest)
    s = 2.0 ** (130 - 136)
    np.testing.assert_allclose(img[0, 0], np.array([2, 7, 9]) * s)
    np.testing.assert_allclose(img[0, 7], np.array([2, 7, 9]) * s)


def test_hdr_adversarial_new_rle_ignores_encoded_length(tmp_path):
    # the reference never validates (B<<8)|E against the width
    # (hdrloader.cpp:126-139): a wrong encoded length still new-RLE-decodes
    w, h = 8, 1
    hdr = bytes([2, 2, 0, 99])      # claims width 99; actual 8
    planes = b""
    for comp in range(4):
        planes += bytes([128 + 8, comp + 1])  # run of 8 of (comp+1)
    img = _decode_both(tmp_path, _hdr_header(w, h) + hdr + planes)
    s = 2.0 ** (4 - 136)
    np.testing.assert_allclose(img[0, 3], np.array([1, 2, 3]) * s)


def test_hdr_adversarial_old_rle_rshift_chain(tmp_path):
    # consecutive repeat records shift the count left 8 bits each
    # (hdrloader.cpp:175-183): (1,1,1,1)<<0 then (1,1,1,1)<<8 = 256
    w, h = 300, 1
    data = bytes([5, 6, 7, 136])            # literal first (not byte 2)
    data += bytes([1, 1, 1, 42])            # repeat 42
    data += bytes([1, 1, 1, 1])             # repeat 1<<8 = 256
    data += bytes([9, 9, 9, 136])           # literal last
    img = _decode_both(tmp_path, _hdr_header(w, h) + data)
    np.testing.assert_allclose(img[0, 298], np.array([5, 6, 7]))
    np.testing.assert_allclose(img[0, 299], np.array([9, 9, 9]))


def test_hdr_adversarial_first_record_repeat_defined(tmp_path):
    # a repeat code as the first old-RLE record references the pixel
    # before the scanline — UB in the reference, defined as zeros here
    w, h = 4, 1
    data = bytes([1, 1, 1, 2]) + bytes([3, 3, 3, 136]) * 2
    img = _decode_both(tmp_path, _hdr_header(w, h) + data)
    np.testing.assert_allclose(img[0, 0], 0.0)
    np.testing.assert_allclose(img[0, 1], 0.0)
    np.testing.assert_allclose(img[0, 2], np.array([3, 3, 3]))


def test_hdr_fuzz_roundtrip_python_native(tmp_path):
    # randomized valid new-RLE + old-RLE + mixed scanlines: byte-equal
    # decode between the Python and native implementations
    rng = np.random.default_rng(0)
    w, h = 16, 6
    body = b""
    for y in range(h):
        kind = y % 3
        if kind == 0:  # new-RLE: alternating runs and dumps
            body += bytes([2, 2, 0, w])
            for comp in range(4):
                body += bytes([128 + 8]) + bytes([int(rng.integers(256))])
                body += bytes([8]) + rng.integers(
                    0, 256, 8, dtype=np.uint8).tobytes()
        elif kind == 1:  # pure old-RLE literals
            for x in range(w):
                px = rng.integers(0, 256, 4, dtype=np.uint8)
                px[0] = max(2, int(px[0]))  # avoid accidental repeat code
                if x == 0:
                    px[0] = 3               # not byte 2: whole-line old
                body += px.tobytes()
        else:  # mixed: (2, G!=2) seed + literals
            body += bytes([2, 5, 1, 130])
            for x in range(w - 1):
                px = rng.integers(2, 256, 4, dtype=np.uint8)
                body += px.tobytes()
    _decode_both(tmp_path, _hdr_header(w, h) + body)
