"""IO: OBJ parsing vs reference semantics, HDR round-trip + tone map,
BMP bit layout + round-trip, PNG validity, JSON scene descriptor."""

import io
import struct
import zlib

import numpy as np
import pytest

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.io import (decode_hdr, encode_bmp, encode_hdr,
                                      encode_png, parse_obj, read_bmp,
                                      tone_map, tonemap_u8)

OBJ_TEXT = """
# comment
v 1.0 2.0 3.0
v 4.0 5.0 6.0
v 7.0 8.0 9.0
v -1.0 -2.0 -3.0
f 1 2 3
f 1/11/21 2/12/22 4/14/24
"""


def test_parse_obj_plain_and_slash_faces():
    tris, (mn, mx) = parse_obj(OBJ_TEXT)
    assert tris.shape == (2, 3, 3)
    np.testing.assert_allclose(tris[0], [[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    np.testing.assert_allclose(tris[1], [[1, 2, 3], [4, 5, 6], [-1, -2, -3]])
    np.testing.assert_allclose(mn, [-1, -2, -3])
    np.testing.assert_allclose(mx, [7, 8, 9])


def test_parse_obj_scale_translate_aabb():
    # scale + translate applied per vertex, AABB over transformed vertices
    # (utility.cpp:111-127).
    tris, (mn, mx) = parse_obj(OBJ_TEXT, scale=(2, 2, 2), translate=(1, 0, 0))
    np.testing.assert_allclose(tris[0][0], [3, 4, 6])
    np.testing.assert_allclose(mn, [-1, -4, -6])
    np.testing.assert_allclose(mx, [15, 16, 18])


def test_reference_f1_car_loads():
    # The actual asset the reference renders (main.cpp:118-128).
    tris, (mn, mx) = parse_obj(
        open("/root/reference/src/assets/models/f1_car.obj").read(),
        scale=(0.15, 0.15, 0.15), translate=(0.0, -0.5, -1.0))
    assert tris.shape == (15329, 3, 3)  # SURVEY.md §2 #25
    assert (mn < mx).all()


def test_hdr_roundtrip_and_tonemap():
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 8, size=(4, 6, 3)) ** 2).astype(np.float32)
    dec = decode_hdr(encode_hdr(img))
    assert dec.shape == img.shape
    # RGBE quantizes each channel to 1/256 of the per-pixel max component.
    step = img.max(axis=2, keepdims=True) / 256.0
    assert (np.abs(dec - img) <= step + 1e-5).all()
    tm = tone_map(img)
    # maps [0,inf) -> [0,1); f32 rounding saturates to exactly 1.0 for large
    # inputs (as the reference's float math does).
    assert (tm >= 0).all() and (tm <= 1.0).all()
    # exact formula check: c' = 1 + 1/(-1-c)^5
    c = img[0, 0, 0]
    np.testing.assert_allclose(tm[0, 0, 0], 1.0 + 1.0 / ((-1.0 - c) ** 5),
                               rtol=1e-6)


def test_hdr_old_rle_path():
    # Build an old-RLE scanline by hand: pixel, then (1,1,1,count) repeat.
    w, h = 5, 1
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + \
        f"-Y {h} +X {w}\n".encode()
    # first pixel: r=128,g=64,b=32,e=128 ; then repeat x4
    scan = bytes([128, 64, 32, 128]) + bytes([1, 1, 1, 4])
    img = decode_hdr(header + scan)
    assert img.shape == (1, 5, 3)
    np.testing.assert_allclose(img[0, 0], img[0, 4])
    np.testing.assert_allclose(img[0, 0, 0], 128 / 256.0, rtol=1e-6)


def test_tonemap_u8_gamma2():
    img = np.array([[[0.25, 1.0, 0.0]]], np.float32)
    u8 = tonemap_u8(img)
    assert u8[0, 0, 0] == int(np.sqrt(0.25) * 255)  # 127
    assert u8[0, 0, 1] == 255
    assert u8[0, 0, 2] == 0


def test_bmp_layout_and_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(3, 5, 3), dtype=np.uint8)
    data = encode_bmp(img)
    # header checks: 'BM', 24bpp, offset 54, stride padded to 4
    assert data[:2] == b"BM"
    w, h = struct.unpack_from("<ii", data, 18)
    assert (w, h) == (5, 3)
    bpp = struct.unpack_from("<H", data, 28)[0]
    assert bpp == 24
    # first stored pixel = row 0 (bottom), BGR order
    assert data[54] == img[0, 0, 2] and data[56] == img[0, 0, 0]
    p = tmp_path / "t.bmp"
    p.write_bytes(data)
    back = read_bmp(str(p))
    np.testing.assert_array_equal(back, img)


def test_png_decodes():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, size=(4, 7, 3), dtype=np.uint8)
    data = encode_png(img, bottom_up=False)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # parse IDAT and verify raw scanlines round-trip
    pos = 8
    idat = b""
    while pos < len(data):
        ln, tag = struct.unpack_from(">I4s", data, pos)
        if tag == b"IDAT":
            idat += data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, np.uint8).reshape(4, 1 + 7 * 3)[:, 1:]
    np.testing.assert_array_equal(rows.reshape(4, 7, 3), img)


def test_scene_json_roundtrip(tmp_path):
    sc = ort.readme_scene()
    js = ort.scene_to_json(sc)
    sc2 = ort.scene_from_json(js)
    np.testing.assert_allclose(np.asarray(sc.spheres.center),
                               np.asarray(sc2.spheres.center))
    np.testing.assert_allclose(np.asarray(sc.spheres.albedo),
                               np.asarray(sc2.spheres.albedo))
    np.testing.assert_array_equal(np.asarray(sc.spheres.mat_type),
                                  np.asarray(sc2.spheres.mat_type))
    np.testing.assert_allclose(float(sc.camera.vfov_deg),
                               float(sc2.camera.vfov_deg))
    assert sc2.sky.kind == sc.sky.kind


def test_scene_json_with_mesh(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 -2\nv 1 0 -2\nv 0 1 -2\nf 1 2 3\n")
    spec = {
        "camera": {"look_from": [0, 0, 0], "look_at": [0, 0, -1]},
        "spheres": [{"center": [0, -100.5, -1], "radius": 100,
                     "albedo": [0.5, 0.5, 0.5], "material": "lambertian"}],
        "meshes": [{"path": "tri.obj", "albedo": [1, 0, 0],
                    "material": "metal"}],
        "sky": {"kind": "gradient"},
    }
    import json
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(spec))
    sc = ort.scene_from_json(str(p))
    assert sc.triangles.count == 1
    assert sc.boxes.count == 1
    assert sc.spheres.count == 1
