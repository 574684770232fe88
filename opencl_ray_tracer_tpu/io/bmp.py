"""24-bit BMP writer/reader.

Bit-compatible with the reference encoder (``src/cpp/bitmap_io.cpp:3-84``):
14-byte file header + 40-byte BITMAPINFOHEADER, bottom-up rows, BGR channel
order, 4-byte row padding.  Combined with ``tonemap_u8`` (the gamma-2.0
``WriteColour`` math, ``colour.cpp:5-15``) this reproduces the reference's
``output.bmp`` byte layout for identical radiance input.

The reader exists for round-trip tests and for loading reference outputs.
"""

from __future__ import annotations

import struct

import numpy as np


def tonemap_u8(img) -> np.ndarray:
    """Radiance [0,1] -> 8-bit with gamma 2.0 (WriteColour, colour.cpp:8-10).

    img: (H,W,3) float, row 0 = image bottom.  Truncating cast matches the C
    ``(unsigned char)`` conversion.
    """
    img = np.asarray(img, np.float32)
    return (np.sqrt(np.clip(img, 0.0, 1.0)) * 255.0).astype(np.uint8)


def encode_bmp(img_u8: np.ndarray) -> bytes:
    """(H,W,3) uint8 RGB, row 0 = bottom -> BMP bytes.

    BMP stores rows bottom-up, so row 0 is written first — exactly the
    reference's layout (bitmap_io.cpp:22-26 writes image[0] first and the
    render loop fills image[0] with v=0, the picture's bottom row).
    """
    h, w, _ = img_u8.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    file_header_size, info_header_size = 14, 40
    file_size = file_header_size + info_header_size + stride * h
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", file_size, 0, 0,
                       file_header_size + info_header_size)
    out += struct.pack("<IiiHHIIiiII", info_header_size, w, h, 1, 24,
                       0, 0, 0, 0, 0, 0)
    bgr = img_u8[:, :, ::-1]  # BGR order (colour.cpp:12-14)
    padding = b"\x00" * pad
    for y in range(h):
        out += bgr[y].tobytes() + padding
    return bytes(out)


def write_bmp(path: str, img, already_u8: bool = False) -> None:
    u8 = np.asarray(img, np.uint8) if already_u8 else tonemap_u8(img)
    with open(path, "wb") as f:
        f.write(encode_bmp(u8))


def read_bmp(path: str) -> np.ndarray:
    """BMP file -> (H,W,3) uint8 RGB, row 0 = bottom (24-bit uncompressed)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", data, 0)
    assert magic == b"BM"
    (_, w, h, _, bpp, comp) = struct.unpack_from("<IiiHHI", data, 14)
    assert bpp == 24 and comp == 0, "only 24-bit uncompressed supported"
    stride = (w * 3 + 3) // 4 * 4
    img = np.zeros((abs(h), w, 3), np.uint8)
    flip = h < 0  # negative height = top-down BMP
    h = abs(h)
    for y in range(h):
        row = np.frombuffer(data, np.uint8, w * 3, offset + y * stride)
        img[y] = row.reshape(w, 3)[:, ::-1]
    return img[::-1] if flip else img
