"""Asset ingestion + image output (reference L0 + L4 layers)."""

from .bmp import encode_bmp, read_bmp, tonemap_u8, write_bmp
from .hdr import decode_hdr, encode_hdr, load_hdr, tone_map
from .obj import load_obj, parse_obj
from .png import encode_png, write_png

__all__ = [
    "load_obj", "parse_obj", "load_hdr", "decode_hdr", "encode_hdr",
    "tone_map", "tonemap_u8", "encode_bmp", "write_bmp", "read_bmp",
    "encode_png", "write_png",
]
