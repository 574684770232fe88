"""Pallas/Mosaic TPU kernels (the compiled hot path)."""

from .megakernel import render_pallas, supports as megakernel_supports
from .megamesh import render_pallas_mesh, supports_mesh as megamesh_supports

__all__ = ["render_pallas", "megakernel_supports",
           "render_pallas_mesh", "megamesh_supports"]
