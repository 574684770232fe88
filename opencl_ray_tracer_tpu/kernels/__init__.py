"""Pallas/Mosaic TPU kernels (the compiled hot path)."""

from .megakernel import render_pallas, supports as megakernel_supports

__all__ = ["render_pallas", "megakernel_supports"]
