"""Pure-jnp differentiable tracer (reference path + CPU golden backend)."""

from .estimator import accumulate_sample, trace
from .intersect import HitInfo, closest_hit, hit_aabbs, hit_spheres
from .render import render, render_and_grad, render_rows
from .scatter import reflect, reflectance, refract, scatter

__all__ = [
    "trace", "accumulate_sample", "closest_hit", "hit_spheres", "hit_aabbs",
    "HitInfo", "render", "render_rows", "render_and_grad", "scatter",
    "reflect", "refract", "reflectance",
]
