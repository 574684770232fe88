"""Geometry ring: triangles sharded across chips, rotated over ICI.

The ring-attention / context-parallel analog for a renderer (SURVEY.md §5
"long-context"): when the triangle soup exceeds per-chip HBM (or to scale
the rays x triangles product), shard triangles along the "tile" mesh axis.
Ray tiles stay resident on their chip; each of n steps computes the closest
hit against the local triangle shard and folds a running (t, hit-record)
minimum, then rotates the shard to the ring neighbor with
``jax.lax.ppermute`` — blockwise and overlap-friendly exactly like ring
attention's running softmax, with XLA free to overlap the permute with the
next intersection.

The fold is exact: min over a partition of the triangles == global min
(matching HitAnything's closest-so-far semantics, gpu_kernel.cl:358-394).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..scene import BoundingBoxes, Scene, Spheres, Triangles
from ..tracer.intersect import HitInfo, closest_hit
from .mesh import TILE_AXIS


def shard_triangles(tris: Triangles, n_shards: int) -> Triangles:
    """Pad the triangle batch to n_shards equal parts (degenerate never-hit
    padding with box_id = -1)."""
    t = tris.count
    per = -(-t // n_shards)
    pad = per * n_shards - t

    def pad_leaf(x, fill=0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    return Triangles(
        pad_leaf(tris.p0), pad_leaf(tris.p1), pad_leaf(tris.p2),
        pad_leaf(tris.albedo), pad_leaf(tris.fuzz), pad_leaf(tris.ior),
        pad_leaf(tris.mat_type), pad_leaf(tris.box_id, fill=-1))


def _merge(a: HitInfo, b: HitInfo) -> HitInfo:
    """Fold two closest-hit records: keep the nearer hit per ray."""
    take_b = b.hit & (~a.hit | (b.t < a.t))
    tb = take_b[:, None]
    return HitInfo(
        hit=a.hit | b.hit,
        t=jnp.where(take_b, b.t, a.t),
        point=jnp.where(tb, b.point, a.point),
        normal=jnp.where(tb, b.normal, a.normal),
        front_face=jnp.where(take_b, b.front_face, a.front_face),
        albedo=jnp.where(tb, b.albedo, a.albedo),
        fuzz=jnp.where(take_b, b.fuzz, a.fuzz),
        ior=jnp.where(take_b, b.ior, a.ior),
        mat_type=jnp.where(take_b, b.mat_type, a.mat_type),
    )


def ring_hit_fn(scene_local: Scene, axis_name: str = TILE_AXIS,
                t_min: float = 1e-3, axis_size: int | None = None):
    """Build a closest-hit function for use *inside* shard_map, where
    ``scene_local`` carries this chip's triangle shard (spheres + boxes
    replicated).  Returns hit_fn(o, d) -> HitInfo over all triangles."""
    n = axis_size if axis_size is not None else jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def hit_fn(o, d):
        # Spheres once (replicated), then fold n rotating triangle shards.
        sphere_scene = dataclasses.replace(
            scene_local, triangles=Triangles.empty(),
            boxes=BoundingBoxes.empty())
        best = closest_hit(sphere_scene, o, d, t_min)

        def body(carry, _):
            best, tris = carry
            local = dataclasses.replace(
                scene_local, spheres=Spheres.empty(), triangles=tris)
            h = closest_hit(local, o, d, t_min)
            best = _merge(best, h)
            tris = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis_name, perm), tris)
            return (best, tris), None

        (best, _), _ = jax.lax.scan(
            body, (best, scene_local.triangles), None, length=n)
        return best

    return hit_fn
