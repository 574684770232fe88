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


def ring_hit_fn_mm(scene_local: Scene, axis_name: str = TILE_AXIS,
                   t_min: float = 1e-3, axis_size: int | None = None,
                   chunk: int | None = None):
    """MXU-path geometry ring: the rotation/fold of :func:`ring_hit_fn`
    with each step's local intersection running the matmul
    (``tracer/mesh_accel``) Moller-Trumbore form — per-triangle weight
    columns contracted on the MXU, chunk-folded with box gating — instead
    of the scalar ``closest_hit`` loop.  This is what makes HBM-exceeding
    meshes fast: every ring step is a dense (rays, 10) x (10, 4*chunk)
    contraction over this chip's shard while ``ppermute`` rotates the
    shard around the ICI ring (XLA overlaps the permute with the next
    step's matmuls).

    The triangle weight tables are built ONCE from the local shard and
    the prebuilt feature leaves themselves ride the ring (weights,
    normals, materials) — no per-step rebuild, and the dot consumes plain
    arrays exactly as the replicated fold does, keeping per-triangle
    arithmetic bit-identical to the single-device matmul path (a rebuild
    inside the scan body changes XLA fusion and costs ~1-ulp t drift —
    measured).  Exactness: min over a partition == global min
    (``gpu_kernel.cl:358-394`` closest-so-far semantics).
    """
    import jax.numpy as _jnp

    from ..tracer.intersect import hit_aabbs
    from ..tracer.mesh_accel import (MM_CHUNK, _mm_closest_tri,
                                     build_tri_features)

    n = axis_size if axis_size is not None else jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    chunk = chunk or MM_CHUNK
    BIG = 3.0e38

    # Built in FACTORY scope (not per hit_fn call): hit_fn runs inside the
    # per-bounce/per-sample render loop, and XLA's loop-invariant hoisting
    # out of lax.scan/while bodies is not guaranteed — closing over the
    # tables makes the build-once contract structural.
    feats0 = build_tri_features(scene_local, chunk=chunk)
    leaves0 = dict(weights=feats0.weights, normal=feats0.normal,
                   albedo=feats0.albedo, fuzz=feats0.fuzz,
                   ior=feats0.ior, mat_type=feats0.mat_type,
                   box_id=feats0.box_id)

    def hit_fn(o, d):
        sphere_scene = dataclasses.replace(
            scene_local, triangles=Triangles.empty(),
            boxes=BoundingBoxes.empty())
        best = closest_hit(sphere_scene, o, d, t_min)
        if scene_local.boxes.count > 0:
            box_hit = hit_aabbs(o, d, scene_local.boxes.box_min,
                                scene_local.boxes.box_max)
        else:
            box_hit = _jnp.zeros((o.shape[0], 1), bool)

        def body(carry, _):
            best, lv = carry
            feats = feats0._replace(**lv)
            tri_t, tri_idx = _mm_closest_tri(feats, box_hit, o, d, t_min)
            take = tri_t < BIG
            idx = _jnp.clip(tri_idx, 0, feats.normal.shape[0] - 1)
            outward = feats.normal[idx]
            front = _jnp.sum(d * outward, axis=-1) < 0.0
            t_safe = _jnp.where(take, tri_t, 1.0)
            h = HitInfo(
                hit=take,
                t=_jnp.where(take, tri_t, BIG),
                point=o + t_safe[:, None] * d,
                normal=_jnp.where(front[:, None], outward, -outward),
                front_face=front,
                albedo=feats.albedo[idx],
                fuzz=feats.fuzz[idx],
                ior=feats.ior[idx],
                mat_type=feats.mat_type[idx],
            )
            best = _merge(best, h)
            lv = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis_name, perm), lv)
            return (best, lv), None

        (best, _), _ = jax.lax.scan(
            body, (best, leaves0), None, length=n)
        return best

    return hit_fn


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
