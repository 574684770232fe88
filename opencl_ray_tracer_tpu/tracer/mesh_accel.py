"""MXU (matmul-form) ray-triangle intersection.

The reference tests every ray against all 15,329 triangles in a scalar loop
(``HitAnything``, ``gpu_kernel.cl:378-389``) — the dominant cost of its mesh
scene (SURVEY.md §3.3 cost model).  On TPU, the rays x triangles product
belongs on the MXU.  Moller-Trumbore decomposes over scalar triple products
that are bilinear in (ray features) x (triangle features):

With ray Plucker features  F = [d, m, o, 1],  m = o x d  (R, 10)
and per-triangle constant columns

    a_col = e1 x e0                    (a      = d . a_col)
    u_col = [-(e1 x p0), e1, 0, 0]     (u_num  = F . u_col)
    v_col = [-(p0 x e0), -e0, 0, 0]    (v_num  = F . v_col)
    t_col = [0, 0, n, -(p0 . n)]       (t_num  = F . t_col),  n = e0 x e1

one (R,10) @ (10, 4T) matmul yields a, u_num, v_num, t_num for every
(ray, triangle) pair; the Moller-Trumbore tests follow elementwise:

    u = u_num / a in [0,1],  v = v_num / a >= 0,  u + v <= 1,
    |a| > eps (parallel cull, eps = 1e-5 as gpu_kernel.cl:496),
    t = t_num / a in (t_min, t_max) strict (gpu_kernel.cl:520)

identical accept/reject semantics to the direct form (tracer/intersect.py),
up to fp reassociation of the dot products.  XLA maps the einsum onto the
MXU and fuses the elementwise epilogue; triangles are folded in chunks with
a running argmin so the full (R,T) product never materializes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene import Scene
from .intersect import (BIG, HitInfo, TRI_EPS, closest_hit, hit_aabbs)

MM_CHUNK = 2048  # default triangles per fold step ((R,10)@(10,4*chunk))
# The chunk adapts DOWN with the ray-batch size (intersect.adaptive_tri_chunk)
# so the (rays x 4*chunk) intermediates stay within budget; large images are
# additionally row-chunked at the render() level (tracer/render.py).


class TriFeatures(NamedTuple):
    weights: jnp.ndarray   # (n_chunks, 10, 4*chunk) matmul weights
    normal: jnp.ndarray    # (T_pad, 3) unit geometric normals
    albedo: jnp.ndarray    # (T_pad, 3)
    fuzz: jnp.ndarray      # (T_pad,)
    ior: jnp.ndarray       # (T_pad,)
    mat_type: jnp.ndarray  # (T_pad,) i32
    box_id: jnp.ndarray    # (T_pad,) i32 (-1 for padding)
    n_chunks: int
    chunk: int
    # Cluster-culling extras (tracer/clusters.py plan); None without a plan.
    cluster_min: jnp.ndarray | None = None   # (n_chunks, 3)
    cluster_max: jnp.ndarray | None = None   # (n_chunks, 3)
    chunk_box_id: tuple | None = None        # per-chunk gating box id


def build_tri_features(scene: Scene, chunk: int = MM_CHUNK,
                       plan=None) -> TriFeatures | None:
    """Precompute the per-triangle matmul columns (once per scene).

    With a clusters.MeshPlan, triangles are reordered into spatially
    coherent fixed-size chunks with per-chunk AABBs (enables chunk-skip
    culling in the Pallas kernels); indices in the returned tables refer to
    the permuted order.
    """
    tris = scene.triangles
    t = tris.count
    if t == 0:
        return None
    if plan is not None:
        from .clusters import cluster_bounds, permute
        assert plan.chunk == chunk and plan.n_tris == t
        p0 = permute(tris.p0, plan)
        p1 = permute(tris.p1, plan)
        # degenerate padding (all-zero corners) never hits: a == 0 cull
        p2 = permute(tris.p2, plan)
        cmin, cmax = cluster_bounds(p0, p1, p2, plan)
        return _features_from(
            p0, p1, p2,
            albedo=permute(tris.albedo, plan),
            fuzz=permute(tris.fuzz, plan),
            ior=permute(tris.ior, plan),
            mat_type=permute(tris.mat_type, plan),
            box_id=permute(tris.box_id, plan, fill=-1),
            chunk=chunk, cluster_min=cmin, cluster_max=cmax,
            chunk_box_id=plan.chunk_box_id)
    pad = (-t) % chunk
    p0 = jnp.pad(tris.p0, ((0, pad), (0, 0)))
    p1 = jnp.pad(tris.p1, ((0, pad), (0, 0)))
    # degenerate padding (p2 == p0) never hits: a == 0 -> parallel cull
    p2 = jnp.pad(tris.p2, ((0, pad), (0, 0)))
    pad1 = lambda x, fill=0: jnp.pad(x, (0, pad), constant_values=fill)
    return _features_from(
        p0, p1, p2,
        albedo=jnp.pad(tris.albedo, ((0, pad), (0, 0))),
        fuzz=pad1(tris.fuzz), ior=pad1(tris.ior),
        mat_type=pad1(tris.mat_type), box_id=pad1(tris.box_id, -1),
        chunk=chunk)


def _features_from(p0, p1, p2, albedo, fuzz, ior, mat_type, box_id, chunk,
                   cluster_min=None, cluster_max=None, chunk_box_id=None):
    e0 = p1 - p0
    e1 = p2 - p0
    n = jnp.cross(e0, e1)                      # geometric normal
    a_col = jnp.cross(e1, e0)                  # = -n
    u_d = -jnp.cross(e1, p0)
    v_d = -jnp.cross(p0, e0)
    t_bias = -jnp.sum(p0 * n, axis=-1)

    tp = p0.shape[0]
    z3 = jnp.zeros((tp, 3), jnp.float32)
    z1 = jnp.zeros((tp, 1), jnp.float32)
    # rows: [d(3), m(3), o(3), 1] ; columns per quantity
    w_a = jnp.concatenate([a_col, z3, z3, z1], axis=1)          # (tp, 10)
    w_u = jnp.concatenate([u_d, e1, z3, z1], axis=1)
    w_v = jnp.concatenate([v_d, -e0, z3, z1], axis=1)
    w_t = jnp.concatenate([z3, z3, n, t_bias[:, None]], axis=1)

    n_chunks = tp // chunk

    def chunk_w(w):  # (tp,10) -> (n_chunks, 10, chunk)
        return w.reshape(n_chunks, chunk, 10).transpose(0, 2, 1)

    weights = jnp.concatenate(
        [chunk_w(w_a), chunk_w(w_u), chunk_w(w_v), chunk_w(w_t)], axis=2)

    nn = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return TriFeatures(
        weights=weights,
        normal=nn,
        albedo=albedo,
        fuzz=fuzz,
        ior=ior,
        mat_type=mat_type,
        box_id=box_id,
        n_chunks=n_chunks,
        chunk=chunk,
        cluster_min=cluster_min,
        cluster_max=cluster_max,
        chunk_box_id=chunk_box_id,
    )


def _mm_closest_tri(feats: TriFeatures, box_hit, o, d, t_min):
    """Fold the matmul intersection over triangle chunks.

    box_hit: (R, B) AABB mask.  Returns (t_best (R,), idx_best (R,))."""
    r = o.shape[0]
    m = jnp.cross(o, d)
    f_ray = jnp.concatenate(
        [d, m, o, jnp.ones((r, 1), jnp.float32)], axis=1)   # (R, 10)
    box_id_c = feats.box_id.reshape(feats.n_chunks, feats.chunk)

    def fold(carry, chunk):
        bt, bi = carry
        w, bid, base = chunk                       # (10, 4C), (C,), ()
        prod = jnp.dot(f_ray, w, preferred_element_type=jnp.float32)
        a, u_num, v_num, t_num = jnp.split(prod, 4, axis=1)  # (R, C) each
        parallel = jnp.abs(a) < TRI_EPS            # gpu_kernel.cl:496
        inv_a = 1.0 / jnp.where(parallel, 1.0, a)
        u = u_num * inv_a
        v = v_num * inv_a
        tt = t_num * inv_a
        # AABB gate without a (R,C) gather: fold over the (few) boxes with
        # broadcast selects — per-lane gathers lower poorly on TPU.
        n_boxes = box_hit.shape[1]
        gate = jnp.zeros((r, bid.shape[0]), bool)
        for b in range(n_boxes):
            gate = gate | ((bid[None, :] == b) & box_hit[:, b:b + 1])
        ok = (~parallel
              & (u >= 0.0) & (u <= 1.0)
              & (v >= 0.0) & (u + v <= 1.0)
              & (tt > t_min)                       # strict (gpu_kernel:520)
              & gate)
        tt = jnp.where(ok, tt, BIG)
        ci = jnp.argmin(tt, axis=1)
        ct = jnp.take_along_axis(tt, ci[:, None], axis=1)[:, 0]
        upd = ct < bt
        bt = jnp.where(upd, ct, bt)
        bi = jnp.where(upd, (base + ci).astype(jnp.int32), bi)
        return (bt, bi), None

    bases = jnp.arange(feats.n_chunks, dtype=jnp.int32) * feats.chunk
    (bt, bi), _ = jax.lax.scan(
        fold, (jnp.full((r,), BIG), jnp.zeros((r,), jnp.int32)),
        (feats.weights, box_id_c, bases))
    return bt, bi


def make_mm_hit_fn(scene: Scene, t_min: float = 1e-3,
                   expected_rays: int | None = None):
    """Closest-hit function using MXU triangle intersection (drop-in for the
    estimator's hit_fn hook).  Spheres still use the direct form (cheap).
    expected_rays sizes the triangle chunk to bound peak memory."""
    from .intersect import adaptive_tri_chunk
    chunk = MM_CHUNK if expected_rays is None else min(
        MM_CHUNK, adaptive_tri_chunk(expected_rays, per_pair_cost=12))
    feats = build_tri_features(scene, chunk)
    sphere_scene = dataclasses.replace(
        scene, triangles=scene.triangles.empty(),
        boxes=scene.boxes.empty())

    def hit_fn(o, d):
        base = closest_hit(sphere_scene, o, d, t_min)
        if feats is None:
            return base
        r = o.shape[0]
        if scene.boxes.count > 0:
            box_hit = hit_aabbs(o, d, scene.boxes.box_min,
                                scene.boxes.box_max)
        else:
            box_hit = jnp.zeros((r, 1), bool)
        tri_t, tri_idx = _mm_closest_tri(feats, box_hit, o, d, t_min)

        take_tri = (tri_t < BIG) & (~base.hit | (tri_t < base.t))
        tt = take_tri[:, None]
        idx = jnp.clip(tri_idx, 0, feats.normal.shape[0] - 1)
        outward = feats.normal[idx]
        front_tri = jnp.sum(d * outward, axis=-1) < 0.0
        normal_tri = jnp.where(front_tri[:, None], outward, -outward)

        t_safe = jnp.where(take_tri, tri_t, 1.0)
        return HitInfo(
            hit=base.hit | take_tri,
            t=jnp.where(take_tri, tri_t, base.t),
            point=jnp.where(tt, o + t_safe[:, None] * d, base.point),
            normal=jnp.where(tt, normal_tri, base.normal),
            front_face=jnp.where(take_tri, front_tri, base.front_face),
            albedo=jnp.where(tt, feats.albedo[idx], base.albedo),
            fuzz=jnp.where(take_tri, feats.fuzz[idx], base.fuzz),
            ior=jnp.where(take_tri, feats.ior[idx], base.ior),
            mat_type=jnp.where(take_tri, feats.mat_type[idx],
                               base.mat_type),
        )

    return hit_fn
