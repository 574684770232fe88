"""Vectorized ray-scene intersection (pure jnp, differentiable).

Replaces the reference's per-work-item linear scans
(``HitAnything``, ``gpu_kernel.cl:358-394``) with batched tests over all rays
at once.  Semantics reproduced exactly:

- Sphere test: RTiOW quadratic half-b form with near/far root selection in
  [t_min, t_max] (inclusive bounds — ``HitSphere``, ``gpu_kernel.cl:455-487``).
- Triangle test: Moller-Trumbore with eps = 1e-5 parallel cull, barycentric
  bounds, strict (t_min, t_max) window (``HitTriangle``,
  ``gpu_kernel.cl:489-532``).
- AABB slab test with NaN-ignoring min/max (OpenCL fmin/fmax semantics ->
  ``jnp.fmin/fmax``), gating triangles by their box id
  (``HitBoundingBox``, ``gpu_kernel.cl:534-555``; gating ``:374-391``).
- Closest-hit selection: running min over primitives -> argmin here (the
  ``closestSoFar`` fold at ``gpu_kernel.cl:358-394``).
- Front-face normals (``SetFaceNormal``, ``gpu_kernel.cl:352-356``).

Hit selection as argmin keeps the computation differentiable through the
*selected* branch (the winner's t/normal are smooth functions of the scene
parameters); the discrete selection itself carries no gradient, matching the
usual differentiable-renderer interior-derivative convention.

Triangles are folded in static-size chunks (``lax.scan`` over tiles) so the
(rays x triangles) product never materializes — per step only
(R, TRI_CHUNK) lives in memory, which XLA keeps tiled in VMEM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene import Scene

TRI_EPS = 1e-5        # gpu_kernel.cl:496
# Plain Python float (see camera.py _DEG note on module-level jnp arrays).
BIG = 3.4e38

# Default triangle tile size for the scan fold (multiple of 128 lanes).
TRI_CHUNK = 512
# Budget for the (rays x tri_chunk) intermediates of one fold step, in
# elements (~800 MB of f32 temporaries).  The chunk adapts DOWN as the ray
# batch grows, so big renders never exhaust HBM; nesting an extra ray-chunk
# lax.map instead triggers TPU kernel faults when it sits inside the sample
# scan (observed on v5e), so memory is bounded by chunk sizing alone.
PAIR_BUDGET = 2 * 10**8


def adaptive_tri_chunk(n_rays: int, per_pair_cost: int = 3) -> int:
    """Largest 128-multiple triangle chunk keeping n_rays*chunk*cost within
    PAIR_BUDGET (floor 128)."""
    c = PAIR_BUDGET // max(n_rays * per_pair_cost, 1)
    return int(max(128, min(TRI_CHUNK, (c // 128) * 128)))


class HitInfo(NamedTuple):
    """Per-ray closest-hit record (the vectorized ``HitRecord``,
    gpu_kernel.cl:44-51)."""
    hit: jnp.ndarray         # (R,) bool
    t: jnp.ndarray           # (R,) f32
    point: jnp.ndarray       # (R,3)
    normal: jnp.ndarray      # (R,3) front-facing
    front_face: jnp.ndarray  # (R,) bool
    albedo: jnp.ndarray      # (R,3)
    fuzz: jnp.ndarray        # (R,)
    ior: jnp.ndarray         # (R,)
    mat_type: jnp.ndarray    # (R,) i32


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def hit_spheres(o, d, center, radius, t_min):
    """Sphere-batch t values.  o,d: (R,3); center: (S,3); radius: (S,).

    Returns t: (R,S) with BIG where no hit in [t_min, inf).
    (HitSphere, gpu_kernel.cl:455-487.)
    """
    oc = o[:, None, :] - center[None, :, :]            # (R,S,3)
    a = _dot(d, d)[:, None]                            # (R,1)
    half_b = jnp.einsum("rsk,rk->rs", oc, d)           # (R,S)
    c = jnp.sum(oc * oc, axis=-1) - (radius * radius)[None, :]
    disc = half_b * half_b - a * c
    # Tiny floor (not 0): sqrt'(0) = inf would turn the max's zero tangent
    # into NaN gradients for every miss ray (0 * inf).
    sqrtd = jnp.sqrt(jnp.maximum(disc, 1e-30))
    root0 = (-half_b - sqrtd) / a
    root1 = (-half_b + sqrtd) / a
    # Inclusive window: reject only if root < tMin || tMax < root
    # (gpu_kernel.cl:471-477); tMax here is +inf, the argmin does the rest.
    ok0 = (disc >= 0.0) & (root0 >= t_min)
    ok1 = (disc >= 0.0) & (root1 >= t_min)
    t = jnp.where(ok0, root0, jnp.where(ok1, root1, BIG))
    return t


def hit_triangles_chunk(o, d, p0, p1, p2, t_min, gate):
    """Moller-Trumbore for one triangle tile.

    o,d: (R,3); p0/p1/p2: (C,3); gate: (R,C) bool (AABB gating).
    Returns t: (R,C) with BIG on miss.  (HitTriangle, gpu_kernel.cl:489-532.)
    """
    e0 = p1 - p0                                       # (C,3)
    e1 = p2 - p0
    # h = d x e1 -> a = e0 . h  (per ray-triangle pair)
    h = jnp.cross(d[:, None, :], e1[None, :, :])       # (R,C,3)
    a = jnp.einsum("ck,rck->rc", e0, h)                # (R,C)
    parallel = (a > -TRI_EPS) & (a < TRI_EPS)          # gpu_kernel.cl:496
    f = 1.0 / a
    s = o[:, None, :] - p0[None, :, :]                 # (R,C,3)
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e0[None, :, :])                   # (R,C,3)
    v = f * jnp.einsum("rk,rck->rc", d, q)
    t0 = f * jnp.einsum("ck,rck->rc", e1, q)
    ok = (~parallel
          & (u >= 0.0) & (u <= 1.0)                    # gpu_kernel.cl:505
          & (v >= 0.0) & (u + v <= 1.0)                # gpu_kernel.cl:513
          & (t0 > t_min)                               # strict, :520
          & gate)
    return jnp.where(ok, t0, BIG)


def hit_aabbs(o, d, box_min, box_max):
    """Branchless slab test.  o,d: (R,3); boxes: (B,3).  Returns (R,B) bool.

    (HitBoundingBox, gpu_kernel.cl:534-555 — note the reference precomputes
    invDirection per ray, gpu_kernel.cl:12; fmin/fmax are NaN-ignoring.)
    """
    inv_d = 1.0 / d                                     # (R,3), inf where d=0
    t1 = (box_min[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    t2 = (box_max[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    lo = jnp.fmin(t1, t2)
    hi = jnp.fmax(t1, t2)
    tmin = jnp.max(lo, axis=-1)
    tmax = jnp.min(hi, axis=-1)
    return tmax > jnp.maximum(tmin, 0.0)


def _pad_triangles(tris, chunk):
    """Pad triangle arrays to a chunk multiple with degenerate (never-hit)
    triangles; returns (p0, p1, p2, box_id, n_chunks)."""
    t = tris.count
    pad = (-t) % chunk
    if t == 0:
        return None
    p0 = jnp.pad(tris.p0, ((0, pad), (0, 0)))
    p1 = jnp.pad(tris.p1, ((0, pad), (0, 0)))
    p2 = jnp.pad(tris.p2, ((0, pad), (0, 0)))
    box_id = jnp.pad(tris.box_id, (0, pad), constant_values=-1)
    return p0, p1, p2, box_id, (t + pad) // chunk


def closest_fold(scene: Scene, o, d, t_min):
    """Winner search: (best_t, best_kind, best_idx) over spheres +
    AABB-gated triangles (the closestSoFar fold, gpu_kernel.cl:358-394).
    kind 0 = sphere, 1 = triangle; best_t == BIG means miss."""
    r = o.shape[0]
    spheres, tris, boxes = scene.spheres, scene.triangles, scene.boxes

    best_t = jnp.full((r,), BIG)
    best_kind = jnp.zeros((r,), jnp.int32)   # 0 = sphere, 1 = triangle
    best_idx = jnp.zeros((r,), jnp.int32)

    if spheres.count > 0:
        ts = hit_spheres(o, d, spheres.center, spheres.radius, t_min)  # (R,S)
        idx = jnp.argmin(ts, axis=1)
        tbest = jnp.take_along_axis(ts, idx[:, None], axis=1)[:, 0]
        upd = tbest < best_t
        best_t = jnp.where(upd, tbest, best_t)
        best_idx = jnp.where(upd, idx.astype(jnp.int32), best_idx)

    chunk = adaptive_tri_chunk(r)
    padded = _pad_triangles(tris, chunk)
    if padded is not None:
        p0, p1, p2, box_id, n_chunks = padded
        if boxes.count > 0:
            box_hit = hit_aabbs(o, d, boxes.box_min, boxes.box_max)  # (R,B)
        else:
            box_hit = jnp.zeros((r, 1), bool)

        p0c = p0.reshape(n_chunks, chunk, 3)
        p1c = p1.reshape(n_chunks, chunk, 3)
        p2c = p2.reshape(n_chunks, chunk, 3)
        bidc = box_id.reshape(n_chunks, chunk)
        bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

        def tri_fold(ob, db, box_hit_b):
            rb = ob.shape[0]

            def fold(carry, chunk):
                bt, bi = carry
                cp0, cp1, cp2, cbid, base = chunk
                # AABB gate: triangle tested only if its box is hit
                # (gpu_kernel.cl:374-391); padded tris (box_id=-1) never.
                # Fold over boxes with broadcast selects — per-lane gathers
                # lower poorly on TPU.
                gate = jnp.zeros((rb, cbid.shape[0]), bool)
                for b in range(box_hit_b.shape[1]):
                    gate = gate | ((cbid[None, :] == b)
                                   & box_hit_b[:, b:b + 1])
                tt = hit_triangles_chunk(ob, db, cp0, cp1, cp2, t_min, gate)
                ci = jnp.argmin(tt, axis=1)
                ct = jnp.take_along_axis(tt, ci[:, None], axis=1)[:, 0]
                upd = ct < bt
                bt = jnp.where(upd, ct, bt)
                bi = jnp.where(upd, (base + ci).astype(jnp.int32), bi)
                return (bt, bi), None

            (bt, bi), _ = jax.lax.scan(
                fold, (jnp.full((rb,), BIG), jnp.zeros((rb,), jnp.int32)),
                (p0c, p1c, p2c, bidc, bases))
            return bt, bi

        tri_t, tri_idx = tri_fold(o, d, box_hit)
        upd = tri_t < best_t
        best_t = jnp.where(upd, tri_t, best_t)
        best_kind = jnp.where(upd, 1, best_kind)
        best_idx = jnp.where(upd, tri_idx, best_idx)

    return best_t, best_kind, best_idx


def closest_hit(scene: Scene, o, d, t_min) -> HitInfo:
    """Closest hit over all spheres + AABB-gated triangles.

    o, d: (R,3).  Mirrors HitAnything (gpu_kernel.cl:358-394): spheres are
    scanned first, then triangles gated by their bounding box.
    """
    r = o.shape[0]
    spheres, tris = scene.spheres, scene.triangles
    best_t, best_kind, best_idx = closest_fold(scene, o, d, t_min)

    hit = best_t < BIG
    # Safe-select before compute: miss lanes would otherwise produce
    # o + BIG*d = inf, and inf/NaN in an unselected jnp.where branch leaks
    # NaN into gradients (0 * inf).  Miss lanes' point/normal are never
    # consumed (the estimator masks on `hit`), any finite value works.
    t_safe = jnp.where(hit, best_t, 1.0)
    point = o + t_safe[:, None] * d

    # Gather winner attributes; outward normal per kind.
    if spheres.count > 0:
        sidx = jnp.where(best_kind == 0, best_idx, 0)
        s_center = spheres.center[sidx]
        s_normal = (point - s_center) / spheres.radius[sidx][:, None]
        s_albedo = spheres.albedo[sidx]
        s_fuzz = spheres.fuzz[sidx]
        s_ior = spheres.ior[sidx]
        s_type = spheres.mat_type[sidx]
    else:
        s_normal = jnp.zeros_like(o)
        s_albedo = jnp.zeros_like(o)
        s_fuzz = jnp.zeros((r,))
        s_ior = jnp.zeros((r,))
        s_type = jnp.zeros((r,), jnp.int32)

    if tris.count > 0:
        tidx = jnp.clip(jnp.where(best_kind == 1, best_idx, 0),
                        0, tris.count - 1)
        e0 = tris.p1[tidx] - tris.p0[tidx]
        e1 = tris.p2[tidx] - tris.p0[tidx]
        n = jnp.cross(e0, e1)
        t_normal = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        t_albedo = tris.albedo[tidx]
        t_fuzz = tris.fuzz[tidx]
        t_ior = tris.ior[tidx]
        t_type = tris.mat_type[tidx]
    else:
        t_normal = jnp.zeros_like(o)
        t_albedo = jnp.zeros_like(o)
        t_fuzz = jnp.zeros((r,))
        t_ior = jnp.zeros((r,))
        t_type = jnp.zeros((r,), jnp.int32)

    is_tri = (best_kind == 1)[:, None]
    outward = jnp.where(is_tri, t_normal, s_normal)
    albedo = jnp.where(is_tri, t_albedo, s_albedo)
    fuzz = jnp.where(best_kind == 1, t_fuzz, s_fuzz)
    ior = jnp.where(best_kind == 1, t_ior, s_ior)
    mat_type = jnp.where(best_kind == 1, t_type, s_type)

    # SetFaceNormal (gpu_kernel.cl:352-356)
    front_face = _dot(d, outward) < 0.0
    normal = jnp.where(front_face[:, None], outward, -outward)

    return HitInfo(hit=hit, t=best_t, point=point, normal=normal,
                   front_face=front_face, albedo=albedo, fuzz=fuzz,
                   ior=ior, mat_type=mat_type)
