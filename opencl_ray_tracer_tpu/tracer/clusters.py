"""Spatial triangle clustering (BVH-leaf ordering) for chunk-skip culling.

The reference tests every ray against every triangle behind a single
mesh-level AABB (``gpu_kernel.cl:374-391``; a real BVH is on its own to-do
list, ``README.md:62``).  A classic pointer-chasing BVH is hostile to TPUs —
per-ray divergent traversal defeats both the VPU and the MXU.  The TPU-native
formulation used here keeps the *dense chunked intersection* (MXU matmuls
over fixed-size triangle chunks, tracer/mesh_accel.py) and makes the chunks
**spatially coherent**:

1. On the host (numpy, once per scene), triangles are ordered by a
   median-split BVH over centroids (longest axis, recursing until a node
   fits one chunk) — BVH *leaves become contiguous runs* of the triangle
   array.
2. Triangles are first grouped by ``box_id`` and each group padded to a
   chunk multiple, so every fixed-size chunk has a single gating box
   (reference semantics: a triangle is only tested when its box is hit).
3. Each chunk gets a slightly padded AABB over its triangles.

At render time a cheap per-ray x per-chunk slab test (``hit_aabbs``) gives a
gate matrix; the Pallas kernels skip whole chunks no ray in a tile can hit
(``@pl.when``), and mask per-ray accepts inside mixed tiles.  Culling is
conservative: chunk AABBs are epsilon-padded so a triangle hit always
implies its chunk-AABB hit, making the result identical to the brute-force
scan (same accept tests, same closest-t fold).

The plan is a *static* object (hashable: the permutation is carried as
bytes) so it can thread through ``jax.jit`` as a static argument while the
triangle arrays themselves stay traced/differentiable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class MeshPlan(NamedTuple):
    """Static clustering plan (host-built, hashable — safe as a jit static
    argument)."""

    perm_bytes: bytes            # (n_chunks*chunk,) i32; -1 marks padding
    chunk_box_id: tuple          # per-chunk gating box id
    n_chunks: int
    chunk: int
    n_tris: int

    @property
    def perm(self) -> np.ndarray:
        return np.frombuffer(self.perm_bytes, np.int32)


def _bvh_order(idx: np.ndarray, cent: np.ndarray, leaf: int,
               tlo: np.ndarray | None = None,
               thi: np.ndarray | None = None) -> list:
    """Median-split ordering: recursively halve until nodes fit one chunk;
    returns index runs in BVH order.  The split axis is chosen per node by
    trying all three median splits and keeping the one whose two children
    have the smallest summed AABB surface area (SAH-lite: equal halves
    keep chunk padding at zero, the area term minimises the expected
    ray-entry rate of the resulting chunk gates).  tlo/thi are
    per-triangle AABB corners; when absent the area is taken over
    centroids.  Measured on the F1 car (TPU, round 5,
    benchmarks/sweep_sah_r05.txt): centroid-area pick 1.731 -> 1.676 s
    vs the old longest-axis split; the triangle-AABB pick (chunk area
    -6.7% further) 1.694 -> 1.649 s in a second A/B."""
    lo = cent if tlo is None else tlo
    hi = cent if thi is None else thi
    out = []
    stack = [idx]
    while stack:
        ids = stack.pop()
        if ids.size <= leaf:
            out.append(ids)
            continue
        c = cent[ids]
        k = ids.size // 2
        best = None
        for ax in range(3):
            part = np.argpartition(c[:, ax], k)
            sa = 0.0
            for side in (ids[part[:k]], ids[part[k:]]):
                d = hi[side].max(axis=0) - lo[side].min(axis=0)
                sa += 2.0 * (d[0] * d[1] + d[1] * d[2] + d[0] * d[2])
            if best is None or sa < best[0]:
                best = (sa, part)
        part = best[1]
        # push right first so pops traverse left-to-right
        stack.append(ids[part[k:]])
        stack.append(ids[part[:k]])
    return out


def build_mesh_plan(p0: np.ndarray, p1: np.ndarray, p2: np.ndarray,
                    box_id: np.ndarray, chunk: int = 512,
                    eye: np.ndarray | None = None) -> MeshPlan:
    """Build the clustering plan from concrete (numpy) triangle data.

    eye (camera position) optionally orders chunks front-to-back by
    nearest chunk-centroid distance: the Pallas kernels' entry-t culling
    (skip a chunk whose AABB entry lies beyond the running closest hit)
    then fires for far chunks once a near chunk has set a small best-t —
    the static-schedule analog of ordered BVH traversal."""
    t = p0.shape[0]
    cent = (p0 + p1 + p2) / 3.0
    pts = np.stack([p0, p1, p2], axis=1)
    tlo, thi = pts.min(axis=1), pts.max(axis=1)
    order_parts = []
    chunk_bids = []
    for b in np.unique(box_id):
        ids = np.nonzero(box_id == b)[0].astype(np.int32)
        runs = _bvh_order(ids, cent, chunk, tlo, thi)
        grouped = np.concatenate(runs) if runs else ids
        pad = (-grouped.size) % chunk
        grouped = np.concatenate(
            [grouped, np.full((pad,), -1, np.int32)])
        order_parts.append(grouped)
        chunk_bids.extend([int(b)] * (grouped.size // chunk))
    perm = (np.concatenate(order_parts) if order_parts
            else np.zeros((0,), np.int32))
    chunk_bids = list(chunk_bids)
    if eye is not None and perm.size:
        n_chunks = perm.size // chunk
        key = []
        for ci in range(n_chunks):
            ids = perm[ci * chunk:(ci + 1) * chunk]
            ids = ids[ids >= 0]
            key.append(float(np.linalg.norm(cent[ids] - eye[None, :],
                                            axis=1).min())
                       if ids.size else np.inf)
        order = np.argsort(np.asarray(key), kind="stable")
        perm = np.concatenate([perm[ci * chunk:(ci + 1) * chunk]
                               for ci in order])
        chunk_bids = [chunk_bids[ci] for ci in order]
    return MeshPlan(perm_bytes=perm.astype(np.int32).tobytes(),
                    chunk_box_id=tuple(chunk_bids),
                    n_chunks=perm.size // chunk if chunk else 0,
                    chunk=chunk, n_tris=t)


_PLAN_CACHE: dict = {}


def plan_for_scene(scene, chunk: int = 512) -> MeshPlan | None:
    """Cached plan for a *concrete* scene; None when the scene has no
    triangles or is a tracer (inside jit — callers fall back to the
    sequential-chunk path)."""
    tris = scene.triangles
    if tris.count == 0:
        return None
    import jax.core
    if any(isinstance(x, jax.core.Tracer)
           for x in (tris.p0, tris.p1, tris.p2, tris.box_id)):
        return None
    p0 = np.asarray(tris.p0)
    eye = None
    if not isinstance(scene.camera.look_from, jax.core.Tracer):
        eye = np.asarray(scene.camera.look_from, np.float64)
    key = (hash((p0[:: max(1, p0.shape[0] // 64)].tobytes(),
                 p0.shape[0], chunk,
                 None if eye is None else eye.tobytes())))
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        return hit
    plan = build_mesh_plan(p0, np.asarray(tris.p1), np.asarray(tris.p2),
                           np.asarray(tris.box_id), chunk, eye=eye)
    if len(_PLAN_CACHE) > 32:
        _PLAN_CACHE.clear()
    _PLAN_CACHE[key] = plan
    return plan


def permute(x, plan: MeshPlan, fill=0.0):
    """Apply the plan's ordering to a per-triangle array (traced ok);
    padding rows (perm == -1) get ``fill``."""
    perm = jnp.asarray(plan.perm)
    safe = jnp.maximum(perm, 0)
    out = jnp.take(jnp.asarray(x), safe, axis=0)
    mask = (perm >= 0)
    if out.ndim > 1:
        mask = mask[:, None]
    return jnp.where(mask, out, fill)


def subcluster_bounds(p0, p1, p2, plan: MeshPlan, k: int,
                      rel_eps: float = 1e-4, abs_eps: float = 1e-5):
    """Per-chunk SUB-AABBs: k boxes per chunk over consecutive
    (chunk//k)-triangle runs of the BVH-ordered permutation (runs are
    spatially coherent by construction).  Used as refined FIRE gates: a
    chunk whose coarse AABB a ray enters still need not fire its matmul
    when the ray misses every sub-box.  Conservative for the same reason
    as cluster_bounds (a triangle lies inside its sub-box).  Empty
    (all-padding) sub-runs get an inverted box no slab test can hit.
    Returns (n_chunks*k, 6) [min, max] rows."""
    assert plan.chunk % k == 0
    perm = jnp.asarray(plan.perm)
    valid = (perm >= 0)[:, None]
    pts = jnp.stack([p0, p1, p2], axis=1)          # (T_pad, 3, 3)
    big = jnp.float32(3.4e38)
    lo = jnp.where(valid[:, None], pts, big).min(axis=1)
    hi = jnp.where(valid[:, None], pts, -big).max(axis=1)
    sub = plan.chunk // k
    cmin = lo.reshape(plan.n_chunks * k, sub, 3).min(axis=1)
    cmax = hi.reshape(plan.n_chunks * k, sub, 3).max(axis=1)
    ext = jnp.maximum(cmax - cmin, 0.0).max(axis=-1, keepdims=True)
    pad = ext * rel_eps + abs_eps
    return jnp.concatenate([cmin - pad, cmax + pad], axis=1)


def cluster_bounds(p0, p1, p2, plan: MeshPlan, rel_eps: float = 1e-4,
                   abs_eps: float = 1e-5):
    """Per-chunk AABBs over the *permuted* triangle positions (traced ok).

    p0/p1/p2: (n_chunks*chunk, 3) already permuted, padding rows arbitrary.
    Epsilon padding keeps the slab test conservative (the reference's strict
    ``tmax > tmin`` would miss flat boxes, ``gpu_kernel.cl:534-555``).
    Returns (cmin, cmax): (n_chunks, 3).
    """
    perm = jnp.asarray(plan.perm)
    valid = (perm >= 0)[:, None]
    pts = jnp.stack([p0, p1, p2], axis=1)          # (T_pad, 3, 3)
    big = jnp.float32(3.4e38)
    lo = jnp.where(valid[:, None], pts, big).min(axis=1)
    hi = jnp.where(valid[:, None], pts, -big).max(axis=1)
    cmin = lo.reshape(plan.n_chunks, plan.chunk, 3).min(axis=1)
    cmax = hi.reshape(plan.n_chunks, plan.chunk, 3).max(axis=1)
    ext = (cmax - cmin).max(axis=-1, keepdims=True)
    pad = ext * rel_eps + abs_eps
    return cmin - pad, cmax + pad
