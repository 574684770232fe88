"""Winner-only differentiable closest hit (the fast backward path).

The gradient of a path-traced image w.r.t. scene parameters flows only
through the *winning* primitive of each ray segment — the argmin selection
itself is non-differentiable (the standard interior-derivative convention,
SURVEY.md §7 hard part (b)).  Differentiating the brute-force closest-hit
fold therefore wastes O(rays x primitives) backward work computing
cotangents that are identically zero.

This module splits the hit into:

1. **winner search** — the full fold (``intersect.closest_fold``), wrapped
   in ``stop_gradient``; since no gradient flows through it, it can run on
   ANY backend, including the forward-only fused Pallas kernel
   (kernels/intersect_mm.py) — making the *forward pass of a gradient
   render* as fast as an inference render.
2. **winner recompute** — the hit record (t, point, normal, material) is
   recomputed differentiably for only the winning primitive per ray
   ((R,)-gathers + a few flops), reproducing exactly the math the fold
   would have selected (same quadratic-root choice, same Moller-Trumbore
   expressions), so values AND gradients are identical to autodiff of
   ``closest_hit`` while the backward cost is independent of scene size.

Used by render_and_grad / the sharded train step via
``make_grad_hit_fn``; verified against brute-force autodiff in
tests/test_diffhit.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene import Scene
from .intersect import BIG, HitInfo, TRI_EPS, closest_fold, hit_aabbs


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


# Tables up to this size gather via select-folds: the backward of a
# jnp.take is a scatter-add (a TPU performance cliff at estimator rates),
# while a select-fold transposes to dense masked reductions.
SELECT_GATHER_MAX = 64


def _sel_gather(table, idx, n):
    """table[idx] as a select-fold (dense-reduction backward)."""
    out = jnp.zeros(idx.shape + table.shape[1:], table.dtype)
    for i in range(n):
        m = idx == i
        if table.ndim > 1:
            m = m[:, None]
        out = jnp.where(m, table[i], out)
    return out


def winner_hitinfo(scene: Scene, o, d, best_kind, best_idx, hit,
                   t_min) -> HitInfo:
    """Differentiable hit record for known winners.

    best_kind/best_idx/hit must be concrete winner identities (gradients
    are stopped through them by construction — integer arrays).
    """
    r = o.shape[0]
    spheres, tris = scene.spheres, scene.triangles
    is_tri = best_kind == 1

    def take(table, idx, n):
        if n <= SELECT_GATHER_MAX and jnp.issubdtype(table.dtype,
                                                     jnp.floating):
            return _sel_gather(table, idx, n)
        return table[idx]

    # ---- sphere branch: recompute the selected quadratic root ----
    if spheres.count > 0:
        ns = spheres.count
        sidx = jnp.where(~is_tri & hit, best_idx, 0)
        c = take(spheres.center, sidx, ns)           # (R,3)
        rad = take(spheres.radius, sidx, ns)
        oc = o - c
        a = _dot(d, d)
        half_b = _dot(oc, d)
        cc = _dot(oc, oc) - rad * rad
        disc = half_b * half_b - a * cc
        sqrtd = jnp.sqrt(jnp.maximum(disc, 1e-30))
        root0 = (-half_b - sqrtd) / a
        root1 = (-half_b + sqrtd) / a
        # same root selection as the fold (gpu_kernel.cl:471-477), with the
        # *choice* (not the value) gradient-stopped
        ok0 = jax.lax.stop_gradient((disc >= 0.0) & (root0 >= t_min))
        s_t = jnp.where(ok0, root0, root1)
        s_point = o + s_t[:, None] * d
        s_normal = (s_point - c) / rad[:, None]
        s_albedo = take(spheres.albedo, sidx, ns)
        s_fuzz = take(spheres.fuzz, sidx, ns)
        s_ior = take(spheres.ior, sidx, ns)
        s_type = spheres.mat_type[sidx]
    else:
        s_t = jnp.ones((r,))
        s_point = o + d
        s_normal = jnp.zeros_like(o)
        s_albedo = jnp.zeros_like(o)
        s_fuzz = jnp.zeros((r,))
        s_ior = jnp.zeros((r,))
        s_type = jnp.zeros((r,), jnp.int32)

    # ---- triangle branch: recompute Moller-Trumbore for the winner ----
    if tris.count > 0:
        nt = tris.count
        tidx = jnp.where(is_tri & hit, best_idx, 0)
        p0 = take(tris.p0, tidx, nt)
        p1 = take(tris.p1, tidx, nt)
        p2 = take(tris.p2, tidx, nt)
        e0 = p1 - p0
        e1 = p2 - p0
        h = jnp.cross(d, e1)
        a_t = _dot(e0, h)
        f = 1.0 / jnp.where(jnp.abs(a_t) < TRI_EPS, 1.0, a_t)
        s = o - p0
        q = jnp.cross(s, e0)
        t_t = f * _dot(e1, q)
        t_point = o + t_t[:, None] * d
        n = jnp.cross(e0, e1)
        t_normal = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        t_albedo = take(tris.albedo, tidx, nt)
        t_fuzz = take(tris.fuzz, tidx, nt)
        t_ior = take(tris.ior, tidx, nt)
        t_type = tris.mat_type[tidx]
    else:
        t_t = jnp.ones((r,))
        t_point = o + d
        t_normal = jnp.zeros_like(o)
        t_albedo = jnp.zeros_like(o)
        t_fuzz = jnp.zeros((r,))
        t_ior = jnp.zeros((r,))
        t_type = jnp.zeros((r,), jnp.int32)

    it = is_tri[:, None]
    t = jnp.where(is_tri, t_t, s_t)
    # miss lanes: finite placeholders (never consumed; see closest_hit)
    t = jnp.where(hit, t, 1.0)
    point = jnp.where(hit[:, None], jnp.where(it, t_point, s_point),
                      o + d)
    outward = jnp.where(it, t_normal, s_normal)
    outward = jnp.where(hit[:, None], outward,
                        jnp.broadcast_to(
                            jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                            outward.shape))
    albedo = jnp.where(it, t_albedo, s_albedo)
    fuzz = jnp.where(is_tri, t_fuzz, s_fuzz)
    ior = jnp.where(is_tri, t_ior, s_ior)
    mat_type = jnp.where(is_tri, t_type, s_type)

    front_face = _dot(d, outward) < 0.0
    normal = jnp.where(front_face[:, None], outward, -outward)
    return HitInfo(hit=hit, t=t, point=point, normal=normal,
                   front_face=front_face, albedo=albedo, fuzz=fuzz,
                   ior=ior, mat_type=mat_type)


def make_grad_hit_fn(scene: Scene, t_min: float = 1e-3,
                     winner_backend: str = "jnp", mesh_plan=None,
                     interpret: bool = False):
    """hit_fn for gradient renders: fast (optionally Pallas) winner search
    under stop_gradient + winner-only differentiable recompute.

    scene may be traced (a closure inside value_and_grad) — gradients flow
    to it through the recompute, not the search.
    """
    use_pallas = winner_backend == "pallas" and scene.triangles.count > 0
    if use_pallas:
        from ..kernels.intersect_mm import _build_weights, \
            _pallas_closest_tri
        import dataclasses as _dc
        sg = jax.lax.stop_gradient
        frozen = jax.tree.map(jax.lax.stop_gradient, scene)
        built = _build_weights(frozen, mesh_plan)

    def hit_fn(o, d):
        if use_pallas:
            feats, w_flat, chunk_box, n_chunks = built
            o_s = jax.lax.stop_gradient(o)
            d_s = jax.lax.stop_gradient(d)
            # sphere winner via the jnp fold (cheap), triangles via Pallas
            sph_only = _dc.replace(frozen,
                                   triangles=frozen.triangles.empty(),
                                   boxes=frozen.boxes.empty())
            s_t, _, s_idx = closest_fold(sph_only, o_s, d_s, t_min)
            if frozen.boxes.count > 0:
                box_hit = hit_aabbs(o_s, d_s, frozen.boxes.box_min,
                                    frozen.boxes.box_max)
            else:
                box_hit = jnp.zeros((o.shape[0], 1), bool)
            tri_t, tri_idx = _pallas_closest_tri(
                feats, w_flat, chunk_box, n_chunks, frozen, o_s, d_s,
                box_hit, t_min, interpret)
            # map permuted-table winner back to original triangle ids so
            # the recompute gathers the right (traced) vertices
            if feats.cluster_min is not None:
                import numpy as _np
                perm = jnp.asarray(
                    _np.maximum(mesh_plan.perm, 0), jnp.int32)
                tri_idx = perm[jnp.clip(tri_idx, 0, perm.shape[0] - 1)]
            take_tri = (tri_t < BIG) & (tri_t < s_t)
            best_t = jnp.minimum(tri_t, s_t)
            kind = take_tri.astype(jnp.int32)
            idx = jnp.where(take_tri, tri_idx, s_idx)
            hit = best_t < BIG
        else:
            best_t, kind, idx = jax.tree.map(
                jax.lax.stop_gradient,
                closest_fold(jax.lax.stop_gradient(scene),
                             jax.lax.stop_gradient(o),
                             jax.lax.stop_gradient(d), t_min))
            hit = best_t < BIG
        return winner_hitinfo(scene, o, d, kind, idx, hit, t_min)

    return hit_fn
