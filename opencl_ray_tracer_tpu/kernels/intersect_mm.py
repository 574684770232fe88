"""Fused Pallas ray-x-triangle intersection kernel (MXU + VMEM epilogue).

The jnp matmul formulation (tracer/mesh_accel.py) is HBM-bound: every
triangle chunk materializes its (rays, 4*chunk) product and epilogue
temporaries to HBM (~16 bytes per ray-triangle pair).  This kernel keeps the
whole pipeline in VMEM per ray tile:

  grid cell = one tile of TILE_R rays
    f_ray tile (TILE_R, 16)   [d, m=o x d, o, 1, pad]  -> VMEM
    for each triangle chunk (static loop):
      if AABB says no ray in this tile can hit the chunk's boxes: skip
      (TILE_R,16) @ (16, 4*CHUNK) on the MXU  -> a | u | v | t columns
      Moller-Trumbore accept tests elementwise in VMEM
      fold running (min t, argmin triangle id) into scratch
    write (t_best, idx_best) for the tile

HBM traffic per pair: ZERO (weights stay resident in VMEM, ~4 MB for 15k
triangles); the only HBM I/O is the ray features in and two (R,) results
out.  The per-tile chunk skip generalizes the reference's per-ray AABB gate
(gpu_kernel.cl:374-391) to tile granularity — camera tiles that miss the
mesh's box skip all triangle work.

Semantics identical to mesh_accel (same feature construction, eps, strict
t window); used via make_pallas_hit_fn as the estimator hit_fn on TPU.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene import Scene
from ..tracer.intersect import BIG, TRI_EPS, HitInfo, closest_hit, hit_aabbs
from ..tracer import mesh_accel as ma

TILE_R = 512       # rays per grid cell (the proven VMEM fit: smaller
                   # tiles with 512-triangle chunks crash the Mosaic
                   # compile service; see megamesh.py for the fine-grained
                   # cluster kernel)
CHUNK = 2048       # triangles per inner step
PLAN_CHUNK = 2048  # cluster-plan chunk: box-exact per-chunk gating + tile
                   # skip at 2048-triangle granularity (the fused megamesh
                   # kernel culls at 512; this standalone kernel keeps the
                   # round-1-proven 512x2048 configuration)
NF = 16            # feature rows (10 used, padded)


def _build_weights(scene: Scene, plan=None):
    """(NF, n_chunks*4*chunk) f32 weight table + per-chunk box mask."""
    chunk = plan.chunk if plan is not None else CHUNK
    feats = ma.build_tri_features(scene, chunk, plan=plan)
    if feats is None:
        return None
    # feats.weights: (n_chunks, 10, 4*chunk) -> pad rows to NF and flatten
    w = feats.weights
    n_chunks = feats.n_chunks
    w = jnp.pad(w, ((0, 0), (0, NF - w.shape[1]), (0, 0)))
    w_flat = w.transpose(1, 0, 2).reshape(NF, n_chunks * 4 * chunk)
    # which boxes appear in each chunk (traced-safe: scene may be a tracer)
    box_id_c = feats.box_id.reshape(n_chunks, chunk)
    n_boxes = max(1, scene.boxes.count)  # static (array shape)
    chunk_box = jnp.stack(
        [(box_id_c == b).any(axis=1) for b in range(n_boxes)], axis=1)
    return feats, w_flat, chunk_box, n_chunks


def _make_kernel(n_chunks: int, t_min: float, chunk: int):
    def kernel(fray_ref, w_ref, gate_ref, box_gate_ref, t_ref, idx_ref,
               best_ref, bidx_ref):
        i = pl.program_id(0)
        fray = fray_ref[:]                       # (TILE_R, NF)
        best_ref[:] = jnp.full((TILE_R, 1), BIG, jnp.float32)
        bidx_ref[:] = jnp.zeros((TILE_R, 1), jnp.int32)

        for c in range(n_chunks):
            @pl.when(gate_ref[i, c] > 0)
            def _(c=c):
                w = w_ref[:, c * 4 * chunk:(c + 1) * 4 * chunk]
                prod = jnp.dot(fray, w,
                               preferred_element_type=jnp.float32)
                a = prod[:, 0 * chunk:1 * chunk]
                u_num = prod[:, 1 * chunk:2 * chunk]
                v_num = prod[:, 2 * chunk:3 * chunk]
                t_num = prod[:, 3 * chunk:4 * chunk]
                parallel = jnp.abs(a) < TRI_EPS      # gpu_kernel.cl:496
                inv_a = 1.0 / jnp.where(parallel, 1.0, a)
                u = u_num * inv_a
                v = v_num * inv_a
                tt = t_num * inv_a
                # per-ray box gate for this chunk's triangles
                gate = box_gate_ref[:, c:c + 1] > 0  # (TILE_R, 1)
                ok = (~parallel
                      & (u >= 0.0) & (u <= 1.0)
                      & (v >= 0.0) & (u + v <= 1.0)
                      & (tt > t_min)                 # strict (:520)
                      & gate)
                tt = jnp.where(ok, tt, BIG)
                ci = jnp.argmin(tt, axis=1)[:, None].astype(jnp.int32)
                ct = jnp.min(tt, axis=1)[:, None]
                upd = ct < best_ref[:]
                best_ref[:] = jnp.where(upd, ct, best_ref[:])
                bidx_ref[:] = jnp.where(upd, c * chunk + ci, bidx_ref[:])

        t_ref[:] = best_ref[:]
        idx_ref[:] = bidx_ref[:]

    return kernel


def _pallas_closest_tri(feats, w_flat, chunk_box, n_chunks, scene, o, d,
                        box_hit, t_min, interpret):
    r = o.shape[0]
    chunk = feats.chunk
    pad = (-r) % TILE_R
    n_tiles = (r + pad) // TILE_R
    m = jnp.cross(o, d)
    f_ray = jnp.concatenate(
        [d, m, o, jnp.ones((r, 1), jnp.float32),
         jnp.zeros((r, NF - 10), jnp.float32)], axis=1)
    f_ray = jnp.pad(f_ray, ((0, pad), (0, 0)))

    bh = jnp.pad(box_hit, ((0, pad), (0, 0)))              # (R_pad, B)
    if feats.cluster_min is not None:
        # Cluster culling: ray participates in a chunk iff it hits the
        # chunk's (eps-padded) AABB AND the chunk's gating box (reference
        # box semantics, gpu_kernel.cl:374-391 — exact per-chunk since the
        # plan groups chunks by box id).
        cl_hit = hit_aabbs(o, d, feats.cluster_min, feats.cluster_max)
        cl_hit = jnp.pad(cl_hit, ((0, pad), (0, 0)))       # (R_pad, n_chunks)
        bid = np.asarray(feats.chunk_box_id)
        ray_chunk_gate = (cl_hit & bh[:, bid]).astype(jnp.int32)
    else:
        # a ray participates in chunk c iff it hits one of the chunk's boxes
        ray_chunk_gate = (bh.astype(jnp.int32)
                          @ chunk_box.T.astype(jnp.int32))  # (R_pad, n_chunks)
    # tile-level chunk gates: tile runs a chunk iff any of its rays does
    gates = (ray_chunk_gate.reshape(n_tiles, TILE_R, n_chunks)
             .max(axis=1).astype(jnp.int32))                # (n_tiles, n_chunks)

    kernel = _make_kernel(n_chunks, t_min, chunk)
    t_out, idx_out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * TILE_R, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * TILE_R, 1), jnp.int32),
        ],
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_R, NF), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NF, n_chunks * 4 * CHUNK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole gate table
            pl.BlockSpec((TILE_R, n_chunks), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_R, 1), jnp.float32),
            pltpu.VMEM((TILE_R, 1), jnp.int32),
        ],
        interpret=interpret,
    )(f_ray, w_flat, gates, ray_chunk_gate)
    return t_out[:r, 0], idx_out[:r, 0]


def make_pallas_hit_fn(scene: Scene, t_min: float = 1e-3,
                       interpret: bool = False, plan=None):
    """Estimator hit_fn using the fused Pallas intersection kernel.
    Returns None when the scene has no triangles.

    plan: optional clusters.MeshPlan for chunk-skip culling; when omitted it
    is derived from the scene if concrete (inside jit the scene is traced
    and the sequential-chunk fallback is used)."""
    if plan is None:
        from ..tracer.clusters import plan_for_scene
        plan = plan_for_scene(scene, PLAN_CHUNK)
    built = _build_weights(scene, plan)
    sphere_scene = dataclasses.replace(
        scene, triangles=scene.triangles.empty(),
        boxes=scene.boxes.empty())
    if built is None:
        return None
    feats, w_flat, chunk_box, n_chunks = built

    def hit_fn(o, d):
        base = closest_hit(sphere_scene, o, d, t_min)
        r = o.shape[0]
        if scene.boxes.count > 0:
            box_hit = hit_aabbs(o, d, scene.boxes.box_min,
                                scene.boxes.box_max)
        else:
            # Reference semantics: triangles are only tested inside the
            # bounding-box loop (gpu_kernel.cl:374-391), so no boxes means
            # no triangle hits — matching closest_hit and make_mm_hit_fn.
            box_hit = jnp.zeros((r, 1), bool)
        tri_t, tri_idx = _pallas_closest_tri(
            feats, w_flat, chunk_box, n_chunks, scene, o, d, box_hit,
            t_min, interpret)

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
