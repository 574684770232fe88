"""Fused mesh + HDR-sky Pallas wavefront megakernel.

Round-1's megakernel (kernels/megakernel.py) covers sphere scenes with
gradient/constant skies; the reference's *default* scene (8 spheres +
15,329-triangle F1 car + HDR skybox, ``main.cpp:80-152``) ran on the jnp
wavefront path orders of magnitude slower.  This kernel runs that scene in
one fused wavefront loop, like the reference's single ``pixel_colour``
megakernel (``gpu_kernel.cl:595-648``) renders it in one dispatch:

- **Triangles on the MXU, resident in VMEM.**  The Moller-Trumbore
  matmul-form weights (tracer/mesh_accel.py) for the whole mesh (~4 MB for
  16K triangles) sit in VMEM; each bounce intersects one 128-lane pixel row
  against a triangle chunk with a (16, 4C) x (16, 128) ``dot_general``
  (triangles on sublanes, pixels on lanes — reductions and gates stay in
  natural lane orientation).
- **In-kernel cluster culling.**  Chunks are spatially-coherent BVH leaves
  (tracer/clusters.py) with per-chunk AABBs in SMEM.  Every bounce
  recomputes the per-lane slab masks (rays move between bounces!), and a
  whole chunk is skipped (``@pl.when``) when no live lane in the tile hits
  its AABB — the TPU-native generalization of the reference's per-ray box
  gate (``gpu_kernel.cl:374-391``).
- **Winner attributes without gathers.**  Mosaic per-lane gathers are
  catastrophic; the winning triangle's geometric normal is recovered with a
  one-hot matmul against the weight table's own normal rows (the ``o``-rows
  of the t-column block), and mesh material parameters are uniform scalars
  (the reference's fixed-material-per-mesh, ``utility.cpp:99``).
- **HDR sky via deferred miss records.**  Equirect lookups need per-lane
  gathers, so the kernel records (throughput, direction) per terminated
  miss sample into VMEM and a tiny jnp epilogue adds
  ``sum_s thr_s * sky(dir_s)`` with XLA's native gathers.  This is exact:
  per-sample clamping (``gpu_kernel.cl:632-638``) is a no-op for miss
  contributions because tone-mapped HDR radiance is < 1
  (``utility.cpp:180-186`` maps to [0,1)) and path throughput is <= 1 —
  ``supports_mesh`` checks both.  (Only the NaN running-sum quirk would
  need in-order sky values; NaN-free scenes — all real ones — match the
  jnp path exactly.)  HDR renders with spp > 8 chunk the sample loop over
  multiple dispatches to bound record memory.

Estimator semantics otherwise match kernels/megakernel.py exactly
(wavefront path regeneration, counter RNG, clamp-before-average, depth
exhaustion -> black).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene import Scene, camera_frame, sky_colour
from ..scene import materials as mat
from ..scene.sky import KIND_CONST, KIND_GRADIENT, KIND_HDR
from ..tracer import mesh_accel as ma
from .megakernel import (BIG, LANES, N_FIELDS, TWO_PI, _U32, _camera_table,
                         _dot3, _sphere_fold_spec, _sphere_group_aabbs,
                         _sphere_table, sphere_chunk_plan,
                         _uniform4, make_winner_gather, scatter_block,
                         sphere_winner_fold,
                         F_CX, F_CY, F_CZ, F_ALR, F_ALG, F_ALB, F_FUZZ,
                         F_IOR, F_TYPE, F_R2, F_INVR, F_INVIOR,
                         C_OX, C_OY, C_OZ, C_HX, C_HY, C_HZ, C_VX, C_VY,
                         C_VZ, C_LX, C_LY, C_LZ, C_DUX, C_DUY, C_DUZ,
                         C_DVX, C_DVY, C_DVZ, C_SKY0, C_SKY1, C_SKY2)

TILE_ROWS = 64
TILE = TILE_ROWS * LANES
MESH_CHUNK = 128           # triangles per cluster chunk.  Round-3 sweep on
                           # the F1 scene (fired-row counting showed ~17 of
                           # 60 256-tri chunks firing per live row-bounce at
                           # ~4.1 us each — the K=16 MXU roofline): finer
                           # chunks halve the per-fired-row matmul+ladder
                           # cost and the fired count grows sublinearly.
                           # 64: 1.95 s, 128: 1.76 s, 256: 2.01 s, 512:
                           # scoped-VMEM overflow (F1+HDR 5spp/d32 ladder).
# Pixel rows batched per intersection matmul.  The TPU matmul unit is
# LATENCY-bound at these contraction sizes (K=16): a (16,4C)x(16,128)
# per-pixel-row dot costs the same wall time as a (16,4C)x(16,1024) one
# (measured ~13 us either way), so the tile state is stored (N_SUB, SUB*128)
# — SUB pixel rows per storage row — and each matmul intersects SUB rows at
# once with NO relayout (features slice straight out of the state planes).
SUB = 8
SUBL = SUB * LANES         # matmul N (lanes per storage row)
N_SUB = TILE_ROWS // SUB   # storage rows per tile
ROW_GATED = True           # per-storage-row pl.when gates in the fold
HDR_SPP_CHUNK = 8          # samples per dispatch in HDR mode (records)
MESH_SUB_GATES = 4         # sub-AABB fire gates per chunk (0 = off): a
                           # coarse-gate-passing chunk still skips its
                           # matmuls for rays that miss every sub-box
                           # (BVH-ordered 32-tri runs at chunk=128).
                           # Measured on the F1 flagship (TPU, r5): 0 ->
                           # 1.720 s, 4 -> 1.717 s, 8 -> 1.733 s — the
                           # fired rows are GENUINE (some lane really
                           # enters cluster geometry), so finer gates
                           # are ~neutral there; kept at 4 for scenes
                           # with sparser/elongated clusters.
SPHERE_CHUNK_MIN = 24      # sphere count above which sphere-only scenes
                           # route through this kernel: its 2-D image
                           # tiles + multi-round compaction beat the
                           # linear-tile megakernel (book-cover 250spp/d50
                           # measured: megakernel 1.84 s -> 0.93 s here)
# Chunk-gated sphere fold (near-to-far spatial chunks with SMEM AABBs,
# entry-t culled per bounce): measured SLOWER than the plain fold under
# the same multi-round schedule (book-cover 1.13 s vs 0.93 s — slab tests
# + scratch round-trips exceed the skipped sphere tests, the third
# grouped-fold variant to lose this way; see megakernel.SPHERE_GROUP_MIN).
# Disabled by default; the code path stays tested for spatially sparse
# scenes where callers can lower the threshold.
SPHERE_GATE_MIN = 10 ** 9
SPHERE_CHUNK_SIZE = 16
HIGH_SPP_MIN = 64          # spp at which the multi-round tail-compaction
                           # ladder wins even for tiny sphere scenes
                           # (README 250spp/d50: megakernel 0.280 s ->
                           # 0.228 s here); shared by supports_mesh,
                           # _round_schedule, and the dispatch loop

# Multi-round tail compaction: round 0 runs the full-grid wavefront for at
# most cap0 iterations; survivors — deep ground<->car interreflection
# chains whose tiles would otherwise iterate mostly idle — are compacted
# (sorted by a spatial key so 128-lane rows regain cluster coherence) into
# a dense dispatch at 1/denom of the padded lane count, which runs its own
# cap, compacts again, and so on until a final uncapped round.  Measured on
# the F1 scene (survival curve at 5 spp/d32: 29% alive after 12 iters, 13%
# after 24, 8% after 36, 4% after 48 — a heavy tail): a single two-pass
# split costs 2.78 s where the multi-round ladder reaches the packed-work
# floor (~57 ms per full-grid iteration, lane-proportional when packed).
# Exact: identical per-sample draws and accumulation; only the NaN
# running-sum quirk would see the split accumulator (same caveat as HDR,
# module docstring).  Soundness: a round whose survivors exceed the next
# round's capacity would silently drop paths, so every compaction emits an
# ok flag; render_pallas_mesh re-renders with a single uncapped round if
# any flag trips (capacities carry ~2x margins — in practice never).
PASS1_ITER_FACTOR = 2      # round-0 cap = factor*spp + slack
PASS1_ITER_SLACK = 0
# Continuation rounds: (cap_factor, cap_slack, capacity_denominator); the
# denominator divides the PADDED full-grid lane count for the state
# entering that round.  Round-3 ladder re-design from a MEASURED survival
# curve (F1 5spp/d32, capped _dispatch + alive count: 36.1% alive after 10
# iters, 20.1% @16, 13.2% @24, 9.4% @32, 6.5% @40): eager 7-round ladders
# with denominators ~1.4-1.9x above the curve beat the round-2 ladder
# 2.01 s -> 1.69 s (at MESH_CHUNK=128); tighter denominators trip the
# ok-flag fallback (single-round re-render, 3.8 s) — keep the margins.
EXTRA_ROUNDS = ((1, 1, 2), (1, 3, 3), (2, 2, 5), (3, 1, 8), (4, 4, 14))
FINAL_DENOM = 28           # capacity of the final uncapped round
N_CONT = 12                # continuation-state rows: pix, o3, d3, thr3,
                           # sample, depth


def _round_schedule(spp_c: int, max_depth: int) -> tuple:
    """Static (iter_cap, capacity_denominator) per round.  cap == bound
    means uncapped (the kernel's while loop exits when all lanes finish).
    Small configs (bound <= 2*cap0) render in one uncapped round.

    High sample counts get a different ladder: a lane's total iterations
    are the SUM of spp path lengths, which concentrates around the PIXEL's
    mean path length as spp grows — so the tail is spatial (pixels on
    glass have long paths every sample), wide but quickly-decaying in cap
    (book-cover measured survival at 250 spp/d50: 2.8x spp -> 25%,
    4x -> 8%, 5.6x -> 1.5%, 8x -> 0.4%).  Caps scale ~linearly in spp
    with ~2-4x capacity margins against that curve.

    Round-5 negative result (README 250spp/d50 swept on TPU): tighter
    survival-curve-style schedules with float denominators — which won
    -18%% in the GRAD kernel's ladder — all LOSE here (0.42 s vs 0.248;
    first-level denominators of 1.5-1.6 overflow because the forward
    carries live ray state instead of restarting samples, so its
    survivors decay slower per iteration than the grad fill's); even a
    6-level variant with the proven first two levels only ties (0.254).
    The default below is already at the floor."""
    bound = spp_c * max_depth + 1
    if spp_c >= HIGH_SPP_MIN:
        c0 = int(2.8 * spp_c) + 8
        if bound <= 2 * c0:
            return ((bound, 1),)
        return ((c0, 1), (int(1.2 * spp_c) + 8, 2),
                (int(1.6 * spp_c) + 8, 4), (int(2.4 * spp_c) + 8, 16),
                (bound, 64))
    cap0 = spp_c * PASS1_ITER_FACTOR + PASS1_ITER_SLACK
    if bound <= 2 * cap0:
        return ((bound, 1),)
    sched = [(cap0, 1)]
    cum = cap0
    for fac, slack, denom in EXTRA_ROUNDS:
        if cum >= bound:
            return tuple(sched)
        cap = min(spp_c * fac + slack, bound)
        sched.append((cap, denom))
        cum += cap
    if cum < bound:
        sched.append((bound, FINAL_DENOM))
    return tuple(sched)


def _morton6(v):
    """Spread each 6-bit int to every 3rd bit (3-D Morton interleave)."""
    v = (v | (v << 8)) & 0x300F
    v = (v | (v << 4)) & 0x30C3
    return (v | (v << 2)) & 0x9249


def _compact_state(state_flat, spp_c: int, n2: int):
    """Sort the packed lane state so live lanes lead, keyed by Morton-
    interleaved quantized origin + direction octant (128-lane rows in the
    packed dispatch then share locality AND ray orientation, so the
    per-row cluster gates and front-to-back entry-t culls keep firing),
    and keep the first n2 (a TILE multiple <= lane count).  Returns
    (state2 (N_CONT, n2//SUBL, SUBL), ok) where ok = no live lane was
    dropped (capacity soundness; see module constants)."""
    alive = (state_flat[10] < spp_c) & (state_flat[0] >= 0)
    o = state_flat[1:4]
    d = state_flat[4:7]
    q = jnp.clip(((o / (1.0 + jnp.abs(o)) + 1.0)
                  * 31.5).astype(jnp.int32), 0, 63)
    morton = (_morton6(q[0]) | (_morton6(q[1]) << 1)
              | (_morton6(q[2]) << 2))
    octant = ((d[0] < 0).astype(jnp.int32)
              + 2 * (d[1] < 0).astype(jnp.int32)
              + 4 * (d[2] < 0).astype(jnp.int32))
    key = jnp.where(alive, morton * 8 + octant, jnp.int32(2 ** 30))
    order = jnp.argsort(key)
    sel = order[:n2]
    ok = jnp.sum(alive) <= n2
    return state_flat[:, sel].reshape(N_CONT, n2 // SUBL, SUBL), ok


def _round_capacity(p_tot: int, L: int, denom) -> int:
    """Capacity (lane count) of a round: 1/denom of the FULL padded grid
    (p_tot; denom may be a float for tight survival-curve tracking),
    tile-rounded, at least one tile, never more than the entering
    state's lane count L."""
    return min(L, max(TILE, -(-int(p_tot / denom) // TILE) * TILE))

def _delane(a, n_tr: int, n_tc: int):
    """Kernel lane layout -> image layout.

    Kernel arrays are (..., n_tr*N_SUB, n_tc*SUBL): storage row s of tile
    (i, j), lane b*LANES + x holds pixel (i*TILE_ROWS + s*SUB + b,
    j*LANES + x).  Returns (..., n_tr*TILE_ROWS, n_tc*LANES)."""
    lead = a.shape[:-2]
    a = a.reshape(*lead, n_tr, N_SUB, n_tc, SUB, LANES)
    a = jnp.moveaxis(a, -2, -3)           # (..., i, s, b, j, x)
    return a.reshape(*lead, n_tr * TILE_ROWS, n_tc * LANES)


# Extra camera-table slots for the uniform mesh material (after C_SKY2=21).
(C_MA_R, C_MA_G, C_MA_B, C_M_FUZZ, C_M_IOR, C_M_INVIOR) = range(22, 28)

# State slots (a superset of megakernel's): ray, throughput, counters.
(S_OX, S_OY, S_OZ, S_DX, S_DY, S_DZ, S_TR, S_TG, S_TB,
 S_SAMPLE, S_DEPTH) = range(11)
N_STATE = 12


def _make_kernel(n_spheres: int, width: int, height: int,
                 spp: int, max_depth: int, t_min: float,
                 sky_kind: int, clamp_samples: bool, nan_policy: str,
                 has_metal: bool, has_diel: bool, has_emit: bool,
                 has_fuzz: bool, has_aperture: bool,
                 n_chunks: int, chunk: int, chunk_box_ids: tuple,
                 n_boxes: int, mesh_mtype: int,
                 continuation: bool = False, iter_cap: int | None = None,
                 emit_state: bool = False, sphere_spec=None,
                 sph_chunks=None, count_fires: bool = False,
                 sub_gates: int = 0):
    """Kernel body with all structure baked statically.

    spp here is the per-dispatch sample count (HDR chunks the sample loop).
    continuation restarts lanes from a packed state (pix id + ray +
    throughput + counters) instead of camera rays; iter_cap bounds the
    wavefront loop; emit_state dumps the per-lane state at exit (the
    two-pass tail compaction, module constants above).
    """
    hdr = sky_kind == KIND_HDR
    c4 = 4 * chunk

    def kernel(off_ref, cam_ref, sph_ref, w_ref, aabb_ref, box_ref,
               sph_box_ref, *io):
        pos = 0
        if sub_gates:
            sub_ref = io[0]      # (n_chunks*sub_gates, 6) SMEM AABBs
            io = io[1:]
        else:
            sub_ref = None
        if continuation:
            state_in = io[0]
            pos = 1
        r_ref, g_ref, b_ref = io[pos:pos + 3]
        pos += 3
        if hdr:
            rec = io[pos]                       # records output ref
            pos += 1
        else:
            rec = None
        if emit_state:
            sout = io[pos]
            pos += 1
        if count_fires:
            cnt_ref = io[pos]                   # (·, 6) SMEM per tile
            pos += 1
        st, acc, tri_sc = io[pos], io[pos + 1], io[pos + 2]
        cnt_sc = io[pos + 3] if count_fires else None
        shape = (N_SUB, SUBL)
        if continuation:
            # packed lanes: pixel ids (f32-exact ints, -1 padding) come
            # from the state rows, not the grid position
            lin = state_in[0].astype(jnp.int32)
            valid = lin >= 0
            lin = jnp.maximum(lin, 0)
            px_i = lin % width
            py_i = lin // width
        else:
            # 2-D image tiles (TILE_ROWS x LANES pixel blocks) stored as
            # (N_SUB, SUB*LANES): storage row s, lane b*LANES+x = pixel
            # (tile_y + s*SUB + b, tile_x + x).  Spatially compact tiles
            # are what make the cluster gates fire — a linear 8192-pixel
            # tile spans the full image width and defeats culling.
            ti = pl.program_id(0)
            tj = pl.program_id(1)
            lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            srow = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            px_i = tj * LANES + jax.lax.rem(lane, LANES)
            py_i = (off_ref[0, 0] + ti * TILE_ROWS + srow * SUB
                    + jax.lax.div(lane, LANES))
            valid = (px_i < width) & (py_i < off_ref[0, 3])
            lin = py_i * width + px_i
        pix_u = lin.astype(_U32)
        px = px_i.astype(jnp.float32)
        py = py_i.astype(jnp.float32)
        sample_base = off_ref[0, 2]

        def cam(i):
            return cam_ref[0, i]

        seed_arr = jnp.zeros(shape, _U32) + off_ref[0, 1].astype(_U32)
        zero = jnp.zeros(shape, jnp.float32)
        one = zero + 1.0
        spp_f_init = jnp.float32(spp)

        def camera_ray(sample_f):
            """GetRay (gpu_kernel.cl:559-578); sample ids are global
            (sample_base + local) so RNG streams match the jnp path."""
            s_u = (sample_f.astype(jnp.int32) + sample_base).astype(_U32)
            u0, u1, u2, u3 = _uniform4(seed_arr, pix_u, s_u,
                                       jnp.zeros_like(pix_u))
            uu = (px + u0) * jnp.float32(1.0 / width)
            vv = (py + u1) * jnp.float32(1.0 / height)
            if has_aperture:
                dr = jnp.sqrt(u2)
                th = TWO_PI * u3
                lens_x = dr * jnp.cos(th)
                lens_y = dr * jnp.sin(th)
                ox = cam(C_OX) + (cam(C_DUX) * lens_x + cam(C_DVX) * lens_y)
                oy = cam(C_OY) + (cam(C_DUY) * lens_x + cam(C_DVY) * lens_y)
                oz = cam(C_OZ) + (cam(C_DUZ) * lens_x + cam(C_DVZ) * lens_y)
            else:
                ox = cam(C_OX) + zero
                oy = cam(C_OY) + zero
                oz = cam(C_OZ) + zero
            dx = cam(C_LX) + uu * cam(C_HX) + vv * cam(C_VX) - ox
            dy = cam(C_LY) + uu * cam(C_HY) + vv * cam(C_VY) - oy
            dz = cam(C_LZ) + uu * cam(C_HZ) + vv * cam(C_VZ) - oz
            return ox, oy, oz, dx, dy, dz

        # ---- initial state ----
        if continuation:
            st[S_OX] = state_in[1]
            st[S_OY] = state_in[2]
            st[S_OZ] = state_in[3]
            st[S_DX] = state_in[4]
            st[S_DY] = state_in[5]
            st[S_DZ] = state_in[6]
            st[S_TR] = state_in[7]
            st[S_TG] = state_in[8]
            st[S_TB] = state_in[9]
            st[S_SAMPLE] = jnp.where(valid, state_in[10], spp_f_init)
            st[S_DEPTH] = state_in[11]
        else:
            ox0, oy0, oz0, dx0, dy0, dz0 = camera_ray(zero)
            st[S_OX] = ox0
            st[S_OY] = oy0
            st[S_OZ] = oz0
            st[S_DX] = dx0
            st[S_DY] = dy0
            st[S_DZ] = dz0
            st[S_TR] = one
            st[S_TG] = one
            st[S_TB] = one
            # out-of-image padding lanes start exhausted (never traced)
            st[S_SAMPLE] = jnp.where(valid, 0.0, spp_f_init)
            st[S_DEPTH] = zero
        acc[0] = zero
        acc[1] = zero
        acc[2] = zero
        if count_fires:
            cnt_sc[0] = 0.0      # wavefront iterations
            cnt_sc[1] = 0.0      # fired chunk-row matmuls
            cnt_sc[2] = 0.0      # alive lane-iterations
            cnt_sc[3] = 0.0      # fired chunks
            cnt_sc[4] = 0.0      # improving rows (winner extractions)
            cnt_sc[5] = 0.0      # spare
        if hdr:
            for s in range(spp):
                rec[6 * s + 0] = zero
                rec[6 * s + 1] = zero
                rec[6 * s + 2] = zero
                rec[6 * s + 3] = zero
                rec[6 * s + 4] = zero
                rec[6 * s + 5] = one   # safe miss direction (0,0,1)

        spp_f = jnp.float32(spp)
        max_iters = spp * max_depth + 1
        if iter_cap is not None:
            max_iters = min(max_iters, iter_cap)

        def cond(c):
            it, any_active = c
            return (it < max_iters) & any_active

        def body(c):
            it, _ = c
            ox = st[S_OX]
            oy = st[S_OY]
            oz = st[S_OZ]
            dx = st[S_DX]
            dy = st[S_DY]
            dz = st[S_DZ]
            tr = st[S_TR]
            tg = st[S_TG]
            tb = st[S_TB]
            sample_f = st[S_SAMPLE]
            depth_f = st[S_DEPTH]
            active = sample_f < spp_f
            if count_fires:
                cnt_sc[0] = cnt_sc[0] + 1.0
                cnt_sc[2] = cnt_sc[2] + jnp.sum(active.astype(jnp.float32))
            s_u = (sample_f.astype(jnp.int32) + sample_base).astype(_U32)

            # ---- closest hit over spheres (HitSphere fold) ----
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a
            neg_inv_a = -inv_a
            inv_len = jax.lax.rsqrt(a)

            def sphere_test(i):
                """Candidate t for sphere i (fused near-then-far ladder,
                see megakernel.sphere_test)."""
                ocx = ox - sph_ref[F_CX, i]
                ocy = oy - sph_ref[F_CY, i]
                ocz = oz - sph_ref[F_CZ, i]
                half_b = _dot3(ocx, ocy, ocz, dx, dy, dz)
                c_t = (_dot3(ocx, ocy, ocz, ocx, ocy, ocz)
                       - sph_ref[F_R2, i])
                disc = half_b * half_b - a * c_t
                sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
                nb = half_b * neg_inv_a
                sqa = sq * inv_a
                r0 = nb - sqa
                r1 = nb + sqa
                t_sel = jnp.where(r0 >= t_min, r0, r1)
                valid = (disc >= 0.0) & (t_sel >= t_min)
                return jnp.where(valid, t_sel, BIG)

            if n_chunks > 0 or sph_chunks is not None:
                inv_dx = 1.0 / dx
                inv_dy = 1.0 / dy
                inv_dz = 1.0 / dz

                def slab(bref, b):
                    """Per-lane AABB slab test (HitBoundingBox,
                    gpu_kernel.cl:534-555; fmin/fmax NaN-ignoring is moot
                    here: inv_d inf, not NaN, off-axis).  Returns
                    (hit, entry_t)."""
                    t1x = (bref[b, 0] - ox) * inv_dx
                    t2x = (bref[b, 3] - ox) * inv_dx
                    t1y = (bref[b, 1] - oy) * inv_dy
                    t2y = (bref[b, 4] - oy) * inv_dy
                    t1z = (bref[b, 2] - oz) * inv_dz
                    t2z = (bref[b, 5] - oz) * inv_dz
                    lo = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                                 jnp.minimum(t1y, t2y)),
                                     jnp.minimum(t1z, t2z))
                    hi = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                                 jnp.maximum(t1y, t2y)),
                                     jnp.maximum(t1z, t2z))
                    return hi > jnp.maximum(lo, 0.0), lo

            # ---- closest hit over spheres ----
            if sph_chunks is None:
                best_t, best_i, gather = sphere_winner_fold(
                    n_spheres, sph_ref, shape, zero, sphere_test,
                    sphere_spec)
            else:
                # chunked fold: near-to-far spatial chunks (SMEM AABBs),
                # a chunk is skipped unless some live lane's ray enters
                # its box closer than the running best t.  Only
                # (t, winner) live in scratch; attribute gathers run on
                # the final winner (sparse majority-default folds).
                tri_sc[8] = jnp.full(shape, BIG)
                tri_sc[9] = zero
                for sci, (c0, c1) in enumerate(sph_chunks):
                    s_hit, s_lo = slab(sph_box_ref, sci)
                    m_c = s_hit & (s_lo < tri_sc[8]) & active
                    s_any = jnp.max(m_c.astype(jnp.int32))

                    @pl.when(s_any > 0)
                    def _sph_chunk(c0=c0, c1=c1, m_c=m_c):
                        bt = tri_sc[8]
                        bi = tri_sc[9]
                        for i in range(c0, c1):
                            t_i = sphere_test(i)
                            upd = (t_i < bt) & m_c
                            bt = jnp.where(upd, t_i, bt)
                            bi = jnp.where(upd, float(i), bi)
                        tri_sc[8] = bt
                        tri_sc[9] = bi
                best_t = tri_sc[8]
                gather = make_winner_gather(tri_sc[9], sph_ref, shape,
                                            zero, n_spheres, sphere_spec,
                                            float_index=True)

            # ---- closest hit over triangle clusters (MXU fold) ----
            tri_sc[0] = jnp.full(shape, BIG)     # best tri t
            tri_sc[1] = zero                      # raw normal x
            tri_sc[2] = zero
            tri_sc[3] = one                       # safe nonzero normal

            if n_chunks > 0:
                # m = o x d (ray Plucker features) — staged through scratch
                # so the per-row fori_loop can slice them dynamically
                tri_sc[4] = oy * dz - oz * dy
                tri_sc[5] = oz * dx - ox * dz
                tri_sc[6] = ox * dy - oy * dx

                box_hits = [slab(box_ref, b)[0] & active
                            for b in range(n_boxes)]
                top_any = jnp.max(sum(bh.astype(jnp.int32)
                                      for bh in box_hits))

                @pl.when(top_any > 0)
                def _mesh():
                    ones_row = jnp.ones((1, SUBL), jnp.float32)
                    zeros_rows = jnp.zeros((6, SUBL), jnp.float32)
                    for ci in range(n_chunks):
                        cl_hit, cl_lo = slab(aabb_ref, ci)
                        # entry-t culling: a cluster whose AABB entry lies
                        # beyond the closest sphere hit (or the running
                        # triangle best) cannot win — for the reference
                        # scene this skips the car for every ray that hits
                        # the ground sphere first.  Conservative: cl_lo <=
                        # any contained triangle t.
                        m_c = (cl_hit & box_hits[chunk_box_ids[ci]]
                               & (cl_lo < jnp.minimum(best_t, tri_sc[0])))
                        # per-lane gate staged through scratch for the
                        # row loop's dynamic slicing
                        tri_sc[7] = m_c.astype(jnp.float32)
                        s_c = jnp.max(m_c.astype(jnp.int32))

                        @pl.when(s_c > 0)
                        def _chunk(ci=ci, m_c=m_c):
                            if sub_gates:
                                # refined FIRE gate: k sub-AABBs per
                                # chunk (BVH-ordered runs); a ray that
                                # enters the coarse chunk box but misses
                                # every sub-box cannot hit a triangle,
                                # so its lane drops out of the row gate
                                # before any matmul fires.  Cost: k slab
                                # tests, paid only for chunks that
                                # passed the coarse gate.
                                lim = jnp.minimum(best_t, tri_sc[0])
                                m_s = None
                                for kk in range(sub_gates):
                                    sh_, sl_ = slab(
                                        sub_ref, ci * sub_gates + kk)
                                    mk = sh_ & (sl_ < lim)
                                    m_s = mk if m_s is None else (m_s | mk)
                                tri_sc[7] = (m_c & m_s).astype(
                                    jnp.float32)
                            if count_fires:
                                m_cf = m_c.astype(jnp.float32)
                                fired = jnp.float32(0.0)
                                for r0 in range(N_SUB):
                                    fired = fired + jnp.where(
                                        jnp.max(m_cf[r0]) > 0.0, 1.0, 0.0)
                                cnt_sc[1] = cnt_sc[1] + fired
                                cnt_sc[3] = cnt_sc[3] + 1.0
                            w = w_ref[:, ci * c4:(ci + 1) * c4]
                            n_cols = w_ref[6:9,
                                           ci * c4 + 3 * chunk:
                                           ci * c4 + 4 * chunk]

                            def _intersect_row(r1):
                                f = jnp.concatenate([
                                    st[S_DX, r1, :], st[S_DY, r1, :],
                                    st[S_DZ, r1, :],
                                    tri_sc[4, r1, :], tri_sc[5, r1, :],
                                    tri_sc[6, r1, :],
                                    st[S_OX, r1, :], st[S_OY, r1, :],
                                    st[S_OZ, r1, :],
                                    ones_row, zeros_rows], axis=0)
                                # (16,4C)^T-contract-(16,128) -> (4C,128):
                                # triangles on sublanes, pixels on lanes.
                                prod = jax.lax.dot_general(
                                    w, f, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                                aa = prod[0 * chunk:1 * chunk, :]
                                u_num = prod[1 * chunk:2 * chunk, :]
                                v_num = prod[2 * chunk:3 * chunk, :]
                                t_num = prod[3 * chunk:4 * chunk, :]
                                # Division-free scaled Moller-Trumbore:
                                # with s = sign(a), u = u_num/a in [0,1]
                                # <=> 0 <= u_num*s <= |a| etc.  The
                                # barycentric window folds to one min-
                                # ladder (u<=|a| is implied by v>=0 and
                                # u+v<=|a|), and the candidate test also
                                # demands t < running-best (t_num*s <
                                # old*|a|, still division-free) — the
                                # whole winner extraction (reciprocals,
                                # argmin, one-hot normal matmul) then
                                # hides behind a per-row "any candidate
                                # improves" gate, the common case being
                                # a tested chunk with no improvement.
                                sgn_a = jnp.sign(aa)
                                abs_a = aa * sgn_a
                                us = u_num * sgn_a
                                vs = v_num * sgn_a
                                ts = t_num * sgn_a
                                gate = tri_sc[7, r1, :] > 0.0
                                old = tri_sc[0, r1, :]
                                m3 = jnp.minimum(jnp.minimum(us, vs),
                                                 abs_a - (us + vs))
                                imp = ((abs_a >= 1e-5)          # TRI_EPS
                                       & (m3 >= 0.0)
                                       & (ts > t_min * abs_a)
                                       & (ts < old * abs_a)
                                       & gate)
                                any_imp = jnp.max(imp.astype(jnp.int32))

                                if count_fires:
                                    cnt_sc[4] = cnt_sc[4] + jnp.where(
                                        any_imp > 0, 1.0, 0.0)

                                @pl.when(any_imp > 0)
                                def _extract():
                                    ra = pl.reciprocal(
                                        jnp.maximum(abs_a, 1e-30),
                                        approx=True)
                                    # one Newton step: ~2^-24 relative, so
                                    # the in-chunk argmin ordering matches
                                    # the exact-divide fold
                                    ra = ra * (2.0 - abs_a * ra)
                                    tt = jnp.where(imp, ts * ra, BIG)
                                    ct_a = jnp.min(tt, axis=0,
                                                   keepdims=True)
                                    ai = jnp.argmin(tt, axis=0)
                                    oh = (jax.lax.broadcasted_iota(
                                        jnp.int32, (chunk, SUBL), 0)
                                        == ai[None, :]).astype(jnp.float32)
                                    # winner rows: [nx, ny, nz] via the
                                    # weight table + exact t via Newton-
                                    # refined reciprocal
                                    nrm = jax.lax.dot_general(
                                        n_cols, oh, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                                    ts_w = jnp.sum(ts * oh, axis=0,
                                                   keepdims=True)
                                    aa_w = jnp.sum(abs_a * oh, axis=0,
                                                   keepdims=True)
                                    ra_w = pl.reciprocal(
                                        jnp.maximum(aa_w, 1e-30),
                                        approx=True)
                                    ra_w = ra_w * (2.0 - aa_w * ra_w)
                                    ra_w = ra_w * (2.0 - aa_w * ra_w)
                                    ct = jnp.where(ct_a < BIG, ts_w * ra_w,
                                                   BIG)
                                    upd = ct < old
                                    tri_sc[0, r1, :] = jnp.where(upd, ct,
                                                                 old)
                                    tri_sc[1, r1, :] = jnp.where(
                                        upd, nrm[0:1, :], tri_sc[1, r1, :])
                                    tri_sc[2, r1, :] = jnp.where(
                                        upd, nrm[1:2, :], tri_sc[2, r1, :])
                                    tri_sc[3, r1, :] = jnp.where(
                                        upd, nrm[2:3, :], tri_sc[3, r1, :])
                                return 0

                            # One matmul per STORAGE row (SUB pixel rows,
                            # SUBL lanes): the matmul is latency-bound at
                            # K=16, so batching rows is ~free (see SUB).
                            def row(r, _):
                                if ROW_GATED:
                                    row_any = jnp.max(tri_sc[7,
                                                             pl.ds(r, 1), :])

                                    @pl.when(row_any > 0.0)
                                    def _row_body():
                                        _intersect_row(pl.ds(r, 1))
                                else:
                                    _intersect_row(pl.ds(r, 1))
                                return 0

                            jax.lax.fori_loop(0, N_SUB, row, 0)

            tri_t = tri_sc[0]
            tri_win = tri_t < best_t
            best_t = jnp.where(tri_win, tri_t, best_t)
            hit = best_t < BIG
            t_safe = jnp.where(hit, best_t, 1.0)
            hx = ox + t_safe * dx
            hy = oy + t_safe * dy
            hz = oz + t_safe * dz

            # sphere outward normal
            inv_r = gather(F_INVR, 1.0)
            nx = (hx - gather(F_CX)) * inv_r
            ny = (hy - gather(F_CY)) * inv_r
            nz = (hz - gather(F_CZ)) * inv_r
            if n_chunks > 0:
                # triangle outward normal (normalize the raw cross product)
                tnx = tri_sc[1]
                tny = tri_sc[2]
                tnz = tri_sc[3]
                tinv = jax.lax.rsqrt(jnp.maximum(
                    _dot3(tnx, tny, tnz, tnx, tny, tnz), 1e-30))
                nx = jnp.where(tri_win, tnx * tinv, nx)
                ny = jnp.where(tri_win, tny * tinv, ny)
                nz = jnp.where(tri_win, tnz * tinv, nz)

            # merged material params (mesh material is uniform scalars)
            alr = gather(F_ALR)
            alg = gather(F_ALG)
            alb = gather(F_ALB)
            mtype = gather(F_TYPE)
            if n_chunks > 0:
                alr = jnp.where(tri_win, cam(C_MA_R), alr)
                alg = jnp.where(tri_win, cam(C_MA_G), alg)
                alb = jnp.where(tri_win, cam(C_MA_B), alb)
                mtype = jnp.where(tri_win, float(mesh_mtype), mtype)

            front = _dot3(dx, dy, dz, nx, ny, nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            nx = nx * sgn
            ny = ny * sgn
            nz = nz * sgn

            # ---- RNG for this bounce ----
            slot = (jnp.zeros_like(pix_u) + _U32(4)
                    + depth_f.astype(jnp.int32).astype(_U32) * _U32(2))
            a0, a1, a2, a3 = _uniform4(seed_arr, pix_u, s_u, slot)
            if has_fuzz or has_diel:
                b0, b1, _, _ = _uniform4(seed_arr, pix_u, s_u,
                                         slot + _U32(1))

            # ---- scatter (shared scatter_block; mesh lanes take the
            # uniform mesh material from the camera-table scalars) ----
            if not (has_fuzz or has_diel):
                b0 = b1 = None

            def _merge(field_getter, cam_slot):
                v = field_getter()
                if n_chunks > 0:
                    v = jnp.where(tri_win, cam(cam_slot), v)
                return v

            (new_dx, new_dy, new_dz, at_r, at_g, at_b,
             absorbed) = scatter_block(
                shape, dx, dy, dz, inv_len, nx, ny, nz, front,
                alr, alg, alb, mtype,
                lambda: _merge(lambda: gather(F_FUZZ), C_M_FUZZ),
                lambda: _merge(lambda: gather(F_IOR), C_M_IOR),
                lambda: _merge(lambda: gather(F_INVIOR, 1.0), C_M_INVIOR),
                a0, a1, a2, a3, b0, b1,
                has_metal, has_diel, has_fuzz)

            # ---- termination events ----
            miss_now = active & ~hit
            if has_emit:
                is_emit = mtype == float(mat.EMISSIVE)
                emit_now = active & hit & is_emit
            else:
                is_emit = jnp.zeros(shape, bool)
                emit_now = jnp.zeros(shape, bool)
            would_cont = active & hit & ~is_emit & ~absorbed
            exhaust_now = would_cont & (depth_f + 1.0 >= float(max_depth))
            cont = would_cont & ~exhaust_now
            term = active & ~cont

            if sky_kind == KIND_GRADIENT:
                tsky = 0.5 * (dy * inv_len + 1.0)
                sk_r = (1.0 - tsky) + tsky * 0.5
                sk_g = (1.0 - tsky) + tsky * 0.7
                sk_b = (1.0 - tsky) + tsky * 1.0
            elif sky_kind == KIND_CONST:
                sk_r = cam(C_SKY0) + zero
                sk_g = cam(C_SKY1) + zero
                sk_b = cam(C_SKY2) + zero

            if hdr:
                # misses: record (throughput, direction) for the epilogue;
                # in-kernel radiance contribution is emissive-only.
                for s in range(spp):
                    sel = miss_now & (sample_f == float(s))
                    rec[6 * s + 0] = jnp.where(sel, tr, rec[6 * s + 0])
                    rec[6 * s + 1] = jnp.where(sel, tg, rec[6 * s + 1])
                    rec[6 * s + 2] = jnp.where(sel, tb, rec[6 * s + 2])
                    rec[6 * s + 3] = jnp.where(sel, dx, rec[6 * s + 3])
                    rec[6 * s + 4] = jnp.where(sel, dy, rec[6 * s + 4])
                    rec[6 * s + 5] = jnp.where(sel, dz, rec[6 * s + 5])
                c_r = jnp.where(emit_now, tr * alr, zero)
                c_g = jnp.where(emit_now, tg * alg, zero)
                c_b = jnp.where(emit_now, tb * alb, zero)
            else:
                c_r = jnp.where(miss_now, tr * sk_r,
                                jnp.where(emit_now, tr * alr, zero))
                c_g = jnp.where(miss_now, tg * sk_g,
                                jnp.where(emit_now, tg * alg, zero))
                c_b = jnp.where(miss_now, tb * sk_b,
                                jnp.where(emit_now, tb * alb, zero))

            if clamp_samples:
                c_r = jnp.clip(c_r, 0.0, 1.0)
                c_g = jnp.clip(c_g, 0.0, 1.0)
                c_b = jnp.clip(c_b, 0.0, 1.0)
            if nan_policy == "running_sum":
                c_r = jnp.where(jnp.isnan(c_r), acc[0], c_r)
                c_g = jnp.where(jnp.isnan(c_g), acc[1], c_g)
                c_b = jnp.where(jnp.isnan(c_b), acc[2], c_b)
            else:
                c_r = jnp.where(jnp.isnan(c_r), 0.0, c_r)
                c_g = jnp.where(jnp.isnan(c_g), 0.0, c_g)
                c_b = jnp.where(jnp.isnan(c_b), 0.0, c_b)
            acc[0] = acc[0] + jnp.where(term, c_r, 0.0)
            acc[1] = acc[1] + jnp.where(term, c_g, 0.0)
            acc[2] = acc[2] + jnp.where(term, c_b, 0.0)

            # ---- path regeneration ----
            new_sample = jnp.where(term, sample_f + 1.0, sample_f)
            regen = term & (new_sample < spp_f)
            cox, coy, coz, cdx, cdy, cdz = camera_ray(new_sample)

            st[S_SAMPLE] = new_sample
            st[S_DEPTH] = jnp.where(regen, 0.0,
                                    jnp.where(cont, depth_f + 1.0,
                                              depth_f))
            st[S_OX] = jnp.where(regen, cox, jnp.where(cont, hx, ox))
            st[S_OY] = jnp.where(regen, coy, jnp.where(cont, hy, oy))
            st[S_OZ] = jnp.where(regen, coz, jnp.where(cont, hz, oz))
            st[S_DX] = jnp.where(regen, cdx, jnp.where(cont, new_dx, dx))
            st[S_DY] = jnp.where(regen, cdy, jnp.where(cont, new_dy, dy))
            st[S_DZ] = jnp.where(regen, cdz, jnp.where(cont, new_dz, dz))
            st[S_TR] = jnp.where(regen, 1.0,
                                 jnp.where(cont, tr * at_r, tr))
            st[S_TG] = jnp.where(regen, 1.0,
                                 jnp.where(cont, tg * at_g, tg))
            st[S_TB] = jnp.where(regen, 1.0,
                                 jnp.where(cont, tb * at_b, tb))
            return (it + 1, jnp.any(new_sample < spp_f))

        jax.lax.while_loop(cond, body, (jnp.int32(0), True))

        # radiance SUM (the wrapper divides by the full spp)
        r_ref[:] = acc[0]
        g_ref[:] = acc[1]
        b_ref[:] = acc[2]
        if count_fires:
            # whole-array SMEM output: index by grid position
            ci0 = pl.program_id(0)
            cj0 = pl.program_id(1) * 6 if not continuation else 0
            for k0 in range(6):
                cnt_ref[ci0, cj0 + k0] = cnt_sc[k0]
        if emit_state:
            sout[0] = jnp.where(valid, lin.astype(jnp.float32), -1.0)
            sout[1] = st[S_OX]
            sout[2] = st[S_OY]
            sout[3] = st[S_OZ]
            sout[4] = st[S_DX]
            sout[5] = st[S_DY]
            sout[6] = st[S_DZ]
            sout[7] = st[S_TR]
            sout[8] = st[S_TG]
            sout[9] = st[S_TB]
            sout[10] = st[S_SAMPLE]
            sout[11] = st[S_DEPTH]

    return kernel


def _mesh_uniform_material(scene: Scene):
    """(albedo(3,), fuzz, ior, mat_type) if the mesh material is uniform
    (concrete scene), else None.  Reference: fixed material per mesh
    (utility.cpp:99-170, main.cpp:127)."""
    tris = scene.triangles
    if tris.count == 0:
        return ((0.0, 0.0, 0.0), 0.0, 0.0, 0)
    al = np.asarray(tris.albedo)
    fz = np.asarray(tris.fuzz)
    io = np.asarray(tris.ior)
    ty = np.asarray(tris.mat_type)
    if not ((al == al[0]).all() and (fz == fz[0]).all()
            and (io == io[0]).all() and (ty == ty[0]).all()):
        return None
    return (tuple(float(x) for x in al[0]), float(fz[0]), float(io[0]),
            int(ty[0]))


def supports_mesh(scene: Scene, cfg: RenderConfig) -> bool:
    """True when the fused mesh/HDR megakernel covers this scene/config.

    Conditions: <=128 spheres; triangles (if any) carry one uniform
    material and at least one gating box; HDR skies must be tone-mapped
    (max < 1) and all albedos <= 1 so the per-sample clamp is a no-op for
    deferred sky contributions (see module docstring).  Sphere-only
    gradient/const-sky scenes are covered from SPHERE_CHUNK_MIN spheres up
    (chunked gated fold + 2-D tiles + multi-round compaction beat the
    megakernel there; render() dispatches here first) — and at ANY sphere
    count once cfg.spp >= HIGH_SPP_MIN, where the high-spp compaction
    ladder beats the megakernel even for tiny scenes.
    """
    if scene.spheres.count > 128:
        return False
    if (scene.triangles.count == 0 and scene.sky.kind != KIND_HDR
            and scene.spheres.count < SPHERE_CHUNK_MIN
            and cfg.spp < HIGH_SPP_MIN):
        return False      # small sphere scenes at low spp use
        # kernels/megakernel.py; at spp >= 64 the multi-round tail
        # compaction wins even for tiny sphere counts (README 250spp/d50
        # measured: megakernel 0.280 s -> 0.228 s here)
    if scene.triangles.count > 0:
        if scene.boxes.count < 1:
            return False
        if _mesh_uniform_material(scene) is None:
            return False
    if scene.sky.kind == KIND_HDR:
        if float(np.max(np.asarray(scene.sky.image))) > 1.0:
            return False
        if scene.spheres.count and \
                float(np.max(np.asarray(scene.spheres.albedo))) > 1.0:
            return False
        if scene.triangles.count and \
                float(np.max(np.asarray(scene.triangles.albedo))) > 1.0:
            return False
    elif scene.sky.kind not in (KIND_GRADIENT, KIND_CONST):
        return False
    return True


def specialize_mesh_flags(scene: Scene, conservative: bool = False):
    """Static specialization for the fused kernel (concrete scene only).

    conservative = value-independent flags (see
    megakernel.specialize_flags): fuzz/aperture paths compiled
    unconditionally, fold-spec masks cover every relevant sphere — one
    compilation stays correct as fitted float parameters drift."""
    types = np.asarray(scene.spheres.mat_type)
    fuzz = np.asarray(scene.spheres.fuzz)
    aperture = float(np.asarray(scene.camera.aperture_deg))
    m = _mesh_uniform_material(scene)
    assert m is not None, "megamesh: mesh material must be uniform"
    _, m_fuzz, _, m_type = m
    has_metal = bool((types == mat.METAL).any()) or m_type == mat.METAL
    has_diel = (bool((types == mat.DIELECTRIC).any())
                or m_type == mat.DIELECTRIC)
    has_emit = (bool((types == mat.EMISSIVE).any())
                or m_type == mat.EMISSIVE)
    if conservative:
        has_fuzz = has_metal
        has_aperture = True
    else:
        s_fuzz = bool((fuzz[types == mat.METAL] > 0).any()) \
            if (types == mat.METAL).any() else False
        has_fuzz = s_fuzz or (m_type == mat.METAL and m_fuzz > 0)
        has_aperture = aperture > 0.0
    sph_plan = None
    if scene.spheres.count >= SPHERE_GATE_MIN:
        sph_plan = sphere_chunk_plan(scene, SPHERE_CHUNK_SIZE)
    perm = sph_plan[0] if sph_plan is not None else None
    spec = (_sphere_fold_spec(scene, perm, conservative=conservative)
            if scene.spheres.count > 0 else None)
    return (has_metal, has_diel, has_emit, has_fuzz, has_aperture,
            m_type, spec, sph_plan)


def _mesh_camera_table(scene: Scene):
    """Camera table + uniform mesh material slots.  Traced-safe: material
    uniformity was checked concretely in supports_mesh, so slot values come
    from the first triangle's (possibly traced) fields."""
    base = _camera_table(scene)                  # (1, 128)
    tris = scene.triangles
    if tris.count == 0:
        return base
    vals = jnp.stack([
        tris.albedo[0, 0], tris.albedo[0, 1], tris.albedo[0, 2],
        tris.fuzz[0], tris.ior[0],
        1.0 / jnp.maximum(tris.ior[0], 1e-8)]).astype(jnp.float32)
    return base.at[0, C_MA_R:C_MA_R + 6].set(vals)


def _mesh_tables(scene: Scene, plan):
    """Traced tables: weight matrix (16, n_chunks*4C), cluster AABBs
    (n_chunks, 6), top boxes (n_boxes, 6)."""
    if plan is None or plan.n_chunks == 0:
        w_flat = jnp.zeros((16, 4 * MESH_CHUNK), jnp.float32)
        aabb = jnp.zeros((1, 6), jnp.float32)
        n_chunks = 0
        chunk = MESH_CHUNK
        bids = ()
    else:
        feats = ma.build_tri_features(scene, plan.chunk, plan=plan)
        w = jnp.pad(feats.weights, ((0, 0), (0, 16 - feats.weights.shape[1]),
                                    (0, 0)))
        n_chunks = feats.n_chunks
        chunk = feats.chunk
        w_flat = w.transpose(1, 0, 2).reshape(16, n_chunks * 4 * chunk)
        aabb = jnp.concatenate([feats.cluster_min, feats.cluster_max],
                               axis=1)
        bids = feats.chunk_box_id
    if scene.boxes.count > 0:
        boxes = jnp.concatenate([scene.boxes.box_min, scene.boxes.box_max],
                                axis=1)
    else:
        boxes = jnp.zeros((1, 6), jnp.float32)
    return w_flat, aabb, boxes, n_chunks, chunk, bids


def render_pallas_mesh(scene: Scene, cfg: RenderConfig, seed: int = 0,
                       interpret: bool = False, rows: int | None = None,
                       pix_offset=0, schedule: tuple | None = None,
                       sample_offset=0, mean: bool = True, acc0=None):
    """Forward render via the fused mesh/HDR megakernel.

    Same contract as megakernel.render_pallas: ((rows or H), W, 3) f32 mean
    radiance, RNG/estimator semantics matching the jnp tracer.

    schedule overrides the multi-round compaction ladder (static tuple of
    (iter_cap, capacity_denominator); see _round_schedule).  If any round's
    survivors exceed the next round's capacity (ok=False — capacities
    carry ~2x margins, so essentially never), the render falls back to a
    single uncapped full-grid round, which is always sound.

    sample_offset/mean/acc0: global sample window + raw-sum output seeded
    with acc0 — kernel-rate checkpoint/resume (parallel/checkpoint.py).
    Window sums equal the monolithic render's up to fp addition order
    (the compaction ladder already accumulates out of sample order; the
    running-sum NaN policy keeps its per-dispatch scope either way).
    """
    assert supports_mesh(scene, cfg), "megamesh: unsupported scene"
    from ..tracer.clusters import plan_for_scene
    plan = plan_for_scene(scene, MESH_CHUNK)
    flags = specialize_mesh_flags(scene)
    rows = rows if rows is not None else cfg.height
    img, ok = _render_mesh_jit(scene, cfg, jnp.int32(seed), interpret,
                               flags, plan, rows, jnp.int32(pix_offset),
                               schedule, True,
                               sample_offset=jnp.int32(sample_offset),
                               mean=mean, acc0=acc0)
    if not bool(ok):
        import warnings
        warnings.warn(
            "megamesh: a compaction round overflowed its capacity for "
            f"this scene/config (spp={cfg.spp}, depth={cfg.max_depth}); "
            "re-rendering in one uncapped round (~2x cost).  The ladder "
            "margins (_round_schedule) may need widening for this "
            "scene's survival curve.")
        img, _ = _render_mesh_jit(
            scene, cfg, jnp.int32(seed), interpret, flags, plan, rows,
            jnp.int32(pix_offset),
            ((cfg.spp * cfg.max_depth + 1, 1),), True,
            sample_offset=jnp.int32(sample_offset), mean=mean, acc0=acc0)
    return img


def render_pallas_mesh_inner(scene: Scene, cfg: RenderConfig, seed,
                             interpret, flags, plan, rows, pix_offset,
                             schedule=None, return_ok=False,
                             count_fires=False, sample_offset=0,
                             mean: bool = True, acc0=None):
    """Trace-safe fused-kernel call (flags/plan precomputed concretely).

    pix_offset must be a whole-row offset (a multiple of width) — the
    sharded entry point passes row-block offsets.  return_ok adds the
    compaction-capacity soundness flag to the return value.
    count_fires (instrumentation; used by benchmarks/profile sweeps)
    OVERRIDES return_ok and always returns the 3-tuple
    ``(img, ok, fire_rounds)`` where fire_rounds is a list of per-round
    ``(tiles, 6)`` int32 counter dumps (fired-chunk / iteration tallies).
    sample_offset/mean/acc0: sample-window raw-sum checkpoint mode
    (render_pallas_mesh).
    """
    (has_metal, has_diel, has_emit, has_fuzz, has_aperture, m_type,
     sph_spec, sph_plan) = flags
    hdr = scene.sky.kind == KIND_HDR
    n_tr = -(-rows // TILE_ROWS)
    n_tc = -(-cfg.width // LANES)
    hp, wp = n_tr * TILE_ROWS, n_tc * LANES
    w_flat, aabb, boxes, n_chunks, chunk, bids = _mesh_tables(scene, plan)
    sub_tab = None
    if n_chunks > 0 and MESH_SUB_GATES:
        from ..tracer.clusters import permute, subcluster_bounds
        tr = scene.triangles
        sub_tab = subcluster_bounds(
            permute(tr.p0, plan), permute(tr.p1, plan),
            permute(tr.p2, plan), plan, MESH_SUB_GATES)
    n_boxes = max(1, scene.boxes.count)
    cam_tab = _mesh_camera_table(scene)
    sph_tab = _sphere_table(scene,
                            sph_plan[0] if sph_plan is not None else None)
    row_offset = pix_offset // cfg.width

    acc = jnp.zeros((3, hp, wp), jnp.float32)
    if acc0 is not None:
        a0 = jnp.asarray(acc0, jnp.float32).reshape(rows, cfg.width, 3)
        acc = acc.at[:, :rows, :cfg.width].set(a0.transpose(2, 0, 1))
    sky_sum = jnp.zeros((hp, wp, 3), jnp.float32)
    spp_step = HDR_SPP_CHUNK if hdr else cfg.spp
    ok = jnp.bool_(True)
    fire_rounds = []

    def sky_of_records(recs, spp_c):
        # sum_s throughput_s * sky(direction_s) with XLA's native gathers
        # (exact: clamp is a no-op, see module docstring)
        rec = recs.reshape(spp_c, 6, -1)
        thr = rec[:, 0:3].transpose(0, 2, 1)             # (spp, L, 3)
        dirs = rec[:, 3:6].transpose(0, 2, 1)
        sky = sky_colour(scene.sky, dirs)
        return jnp.sum(thr * sky, axis=0)                # (L, 3)

    def delane3(r, g, b):
        return _delane(jnp.stack([r, g, b]), n_tr, n_tc)

    for s_base in range(0, cfg.spp, spp_step):
        spp_c = min(spp_step, cfg.spp - s_base)
        bound = spp_c * cfg.max_depth + 1
        if schedule is not None:
            sched = schedule
        elif (n_chunks > 0 or scene.spheres.count >= SPHERE_CHUNK_MIN
              or spp_c >= HIGH_SPP_MIN):
            sched = _round_schedule(spp_c, cfg.max_depth)
        else:
            sched = ((bound, 1),)
        state2 = None
        out = None
        for ri, (cap, denom) in enumerate(sched):
            last = ri == len(sched) - 1
            if ri > 0:
                si = -2 if count_fires else -1
                state_flat = out[si].reshape(N_CONT, -1)
                n2 = _round_capacity(hp * wp, state_flat.shape[1], denom)
                state2, ok_r = _compact_state(state_flat, spp_c, n2)
                ok = jnp.logical_and(ok, ok_r)
            out = list(_dispatch(
                scene, cfg, seed, interpret, flags, rows, row_offset,
                jnp.int32(sample_offset) + s_base, spp_c, n_tr, n_tc,
                w_flat, aabb, boxes, n_chunks,
                chunk, bids, n_boxes, cam_tab, sph_tab, hdr,
                iter_cap=min(cap, bound), emit_state=not last,
                state_in=state2, count_fires=count_fires,
                sub_tab=sub_tab))
            if count_fires:
                # raw per-tile (iterations, fired rows, alive lane-iters,
                # fired chunks, improving rows, spare) — callers aggregate
                fire_rounds.append(out[-1].reshape(-1, 6))
            r, g, b = out[:3]
            recs = out[3] if hdr else None
            if ri == 0:
                acc = acc + delane3(r, g, b)
                if hdr:
                    sky_l = sky_of_records(recs, spp_c)   # lane order
                    sky_img = _delane(
                        sky_l.reshape(n_tr * N_SUB, n_tc * SUBL, 3)
                        .transpose(2, 0, 1), n_tr, n_tc)
                    sky_sum = sky_sum + sky_img.transpose(1, 2, 0)
            else:
                # scatter the packed round's contributions back by pixel id
                pix2 = state2[0].reshape(-1).astype(jnp.int32)
                ok2 = pix2 >= 0
                pix_s = jnp.maximum(pix2, 0)
                y2 = jnp.clip(pix_s // cfg.width - row_offset, 0, hp - 1)
                x2 = jnp.clip(pix_s % cfg.width, 0, wp - 1)
                okf = ok2.astype(jnp.float32)
                if hdr:
                    sky2 = sky_of_records(recs, spp_c) * okf[:, None]
                    sky_sum = sky_sum.at[y2, x2].add(sky2)
                lane_rgb = jnp.stack([r.reshape(-1), g.reshape(-1),
                                      b.reshape(-1)],
                                     axis=-1) * okf[:, None]
                acc = acc.transpose(1, 2, 0).at[y2, x2].add(
                    lane_rgb).transpose(2, 0, 1)

    img = acc.transpose(1, 2, 0)
    if hdr:
        img = img + sky_sum
    if mean:
        img = img * jnp.float32(1.0 / cfg.spp)
    img = img[:rows, :cfg.width]
    if count_fires:
        return img, ok, fire_rounds
    return (img, ok) if return_ok else img


def _dispatch(scene, cfg, seed, interpret, flags, rows, row_offset,
              s_base, spp_c, n_tr, n_tc, w_flat, aabb, boxes, n_chunks,
              chunk, bids, n_boxes, cam_tab, sph_tab, hdr,
              iter_cap=None, emit_state=False, state_in=None,
              count_fires=False, sub_tab=None):
    (has_metal, has_diel, has_emit, has_fuzz, has_aperture, m_type,
     sph_spec, sph_plan) = flags
    sub_gates = (MESH_SUB_GATES
                 if sub_tab is not None and n_chunks > 0 else 0)
    sph_chunks = sph_plan[1] if sph_plan is not None else None
    if sph_plan is not None:
        sph_box = _sphere_group_aabbs(
            scene, sph_plan[0],
            tuple(tuple(range(a, b)) for a, b in sph_chunks))
    else:
        sph_box = jnp.zeros((1, 6), jnp.float32)
    continuation = state_in is not None
    kernel = _make_kernel(
        n_spheres=scene.spheres.count, width=cfg.width, height=cfg.height,
        spp=spp_c, max_depth=cfg.max_depth, t_min=cfg.t_min,
        sky_kind=scene.sky.kind, clamp_samples=cfg.clamp_samples,
        nan_policy=cfg.nan_policy, has_metal=has_metal, has_diel=has_diel,
        has_emit=has_emit, has_fuzz=has_fuzz, has_aperture=has_aperture,
        n_chunks=n_chunks, chunk=chunk, chunk_box_ids=bids,
        n_boxes=n_boxes, mesh_mtype=m_type, continuation=continuation,
        iter_cap=iter_cap, emit_state=emit_state, sphere_spec=sph_spec,
        sph_chunks=sph_chunks, count_fires=count_fires,
        sub_gates=sub_gates)

    in_specs = [
        pl.BlockSpec((1, 4), lambda *_: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, LANES), lambda *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_FIELDS, LANES), lambda *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, w_flat.shape[1]), lambda *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),   # cluster AABBs
        pl.BlockSpec(memory_space=pltpu.SMEM),   # top boxes
        pl.BlockSpec(memory_space=pltpu.SMEM),   # sphere-chunk AABBs
    ]
    operands = [
        jnp.stack([jnp.int32(row_offset), jnp.int32(seed),
                   jnp.int32(s_base),
                   jnp.int32(row_offset) + jnp.int32(rows)]).reshape(1, 4),
        cam_tab, sph_tab, w_flat, aabb, boxes, sph_box,
    ]
    if sub_gates:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(sub_tab)
    scratch = [
        pltpu.VMEM((N_STATE, N_SUB, SUBL), jnp.float32),
        pltpu.VMEM((3, N_SUB, SUBL), jnp.float32),
        pltpu.VMEM((10, N_SUB, SUBL), jnp.float32),
    ]

    if continuation:
        # packed-lane tiles: 1-D grid over (n_t2 * N_SUB, SUBL)
        lp = state_in.shape[1]
        n_t2 = lp // N_SUB
        grid = (n_t2,)
        in_specs.append(pl.BlockSpec((N_CONT, N_SUB, SUBL),
                                     lambda i: (0, i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(state_in)
        lane_shape = jax.ShapeDtypeStruct((lp, SUBL), jnp.float32)
        out_shape = [lane_shape, lane_shape, lane_shape]
        out_specs = [pl.BlockSpec((N_SUB, SUBL), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
                     for _ in range(3)]
        if hdr:
            out_shape.append(jax.ShapeDtypeStruct(
                (6 * spp_c, lp, SUBL), jnp.float32))
            out_specs.append(pl.BlockSpec((6 * spp_c, N_SUB, SUBL),
                                          lambda i: (0, i, 0),
                                          memory_space=pltpu.VMEM))
        if emit_state:
            out_shape.append(jax.ShapeDtypeStruct(
                (N_CONT, lp, SUBL), jnp.float32))
            out_specs.append(pl.BlockSpec((N_CONT, N_SUB, SUBL),
                                          lambda i: (0, i, 0),
                                          memory_space=pltpu.VMEM))
        if count_fires:
            out_shape.append(jax.ShapeDtypeStruct((n_t2, 6), jnp.float32))
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    else:
        hl, wl = n_tr * N_SUB, n_tc * SUBL
        grid = (n_tr, n_tc)
        tile_shape = jax.ShapeDtypeStruct((hl, wl), jnp.float32)
        out_shape = [tile_shape, tile_shape, tile_shape]
        out_specs = [pl.BlockSpec((N_SUB, SUBL),
                                  lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM)
                     for _ in range(3)]
        if hdr:
            out_shape.append(jax.ShapeDtypeStruct(
                (6 * spp_c, hl, wl), jnp.float32))
            out_specs.append(pl.BlockSpec((6 * spp_c, N_SUB, SUBL),
                                          lambda i, j: (0, i, j),
                                          memory_space=pltpu.VMEM))
        if emit_state:
            out_shape.append(jax.ShapeDtypeStruct(
                (N_CONT, hl, wl), jnp.float32))
            out_specs.append(pl.BlockSpec((N_CONT, N_SUB, SUBL),
                                          lambda i, j: (0, i, j),
                                          memory_space=pltpu.VMEM))
        if count_fires:
            out_shape.append(jax.ShapeDtypeStruct((n_tr, n_tc * 6),
                                                  jnp.float32))
            out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    if count_fires:
        scratch.append(pltpu.SMEM((6,), jnp.float32))

    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)


_render_mesh_jit = functools.partial(jax.jit, static_argnames=(
    "cfg", "interpret", "flags", "plan", "rows", "schedule",
    "return_ok", "count_fires", "mean"))(render_pallas_mesh_inner)


def render_pallas_mesh_safe(scene: Scene, cfg: RenderConfig, seed,
                            interpret, flags, plan, rows, pix_offset,
                            schedule=None):
    """Trace-safe render with a TRACE-SAFE capacity fallback.

    The eager wrapper (:func:`render_pallas_mesh`) re-renders when the
    compaction ok-flag trips, but that requires a concrete flag; under an
    outer jit / shard_map (``parallel/sharded.py``) the flag is a tracer
    and the fallback used to be unreachable — a ladder trip inside a
    jitted training loop would silently drop live paths.  Here the
    fallback is a ``lax.cond`` branch: the ladder runs unconditionally,
    and only when its ok-flag is False does the cond execute a single
    uncapped full-grid round (always sound — capacity is the whole padded
    grid, so nothing can overflow).  Costs one extra dispatch-variant
    compile; runtime cost only on an actual trip.
    """
    img, ok = render_pallas_mesh_inner(
        scene, cfg, seed, interpret, flags, plan, rows, pix_offset,
        schedule=schedule, return_ok=True)
    sched = schedule
    if sched is None:
        # mirror the dispatch-loop default (see render_pallas_mesh_inner)
        spp_c = min(HDR_SPP_CHUNK, cfg.spp) \
            if scene.sky.kind == KIND_HDR else cfg.spp
        sched = _round_schedule(spp_c, cfg.max_depth)
    if len(sched) == 1 and sched[0][1] == 1:
        return img          # already a single full-capacity round: sound

    def _fallback(_):
        img2, _ok2 = render_pallas_mesh_inner(
            scene, cfg, seed, interpret, flags, plan, rows, pix_offset,
            schedule=((cfg.spp * cfg.max_depth + 1, 1),), return_ok=True)
        return img2

    return jax.lax.cond(jnp.reshape(ok, ()), lambda _: img, _fallback,
                        operand=None)
