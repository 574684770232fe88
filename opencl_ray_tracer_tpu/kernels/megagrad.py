"""Pallas TPU backward megakernel: scene gradients at kernel speed.

The forward megakernel (kernels/megakernel.py) renders the README benchmark
scene ~40x faster than the jnp wavefront estimator; until this module, the
*backward* pass (scene-parameter gradients, the BASELINE.json fwd+bwd
metric) still ran through the jnp differentiable wavefront scan
(tracer/wavefront.py), whose XLA-compiled loop body is latency/overhead
bound at ~90M ray-bounces/s (measured; see benchmarks/profile_fwdbwd.py).

This kernel computes the VJP of the path-tracing estimator w.r.t. the
differentiable scene tables directly on-chip:

- **Record ring with path regeneration (both directions wavefront).**  The
  naive per-sample replay+reverse runs each loop to the MAX path length
  across the tile's 2048 lanes — at heavy-tailed depth distributions most
  lanes idle most iterations (measured 5.27 s fwd+bwd vs 0.29 s forward).
  Instead, a fill loop advances EVERY lane one bounce per iteration —
  terminated lanes immediately regenerate their next sample, exactly like
  the forward megakernel (the counter RNG makes the draws identical) —
  writing one record (o, d, T, sample, depth) per slot into a VMEM ring
  (~6 MB for a (16, 128) tile x 64 slots).  When the ring is full it is
  unwound in reverse; then the next round refills it.  Paths still
  mid-flight at the ring boundary are ABANDONED (their partial records
  yield exactly zero adjoint — see below) and recomputed from their camera
  ray next round: expected waste = E[path length]/N_SLOTS, a few percent.
- **Per-path adjoint isolation falls out of the reverse walk.**  Walking
  slots top-down, a record's bounce is re-linearized and its VJP applied
  with the lane's running state adjoint plus the pixel cotangent on the
  contribution output.  The contribution is nonzero ONLY at a path's
  terminal bounce, so terminal records self-seed through the
  ``where(term, ...)`` transpose; at a ``depth == 0`` record the camera
  VJP is chained and the lane's adjoint zeroed, so the record below (the
  PREVIOUS path's terminal bounce) starts from a clean adjoint.  Abandoned
  partial chains end in a non-terminal record entered with a zero adjoint,
  so they propagate exactly zero.
- **Reverse sweep with trace-time autodiff.**  The adjoint walks bounces
  backward; each step calls ``jax.vjp`` *at trace time* on the pure
  single-bounce function (sphere fold + shared ``scatter_block`` +
  terminal contribution with the clamp/NaN estimator quirks), so Mosaic
  compiles exact hand-free adjoint code.  The interior-derivative
  convention (gradients flow through the argmin-selected branch only)
  falls out of the ``jnp.where`` folds, matching the jnp tracer's VJP.
- **Winner-only reverse bounce.**  Differentiating the full intersection
  argmin loop leaves O(n_spheres) tile-sized vjp residuals live across
  the reverse step — 100-sphere scenes overflow the 16 MB scoped-VMEM
  limit (measured: 16.23 MB at (32,128) tiles).  The reverse bounce
  (``winner_bounce``) instead runs the argmin on stop_gradient'ed
  inputs, gathers the WINNER's parameters with linear one-hot folds
  (whose transpose produces the per-sphere scalar cotangents), and
  recomputes t from them with the argmin loop's exact expressions —
  bitwise-equal primals, identical gradients, O(1) residuals in the
  sphere count (same idea as tracer/diffhit.py's winner-only hit).
- **Scalar primals, no scatters.**  Mosaic cannot lower scatter-add — the
  transpose of an integer table read — so every camera/sphere table entry
  is read ONCE into a scalar outside the differentiated function and
  passed as a primal; cotangents come back as scalars (the transpose of a
  broadcast is a dense reduce) and are placed into the gradient
  accumulator rows with static iota-select folds.
- **Adjoint seeding is implicit.**  The bounce function returns
  ``c = where(term, contribution, 0)``: terminal lanes receive the pixel
  cotangent through the ``where`` transpose, mid-path lanes pass state
  adjoints through the continuation branch, finished/idle lanes carry
  zeros.  No explicit seeding masks.
- **Table cotangents, chain rule outside.**  The kernel accumulates
  gradients for the (1,128) camera table and (16,128) sphere table (the
  same differentiable builders the forward kernel uses); a one-line
  ``jax.vjp`` of the table builders maps them to the Scene pytree
  (centers, radii, albedos, fuzz, ior, camera fields, const-sky colour).

Semantics: the estimator with ``nan_policy="zero"`` (the order-invariant
policy render_grad_sampled already uses for gradient chunks) and
clamp-before-average exactly as the forward kernels.  Scope =
megakernel.supports() up to GRAD_MAX_SPHERES spheres, gradient/constant
sky.

Round-4 TPU measurements (README 250spp/d50; do not re-learn):
uncapped fill 0.26 s + reverse 0.40 s = 0.66 s, cut to 0.537 s by the
tail-compaction ladder (_grad_tables_laddered — half the uncapped cost
was tiles idling on their slowest lane); of the reverse, the per-slot
scalar-cotangent reduces + gacc folds are ~0.07 s and the camera vjp
~0.02 s (profile_skip flags).  (rows=32, slots=64) beat (32,50),
(16,64), (16,128), (8,256).  Two NEGATIVE results, both measured:
hoisting the gacc select-folds out of the slot loop via scalar fori
carries was SLOWER (0.70 vs 0.66 — ~60 scalar carries serialize), and
per-slot idle gating (pl.when on any-valid-record) was slower at EVERY
spp (250spp: 0.80; spp=8: 0.094 vs 0.088 — the branch+reduce breaks
the slot-loop pipelining even when 2/3 of the slots are idle).

Reference parity: this is the backward of ``pixel_colour``
(gpu_kernel.cl:595-648) — a capability the reference does not have.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene import Scene
from ..scene import materials as mat
from ..scene.sky import KIND_CONST, KIND_GRADIENT, KIND_HDR
from .megakernel import (BIG, LANES, N_FIELDS, TWO_PI, _U32, _camera_table,
                         _dot3, _sphere_table, _uniform4, scatter_block,
                         specialize_flags, supports,
                         F_CX, F_CY, F_CZ, F_ALR, F_ALG, F_ALB, F_FUZZ,
                         F_IOR, F_TYPE, F_R2, F_INVR, F_INVIOR,
                         C_OX, C_OY, C_OZ, C_HX, C_HY, C_HZ, C_VX, C_VY,
                         C_VZ, C_LX, C_LY, C_LZ, C_DUX, C_DUY, C_DUZ,
                         C_DVX, C_DVY, C_DVZ, C_SKY0, C_SKY1, C_SKY2)

# Smaller tiles than the forward kernel: the record ring is
# N_REC x N_SLOTS x tile and must fit VMEM (~16 MB/core).  Swept on the
# README scene at 250spp/d50: rows=8 1.30 s, 16 1.11 s, 32 1.07 s (the
# ~11.5 MB ring still fits).
TILE_ROWS = 32
TILE = TILE_ROWS * LANES
# ox,oy,oz,dx,dy,dz,tr,tg,tb,sample,depth,winner per record.  The winner
# code (-1 miss, else sphere index; n_spheres = triangle in the mesh
# variant) is stored by the fill so the reverse sweep never re-runs the
# intersection argmin — its winner is bitwise the fill's by construction.
N_REC = 12
(R_OX, R_OY, R_OZ, R_DX, R_DY, R_DZ, R_TR, R_TG, R_TB,
 R_S, R_K, R_WIN) = range(N_REC)
# Ring slots per round.  Must be >= max_depth so a freshly restarted path
# always completes within one round (forward progress); 64 keeps the ring
# under 6 MB at (16, 128) tiles and the abandoned-path waste ~4%.
MIN_SLOTS = 64

# Sphere-count cap of the backward kernel.  Since round 5 the fast-acc
# reverse accumulates per-sphere cotangents with one-hot MXU
# contractions over a multi-lane-group table, so the cap is set by
# trace/unroll size (the intersection and gather folds unroll over
# n_spheres), not by the 128-lane accumulator of the old per-scalar
# path.  256 is tested against the jnp VJP; the forward for > 128
# spheres uses the jnp wavefront (the forward kernels' scope), so only
# the BACKWARD runs at kernel rate there.  Large tables also halve the
# tile (VMEM; see _grad_tables_inner).
GRAD_MAX_SPHERES = 256

# Differentiable sphere-table rows (order = accumulator row order).
DIFF_FIELDS = (F_CX, F_CY, F_CZ, F_R2, F_INVR, F_ALR, F_ALG, F_ALB,
               F_FUZZ, F_IOR, F_INVIOR)
# Differentiable camera-table slots.
CAM_SLOTS = (C_OX, C_OY, C_OZ, C_HX, C_HY, C_HZ, C_VX, C_VY, C_VZ,
             C_LX, C_LY, C_LZ, C_DUX, C_DUY, C_DUZ, C_DVX, C_DVY, C_DVZ,
             C_SKY0, C_SKY1, C_SKY2)

# Adjoint/state scratch rows.  S_S/S_K are f32 counters (exact ints).
(A_OX, A_OY, A_OZ, A_DX, A_DY, A_DZ, A_TR, A_TG, A_TB,   # adjoints
 S_OX, S_OY, S_OZ, S_DX, S_DY, S_DZ, S_TR, S_TG, S_TB,    # fill state
 S_S, S_K) = range(20)
N_ST = 20

# Mesh-variant extra record rows: raw geometric winner normal + hit t +
# winner triangle id in PLAN (chunk-permuted) order, -1 for non-triangle
# records (the winner code itself lives in the base ring's R_WIN row).
# The id keys the reverse sweep's per-triangle plane-cotangent
# accumulation (vertex gradients; see _make_grad_kernel docstring).
N_REC_MESH = N_REC + 5
(R_NX, R_NY, R_NZ, R_T, R_TID) = range(N_REC, N_REC_MESH)
# tri_sc scratch planes: 0 best-t, 1:4 winner raw normal, 4:7 o x d cross
# rows, 7 chunk gate, 8 winner triangle id (plan order, f32 exact int);
# the REVERSE reuses 0..5 for plane-cotangent staging and 6..11 for the
# per-triangle MATERIAL cotangent planes (albedo rgb, fuzz, ior, invior)
N_TRI_SC = 12
# gtri rows: 4 plane cotangents (d_nx, d_ny, d_nz, d_c) + 6 material
# cotangents (d_albedo rgb, d_fuzz, d_ior, d_invior), all in PLAN order
N_GTRI = 10
# Mesh-variant tile height: the ring grows by 5 rows and the MXU weight
# table (~4 MB for the F1 car) must stay resident, so the tile halves
# again vs the sphere kernel.  2-D image tiles (tile_rows x LANES pixels)
# keep the cluster gates firing — a linear tile spans the image width and
# defeats culling (measured on the forward kernel; see megamesh.py).
MESH_TILE_ROWS = 16
# Pixel rows per fill-fold matmul in the mesh variant (megamesh's SUB
# trick; the row group collapses to lanes so N = 8*128): per-fire cost is
# overhead-dominated, so batching rows is ~free while cutting fired
# matmuls ~8x (the F1 grad fill measured 7.6x the forward's cost with
# per-row fires).  Must divide MESH_TILE_ROWS.
MESH_ROW_BATCH = 8


def _make_grad_kernel(n_spheres: int, width: int, height: int,
                      spp: int, max_depth: int, t_min: float,
                      sky_kind: int, clamp_samples: bool,
                      has_metal: bool, has_diel: bool, has_emit: bool,
                      has_fuzz: bool, has_aperture: bool,
                      n_slots: int = MIN_SLOTS,
                      tile_rows: int = TILE_ROWS, mesh=None,
                      hdr_mode=None, fill_only: bool = False,
                      profile_skip: str = "", max_rounds=None,
                      emit_state: bool = False,
                      continuation: bool = False,
                      fast_acc: bool = False):
    """Backward kernel body; all config static.  NaN policy is always
    "zero" (order-invariant; see module docstring).  n_slots = record-ring
    depth (>= max_depth for forward progress).

    mesh = (n_chunks, chunk, chunk_box_ids, n_boxes, m_type) adds the
    triangle scene: the fill loop runs megamesh's chunked MXU
    Moller-Trumbore fold (per-row, cluster-AABB + entry-t gated) and the
    ring stores the winner (code, raw normal, t); the reverse sweep
    recovers a differentiable triangle hit from the stored plane —
    t(o, d) = t_rec + plane(o, d) - sg(plane(o, d)) — so ray/camera/sphere
    cotangents flow through mesh bounces.  Triangle VERTEX gradients: the
    winner's raw normal n and plane constant c = n . v0 are vjp LEAVES of
    the reverse bounce; their per-lane cotangents are accumulated per
    recorded winner id into a (4, T_pad) table by chunk-gated one-hot
    matmuls (scatter-free), then chained through n = (p1-p0) x (p2-p0),
    c = n . p0 outside the kernel (_tri_vertex_cots) — analytically the
    Moller-Trumbore interior derivative.  Mesh material is uniform
    (reference semantics) and read from the extended camera table's
    C_MA_* slots as non-differentiated constants."""
    fi = {f: p for p, f in enumerate(DIFF_FIELDS)}
    ci = {c: p for p, c in enumerate(CAM_SLOTS)}
    if mesh is not None:
        n_chunks, chunk, chunk_box_ids, n_boxes, mesh_mtype = mesh
        c4 = 4 * chunk
    # fast_acc: the reverse sweep passes the WINNER's per-lane parameter
    # planes (stacked array W) as the sphere vjp leaf instead of the
    # table scalars; the transpose then returns cotangent PLANES and the
    # per-sphere reduction is ONE one-hot MXU contraction per slot
    # ((n_wf, tile) . (ns_pad, tile)^T) instead of O(fields x spheres)
    # masked cross-lane scalar reduces — the dominant per-slot cost of
    # the old reverse.  Mathematically identical (the dot computes
    # exactly the sum the where-fold transpose produced), fp-order only.
    w_fields = [F_CX, F_CY, F_CZ, F_R2, F_INVR, F_ALR, F_ALG, F_ALB]
    if has_metal and has_fuzz:
        w_fields.append(F_FUZZ)
    if has_diel:
        w_fields += [F_IOR, F_INVIOR]
    w_fields = tuple(w_fields)
    wmap = {f: p for p, f in enumerate(w_fields)}
    n_wf = len(w_fields)
    # table width: one 128-lane group per 128 spheres; > 128 spheres
    # REQUIRE the fast-acc reverse (the old per-scalar accumulator is a
    # single 128-lane row) and have no mesh variant (supports_mesh caps
    # at 128)
    tab_w = max(LANES, -(-n_spheres // LANES) * LANES)
    ns_pad = (-(-n_spheres // 8) * 8) if n_spheres <= LANES else tab_w
    if n_spheres > LANES:
        assert mesh is None and (fast_acc or hdr_mode == "emit"), \
            "> 128 spheres needs the fast-acc sphere kernel"

    def _intersect(sph_s, ox, oy, oz, dx, dy, dz, a, inv_a):
        """Closest-hit argmin over the sphere table (first-min ties, the
        forward megakernel's semantics).  Returns (best_t, best_i)."""
        shape = ox.shape

        def sv(field, i):
            return sph_s[fi[field]][i]

        best_t = jnp.full(shape, BIG)
        best_i = jnp.zeros(shape, jnp.int32)
        for i in range(n_spheres):
            ocx = ox - sv(F_CX, i)
            ocy = oy - sv(F_CY, i)
            ocz = oz - sv(F_CZ, i)
            half_b = _dot3(ocx, ocy, ocz, dx, dy, dz)
            c_t = (_dot3(ocx, ocy, ocz, ocx, ocy, ocz) - sv(F_R2, i))
            disc = half_b * half_b - a * c_t
            sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
            r0 = (-half_b - sq) * inv_a
            r1 = (-half_b + sq) * inv_a
            ok0 = (disc >= 0.0) & (r0 >= t_min)
            ok1 = (disc >= 0.0) & (r1 >= t_min)
            t_i = jnp.where(ok0, r0, jnp.where(ok1, r1, BIG))
            upd = t_i < best_t
            best_t = jnp.where(upd, t_i, best_t)
            best_i = jnp.where(upd, i, best_i)
        return best_t, best_i

    def shade(cam_s, ox, oy, oz, dx, dy, dz, tr, tg, tb,
              active, term_allowed, a0, a1, a2, a3, b0, b1,
              inv_a, inv_len, hit, best_t,
              scx, scy, scz, inv_r, alr, alg, alb,
              fuzz_fn, ior_fn, invior_fn, mtype, mesh_over=None,
              hdr_sky=None):
        """Hit-point/normal/scatter/contribution given resolved winner
        fields — the differentiable tail shared by the fill bounce (loop
        gathers) and the reverse bounce (winner-only gathers).  Mirrors
        kernels/megakernel.py's body (gpu_kernel.cl:266-348 semantics)
        minus regeneration.

        mesh_over (triangle-winner overrides, mesh variant only):
        (is_tri, t_tri, raw normal x/y/z, albedo r/g/b, fuzz, ior,
        inv_ior, mtype) — per-lane values that replace the sphere-gathered
        fields on lanes whose closest hit is a triangle.  t_tri is the
        caller's (possibly differentiable) triangle hit distance; the
        normal is the stored geometric cross product (constant w.r.t. the
        ray, the interior-derivative convention for flat triangles).
        """
        shape = ox.shape

        def cam(slot):
            return cam_s[ci[slot]]

        zero = jnp.zeros(shape, jnp.float32)
        if mesh_over is not None:
            (is_tri, t_tri, mnx, mny, mnz, m_alr, m_alg, m_alb,
             m_fuzz, m_ior, m_invior, m_mtype) = mesh_over
            best_t = jnp.where(is_tri, t_tri, best_t)
        t_safe = jnp.where(hit, best_t, 1.0)
        hx = ox + t_safe * dx
        hy = oy + t_safe * dy
        hz = oz + t_safe * dz

        nx = (hx - scx) * inv_r
        ny = (hy - scy) * inv_r
        nz = (hz - scz) * inv_r
        if mesh_over is not None:
            tinv = jax.lax.rsqrt(jnp.maximum(
                _dot3(mnx, mny, mnz, mnx, mny, mnz), 1e-30))
            nx = jnp.where(is_tri, mnx * tinv, nx)
            ny = jnp.where(is_tri, mny * tinv, ny)
            nz = jnp.where(is_tri, mnz * tinv, nz)
            alr = jnp.where(is_tri, m_alr, alr)
            alg = jnp.where(is_tri, m_alg, alg)
            alb = jnp.where(is_tri, m_alb, alb)
            mtype = jnp.where(is_tri, m_mtype, mtype)
            s_fuzz, s_ior, s_invior = fuzz_fn, ior_fn, invior_fn
            fuzz_fn = lambda: jnp.where(is_tri, m_fuzz, s_fuzz())
            ior_fn = lambda: jnp.where(is_tri, m_ior, s_ior())
            invior_fn = lambda: jnp.where(is_tri, m_invior, s_invior())
        front = _dot3(dx, dy, dz, nx, ny, nz) < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        nx = nx * sgn
        ny = ny * sgn
        nz = nz * sgn

        (new_dx, new_dy, new_dz, at_r, at_g, at_b,
         absorbed) = scatter_block(
            shape, dx, dy, dz, inv_len, nx, ny, nz, front,
            alr, alg, alb, mtype,
            fuzz_fn, ior_fn, invior_fn,
            a0, a1, a2, a3, b0, b1,
            has_metal, has_diel, has_fuzz)

        miss_now = active & ~hit
        if has_emit:
            is_emit = mtype == float(mat.EMISSIVE)
            emit_now = active & hit & is_emit
        else:
            is_emit = jnp.zeros(shape, bool)
            emit_now = jnp.zeros(shape, bool)
        would_cont = active & hit & ~is_emit & ~absorbed
        exhaust_now = would_cont & ~term_allowed
        cont = would_cont & ~exhaust_now

        if sky_kind == KIND_HDR:
            # nearest-texel equirect lookup (sky.py, gpu_kernel.cl:342-346)
            # has zero direction-derivative, so the per-(pixel, sample)
            # sky values from the emit pass are exact CONSTANTS here
            # (matches the jnp VJP, whose int-cast cotangent is zero)
            sk_r, sk_g, sk_b = hdr_sky
        elif sky_kind == KIND_GRADIENT:
            tsky = 0.5 * (dy * inv_len + 1.0)
            sk_r = (1.0 - tsky) + tsky * 0.5
            sk_g = (1.0 - tsky) + tsky * 0.7
            sk_b = (1.0 - tsky) + tsky * 1.0
        else:
            sk_r = cam(C_SKY0) + zero
            sk_g = cam(C_SKY1) + zero
            sk_b = cam(C_SKY2) + zero

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
        c_r = jnp.where(jnp.isnan(c_r), 0.0, c_r)
        c_g = jnp.where(jnp.isnan(c_g), 0.0, c_g)
        c_b = jnp.where(jnp.isnan(c_b), 0.0, c_b)

        o2x = jnp.where(cont, hx, ox)
        o2y = jnp.where(cont, hy, oy)
        o2z = jnp.where(cont, hz, oz)
        d2x = jnp.where(cont, new_dx, dx)
        d2y = jnp.where(cont, new_dy, dy)
        d2z = jnp.where(cont, new_dz, dz)
        t2r = jnp.where(cont, tr * at_r, tr)
        t2g = jnp.where(cont, tg * at_g, tg)
        t2b = jnp.where(cont, tb * at_b, tb)
        return (o2x, o2y, o2z, d2x, d2y, d2z, t2r, t2g, t2b,
                c_r, c_g, c_b, cont)

    def bounce_fn(cam_s, sph_s, mtypes, ox, oy, oz, dx, dy, dz, tr, tg, tb,
                  active, term_allowed, a0, a1, a2, a3, b0, b1,
                  pre=None, mesh_over=None, hdr_sky=None):
        """One full bounce (state -> state', contribution) — the FILL-loop
        path: intersection argmin + loop gathers + shade.  Runs outside
        any vjp, so its O(n_spheres) intermediates carry no residuals.

        pre = (best_t, best_i) skips the sphere argmin (the mesh fill
        computes it outside, before the triangle fold); mesh_over adds the
        triangle winner (see shade)."""
        shape = ox.shape

        def sv(field, i):
            return sph_s[fi[field]][i]

        a = _dot3(dx, dy, dz, dx, dy, dz)
        inv_a = 1.0 / a
        inv_len = jax.lax.rsqrt(a)
        if pre is None:
            best_t, best_i = _intersect(sph_s, ox, oy, oz, dx, dy, dz,
                                        a, inv_a)
        else:
            best_t, best_i = pre
        hit = best_t < BIG
        if mesh_over is not None:
            hit = hit | mesh_over[0]

        def gather(field, init=0.0):
            v = jnp.full(shape, init, jnp.float32)
            for i in range(n_spheres):
                v = jnp.where(best_i == i, sv(field, i), v)
            return v

        mtype = jnp.full(shape, -1.0, jnp.float32)
        for i in range(n_spheres):
            mtype = jnp.where(best_i == i, mtypes[i], mtype)

        return shade(cam_s, ox, oy, oz, dx, dy, dz, tr, tg, tb,
                     active, term_allowed, a0, a1, a2, a3, b0, b1,
                     inv_a, inv_len, hit, best_t,
                     gather(F_CX), gather(F_CY), gather(F_CZ),
                     gather(F_INVR, 1.0),
                     gather(F_ALR), gather(F_ALG), gather(F_ALB),
                     lambda: gather(F_FUZZ),
                     lambda: gather(F_IOR),
                     lambda: gather(F_INVIOR, 1.0),
                     mtype, mesh_over=mesh_over, hdr_sky=hdr_sky)

    def winner_bounce(cam_s, sph_s, mtypes, ox, oy, oz, dx, dy, dz,
                      tr, tg, tb, active, term_allowed,
                      a0, a1, a2, a3, b0, b1,
                      win_code=None, mesh_rec=None, mesh_mat=None,
                      hdr_sky=None, w_params=None):
        """One bounce for the REVERSE sweep, restructured so its vjp
        carries O(1) tile-sized residuals in the sphere count.

        The winner index and hit mask are discrete, so they come straight
        from the ring (the fill stored its argmin — no re-intersection at
        all in the reverse sweep); the differentiable part gathers the
        WINNER's parameters with linear one-hot folds (whose transpose
        yields the per-sphere scalar cotangents) and recomputes t from
        them — the same expressions in the same order as the argmin loop,
        so t is bitwise-equal to best_t on hit lanes.  Gradients are
        mathematically identical to differentiating the full loop: the
        interior-derivative convention routes d(best_t) through the
        argmin winner only, and the loop's where-folds gave every
        non-winner branch an exactly-zero cotangent.  Without this,
        100-sphere scenes overflow the 16 MB scoped-VMEM limit
        (O(n_spheres) vjp residuals; measured).

        win_code is the ring-recorded winner (-1 miss, sphere index, or
        n_spheres = triangle in the mesh variant): the winner comes from
        the record instead of a re-intersection (bitwise the fill's
        argmin by construction — the fill stored it).  mesh_rec (mesh
        variant) = (rnx, rny, rnz, t_rec): triangle-winner lanes get a
        differentiable hit via the stored plane: t(o, d) = t_rec +
        plane_t - sg(plane_t) (primal exactly t_rec; derivative the
        ray-plane intersection's, which is the exact interior derivative
        for a fixed triangle).  mesh_mat = the uniform mesh material
        scalars (constants)."""
        shape = ox.shape
        sg = jax.lax.stop_gradient

        def sv(field, i):
            return sph_s[fi[field]][i]

        a = _dot3(dx, dy, dz, dx, dy, dz)
        inv_a = 1.0 / a
        inv_len = jax.lax.rsqrt(a)
        mesh_over = None
        if mesh_rec is not None:
            # 5-tuple: (raw normal, recorded t, plane constant).  c_pl may
            # be a DIFFERENTIABLE leaf (vertex gradients: c = n . v0, the
            # caller reconstructs its primal from the record and takes its
            # cotangent); None reproduces the fixed-geometry behaviour.
            rnx, rny, rnz, t_rec, c_in = mesh_rec
            is_tri = win_code == jnp.float32(n_spheres)
            hit_sph = (win_code >= 0.0) & ~is_tri
            best_i = win_code.astype(jnp.int32)
            nd = _dot3(rnx, rny, rnz, dx, dy, dz)
            nd_s = jnp.where(is_tri, nd, 1.0)
            n_o = _dot3(rnx, rny, rnz, ox, oy, oz)
            c_pl = sg(n_o + t_rec * nd_s) if c_in is None else c_in
            t_plane = (c_pl - n_o) / nd_s
            t_tri = t_rec + (t_plane - sg(t_plane))
            (m_alr, m_alg, m_alb, m_fuzz, m_ior, m_invior,
             m_mtype) = mesh_mat
            mesh_over = (is_tri, t_tri, rnx, rny, rnz,
                         m_alr, m_alg, m_alb, m_fuzz, m_ior, m_invior,
                         m_mtype)
        else:
            hit_sph = win_code >= 0.0
            best_i = jnp.maximum(win_code, 0.0).astype(jnp.int32)

        if w_params is None:
            def wgather(field, init=0.0):
                v = jnp.full(shape, init, jnp.float32)
                for i in range(n_spheres):
                    v = jnp.where(best_i == i, sv(field, i), v)
                return v
        else:
            # fast_acc: the winner's per-lane parameter planes are vjp
            # LEAVES built by the caller with the identical select folds
            # (same primal bitwise); fields a material class can't read
            # fall back to the old folds' init constants.
            def wgather(field, init=0.0):
                if field in w_params:
                    return w_params[field]
                return jnp.full(shape, init, jnp.float32)

        w_cx = wgather(F_CX)
        w_cy = wgather(F_CY)
        w_cz = wgather(F_CZ)
        w_r2 = wgather(F_R2)
        mtype = jnp.full(shape, -1.0, jnp.float32)
        for i in range(n_spheres):
            mtype = jnp.where(best_i == i, mtypes[i], mtype)

        # winner-only quadratic: bitwise-equal to the argmin loop's t_i
        # for the winning sphere (identical expressions and order)
        ocx = ox - w_cx
        ocy = oy - w_cy
        ocz = oz - w_cz
        half_b = _dot3(ocx, ocy, ocz, dx, dy, dz)
        c_t = (_dot3(ocx, ocy, ocz, ocx, ocy, ocz) - w_r2)
        disc = half_b * half_b - a * c_t
        sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
        r0 = (-half_b - sq) * inv_a
        r1 = (-half_b + sq) * inv_a
        ok0 = (disc >= 0.0) & (r0 >= t_min)
        ok1 = (disc >= 0.0) & (r1 >= t_min)
        t_w = jnp.where(ok0, r0, jnp.where(ok1, r1, BIG))
        # the record already says who won; t_w is only meaningful on
        # sphere-winner lanes (shade overrides triangle lanes and
        # ignores best_t on miss lanes).  hit equals the fill's bitwise:
        # a recorded winner implies its recomputed root is valid.
        hit = (hit_sph | is_tri) if mesh_rec is not None else hit_sph
        best_t = t_w

        return shade(cam_s, ox, oy, oz, dx, dy, dz, tr, tg, tb,
                     active, term_allowed, a0, a1, a2, a3, b0, b1,
                     inv_a, inv_len, hit, best_t,
                     w_cx, w_cy, w_cz, wgather(F_INVR, 1.0),
                     wgather(F_ALR), wgather(F_ALG), wgather(F_ALB),
                     lambda: wgather(F_FUZZ),
                     lambda: wgather(F_IOR),
                     lambda: wgather(F_INVIOR, 1.0),
                     mtype, mesh_over=mesh_over, hdr_sky=hdr_sky)

    def kernel(*refs):
        shape = (tile_rows, LANES)
        if fast_acc and hdr_mode != "emit":
            gacc2 = refs[-1]        # (n_wf, ns_pad) fast-acc accumulator
            refs = refs[:-1]
        else:
            gacc2 = None
        if mesh is not None:
            if hdr_mode == "emit":
                # fill-only pass: dumps per-(pixel, sample) miss
                # directions for the jnp sky lookup between passes
                if continuation:
                    if emit_state:
                        (off_ref, cam_ref, sph_ref, w_ref, aabb_ref,
                         box_ref, state_ref, dref, s_out_ref,
                         st, tri_sc, dsc) = refs
                    else:
                        (off_ref, cam_ref, sph_ref, w_ref, aabb_ref,
                         box_ref, state_ref, dref,
                         st, tri_sc, dsc) = refs
                        s_out_ref = None
                elif emit_state:
                    (off_ref, cam_ref, sph_ref, w_ref, aabb_ref, box_ref,
                     dref, s_out_ref, st, tri_sc, dsc) = refs
                else:
                    (off_ref, cam_ref, sph_ref, w_ref, aabb_ref, box_ref,
                     dref, st, tri_sc, dsc) = refs
                    s_out_ref = None
                rec = gacc = gcam_ref = gsph_ref = None
                gr_ref = gg_ref = gb_ref = None
            elif hdr_mode == "consume":
                if continuation:
                    # packed consume tail: the per-(lane, sample) sky
                    # values ride the state (rows 5..5+3*spp)
                    if emit_state:
                        (off_ref, cam_ref, sph_ref, w_ref, aabb_ref,
                         box_ref, state_ref, gcam_ref, gsph_ref,
                         gtri_ref, s_out_ref, st, rec, gacc,
                         tri_sc) = refs
                    else:
                        (off_ref, cam_ref, sph_ref, w_ref, aabb_ref,
                         box_ref, state_ref, gcam_ref, gsph_ref,
                         gtri_ref, st, rec, gacc, tri_sc) = refs
                        s_out_ref = None
                    sky_ref = None
                    gr_ref = gg_ref = gb_ref = None
                elif emit_state:
                    (off_ref, cam_ref, sph_ref, w_ref, aabb_ref, box_ref,
                     sky_ref, gr_ref, gg_ref, gb_ref, gcam_ref, gsph_ref,
                     gtri_ref, s_out_ref, st, rec, gacc, tri_sc) = refs
                else:
                    (off_ref, cam_ref, sph_ref, w_ref, aabb_ref, box_ref,
                     sky_ref, gr_ref, gg_ref, gb_ref, gcam_ref, gsph_ref,
                     gtri_ref, st, rec, gacc, tri_sc) = refs
                    s_out_ref = None
            elif continuation:
                # packed mesh tail (the mesh ladder): like the sphere
                # continuation, plus the mesh tables
                if emit_state:
                    (off_ref, cam_ref, sph_ref, w_ref, aabb_ref, box_ref,
                     state_ref, gcam_ref, gsph_ref, gtri_ref, s_out_ref,
                     st, rec, gacc, tri_sc) = refs
                else:
                    (off_ref, cam_ref, sph_ref, w_ref, aabb_ref, box_ref,
                     state_ref, gcam_ref, gsph_ref, gtri_ref,
                     st, rec, gacc, tri_sc) = refs
                    s_out_ref = None
                gr_ref = gg_ref = gb_ref = None
            else:
                if emit_state:
                    (off_ref, cam_ref, sph_ref, w_ref, aabb_ref, box_ref,
                     gr_ref, gg_ref, gb_ref, gcam_ref, gsph_ref,
                     gtri_ref, s_out_ref, st, rec, gacc, tri_sc) = refs
                else:
                    (off_ref, cam_ref, sph_ref, w_ref, aabb_ref, box_ref,
                     gr_ref, gg_ref, gb_ref, gcam_ref, gsph_ref,
                     gtri_ref, st, rec, gacc, tri_sc) = refs
                    s_out_ref = None
            if continuation:
                # packed lanes (any mesh mode): uniform 5-row state
                # prefix (pixel id, start sample, pixel cotangent); the
                # consume mode appends 3*spp sky rows after it
                tile = pl.program_id(0)
                first_tile = tile == 0
                lin = state_ref[0].astype(jnp.int32)
                pix_valid = lin >= 0
                lin = jnp.maximum(lin, 0)
                px_i = lin % width
                py_i = lin // width
                g_r = state_ref[2]
                g_g = state_ref[3]
                g_b = state_ref[4]
            else:
                # 2-D image tiles (tile_rows x LANES PIXELS): spatially
                # compact tiles are what make the cluster gates fire
                # (megamesh lesson)
                ti = pl.program_id(0)
                tj = pl.program_id(1)
                first_tile = (ti == 0) & (tj == 0)
                px_i = (tj * LANES
                        + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
                py_i = (off_ref[0, 0] + ti * tile_rows
                        + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
                # padding lanes (beyond the image/block) never trace:
                # their sample counter starts exhausted via pix_valid
                pix_valid = (px_i < width) & (py_i < off_ref[0, 3])
                lin = py_i * width + px_i
        elif continuation:
            # packed tail dispatch (the sphere ladder): lanes carry
            # (pixel id, start sample, per-pixel cotangent) from the
            # capped round-0 dispatch; -1 pixel ids are padding
            if emit_state:
                (off_ref, cam_ref, sph_ref, state_ref,
                 gcam_ref, gsph_ref, s_out_ref, st, rec, gacc) = refs
            else:
                (off_ref, cam_ref, sph_ref, state_ref,
                 gcam_ref, gsph_ref, st, rec, gacc) = refs
                s_out_ref = None
            tile = pl.program_id(0)
            first_tile = tile == 0
            lin = state_ref[0].astype(jnp.int32)
            pix_valid = lin >= 0
            lin = jnp.maximum(lin, 0)
            px_i = lin % width
            py_i = lin // width
            g_r = state_ref[2]
            g_g = state_ref[3]
            g_b = state_ref[4]
        else:
            if emit_state:
                (off_ref, cam_ref, sph_ref, gr_ref, gg_ref, gb_ref,
                 gcam_ref, gsph_ref, s_out_ref, st, rec, gacc) = refs
            else:
                (off_ref, cam_ref, sph_ref, gr_ref, gg_ref, gb_ref,
                 gcam_ref, gsph_ref, st, rec, gacc) = refs
                s_out_ref = None
            tile = pl.program_id(0)
            first_tile = tile == 0
            lin = (off_ref[0, 0] + tile * (tile_rows * LANES)
                   + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
                   + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
            pix_valid = None
            px_i = lin % width
            py_i = lin // width
        pix_u = lin.astype(_U32)
        px = px_i.astype(jnp.float32)
        py = py_i.astype(jnp.float32)
        sample_base = off_ref[0, 2]
        seed_arr = jnp.zeros(shape, _U32) + off_ref[0, 1].astype(_U32)
        zero = jnp.zeros(shape, jnp.float32)
        if hdr_mode != "emit" and not continuation:
            g_r = gr_ref[...]
            g_g = gg_ref[...]
            g_b = gb_ref[...]

        # table entries as scalars (read once; primals of the vjp)
        cam_s = tuple(cam_ref[0, c] for c in CAM_SLOTS)
        sph_s = tuple(tuple(sph_ref[f, i] for i in range(n_spheres))
                      for f in DIFF_FIELDS)
        mtypes = tuple(sph_ref[F_TYPE, i] for i in range(n_spheres))
        if mesh is not None:
            # uniform mesh material (extended camera-table slots) — held
            # constant (not vjp primals; see factory docstring)
            from .megamesh import (C_MA_R, C_MA_G, C_MA_B, C_M_FUZZ,
                                   C_M_IOR, C_M_INVIOR)
            m_alr = cam_ref[0, C_MA_R]
            m_alg = cam_ref[0, C_MA_G]
            m_alb = cam_ref[0, C_MA_B]
            m_fuzz = cam_ref[0, C_M_FUZZ]
            m_ior = cam_ref[0, C_M_IOR]
            m_invior = cam_ref[0, C_M_INVIOR]

        if hdr_mode != "emit":
            @pl.when(first_tile)
            def _init_out():
                gcam_ref[...] = jnp.zeros_like(gcam_ref)
                gsph_ref[...] = jnp.zeros_like(gsph_ref)
                if mesh is not None:
                    gtri_ref[...] = jnp.zeros_like(gtri_ref)

            # per-tile accumulators: DIFF_FIELDS sphere rows + 1 cam row
            n_rows_acc = len(DIFF_FIELDS) + 1
            gacc[0, :n_rows_acc, :] = jnp.zeros((n_rows_acc, LANES),
                                                jnp.float32)
            if gacc2 is not None:
                gacc2[...] = jnp.zeros((n_wf, tab_w), jnp.float32)

        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def scalars_to_rows(gc_s, gs_s):
            """Cotangent scalars -> (n_rows_acc, LANES) delta rows via
            static select folds (no scatters)."""
            rows = []
            for fpos in range(len(DIFF_FIELDS)):
                row = jnp.zeros((1, LANES), jnp.float32)
                for i in range(n_spheres):
                    row = jnp.where(lane_i == i, row + gs_s[fpos][i], row)
                rows.append(row)
            crow = jnp.zeros((1, LANES), jnp.float32)
            for p, c in enumerate(CAM_SLOTS):
                crow = jnp.where(lane_i == c, crow + gc_s[p], crow)
            rows.append(crow)
            return jnp.concatenate(rows, axis=0)

        def cheap6(s_u, slot):
            """Timing probe (profile_skip only): one short integer mix
            instead of two pcg4d hashes.  Outputs stay uniform-ish so
            path statistics — and therefore the round count the timing
            depends on — are preserved; results are wrong."""
            h = (pix_u ^ (s_u * _U32(0x9E3779B9))
                 + slot * _U32(0x85EBCA6B) + seed_arr)
            h = h ^ (h >> _U32(15))
            h = h * _U32(0x2C1B3C6D)
            h = h ^ (h >> _U32(12))
            from .megakernel import _to_f
            outs = []
            for mul in (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35,
                        0x27D4EB2F, 0x165667B1, 0x9E3779B1):
                outs.append(_to_f(h * _U32(mul)))
            return tuple(outs)

        def draws(s_u, depth_f):
            slot = (jnp.zeros_like(pix_u) + _U32(4)
                    + depth_f.astype(jnp.int32).astype(_U32) * _U32(2))
            if "draws" in profile_skip:
                return cheap6(s_u, slot)
            a0, a1, a2, a3 = _uniform4(seed_arr, pix_u, s_u, slot)
            if has_fuzz or has_diel:
                b0, b1, _, _ = _uniform4(seed_arr, pix_u, s_u,
                                         slot + _U32(1))
            else:
                b0 = b1 = None
            return a0, a1, a2, a3, b0, b1

        def camera_ray_fn(cam_t, u0, u1, u2, u3):
            """Differentiable GetRay given fixed draws; cam_t in CAM_SLOTS
            order."""
            def cm(slot):
                return cam_t[ci[slot]]
            uu = (px + u0) * jnp.float32(1.0 / width)
            vv = (py + u1) * jnp.float32(1.0 / height)
            if has_aperture:
                dr = jnp.sqrt(u2)
                th = TWO_PI * u3
                lens_x = dr * jnp.cos(th)
                lens_y = dr * jnp.sin(th)
                ox = cm(C_OX) + (cm(C_DUX) * lens_x + cm(C_DVX) * lens_y)
                oy = cm(C_OY) + (cm(C_DUY) * lens_x + cm(C_DVY) * lens_y)
                oz = cm(C_OZ) + (cm(C_DUZ) * lens_x + cm(C_DVZ) * lens_y)
            else:
                ox = cm(C_OX) + zero
                oy = cm(C_OY) + zero
                oz = cm(C_OZ) + zero
            dx = cm(C_LX) + uu * cm(C_HX) + vv * cm(C_VX) - ox
            dy = cm(C_LY) + uu * cm(C_HY) + vv * cm(C_VY) - oy
            dz = cm(C_LZ) + uu * cm(C_HZ) + vv * cm(C_VZ) - oz
            return ox, oy, oz, dx, dy, dz

        spp_f = jnp.float32(spp)

        def s_to_u(s_f):
            return (s_f.astype(jnp.int32) + sample_base).astype(_U32)

        def fresh_ray(s_f):
            """Camera ray for per-lane sample counter s_f (f32 exact int);
            the counter RNG makes regeneration draws identical to a
            sequential run's."""
            if "fray" in profile_skip:
                u0, u1, u2, u3, _, _ = cheap6(
                    s_to_u(s_f), jnp.zeros_like(pix_u))  # timing only
                return camera_ray_fn(cam_s, u0, u1, u2, u3)
            s_u = s_to_u(s_f)
            u0, u1, u2, u3 = _uniform4(seed_arr, pix_u, s_u,
                                       jnp.zeros_like(pix_u))
            return camera_ray_fn(cam_s, u0, u1, u2, u3)

        if mesh is not None:
            def tri_fold(active, sph_best_t):
                """Chunked MXU Moller-Trumbore fold over the current fill
                ray (st rows) — megamesh's gated per-row fold (cluster
                AABBs + top-box gate + entry-t against the running best,
                the reference's HitAnything triangle loop,
                gpu_kernel.cl:374-391).  Leaves best tri t in tri_sc[0]
                and the raw winner normal in tri_sc[1:4]."""
                ox = st[S_OX]
                oy = st[S_OY]
                oz = st[S_OZ]
                dx = st[S_DX]
                dy = st[S_DY]
                dz = st[S_DZ]
                tri_sc[0] = jnp.full(shape, BIG)
                tri_sc[1] = zero
                tri_sc[2] = zero
                tri_sc[3] = zero + 1.0      # safe nonzero normal
                tri_sc[8] = zero - 1.0      # winner triangle id (plan ord)
                if n_chunks == 0:
                    return
                tri_sc[4] = oy * dz - oz * dy
                tri_sc[5] = oz * dx - ox * dz
                tri_sc[6] = ox * dy - oy * dx
                inv_dx = 1.0 / dx
                inv_dy = 1.0 / dy
                inv_dz = 1.0 / dz

                def slab(bref, b):
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

                box_hits = [slab(box_ref, b)[0] & active
                            for b in range(n_boxes)]
                top_any = jnp.max(sum(bh.astype(jnp.int32)
                                      for bh in box_hits))

                @pl.when(top_any > 0)
                def _mesh():
                    NW = MESH_ROW_BATCH * LANES
                    ones_row = jnp.ones((1, NW), jnp.float32)
                    zeros_rows = jnp.zeros((6, NW), jnp.float32)
                    for ci_ in range(n_chunks):
                        cl_hit, cl_lo = slab(aabb_ref, ci_)
                        m_c = (cl_hit & box_hits[chunk_box_ids[ci_]]
                               & (cl_lo < jnp.minimum(sph_best_t,
                                                      tri_sc[0])))
                        tri_sc[7] = m_c.astype(jnp.float32)
                        s_c = jnp.max(m_c.astype(jnp.int32))

                        @pl.when(s_c > 0)
                        def _chunk(ci_=ci_):
                            w = w_ref[:, ci_ * c4:(ci_ + 1) * c4]
                            n_cols = w_ref[6:9,
                                           ci_ * c4 + 3 * chunk:
                                           ci_ * c4 + 4 * chunk]

                            def row(rg, _):
                                # MESH_ROW_BATCH pixel rows per matmul
                                # (megamesh's SUB trick): collapse the
                                # row group to lanes so the matmul N is
                                # B*128 — per-fire cost is dominated by
                                # fixed overheads, so batching rows is
                                # nearly free (measured on megamesh)
                                r1 = pl.ds(rg * MESH_ROW_BATCH,
                                           MESH_ROW_BATCH)
                                wide = lambda x: x.reshape(1, NW)
                                row_any = jnp.max(tri_sc[7, r1, :])

                                @pl.when(row_any > 0.0)
                                def _row_body():
                                    f = jnp.concatenate([
                                        wide(st[S_DX, r1, :]),
                                        wide(st[S_DY, r1, :]),
                                        wide(st[S_DZ, r1, :]),
                                        wide(tri_sc[4, r1, :]),
                                        wide(tri_sc[5, r1, :]),
                                        wide(tri_sc[6, r1, :]),
                                        wide(st[S_OX, r1, :]),
                                        wide(st[S_OY, r1, :]),
                                        wide(st[S_OZ, r1, :]),
                                        ones_row, zeros_rows], axis=0)
                                    prod = jax.lax.dot_general(
                                        w, f, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                                    aa = prod[0 * chunk:1 * chunk, :]
                                    u_num = prod[1 * chunk:2 * chunk, :]
                                    v_num = prod[2 * chunk:3 * chunk, :]
                                    t_num = prod[3 * chunk:4 * chunk, :]
                                    # division-free scaled MT + improve
                                    # gate (see megamesh._intersect_row)
                                    sgn_a = jnp.sign(aa)
                                    abs_a = aa * sgn_a
                                    us = u_num * sgn_a
                                    vs = v_num * sgn_a
                                    ts = t_num * sgn_a
                                    gate = wide(tri_sc[7, r1, :]) > 0.0
                                    old = wide(tri_sc[0, r1, :])
                                    m3 = jnp.minimum(jnp.minimum(us, vs),
                                                     abs_a - (us + vs))
                                    imp = ((abs_a >= 1e-5)
                                           & (m3 >= 0.0)
                                           & (ts > t_min * abs_a)
                                           & (ts < old * abs_a)
                                           & gate)
                                    any_imp = jnp.max(imp.astype(jnp.int32))

                                    @pl.when(any_imp > 0)
                                    def _extract():
                                        ra = pl.reciprocal(
                                            jnp.maximum(abs_a, 1e-30),
                                            approx=True)
                                        ra = ra * (2.0 - abs_a * ra)
                                        tt = jnp.where(imp, ts * ra, BIG)
                                        ct_a = jnp.min(tt, axis=0,
                                                       keepdims=True)
                                        ai = jnp.argmin(tt, axis=0)
                                        oh = (jax.lax.broadcasted_iota(
                                            jnp.int32, (chunk, NW), 0)
                                            == ai[None, :]
                                        ).astype(jnp.float32)
                                        nrm = jax.lax.dot_general(
                                            n_cols, oh,
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=(
                                                jnp.float32))
                                        ts_w = jnp.sum(ts * oh, axis=0,
                                                       keepdims=True)
                                        aa_w = jnp.sum(abs_a * oh, axis=0,
                                                       keepdims=True)
                                        ra_w = pl.reciprocal(
                                            jnp.maximum(aa_w, 1e-30),
                                            approx=True)
                                        ra_w = ra_w * (2.0 - aa_w * ra_w)
                                        ra_w = ra_w * (2.0 - aa_w * ra_w)
                                        ct = jnp.where(ct_a < BIG,
                                                       ts_w * ra_w, BIG)
                                        # int32 iota -> f32: Mosaic has
                                        # no float iota
                                        id_w = jnp.sum(
                                            (jax.lax.broadcasted_iota(
                                                jnp.int32,
                                                (chunk, NW), 0)
                                             .astype(jnp.float32)
                                             + jnp.float32(ci_ * chunk))
                                            * oh, axis=0, keepdims=True)
                                        upd = ct < old
                                        narrow = lambda x: x.reshape(
                                            MESH_ROW_BATCH, LANES)
                                        tri_sc[0, r1, :] = narrow(
                                            jnp.where(upd, ct, old))
                                        tri_sc[1, r1, :] = narrow(
                                            jnp.where(
                                                upd, nrm[0:1, :],
                                                wide(tri_sc[1, r1, :])))
                                        tri_sc[2, r1, :] = narrow(
                                            jnp.where(
                                                upd, nrm[1:2, :],
                                                wide(tri_sc[2, r1, :])))
                                        tri_sc[3, r1, :] = narrow(
                                            jnp.where(
                                                upd, nrm[2:3, :],
                                                wide(tri_sc[3, r1, :])))
                                        tri_sc[8, r1, :] = narrow(
                                            jnp.where(
                                                upd, id_w,
                                                wide(tri_sc[8, r1, :])))
                                return 0

                            jax.lax.fori_loop(
                                0, tile_rows // MESH_ROW_BATCH, row, 0)

            if hdr_mode == "emit":
                # rows [0, 3*spp): miss directions — safe default
                # (0, 0, 1): samples that never miss keep it; their sky
                # value is never consumed.  rows [3*spp, 6*spp): miss
                # THROUGHPUTS (zero default: a never-missing sample
                # contributes nothing to the sky term or its cotangent).
                # rows [6*spp, 6*spp+3): in-kernel non-sky contribution
                # sum (emissive terminals) — with the jnp sky term this
                # reconstructs the forward image, so the fused pipeline
                # needs no separate forward render.
                for _s in range(spp):
                    dsc[3 * _s + 0] = zero
                    dsc[3 * _s + 1] = zero
                    dsc[3 * _s + 2] = zero + 1.0
                for _r in range(3 * spp, 6 * spp + 3):
                    dsc[_r] = zero
            if continuation:
                # resume each lane at its carried sample counter
                st[S_S] = jnp.where(pix_valid, state_ref[1], spp_f)
            else:
                st[S_S] = jnp.where(pix_valid, 0.0, spp_f)
        elif continuation:
            # resume each lane at its carried sample counter; padding
            # lanes start exhausted
            st[S_S] = jnp.where(pix_valid, state_ref[1], spp_f)
        else:
            st[S_S] = zero

        def round_cond(c):
            it, any_left = c
            if max_rounds is not None:
                return any_left & (it < max_rounds)
            return any_left

        def round_body(c):
            it, _ = c
            # Restart the current sample from its camera ray: a path cut
            # by the previous ring boundary is recomputed in full (its
            # partial records contributed exactly zero — module docstring).
            s_f = st[S_S]
            cox, coy, coz, cdx, cdy, cdz = fresh_ray(s_f)
            st[S_OX] = cox
            st[S_OY] = coy
            st[S_OZ] = coz
            st[S_DX] = cdx
            st[S_DY] = cdy
            st[S_DZ] = cdz
            st[S_TR] = zero + 1.0
            st[S_TG] = zero + 1.0
            st[S_TB] = zero + 1.0
            st[S_K] = zero

            # ---- fill: every lane advances one bounce per slot,
            # regenerating its next sample on termination ----
            def fill_body(j, _):
                s_f = st[S_S]
                k_f = st[S_K]
                active = s_f < spp_f
                ox = st[S_OX]
                oy = st[S_OY]
                oz = st[S_OZ]
                dx = st[S_DX]
                dy = st[S_DY]
                dz = st[S_DZ]
                tr = st[S_TR]
                tg = st[S_TG]
                tb = st[S_TB]
                rows = pl.ds(j * tile_rows, tile_rows)
                if hdr_mode != "emit":
                    rec[R_OX, rows, :] = ox
                    rec[R_OY, rows, :] = oy
                    rec[R_OZ, rows, :] = oz
                    rec[R_DX, rows, :] = dx
                    rec[R_DY, rows, :] = dy
                    rec[R_DZ, rows, :] = dz
                    rec[R_TR, rows, :] = tr
                    rec[R_TG, rows, :] = tg
                    rec[R_TB, rows, :] = tb
                    rec[R_S, rows, :] = s_f
                    rec[R_K, rows, :] = jnp.where(active, k_f, -1.0)
                a0, a1, a2, a3, b0, b1 = draws(s_to_u(s_f), k_f)
                term_allowed = k_f + 1.0 < jnp.float32(max_depth)
                mesh_over = None
                a_q = _dot3(dx, dy, dz, dx, dy, dz)
                best_t, best_i = _intersect(
                    sph_s, ox, oy, oz, dx, dy, dz, a_q, 1.0 / a_q)
                pre = (best_t, best_i)
                win_code = jnp.where(best_t < BIG,
                                     best_i.astype(jnp.float32), -1.0)
                if mesh is not None:
                    tri_fold(active, best_t)
                    tri_t = tri_sc[0]
                    tri_win = tri_t < best_t
                    win_code = jnp.where(tri_win, jnp.float32(n_spheres),
                                         win_code)
                    if hdr_mode != "emit":
                        rec[R_NX, rows, :] = tri_sc[1]
                        rec[R_NY, rows, :] = tri_sc[2]
                        rec[R_NZ, rows, :] = tri_sc[3]
                        rec[R_T, rows, :] = jnp.where(tri_win, tri_t, 0.0)
                        rec[R_TID, rows, :] = jnp.where(tri_win,
                                                        tri_sc[8], -1.0)
                    else:
                        # record the miss direction AND throughput of the
                        # CURRENT sample (a path misses at most once — its
                        # terminal bounce), static select fold over the
                        # window.  The throughput feeds the sky-image
                        # cotangent (g_sky[texel] += thr * g_pixel) and
                        # the fused-forward sky term (sum_s thr_s *
                        # sky(dir_s)) in the jnp epilogue.
                        miss_now = active & (win_code == -1.0)
                        for _s in range(spp):
                            sel = miss_now & (s_f == jnp.float32(_s))
                            dsc[3 * _s + 0] = jnp.where(
                                sel, dx, dsc[3 * _s + 0])
                            dsc[3 * _s + 1] = jnp.where(
                                sel, dy, dsc[3 * _s + 1])
                            dsc[3 * _s + 2] = jnp.where(
                                sel, dz, dsc[3 * _s + 2])
                            t_ = 3 * (spp + _s)
                            dsc[t_ + 0] = jnp.where(sel, tr, dsc[t_ + 0])
                            dsc[t_ + 1] = jnp.where(sel, tg, dsc[t_ + 1])
                            dsc[t_ + 2] = jnp.where(sel, tb, dsc[t_ + 2])
                    mesh_over = (tri_win, tri_t,
                                 tri_sc[1], tri_sc[2], tri_sc[3],
                                 m_alr, m_alg, m_alb, m_fuzz, m_ior,
                                 m_invior, jnp.float32(mesh_mtype))
                if hdr_mode != "emit":
                    rec[R_WIN, rows, :] = win_code
                hdr_zero = ((zero, zero, zero)
                            if sky_kind == KIND_HDR else None)
                (o2x, o2y, o2z, d2x, d2y, d2z, t2r, t2g, t2b,
                 fc_r, fc_g, fc_b, cont) = bounce_fn(
                    cam_s, sph_s, mtypes, ox, oy, oz, dx, dy, dz,
                    tr, tg, tb, active, term_allowed,
                    a0, a1, a2, a3, b0, b1, pre=pre, mesh_over=mesh_over,
                    hdr_sky=hdr_zero)
                term = active & ~cont
                if hdr_mode == "emit":
                    # non-sky contribution sum (emissive terminals; the
                    # sky rows are zero here so miss contributions are
                    # exactly 0) — the in-kernel half of the fused
                    # forward image, clamp/NaN-zero applied by bounce_fn
                    e_ = 6 * spp
                    dsc[e_ + 0] = dsc[e_ + 0] + jnp.where(term, fc_r, 0.0)
                    dsc[e_ + 1] = dsc[e_ + 1] + jnp.where(term, fc_g, 0.0)
                    dsc[e_ + 2] = dsc[e_ + 2] + jnp.where(term, fc_b, 0.0)
                s_new = jnp.where(term, s_f + 1.0, s_f)
                regen = term & (s_new < spp_f)
                nox, noy, noz, ndx, ndy, ndz = fresh_ray(s_new)
                st[S_S] = s_new
                st[S_K] = jnp.where(regen, 0.0,
                                    jnp.where(cont, k_f + 1.0, k_f))
                st[S_OX] = jnp.where(regen, nox, jnp.where(cont, o2x, ox))
                st[S_OY] = jnp.where(regen, noy, jnp.where(cont, o2y, oy))
                st[S_OZ] = jnp.where(regen, noz, jnp.where(cont, o2z, oz))
                st[S_DX] = jnp.where(regen, ndx, jnp.where(cont, d2x, dx))
                st[S_DY] = jnp.where(regen, ndy, jnp.where(cont, d2y, dy))
                st[S_DZ] = jnp.where(regen, ndz, jnp.where(cont, d2z, dz))
                st[S_TR] = jnp.where(regen, 1.0,
                                     jnp.where(cont, t2r, tr))
                st[S_TG] = jnp.where(regen, 1.0,
                                     jnp.where(cont, t2g, tg))
                st[S_TB] = jnp.where(regen, 1.0,
                                     jnp.where(cont, t2b, tb))
                return 0

            jax.lax.fori_loop(0, n_slots, fill_body, 0)

            # ---- reverse: unwind the ring top-down ----
            if hdr_mode != "emit":
                st[A_OX] = zero
                st[A_OY] = zero
                st[A_OZ] = zero
                st[A_DX] = zero
                st[A_DY] = zero
                st[A_DZ] = zero
                st[A_TR] = zero
                st[A_TG] = zero
                st[A_TB] = zero

            def rev_body(jj, _):
                j = n_slots - 1 - jj
                rows = pl.ds(j * tile_rows, tile_rows)
                ox = rec[R_OX, rows, :]
                oy = rec[R_OY, rows, :]
                oz = rec[R_OZ, rows, :]
                dx = rec[R_DX, rows, :]
                dy = rec[R_DY, rows, :]
                dz = rec[R_DZ, rows, :]
                tr = rec[R_TR, rows, :]
                tg = rec[R_TG, rows, :]
                tb = rec[R_TB, rows, :]
                s_rec = rec[R_S, rows, :]
                k_rec = rec[R_K, rows, :]
                alive = k_rec >= 0.0
                k_safe = jnp.maximum(k_rec, 0.0)
                s_u = s_to_u(s_rec)
                a0, a1, a2, a3, b0, b1 = draws(s_u, k_safe)
                term_allowed = k_safe + 1.0 < jnp.float32(max_depth)
                win_rec = rec[R_WIN, rows, :]
                if mesh is not None:
                    rnx_r = rec[R_NX, rows, :]
                    rny_r = rec[R_NY, rows, :]
                    rnz_r = rec[R_NZ, rows, :]
                    t_rec_r = rec[R_T, rows, :]
                    tid_rec = rec[R_TID, rows, :]
                    # the uniform mesh material enters the reverse as
                    # PER-LANE broadcast planes and becomes a vjp leaf:
                    # its per-lane cotangents, accumulated per recorded
                    # winner id, are the per-triangle MATERIAL gradients
                    # (exact at the uniform primal, which
                    # supports_grad_mesh guarantees)
                    mm = jnp.stack([m_alr + zero, m_alg + zero,
                                    m_alb + zero, m_fuzz + zero,
                                    m_ior + zero, m_invior + zero])
                    # plane constant c = n . v0, reconstructed from the
                    # record (n.(o + t d) = n.hitpoint lies on the plane);
                    # it becomes a vjp LEAF below so d(loss)/dc comes back
                    # per lane.  Same expression as winner_bounce's
                    # fixed-geometry sg() reconstruction — primal exact.
                    is_tri_wc = win_rec == jnp.float32(n_spheres)
                    nd_rec = _dot3(rnx_r, rny_r, rnz_r, dx, dy, dz)
                    c_rec = (_dot3(rnx_r, rny_r, rnz_r, ox, oy, oz)
                             + t_rec_r * jnp.where(is_tri_wc, nd_rec,
                                                   1.0))
                else:
                    mesh_mat = None
                if hdr_mode == "consume":
                    # the record's sample selects its (constant) sky
                    # value — from the grid-mapped sky rows, or from the
                    # packed state (rows 5..) in a continuation dispatch
                    skr = sky_ref if not continuation else None
                    base = 0 if not continuation else 5
                    sk0r = zero
                    sk0g = zero
                    sk0b = zero
                    for _s in range(spp):
                        sel = s_rec == jnp.float32(_s)
                        src = skr if skr is not None else state_ref
                        r_ = base + 3 * _s
                        sk0r = jnp.where(sel, src[r_ + 0], sk0r)
                        sk0g = jnp.where(sel, src[r_ + 1], sk0g)
                        sk0b = jnp.where(sel, src[r_ + 2], sk0b)
                    hdr_sky_rec = (sk0r, sk0g, sk0b)
                else:
                    hdr_sky_rec = None

                if fast_acc:
                    # winner-parameter planes built OUTSIDE the vjp with
                    # the identical select folds (bitwise-same primals);
                    # the stacked W is the sphere leaf, so cotangents
                    # come back as per-lane PLANES (reduced below by one
                    # one-hot MXU contraction instead of per-scalar
                    # cross-lane reduces)
                    best_i_r = jnp.maximum(win_rec, 0.0).astype(jnp.int32)

                    def wfold(field):
                        init = 1.0 if field in (F_INVR, F_INVIOR) else 0.0
                        v = jnp.full(shape, init, jnp.float32)
                        for i in range(n_spheres):
                            v = jnp.where(best_i_r == i,
                                          sph_s[fi[field]][i], v)
                        return v

                    W = jnp.stack([wfold(f_) for f_ in w_fields])

                    def unpack_w(W_leaf):
                        return {f_: W_leaf[p] for f_, p in wmap.items()}
                else:
                    W = None
                if mesh is not None:
                    # the raw normal and plane constant are vjp leaves:
                    # their per-lane cotangents key the per-triangle
                    # plane-cotangent accumulation (vertex gradients)
                    def mmat_of(m6):
                        return (m6[0], m6[1], m6[2], m6[3], m6[4],
                                m6[5], jnp.float32(mesh_mtype))

                    if fast_acc:
                        def f(cam_t, W_leaf, ox, oy, oz, dx, dy, dz,
                              tr, tg, tb, rnx, rny, rnz, cpl, m6):
                            out = winner_bounce(
                                cam_t, sph_s, mtypes, ox, oy, oz,
                                dx, dy, dz, tr, tg, tb, alive,
                                term_allowed, a0, a1, a2, a3, b0, b1,
                                win_code=win_rec,
                                mesh_rec=(rnx, rny, rnz, t_rec_r, cpl),
                                mesh_mat=mmat_of(m6),
                                hdr_sky=hdr_sky_rec,
                                w_params=unpack_w(W_leaf))
                            return out[:12]  # drop the bool cont

                        _, vjp_fn = jax.vjp(f, cam_s, W, ox, oy, oz,
                                            dx, dy, dz, tr, tg, tb,
                                            rnx_r, rny_r, rnz_r, c_rec,
                                            mm)
                    else:
                        def f(cam_t, sph_t, ox, oy, oz, dx, dy, dz,
                              tr, tg, tb, rnx, rny, rnz, cpl, m6):
                            out = winner_bounce(
                                cam_t, sph_t, mtypes, ox, oy, oz,
                                dx, dy, dz, tr, tg, tb, alive,
                                term_allowed, a0, a1, a2, a3, b0, b1,
                                win_code=win_rec,
                                mesh_rec=(rnx, rny, rnz, t_rec_r, cpl),
                                mesh_mat=mmat_of(m6),
                                hdr_sky=hdr_sky_rec)
                            return out[:12]  # drop the bool cont

                        _, vjp_fn = jax.vjp(f, cam_s, sph_s, ox, oy, oz,
                                            dx, dy, dz, tr, tg, tb,
                                            rnx_r, rny_r, rnz_r, c_rec,
                                            mm)
                else:
                    if fast_acc:
                        def f(cam_t, W_leaf, ox, oy, oz, dx, dy, dz,
                              tr, tg, tb):
                            out = winner_bounce(
                                cam_t, sph_s, mtypes, ox, oy, oz,
                                dx, dy, dz, tr, tg, tb, alive,
                                term_allowed, a0, a1, a2, a3, b0, b1,
                                win_code=win_rec, mesh_rec=None,
                                mesh_mat=None, hdr_sky=hdr_sky_rec,
                                w_params=unpack_w(W_leaf))
                            return out[:12]  # drop the bool cont

                        _, vjp_fn = jax.vjp(f, cam_s, W, ox, oy, oz,
                                            dx, dy, dz, tr, tg, tb)
                    else:
                        def f(cam_t, sph_t, ox, oy, oz, dx, dy, dz,
                              tr, tg, tb):
                            out = winner_bounce(
                                cam_t, sph_t, mtypes, ox, oy, oz,
                                dx, dy, dz, tr, tg, tb, alive,
                                term_allowed, a0, a1, a2, a3, b0, b1,
                                win_code=win_rec, mesh_rec=None,
                                mesh_mat=None, hdr_sky=hdr_sky_rec)
                            return out[:12]  # drop the bool cont

                        _, vjp_fn = jax.vjp(f, cam_s, sph_s, ox, oy, oz,
                                            dx, dy, dz, tr, tg, tb)
                # Terminal records self-seed from (g_r, g_g, g_b) through
                # the where(term, ...) transpose; mid-path records route
                # the state adjoint; invalid records pass it through.
                cots = (st[A_OX], st[A_OY], st[A_OZ],
                        st[A_DX], st[A_DY], st[A_DZ],
                        st[A_TR], st[A_TG], st[A_TB],
                        g_r, g_g, g_b)
                if mesh is not None:
                    (gc_s, gs_w, aox, aoy, aoz, adx, ady, adz,
                     atr, atg, atb, g_nx, g_ny, g_nz, g_cc,
                     g_mm) = vjp_fn(cots)
                else:
                    (gc_s, gs_w, aox, aoy, aoz, adx, ady, adz,
                     atr, atg, atb) = vjp_fn(cots)
                if fast_acc:
                    dW, gs_s = gs_w, None
                else:
                    dW, gs_s = None, gs_w

                if mesh is not None and n_chunks > 0:
                    # ---- per-triangle plane-cotangent accumulation ----
                    # (d_n, d_c) per record -> gtri_ref[(4, T_pad)] rows
                    # keyed by the recorded winner id.  Scatter-free: a
                    # per-row one-hot (chunk, LANES) matmul transposes the
                    # gather; chunk blocks are gated by the slot's
                    # min/max id so sphere-dominated slots cost O(1).
                    tri_m = is_tri_wc & alive
                    tid_lo = jnp.min(jnp.where(tri_m, tid_rec, BIG))
                    tid_hi = jnp.max(jnp.where(tri_m, tid_rec, -1.0))

                    @pl.when(tid_hi >= 0.0)
                    def _acc_tri():
                        # Stage the per-lane cotangents/ids into tri_sc
                        # (free during the reverse; the fill re-inits it)
                        # so the row loop can pl.ds-slice a REF — Mosaic
                        # has no dynamic_slice on values.
                        tri_sc[0] = g_nx
                        tri_sc[1] = g_ny
                        tri_sc[2] = g_nz
                        tri_sc[3] = g_cc
                        tri_sc[4] = tid_rec
                        tri_sc[5] = tri_m.astype(jnp.float32)
                        for _m in range(6):
                            tri_sc[6 + _m] = g_mm[_m]
                        for ci_ in range(n_chunks):
                            base = jnp.float32(ci_ * chunk)
                            top = jnp.float32((ci_ + 1) * chunk)

                            @pl.when((tid_lo < top) & (tid_hi >= base))
                            def _chunk_acc(ci_=ci_, base=base):
                                NW = MESH_ROW_BATCH * LANES

                                def rrow(rg, _):
                                    r1 = pl.ds(rg * MESH_ROW_BATCH,
                                               MESH_ROW_BATCH)
                                    wd = lambda x: x.reshape(1, NW)
                                    tid_r = wd(tri_sc[4, r1, :])
                                    m_r = ((wd(tri_sc[5, r1, :]) > 0.0)
                                           & (tid_r >= base)
                                           & (tid_r < base + chunk))
                                    row_any = jnp.max(
                                        m_r.astype(jnp.int32))

                                    @pl.when(row_any > 0)
                                    def _row():
                                        oh = ((jax.lax.broadcasted_iota(
                                            jnp.int32,
                                            (chunk, NW), 0)
                                            .astype(jnp.float32)
                                            == (tid_r - base)) & m_r
                                        ).astype(jnp.float32)
                                        arow = jnp.concatenate(
                                            [wd(tri_sc[_r, r1, :])
                                             for _r in (0, 1, 2, 3, 6, 7,
                                                        8, 9, 10, 11)],
                                            axis=0)
                                        blk = jax.lax.dot_general(
                                            arow, oh,
                                            (((1,), (1,)), ((), ())),
                                            preferred_element_type=(
                                                jnp.float32))
                                        cs = slice(ci_ * chunk,
                                                   (ci_ + 1) * chunk)
                                        gtri_ref[:, cs] = (
                                            gtri_ref[:, cs] + blk)
                                    return 0

                                jax.lax.fori_loop(
                                    0, tile_rows // MESH_ROW_BATCH,
                                    rrow, 0)

                # depth-0 records: chain the camera VJP for this sample's
                # draws, then reset the lane adjoint — the record below
                # belongs to the previous path.
                is_k0 = alive & (k_rec == 0.0)
                if "cam" not in profile_skip:
                    u0, u1, u2, u3 = _uniform4(seed_arr, pix_u, s_u,
                                               jnp.zeros_like(pix_u))

                    def cray(cam_t):
                        return camera_ray_fn(cam_t, u0, u1, u2, u3)

                    _, cvjp = jax.vjp(cray, cam_s)
                    (gc0,) = cvjp((jnp.where(is_k0, aox, 0.0),
                                   jnp.where(is_k0, aoy, 0.0),
                                   jnp.where(is_k0, aoz, 0.0),
                                   jnp.where(is_k0, adx, 0.0),
                                   jnp.where(is_k0, ady, 0.0),
                                   jnp.where(is_k0, adz, 0.0)))
                st[A_OX] = jnp.where(is_k0, 0.0, aox)
                st[A_OY] = jnp.where(is_k0, 0.0, aoy)
                st[A_OZ] = jnp.where(is_k0, 0.0, aoz)
                st[A_DX] = jnp.where(is_k0, 0.0, adx)
                st[A_DY] = jnp.where(is_k0, 0.0, ady)
                st[A_DZ] = jnp.where(is_k0, 0.0, adz)
                st[A_TR] = jnp.where(is_k0, 0.0, atr)
                st[A_TG] = jnp.where(is_k0, 0.0, atg)
                st[A_TB] = jnp.where(is_k0, 0.0, atb)

                if "acc" not in profile_skip:
                    if fast_acc:
                        # one one-hot contraction per slot: sphere j's
                        # cotangent for field row p = sum over lanes with
                        # recorded winner j of dW[p] — exactly what the
                        # old where-fold transpose reduced, as an MXU dot
                        # (dim1 x dim1 contraction, the _acc_tri pattern)
                        n_flat = tile_rows * LANES
                        win_flat = win_rec.reshape(1, n_flat)
                        oh = (jax.lax.broadcasted_iota(
                            jnp.int32, (ns_pad, n_flat), 0)
                            .astype(jnp.float32) == win_flat
                        ).astype(jnp.float32)
                        dW2 = dW.reshape(n_wf, n_flat)
                        blk = jax.lax.dot_general(
                            dW2, oh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        # full-lane accumulator; only cols < ns_pad are
                        # touched (Mosaic can't widen (1, ns_pad) ->
                        # (1, LANES) by concat at flush — measured
                        # "offset mismatch on non-concat dimension")
                        gacc2[:, 0:ns_pad] = gacc2[:, 0:ns_pad] + blk
                        crow0 = jnp.zeros((1, LANES), jnp.float32)
                        for p, cslot in enumerate(CAM_SLOTS):
                            crow0 = jnp.where(lane_i == cslot,
                                              crow0 + gc_s[p], crow0)
                        gacc[0, n_rows_acc - 1:n_rows_acc, :] = (
                            gacc[0, n_rows_acc - 1:n_rows_acc, :] + crow0)
                    else:
                        gacc[0, :n_rows_acc, :] = (
                            gacc[0, :n_rows_acc, :]
                            + scalars_to_rows(gc_s, gs_s))
                if "cam" not in profile_skip:
                    crow = jnp.zeros((1, LANES), jnp.float32)
                    for p, cslot in enumerate(CAM_SLOTS):
                        crow = jnp.where(lane_i == cslot, crow + gc0[p],
                                         crow)
                    gacc[0, n_rows_acc - 1:n_rows_acc, :] = (
                        gacc[0, n_rows_acc - 1:n_rows_acc, :] + crow)
                return 0

            if hdr_mode != "emit" and not fill_only:
                # fill_only (profiling instrumentation): skip the reverse
                # sweep entirely to isolate fill cost; outputs stay zero
                jax.lax.fori_loop(0, n_slots, rev_body, 0)
            return (it + 1, jnp.any(st[S_S] < spp_f))

        jax.lax.while_loop(round_cond, round_body, (jnp.int32(0), True))

        if hdr_mode == "emit":
            dref[...] = dsc[...]
            if emit_state:
                s_out_ref[...] = st[S_S]
            return

        if emit_state:
            # per-lane sample counter: lanes with s < spp are the ladder
            # survivors the packed continuation dispatch resumes
            s_out_ref[...] = st[S_S]

        # flush: accumulator rows -> table-shaped outputs (concatenate,
        # not .at[].set — scatters don't lower in Mosaic)
        acc = gacc[0, :n_rows_acc, :]
        if fast_acc:
            acc2 = gacc2[...]
            zrow = jnp.zeros((1, tab_w), jnp.float32)

            def srow(f):
                if f not in wmap:
                    return zrow
                return acc2[wmap[f]:wmap[f] + 1, :]

            gs_out = jnp.concatenate([srow(f) for f in range(N_FIELDS)],
                                     axis=0)
        else:
            fpos = {f: p for p, f in enumerate(DIFF_FIELDS)}
            gs_out = jnp.concatenate(
                [acc[fpos[f]:fpos[f] + 1, :] if f in fpos
                 else jnp.zeros((1, LANES), jnp.float32)
                 for f in range(N_FIELDS)], axis=0)
        gsph_ref[...] = gsph_ref[...] + gs_out
        gcam_ref[...] = (gcam_ref[...]
                         + acc[n_rows_acc - 1:n_rows_acc, :])

    return kernel


# fast_acc (one-hot MXU cotangent accumulation — see _make_grad_kernel)
# is on by default; the flag exists for A/B measurement and as an escape
# hatch.  Scope: any sphere count the kernel supports (<= 128 lanes).
GRAD_FAST_ACC = True


def _w_layout(n_spheres, has_metal, has_diel, has_fuzz):
    """(n_wf, tab_w) of the fast-acc accumulator — row count mirrors the
    w_fields construction in _make_grad_kernel; width = one 128-lane
    group per 128 spheres (full-lane width: Mosaic can't widen a narrow
    row by concat at flush)."""
    n_wf = 8 + (1 if (has_metal and has_fuzz) else 0) \
        + (2 if has_diel else 0)
    return n_wf, max(LANES, -(-n_spheres // LANES) * LANES)


def supports_grad(scene: Scene, cfg: RenderConfig) -> bool:
    """Scenes the Pallas backward kernel covers: sphere-only scenes with
    gradient/constant sky up to GRAD_MAX_SPHERES (256 — beyond the
    forward kernels' 128; the forward for 129..256 spheres runs on the
    jnp wavefront while the backward stays at kernel rate).  The kernel
    always uses the order-invariant "zero" NaN policy for sample
    contributions, like render_grad_sampled's jnp chunks."""
    return (scene.triangles.count == 0
            and scene.sky.kind in (KIND_GRADIENT, KIND_CONST)
            and 0 < scene.spheres.count <= GRAD_MAX_SPHERES)


def render_grad_tables(scene: Scene, cfg: RenderConfig, g_img, seed,
                       sample_base=0, n_samples=None,
                       interpret: bool = False):
    """Cotangents of the (camera, sphere) tables for image cotangent
    g_img (H, W, 3) — already including any 1/spp factor the caller's
    loss uses.  Returns (gcam (1, LANES), gsph (N_FIELDS, LANES))."""
    flags = specialize_flags(scene)
    n_samples = cfg.spp if n_samples is None else n_samples
    return _grad_tables_jit(scene, cfg, g_img, jnp.int32(seed),
                            jnp.int32(sample_base), n_samples, flags,
                            interpret)


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "flags",
                                             "interpret"))
def _grad_tables_jit(scene, cfg, g_img, seed, sample_base, n_samples,
                     flags, interpret):
    cam_tab = _camera_table(scene)
    sph_tab = _sphere_table(scene)
    return _grad_tables_inner(cam_tab, sph_tab, scene.spheres.count,
                              scene.sky.kind, cfg, g_img, seed,
                              sample_base, n_samples, flags, interpret)


def _grad_tables_inner(cam_tab, sph_tab, n_spheres, sky_kind, cfg, g_img,
                       seed, sample_base, n_samples, flags, interpret,
                       pix_base=None, full_height=None,
                       fill_only: bool = False, profile_skip: str = "",
                       max_rounds=None, emit_state: bool = False,
                       continuation_state=None, fast_acc=None):
    """pix_base (traced i32) positions this g_img block's first pixel in
    the GLOBAL linear pixel index (sharded row blocks; camera math uses
    full_height = the global image height).

    Ladder plumbing (see _grad_tables_laddered): max_rounds statically
    caps the round loop; emit_state additionally returns the per-lane
    sample counters ((n_tiles*tile_rows, LANES) f32, linear-lane order);
    continuation_state ((5, rows, LANES): pixel id, start sample, g_r,
    g_g, g_b; -1 pixel = padding) runs the packed tail dispatch instead
    of the full grid — g_img is then ignored except for width/height."""
    has_metal, has_diel, has_emit, has_fuzz, has_aperture = flags[:5]
    h, w = g_img.shape[0], g_img.shape[1]
    if full_height is not None:
        h = full_height
    n_pix = g_img.shape[0] * w

    # Ring depth: >= max_depth so a restarted path always completes within
    # one round (forward progress), >= MIN_SLOTS to keep the abandoned-path
    # recompute waste small.
    n_slots = max(MIN_SLOTS, cfg.max_depth)
    # Large sphere tables inflate the kernel's live vregs; halve the tile
    # so the ring + state stay inside scoped VMEM (measured: 100 spheres
    # at rows=32 overflow the 16 MB scoped limit by 0.24 MB).
    tile_rows = TILE_ROWS if n_spheres <= 32 else TILE_ROWS // 2
    tile = tile_rows * LANES
    if fast_acc is None:
        # > 128 spheres REQUIRE the fast-acc reverse (multi-lane-group
        # accumulator); below that it is the measured-faster default
        fast_acc = GRAD_FAST_ACC or n_spheres > LANES
    tab_w = max(LANES, -(-n_spheres // LANES) * LANES)
    w_in = sph_tab.shape[1]
    if w_in < tab_w:
        sph_tab = jnp.pad(sph_tab, ((0, 0), (0, tab_w - w_in)))
    kernel = _make_grad_kernel(
        n_spheres=n_spheres, width=w, height=h,
        spp=n_samples, max_depth=cfg.max_depth, t_min=cfg.t_min,
        sky_kind=sky_kind, clamp_samples=cfg.clamp_samples,
        has_metal=has_metal, has_diel=has_diel, has_emit=has_emit,
        has_fuzz=has_fuzz, has_aperture=has_aperture, n_slots=n_slots,
        tile_rows=tile_rows, fill_only=fill_only,
        profile_skip=profile_skip, max_rounds=max_rounds,
        emit_state=emit_state,
        continuation=continuation_state is not None,
        fast_acc=fast_acc)

    scratch = [
        pltpu.VMEM((N_ST, tile_rows, LANES), jnp.float32),
        pltpu.VMEM((N_REC, n_slots * tile_rows, LANES), jnp.float32),
        pltpu.VMEM((1, len(DIFF_FIELDS) + 1, LANES), jnp.float32),
    ]
    if fast_acc:
        scratch.append(pltpu.VMEM(
            _w_layout(n_spheres, has_metal, has_diel, has_fuzz),
            jnp.float32))
    off = jnp.stack([jnp.int32(0) if pix_base is None else
                     jnp.asarray(pix_base, jnp.int32), jnp.int32(seed),
                     jnp.int32(sample_base)]).reshape(1, 3)
    table_specs = [
        pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_FIELDS, tab_w), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    table_outs = [
        pl.BlockSpec((1, LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_FIELDS, tab_w), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def _slice_back(outs):
        # the kernel's gsph rides the padded table width; hand callers
        # the cotangent in the INPUT table's width
        return (outs[0], outs[1][:, :w_in]) + tuple(outs[2:])

    if continuation_state is not None:
        n2_rows = continuation_state.shape[1]
        assert n2_rows % tile_rows == 0
        c_shape = [jax.ShapeDtypeStruct((1, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((N_FIELDS, tab_w), jnp.float32)]
        c_specs = list(table_outs)
        if emit_state:
            c_shape.append(jax.ShapeDtypeStruct((n2_rows, LANES),
                                                jnp.float32))
            c_specs.append(pl.BlockSpec((tile_rows, LANES),
                                        lambda i: (i, 0),
                                        memory_space=pltpu.VMEM))
        outs = _slice_back(pl.pallas_call(
            kernel,
            out_shape=c_shape,
            grid=(n2_rows // tile_rows,),
            in_specs=table_specs + [
                pl.BlockSpec((5, tile_rows, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=c_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(off, cam_tab, sph_tab, continuation_state))
        return outs if emit_state else (outs[0], outs[1])

    n_tiles = -(-n_pix // tile)
    pad = n_tiles * tile - n_pix
    g = g_img.reshape(n_pix, 3)
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0)))
    g = g.T.reshape(3, n_tiles * tile_rows, LANES)

    out_shape = [jax.ShapeDtypeStruct((1, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((N_FIELDS, tab_w), jnp.float32)]
    out_specs = list(table_outs)
    if emit_state:
        out_shape.append(jax.ShapeDtypeStruct(
            (n_tiles * tile_rows, LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((tile_rows, LANES),
                                      lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))

    outs = _slice_back(pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tiles,),
        in_specs=table_specs
        + [pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM) for _ in range(3)],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(off, cam_tab, sph_tab, g[0], g[1], g[2]))
    return outs if emit_state else (outs[0], outs[1])


# Ladder exactness: rounds restart the current sample from its camera
# ray, so a cut sample's partial records contribute exactly zero adjoint
# and the continuation retraces it in full with identical counter-RNG
# draws; the "zero" NaN policy makes the gcam/gsph sums order-invariant
# up to fp addition order.  A capacity overflow at any level falls back
# to the plain uncapped kernel via lax.cond (sound under jit).
GRAD_LADDER_MIN_SPP = 64
GRAD_LADDER_DENOM = 2      # single-level interface default (tests)
# Capped-level schedule: (rounds_factor, denom) per level; the round cap
# of level k is max(2, int(factor * spp / n_slots)) and its survivors
# compact into n_padded/denom lanes (denom may be a float).  The final
# dispatch after the last level runs uncapped.  Swept on TPU (README
# 250spp/d50, caps in rounds): r4 two-level (16,2) = 0.538 s;
# (12,2)+(10,8) = 0.481; (12,2)+(6,4)+(6,8)+(8,32) = 0.460;
# (9,1.5)+(4,2.5)+(4,4.5)+(5,10)+(8,40) = 0.4395 (best; measured
# survival curve: alive after 9/12/16/20/24 rounds = 64/47/16/5.8/2.0 %).
# Tighter first levels trip the overflow fallback (~1.04 s).
GRAD_LADDER_SCHEDULE = ((2.304, 1.5), (1.024, 2.5), (1.024, 4.5),
                        (1.28, 10), (2.048, 40))
# The tight schedule's integer floors get unsafe below ~3 rounds/level;
# mid-spp configs (64..199) use the conservative 2-level ladder instead.
# Verified on TPU (README scene): at spp=64/128 the 2-level schedule
# runs 0.176/0.288 s while the scaled tight schedule trips the overflow
# fallback (0.388/0.590 s) — benchmarks/sweep_midspp_r05.txt.
GRAD_LADDER_SCHEDULE_MID = ((3.1, 2), (2.6, 8))


def _default_levels(n_samples: int, n_slots: int):
    if n_samples <= 16:
        # low-spp windows (the HDR flagship: 5 spp/d32 per window): the
        # mean lane finishes within a fraction of ONE round while the
        # uncapped while-loop runs to its slowest lane (~3 rounds at
        # depth 32) — cap at single rounds with capacities derived from
        # the MEASURED F1 grad-fill survival (TPU, 5 spp/d32, 32-slot
        # rounds: 10.0 % / 3.55 % / 0.61 % alive after 1/2/3 rounds —
        # benchmarks/sweep_meshsurv_r05.txt), scaled to the window's
        # spp, with ~2.2x margins.  Two earlier models tripped the
        # overflow fallback (~2x cost): a fixed (8, 32) schedule at
        # 32-slot rings, and a 12-iter-halving fit whose level-1
        # capacity (3.16 %) sat just under the real 3.55 %.
        def frac(iters):
            x = iters * 5.0 / max(n_samples, 1)
            return max(0.10 * 0.36 ** ((x - 32.0) / 32.0), 5e-4)

        d1 = min(64.0, max(2.0, 1.0 / (2.2 * frac(n_slots))))
        d2 = min(64.0, max(d1 * 2.0, 1.0 / (2.2 * frac(2 * n_slots))))
        return ((1, d1), (1, d2))
    sched = (GRAD_LADDER_SCHEDULE if n_samples >= 200
             else GRAD_LADDER_SCHEDULE_MID)
    return tuple((max(2, int(rf * n_samples / n_slots)), d)
                 for rf, d in sched)


def _grad_tables_laddered(cam_tab, sph_tab, n_spheres, sky_kind, cfg,
                          g_img, seed, sample_base, n_samples, flags,
                          interpret, r0=None, denom=GRAD_LADDER_DENOM,
                          levels=None, pix_base=None, full_height=None):
    """Multi-level tail-compaction ladder for the sphere backward kernel.

    The uncapped kernel runs each TILE until its slowest lane exhausts
    spp; measured on the README 250spp/d50 config the mean tile needs
    ~24 rounds while the mean LANE needs ~14 — half the fill+reverse
    cost is tail-lane idle.  Each capped level bounds the round loop and
    emits per-lane sample counters; survivors (pixel id, sample, pixel
    cotangent) compact into a packed dispatch at 1/denom the lanes; the
    final dispatch runs uncapped.  A capacity overflow at ANY level
    falls back to the plain uncapped kernel via lax.cond (jit-sound).

    levels: tuple of (round_cap, denom) per capped level; default from
    GRAD_LADDER_SCHEDULE (r0/denom override a single level, the round-4
    interface the tests use).  pix_base/full_height position a sharded
    row block exactly as in _grad_tables_inner (the packed state carries
    GLOBAL pixel ids)."""
    h, w = g_img.shape[0], g_img.shape[1]
    # The packed continuation state carries GLOBAL pixel ids as f32
    # (state rows are one dtype); ids >= 2^24 are not exactly
    # representable and would silently corrupt survivor pixels (e.g. 8K:
    # 7680*4320 = 33M pixels).  The global id is bounded by the FULL
    # image's pixel count (static), so guard statically and run the
    # uncapped kernel instead — correct at any size, just unladdered.
    full_h = h if full_height is None else full_height
    if w * full_h > 2 ** 24:
        return _grad_tables_inner(
            cam_tab, sph_tab, n_spheres, sky_kind, cfg, g_img, seed,
            sample_base, n_samples, flags, interpret,
            pix_base=pix_base, full_height=full_height)
    n_pix = h * w
    n_slots = max(MIN_SLOTS, cfg.max_depth)
    tile_rows = TILE_ROWS if n_spheres <= 32 else TILE_ROWS // 2
    tile = tile_rows * LANES
    if levels is None:
        if r0 is not None:
            levels = ((r0, denom),)
        else:
            levels = _default_levels(n_samples, n_slots)
    base_kw = dict(pix_base=pix_base, full_height=full_height)
    base_args = (cam_tab, sph_tab, n_spheres, sky_kind, cfg, g_img, seed,
                 sample_base, n_samples, flags, interpret)
    spp_f = jnp.float32(n_samples)
    n_padded = -(-n_pix // tile) * tile
    base_off = (jnp.int32(0) if pix_base is None
                else jnp.asarray(pix_base, jnp.int32))

    gcam = jnp.zeros((1, LANES), jnp.float32)
    gsph = jnp.zeros((N_FIELDS, sph_tab.shape[1]), jnp.float32)
    ok = jnp.bool_(True)
    state = None
    dom_pix = dom_g = dom_valid = None
    for cap_rounds, dnm in levels:
        if state is None:
            gc, gs, s_out = _grad_tables_inner(
                *base_args, max_rounds=cap_rounds, emit_state=True,
                **base_kw)
            dom_s = s_out.reshape(-1)[:n_pix]
            dom_pix = jnp.arange(n_pix, dtype=jnp.int32) + base_off
            dom_g = g_img.reshape(n_pix, 3)
            dom_valid = jnp.ones((n_pix,), bool)
        else:
            gc, gs, s_out = _grad_tables_inner(
                *base_args, max_rounds=cap_rounds, emit_state=True,
                continuation_state=state, **base_kw)
            dom_s = s_out.reshape(-1)
        gcam = gcam + gc
        gsph = gsph + gs
        # dnm may be a float (tight capacity tracking of the survival
        # curve; e.g. 1.5 = two thirds of the padded lanes)
        cap_k = max(tile, int(n_padded / dnm) // tile * tile)
        alive = dom_valid & (dom_s < spp_f)
        ok = ok & (jnp.sum(alive.astype(jnp.int32)) <= cap_k)
        idx = jnp.nonzero(alive, size=cap_k, fill_value=-1)[0]
        valid = idx >= 0
        safe = jnp.maximum(idx, 0)
        pix_f = jnp.where(valid, dom_pix[safe], -1).astype(jnp.float32)
        s0 = jnp.where(valid, dom_s[safe], spp_f)
        gl = dom_g[safe] * valid[:, None]
        state = jnp.stack([pix_f, s0, gl[:, 0], gl[:, 1], gl[:, 2]]
                          ).reshape(5, cap_k // LANES, LANES)
        dom_pix = jnp.where(valid, dom_pix[safe], -1)
        dom_g = gl
        dom_valid = valid
    gc, gs = _grad_tables_inner(*base_args, continuation_state=state,
                                **base_kw)
    gcam = gcam + gc
    gsph = gsph + gs

    def _fallback(_):
        return _grad_tables_inner(*base_args, **base_kw)

    return jax.lax.cond(ok, lambda _: (gcam, gsph), _fallback, None)


# Ring depth of the MESH/HDR grad kernels.  The sphere kernel keeps
# MIN_SLOTS=64 (measured optimal); the mesh variants' ring carries 17
# rows and shares VMEM with the triangle weight table (and, for HDR
# consume, the per-sample sky rows) — at 64 slots the flagship consume
# sits ~0.4 MB past the 16 MB scoped limit.  Smaller rings also shrink
# the FORCED idle inside each round: every round runs n_slots fill+
# reverse iterations while the mean flagship lane needs ~17, so the
# floor sits AT max_depth (env OCLRT_MESH_GRAD_SLOTS to sweep).
import os as _os

MESH_GRAD_SLOTS = int(_os.environ.get("OCLRT_MESH_GRAD_SLOTS", "32"))


def _mesh_slots(cfg) -> int:
    return max(cfg.max_depth, MESH_GRAD_SLOTS)


def _grad_tables_mesh_inner(cam_tab, sph_tab, w_flat, aabb, boxes, mesh,
                            n_spheres, sky_kind, cfg, g_img, seed,
                            sample_base, n_samples, flags, interpret,
                            row_base=None, full_height=None,
                            max_rounds=None, emit_state: bool = False,
                            continuation_state=None):
    """Mesh-variant dispatch: 2-D image tiles (MESH_TILE_ROWS x LANES
    pixels — spatial compactness keeps the in-kernel cluster gates
    firing), VMEM-resident triangle weight table, ring with winner
    records.  row_base (traced i32) positions this g_img block's first
    ROW in the global image (sharded row blocks).

    max_rounds/emit_state/continuation_state: the tail-compaction ladder
    plumbing, exactly as in _grad_tables_inner (the packed state keeps
    raster pixel order, which preserves enough spatial coherence for the
    in-kernel cluster gates to keep firing)."""
    has_metal, has_diel, has_emit, has_fuzz, has_aperture = flags[:5]
    h, w = g_img.shape[0], g_img.shape[1]
    block_rows = g_img.shape[0]
    if full_height is not None:
        h = full_height

    n_slots = _mesh_slots(cfg)
    tile_rows = MESH_TILE_ROWS
    fast_acc = GRAD_FAST_ACC and n_spheres <= LANES
    kernel = _make_grad_kernel(
        n_spheres=n_spheres, width=w, height=h,
        spp=n_samples, max_depth=cfg.max_depth, t_min=cfg.t_min,
        sky_kind=sky_kind, clamp_samples=cfg.clamp_samples,
        has_metal=has_metal, has_diel=has_diel, has_emit=has_emit,
        has_fuzz=has_fuzz, has_aperture=has_aperture, n_slots=n_slots,
        tile_rows=tile_rows, mesh=mesh, fast_acc=fast_acc,
        max_rounds=max_rounds, emit_state=emit_state,
        continuation=continuation_state is not None)

    n_tr = -(-block_rows // tile_rows)
    n_tc = -(-w // LANES)
    hp, wp = n_tr * tile_rows, n_tc * LANES

    row0 = (jnp.int32(0) if row_base is None
            else jnp.asarray(row_base, jnp.int32))
    t_pad = max(1, mesh[0]) * mesh[1]
    off = jnp.stack([row0, jnp.int32(seed), jnp.int32(sample_base),
                     row0 + jnp.int32(block_rows)]).reshape(1, 4)
    scratch = [
        pltpu.VMEM((N_ST, tile_rows, LANES), jnp.float32),
        pltpu.VMEM((N_REC_MESH, n_slots * tile_rows, LANES),
                   jnp.float32),
        pltpu.VMEM((1, len(DIFF_FIELDS) + 1, LANES), jnp.float32),
        pltpu.VMEM((N_TRI_SC, tile_rows, LANES), jnp.float32),
    ] + ([pltpu.VMEM(
        _w_layout(n_spheres, has_metal, has_diel, has_fuzz),
        jnp.float32)] if fast_acc else [])
    out_shape = [jax.ShapeDtypeStruct((1, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((N_FIELDS, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((N_GTRI, t_pad), jnp.float32)]

    if continuation_state is not None:
        n2_rows = continuation_state.shape[1]
        assert n2_rows % tile_rows == 0
        out_specs = [
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FIELDS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_GTRI, t_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if emit_state:
            out_shape.append(jax.ShapeDtypeStruct((n2_rows, LANES),
                                                  jnp.float32))
            out_specs.append(pl.BlockSpec((tile_rows, LANES),
                                          lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(n2_rows // tile_rows,),
            in_specs=[
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FIELDS, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, w_flat.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),   # cluster AABBs
                pl.BlockSpec(memory_space=pltpu.SMEM),   # top boxes
                pl.BlockSpec((5, tile_rows, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(off, cam_tab, sph_tab, w_flat, aabb, boxes,
          continuation_state)
        return outs if emit_state else (outs[0], outs[1], outs[2])

    g = jnp.pad(g_img, ((0, hp - block_rows), (0, wp - w), (0, 0)))
    g = g.transpose(2, 0, 1)                     # (3, hp, wp)
    out_specs = [
        pl.BlockSpec((1, LANES), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_FIELDS, LANES), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_GTRI, t_pad), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if emit_state:
        out_shape.append(jax.ShapeDtypeStruct((hp, wp), jnp.float32))
        out_specs.append(pl.BlockSpec((tile_rows, LANES),
                                      lambda i, j: (i, j),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tr, n_tc),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, LANES), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FIELDS, LANES), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, w_flat.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cluster AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),   # top boxes
        ] + [pl.BlockSpec((tile_rows, LANES), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM) for _ in range(3)],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(off, cam_tab, sph_tab, w_flat, aabb, boxes, g[0], g[1], g[2])
    return outs if emit_state else (outs[0], outs[1], outs[2])


def _mesh_ladder_applicable(cfg) -> bool:
    """The mesh tail ladder pays off whenever a window spans more than
    one ring round (the uncapped while-loop then idles on its slowest
    lane) — which includes LOW-spp deep configs like the flagship's
    5 spp/d32 (bound 161 > 32 slots), not just high-spp ones.

    spp 17..63 is EXCLUDED: neither schedule family is calibrated there
    (the low-spp survival model extrapolates poorly toward its 5-spp
    anchor and the mid-spp round factors floor to over-tight caps), so
    those configs would mostly pay the ~2x overflow fallback — they run
    the plain uncapped kernel instead (the round-4 behavior)."""
    n_slots = _mesh_slots(cfg)
    if 16 < cfg.spp < GRAD_LADDER_MIN_SPP:
        return False
    return cfg.spp * cfg.max_depth + 1 > n_slots


def _grad_tables_mesh_laddered(cam_tab, sph_tab, w_flat, aabb, boxes,
                               mesh, n_spheres, sky_kind, cfg, g_img,
                               seed, sample_base, n_samples, flags,
                               interpret, levels=None, row_base=None,
                               full_height=None):
    """Multi-level tail-compaction ladder for the MESH backward kernel —
    the sphere ladder (_grad_tables_laddered) ported to the 2-D-tiled
    mesh dispatch.  Survivors compact in raster pixel order (spatial
    coherence for the cluster gates); a capacity overflow at any level
    falls back to the plain uncapped kernel via lax.cond."""
    h, w = g_img.shape[0], g_img.shape[1]
    block_rows = h
    full_h = h if full_height is None else full_height
    base_args = (cam_tab, sph_tab, w_flat, aabb, boxes, mesh, n_spheres,
                 sky_kind, cfg, g_img, seed, sample_base, n_samples,
                 flags, interpret)
    base_kw = dict(row_base=row_base, full_height=full_height)
    if w * full_h > 2 ** 24:     # f32-exact pixel-id guard (see sphere)
        return _grad_tables_mesh_inner(*base_args, **base_kw)
    n_slots = _mesh_slots(cfg)
    tile_rows = MESH_TILE_ROWS
    tile = tile_rows * LANES
    if levels is None:
        levels = _default_levels(n_samples, n_slots)
    n_tr = -(-block_rows // tile_rows)
    n_tc = -(-w // LANES)
    hp, wp = n_tr * tile_rows, n_tc * LANES
    n_padded = hp * wp
    row0 = (jnp.int32(0) if row_base is None
            else jnp.asarray(row_base, jnp.int32))
    spp_f = jnp.float32(n_samples)

    t_pad = max(1, mesh[0]) * mesh[1]
    gcam = jnp.zeros((1, LANES), jnp.float32)
    gsph = jnp.zeros((N_FIELDS, LANES), jnp.float32)
    gtri = jnp.zeros((N_GTRI, t_pad), jnp.float32)
    ok = jnp.bool_(True)
    state = None
    dom_pix = dom_g = dom_valid = None
    for cap_rounds, dnm in levels:
        if state is None:
            gc, gs, gt, s_out = _grad_tables_mesh_inner(
                *base_args, max_rounds=cap_rounds, emit_state=True,
                **base_kw)
            # padded-grid layout -> per-pixel domain arrays
            yy = jnp.arange(hp, dtype=jnp.int32)
            xx = jnp.arange(wp, dtype=jnp.int32)
            in_img = ((yy[:, None] < block_rows) & (xx[None, :] < w))
            dom_pix = ((row0 + yy[:, None]) * w + xx[None, :]
                       ).reshape(-1)
            gp = jnp.pad(g_img, ((0, hp - block_rows), (0, wp - w),
                                 (0, 0)))
            dom_g = gp.reshape(-1, 3)
            dom_valid = in_img.reshape(-1)
            dom_s = s_out.reshape(-1)
        else:
            gc, gs, gt, s_out = _grad_tables_mesh_inner(
                *base_args, max_rounds=cap_rounds, emit_state=True,
                continuation_state=state, **base_kw)
            dom_s = s_out.reshape(-1)
        gcam = gcam + gc
        gsph = gsph + gs
        gtri = gtri + gt
        # dnm may be a float (tight capacity tracking of the survival
        # curve; e.g. 1.5 = two thirds of the padded lanes)
        cap_k = max(tile, int(n_padded / dnm) // tile * tile)
        alive = dom_valid & (dom_s < spp_f)
        ok = ok & (jnp.sum(alive.astype(jnp.int32)) <= cap_k)
        idx = jnp.nonzero(alive, size=cap_k, fill_value=-1)[0]
        valid = idx >= 0
        safe = jnp.maximum(idx, 0)
        pix_f = jnp.where(valid, dom_pix[safe], -1).astype(jnp.float32)
        s0 = jnp.where(valid, dom_s[safe], spp_f)
        gl = dom_g[safe] * valid[:, None]
        state = jnp.stack([pix_f, s0, gl[:, 0], gl[:, 1], gl[:, 2]]
                          ).reshape(5, cap_k // LANES, LANES)
        dom_pix = jnp.where(valid, dom_pix[safe], -1)
        dom_g = gl
        dom_valid = valid
    gc, gs, gt = _grad_tables_mesh_inner(
        *base_args, continuation_state=state, **base_kw)
    gcam = gcam + gc
    gsph = gsph + gs
    gtri = gtri + gt

    def _fallback(_):
        return _grad_tables_mesh_inner(*base_args, **base_kw)

    return jax.lax.cond(ok, lambda _: (gcam, gsph, gtri), _fallback,
                        None)


# HDR backward runs over sample windows (two passes per window: emit miss
# directions -> jnp nearest-texel lookup -> consume); the window bounds the
# per-tile VMEM for the dirs/sky rows (3*spp_c each).
GRAD_HDR_SPP_CHUNK = 8


def _grad_tables_hdr_window(cam_tab, sph_tab, w_flat, aabb, boxes, mesh,
                            n_spheres, sky, cfg, g_img, seed,
                            sample_base, n_samples, flags, interpret,
                            row_base=None, full_height=None,
                            want_sky_cot: bool = True):
    """One HDR sample window: emit pass (fill-only kernel dumps the
    per-(pixel, sample) miss directions + throughputs and the non-sky
    contribution sum), nearest-texel sky lookup in jnp (XLA's native
    gathers — exactly the values the reverse needs, and exactly constant:
    the lookup has zero direction-derivative), consume pass (fill +
    reverse with the sky rows as VMEM input).  The emit pass replays the
    SAME fill code, so its directions match the consume pass's replay
    bitwise.

    Returns (gcam, gsph, gtri, g_sky): g_sky is the sky-IMAGE cotangent
    of this window (the per-texel environment-map gradient — scatter-add
    of thr * g_pixel at each miss sample's texel, exactly the jnp VJP's
    interior derivative; the nearest-texel index has zero direction-
    derivative so this is the complete sky.image cotangent).  Zeros when
    want_sky_cot=False."""
    from ..scene import sky_colour

    h, w = g_img.shape[0], g_img.shape[1]
    block_rows = g_img.shape[0]
    tile_rows = MESH_TILE_ROWS
    n_tr = -(-block_rows // tile_rows)
    n_tc = -(-w // LANES)
    hp, wp = n_tr * tile_rows, n_tc * LANES
    # tail ladders pay off whenever the window spans more than one ring
    # round (the uncapped while-loop then idles on its slowest lane)
    n_slots = _mesh_slots(cfg)
    use_ladder = n_samples * cfg.max_depth + 1 > n_slots
    emit_fn = _hdr_emit_laddered if use_ladder else _hdr_emit_window
    consume_fn = (_hdr_consume_laddered if use_ladder
                  else _hdr_consume_window)

    # ---- pass 1: emit miss directions + throughputs (+ non-sky sum) ----
    dirs, thrs, _emis = emit_fn(
        cam_tab, sph_tab, w_flat, aabb, boxes, mesh, n_spheres, cfg,
        block_rows, w, seed, sample_base, n_samples, flags, interpret,
        row_base=row_base, full_height=full_height)

    # ---- sky lookup (constant values; zero direction-derivative) ----
    d_v = dirs.reshape(n_samples, 3, hp, wp).transpose(0, 2, 3, 1)
    sk = sky_colour(sky, d_v)                     # (spp_c, hp, wp, 3)
    sky_rows = sk.transpose(0, 3, 1, 2).reshape(3 * n_samples, hp, wp)
    sky_rows = jax.lax.stop_gradient(sky_rows)

    # ---- sky-image cotangent (the per-texel environment gradient) ----
    if want_sky_cot:
        g_sky = _hdr_sky_cot(sky, cfg, d_v, thrs, sk, g_img, hp, wp,
                             block_rows, w, n_samples)
    else:
        g_sky = jnp.zeros_like(sky.image)

    gcam, gsph, gtri = consume_fn(
        cam_tab, sph_tab, w_flat, aabb, boxes, mesh, n_spheres, cfg,
        g_img, seed, sample_base, n_samples, flags, interpret, sky_rows,
        row_base=row_base, full_height=full_height)
    return gcam, gsph, gtri, g_sky


def _hdr_emit_window(cam_tab, sph_tab, w_flat, aabb, boxes, mesh,
                     n_spheres, cfg, block_rows, w, seed, sample_base,
                     n_samples, flags, interpret, row_base=None,
                     full_height=None, max_rounds=None,
                     emit_state: bool = False, continuation_state=None):
    """Emit pass of one HDR window (fill-only): returns
    (dirs (3*spp, hp, wp), thrs (3*spp, hp, wp), emis (3, hp, wp)) —
    per-(pixel, sample) miss directions and throughputs plus the window's
    non-sky contribution sum (emissive terminals).  dirs default to
    (0,0,1) and thrs to 0 for samples that never missed.

    max_rounds/emit_state/continuation_state: tail-ladder plumbing; a
    continuation returns packed (n_emit, n2_rows, LANES) planes the
    caller scatters back by pixel id (see _hdr_emit_laddered).  The
    state uses the uniform 5-row prefix (g rows ignored here)."""
    has_metal, has_diel, has_emit, has_fuzz, has_aperture = flags[:5]
    h = block_rows if full_height is None else full_height
    n_slots = _mesh_slots(cfg)
    tile_rows = MESH_TILE_ROWS
    n_tr = -(-block_rows // tile_rows)
    n_tc = -(-w // LANES)
    hp, wp = n_tr * tile_rows, n_tc * LANES
    row0 = (jnp.int32(0) if row_base is None
            else jnp.asarray(row_base, jnp.int32))
    off = jnp.stack([row0, jnp.int32(seed), jnp.int32(sample_base),
                     row0 + jnp.int32(block_rows)]).reshape(1, 4)
    kernel = _make_grad_kernel(
        n_spheres=n_spheres, width=w, height=h,
        spp=n_samples, max_depth=cfg.max_depth, t_min=cfg.t_min,
        sky_kind=KIND_HDR, clamp_samples=cfg.clamp_samples,
        has_metal=has_metal, has_diel=has_diel, has_emit=has_emit,
        has_fuzz=has_fuzz, has_aperture=has_aperture,
        n_slots=n_slots, tile_rows=tile_rows, mesh=mesh,
        hdr_mode="emit", max_rounds=max_rounds, emit_state=emit_state,
        continuation=continuation_state is not None)
    n_emit = 6 * n_samples + 3
    scratch = [
        pltpu.VMEM((N_ST, tile_rows, LANES), jnp.float32),
        pltpu.VMEM((N_TRI_SC, tile_rows, LANES), jnp.float32),
        pltpu.VMEM((n_emit, tile_rows, LANES), jnp.float32),
    ]

    if continuation_state is not None:
        n2_rows = continuation_state.shape[1]
        assert n2_rows % tile_rows == 0
        out_shape = [jax.ShapeDtypeStruct((n_emit, n2_rows, LANES),
                                          jnp.float32)]
        out_specs = [pl.BlockSpec((n_emit, tile_rows, LANES),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
        if emit_state:
            out_shape.append(jax.ShapeDtypeStruct((n2_rows, LANES),
                                                  jnp.float32))
            out_specs.append(pl.BlockSpec((tile_rows, LANES),
                                          lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(n2_rows // tile_rows,),
            in_specs=[
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FIELDS, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, w_flat.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((5, tile_rows, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(off, cam_tab, sph_tab, w_flat, aabb, boxes,
          continuation_state)
        return outs if emit_state else (outs[0],)

    base_specs = [
        pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, LANES), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_FIELDS, LANES), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, w_flat.shape[1]), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),   # cluster AABBs
        pl.BlockSpec(memory_space=pltpu.SMEM),   # top boxes
    ]
    emit_spec = pl.BlockSpec((n_emit, tile_rows, LANES),
                             lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_emit, hp, wp), jnp.float32)]
    out_specs = [emit_spec]
    if emit_state:
        out_shape.append(jax.ShapeDtypeStruct((hp, wp), jnp.float32))
        out_specs.append(pl.BlockSpec((tile_rows, LANES),
                                      lambda i, j: (i, j),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tr, n_tc),
        in_specs=base_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(off, cam_tab, sph_tab, w_flat, aabb, boxes)
    emit_out = outs[0]
    parts = (emit_out[:3 * n_samples],
             emit_out[3 * n_samples:6 * n_samples],
             emit_out[6 * n_samples:])
    return parts + (outs[1],) if emit_state else parts


def _hdr_sky_cot(sky, cfg, d_v, thrs, sk, g_img, hp, wp, block_rows, w,
                 n_samples):
    """Per-texel environment-map cotangent of one window: scatter-add of
    thr * g_pixel at each miss sample's texel — the jnp VJP's interior
    derivative (the nearest-texel index has zero direction-derivative).
    thr is zero for samples that never missed, so only genuine miss
    samples contribute (and padding pixels carry zero g)."""
    sh, sw = sky.image.shape[0], sky.image.shape[1]
    from ..scene.sky import direction_to_uv
    u, v = direction_to_uv(jax.lax.stop_gradient(d_v))
    tx = jnp.clip((u * sw).astype(jnp.int32), 0, sw - 1)
    ty = jnp.clip((v * sh).astype(jnp.int32), 0, sh - 1)
    thr_v = (thrs.reshape(n_samples, 3, hp, wp)
             .transpose(0, 2, 3, 1))           # (spp, hp, wp, 3)
    gpix = jnp.pad(g_img, ((0, hp - block_rows), (0, wp - w), (0, 0)))
    contrib = thr_v * gpix[None]
    if cfg.clamp_samples:
        # the per-sample clamp's subgradient at the contribution
        # thr*sky: 1 inside, 0 above, and jax's min-at-tie 0.5 AT
        # exactly 1.0 (tone-mapped texels can round to 1.0f even
        # though the map is < 1 mathematically) — matches the jnp
        # VJP and the consume pass's own clamp transpose
        x = jax.lax.stop_gradient(thr_v * sk)
        cf = jnp.where(x < 1.0, 1.0, jnp.where(x > 1.0, 0.0, 0.5))
        cf = jnp.where(jnp.isnan(x), 0.0, cf)
        contrib = contrib * cf
    return jnp.zeros((sh, sw, 3), jnp.float32).at[
        ty.reshape(-1), tx.reshape(-1)].add(contrib.reshape(-1, 3))


def _hdr_consume_window(cam_tab, sph_tab, w_flat, aabb, boxes, mesh,
                        n_spheres, cfg, g_img, seed, sample_base,
                        n_samples, flags, interpret, sky_rows,
                        row_base=None, full_height=None,
                        max_rounds=None, emit_state: bool = False,
                        continuation_state=None):
    """Consume pass of one HDR window: fill + reverse with the
    per-(pixel, sample) sky rows resident in VMEM.

    max_rounds/emit_state/continuation_state: tail-ladder plumbing.  A
    continuation state has 5 + 3*spp rows (the uniform prefix + each
    lane's per-sample sky values); sky_rows is then ignored."""
    has_metal, has_diel, has_emit, has_fuzz, has_aperture = flags[:5]
    h, w = g_img.shape[0], g_img.shape[1]
    block_rows = g_img.shape[0]
    if full_height is not None:
        h = full_height
    n_slots = _mesh_slots(cfg)
    tile_rows = MESH_TILE_ROWS
    n_tr = -(-block_rows // tile_rows)
    n_tc = -(-w // LANES)
    hp, wp = n_tr * tile_rows, n_tc * LANES
    row0 = (jnp.int32(0) if row_base is None
            else jnp.asarray(row_base, jnp.int32))
    off = jnp.stack([row0, jnp.int32(seed), jnp.int32(sample_base),
                     row0 + jnp.int32(block_rows)]).reshape(1, 4)
    # fast_acc is OFF for the HDR consume: with the per-sample sky rows
    # resident, the fast-acc path's vector-register spill overflows the
    # 16 MB scoped-VMEM limit by ~0.4 MB (measured on the flagship);
    # the mesh reverse is triangle-matmul-dominated, so the per-scalar
    # accumulation costs little here.
    fast_acc = False
    kernel = _make_grad_kernel(
        n_spheres=n_spheres, width=w, height=h,
        spp=n_samples, max_depth=cfg.max_depth, t_min=cfg.t_min,
        sky_kind=KIND_HDR, clamp_samples=cfg.clamp_samples,
        has_metal=has_metal, has_diel=has_diel, has_emit=has_emit,
        has_fuzz=has_fuzz, has_aperture=has_aperture,
        n_slots=n_slots, tile_rows=tile_rows, mesh=mesh,
        hdr_mode="consume", fast_acc=fast_acc, max_rounds=max_rounds,
        emit_state=emit_state,
        continuation=continuation_state is not None)
    t_pad = max(1, mesh[0]) * mesh[1]
    scratch = [
        pltpu.VMEM((N_ST, tile_rows, LANES), jnp.float32),
        pltpu.VMEM((N_REC_MESH, n_slots * tile_rows, LANES),
                   jnp.float32),
        pltpu.VMEM((1, len(DIFF_FIELDS) + 1, LANES), jnp.float32),
        pltpu.VMEM((N_TRI_SC, tile_rows, LANES), jnp.float32),
    ] + ([pltpu.VMEM(
        _w_layout(n_spheres, has_metal, has_diel, has_fuzz),
        jnp.float32)] if fast_acc else [])
    out_shape = [jax.ShapeDtypeStruct((1, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((N_FIELDS, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((N_GTRI, t_pad), jnp.float32)]

    if continuation_state is not None:
        n_state = 5 + 3 * n_samples
        assert continuation_state.shape[0] == n_state
        n2_rows = continuation_state.shape[1]
        assert n2_rows % tile_rows == 0
        out_specs = [
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FIELDS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_GTRI, t_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if emit_state:
            out_shape.append(jax.ShapeDtypeStruct((n2_rows, LANES),
                                                  jnp.float32))
            out_specs.append(pl.BlockSpec((tile_rows, LANES),
                                          lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(n2_rows // tile_rows,),
            in_specs=[
                pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_FIELDS, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, w_flat.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((n_state, tile_rows, LANES),
                             lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(off, cam_tab, sph_tab, w_flat, aabb, boxes,
          continuation_state)
        return outs if emit_state else (outs[0], outs[1], outs[2])

    base_specs = [
        pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, LANES), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_FIELDS, LANES), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, w_flat.shape[1]), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),   # cluster AABBs
        pl.BlockSpec(memory_space=pltpu.SMEM),   # top boxes
    ]
    rows_spec = pl.BlockSpec((tile_rows, LANES), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    sky_spec = pl.BlockSpec((3 * n_samples, tile_rows, LANES),
                            lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    g = jnp.pad(g_img, ((0, hp - block_rows), (0, wp - w), (0, 0)))
    g = g.transpose(2, 0, 1)
    out_specs = [
        pl.BlockSpec((1, LANES), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_FIELDS, LANES), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_GTRI, t_pad), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if emit_state:
        out_shape.append(jax.ShapeDtypeStruct((hp, wp), jnp.float32))
        out_specs.append(pl.BlockSpec((tile_rows, LANES),
                                      lambda i, j: (i, j),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tr, n_tc),
        in_specs=base_specs + [sky_spec, rows_spec, rows_spec, rows_spec],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(off, cam_tab, sph_tab, w_flat, aabb, boxes, sky_rows,
      g[0], g[1], g[2])
    return outs if emit_state else (outs[0], outs[1], outs[2])


def _hdr_consume_laddered(cam_tab, sph_tab, w_flat, aabb, boxes, mesh,
                          n_spheres, cfg, g_img, seed, sample_base,
                          n_samples, flags, interpret, sky_rows,
                          levels=None, row_base=None, full_height=None):
    """Tail-compaction ladder for the HDR consume pass: survivors carry
    their per-sample sky values in the packed state (rows 5..5+3*spp).
    Overflow at any level falls back to the plain uncapped consume."""
    h, w = g_img.shape[0], g_img.shape[1]
    tile_rows = MESH_TILE_ROWS
    tile = tile_rows * LANES
    base_args = (cam_tab, sph_tab, w_flat, aabb, boxes, mesh, n_spheres,
                 cfg, g_img, seed, sample_base, n_samples, flags,
                 interpret, sky_rows)
    base_kw = dict(row_base=row_base, full_height=full_height)
    full_h = h if full_height is None else full_height
    if w * full_h > 2 ** 24:     # f32-exact pixel-id guard
        return _hdr_consume_window(*base_args, **base_kw)
    n_slots = _mesh_slots(cfg)
    if levels is None:
        levels = _default_levels(n_samples, n_slots)
    n_tr = -(-h // tile_rows)
    n_tc = -(-w // LANES)
    hp, wp = n_tr * tile_rows, n_tc * LANES
    n_padded = hp * wp
    row0 = (jnp.int32(0) if row_base is None
            else jnp.asarray(row_base, jnp.int32))
    spp_f = jnp.float32(n_samples)
    t_pad = max(1, mesh[0]) * mesh[1]

    gcam = jnp.zeros((1, LANES), jnp.float32)
    gsph = jnp.zeros((N_FIELDS, LANES), jnp.float32)
    gtri = jnp.zeros((N_GTRI, t_pad), jnp.float32)
    ok = jnp.bool_(True)
    state = None
    dom_pix = dom_g = dom_valid = dom_sky = None
    for cap_rounds, dnm in levels:
        if state is None:
            gc, gs, gt, s_out = _hdr_consume_window(
                *base_args, max_rounds=cap_rounds, emit_state=True,
                **base_kw)
            yy = jnp.arange(hp, dtype=jnp.int32)
            xx = jnp.arange(wp, dtype=jnp.int32)
            in_img = ((yy[:, None] < h) & (xx[None, :] < w))
            dom_pix = ((row0 + yy[:, None]) * w + xx[None, :]
                       ).reshape(-1)
            gp = jnp.pad(g_img, ((0, hp - h), (0, wp - w), (0, 0)))
            dom_g = gp.reshape(-1, 3)
            dom_valid = in_img.reshape(-1)
            dom_sky = sky_rows.reshape(3 * n_samples, -1)
            dom_s = s_out.reshape(-1)
        else:
            gc, gs, gt, s_out = _hdr_consume_window(
                *base_args, max_rounds=cap_rounds, emit_state=True,
                continuation_state=state, **base_kw)
            dom_s = s_out.reshape(-1)
        gcam = gcam + gc
        gsph = gsph + gs
        gtri = gtri + gt
        cap_k = max(tile, int(n_padded / dnm) // tile * tile)
        alive = dom_valid & (dom_s < spp_f)
        ok = ok & (jnp.sum(alive.astype(jnp.int32)) <= cap_k)
        idx = jnp.nonzero(alive, size=cap_k, fill_value=-1)[0]
        valid = idx >= 0
        safe = jnp.maximum(idx, 0)
        pix_f = jnp.where(valid, dom_pix[safe], -1).astype(jnp.float32)
        s0 = jnp.where(valid, dom_s[safe], spp_f)
        gl = dom_g[safe] * valid[:, None]
        skyl = dom_sky[:, safe] * valid[None, :]
        state = jnp.concatenate(
            [jnp.stack([pix_f, s0, gl[:, 0], gl[:, 1], gl[:, 2]]),
             skyl]).reshape(5 + 3 * n_samples, cap_k // LANES, LANES)
        dom_pix = jnp.where(valid, dom_pix[safe], -1)
        dom_g = gl
        dom_sky = skyl
        dom_valid = valid
    gc, gs, gt = _hdr_consume_window(*base_args,
                                     continuation_state=state, **base_kw)
    gcam = gcam + gc
    gsph = gsph + gs
    gtri = gtri + gt

    def _fallback(_):
        return _hdr_consume_window(*base_args, **base_kw)

    return jax.lax.cond(ok, lambda _: (gcam, gsph, gtri), _fallback,
                        None)


def _hdr_emit_laddered(cam_tab, sph_tab, w_flat, aabb, boxes, mesh,
                       n_spheres, cfg, block_rows, w, seed, sample_base,
                       n_samples, flags, interpret, levels=None,
                       row_base=None, full_height=None):
    """Tail-compaction ladder for the HDR emit pass.

    Packed levels return per-lane dsc planes; they are merged back into
    the full (hp, wp) arrays by pixel id with per-sample window masks —
    sample s of a lane belongs to the level where s0 <= s < s_end, which
    is exactly the level whose dsc recorded its (possible) miss.  The
    non-sky contribution planes merge by addition (a sample's terminal
    contribution lands in exactly one level).  Overflow at any level
    falls back to the plain uncapped emit."""
    tile_rows = MESH_TILE_ROWS
    tile = tile_rows * LANES
    base_args = (cam_tab, sph_tab, w_flat, aabb, boxes, mesh, n_spheres,
                 cfg, block_rows, w, seed, sample_base, n_samples, flags,
                 interpret)
    base_kw = dict(row_base=row_base, full_height=full_height)
    full_h = block_rows if full_height is None else full_height
    if w * full_h > 2 ** 24:     # f32-exact pixel-id guard
        return _hdr_emit_window(*base_args, **base_kw)
    n_slots = _mesh_slots(cfg)
    if levels is None:
        levels = _default_levels(n_samples, n_slots)
    n_tr = -(-block_rows // tile_rows)
    n_tc = -(-w // LANES)
    hp, wp = n_tr * tile_rows, n_tc * LANES
    n_padded = hp * wp
    row0 = (jnp.int32(0) if row_base is None
            else jnp.asarray(row_base, jnp.int32))
    spp_f = jnp.float32(n_samples)

    # ---- level 0: grid-mapped capped emit ----
    (cap0, dnm0), rest = levels[0], levels[1:]
    dirs, thrs, emis, s_out = _hdr_emit_window(
        *base_args, max_rounds=cap0, emit_state=True, **base_kw)
    dirs_full = dirs.reshape(3 * n_samples, -1)
    thrs_full = thrs.reshape(3 * n_samples, -1)
    emis_full = emis.reshape(3, -1)
    yy = jnp.arange(hp, dtype=jnp.int32)
    xx = jnp.arange(wp, dtype=jnp.int32)
    in_img = ((yy[:, None] < block_rows) & (xx[None, :] < w))
    dom_pix = ((row0 + yy[:, None]) * w + xx[None, :]).reshape(-1)
    dom_valid = in_img.reshape(-1)
    dom_s = s_out.reshape(-1)
    ok = jnp.bool_(True)

    def compact(dom_pix, dom_valid, dom_s, dnm, ok):
        cap_k = max(tile, int(n_padded / dnm) // tile * tile)
        alive = dom_valid & (dom_s < spp_f)
        ok = ok & (jnp.sum(alive.astype(jnp.int32)) <= cap_k)
        idx = jnp.nonzero(alive, size=cap_k, fill_value=-1)[0]
        valid = idx >= 0
        safe = jnp.maximum(idx, 0)
        pix = jnp.where(valid, dom_pix[safe], -1)
        s0 = jnp.where(valid, dom_s[safe], spp_f)
        zg = jnp.zeros_like(s0)
        state = jnp.stack([pix.astype(jnp.float32), s0, zg, zg, zg]
                          ).reshape(5, cap_k // LANES, LANES)
        return state, pix, valid, s0, ok

    def merge(packed, pix, valid, s_lo, s_hi):
        """Scatter a packed level's dsc planes back by pixel id; sample
        s of a lane wins where s_lo <= s < s_hi (the samples this level
        actually processed)."""
        nonlocal dirs_full, thrs_full, emis_full
        y = pix // w - row0
        x = pix % w
        pos = jnp.where(valid, y * wp + x, n_padded)

        def scat(rowvals):
            return jnp.zeros((n_padded + 1,), jnp.float32).at[
                pos].set(rowvals)[:n_padded]

        pk = packed.reshape(6 * n_samples + 3, -1)
        lo_n = scat(s_lo)
        hi_n = scat(jnp.where(valid, s_hi, 0.0))
        for s in range(n_samples):
            m = (lo_n <= jnp.float32(s)) & (jnp.float32(s) < hi_n)
            for c in range(3):
                r = 3 * s + c
                dirs_full = dirs_full.at[r].set(
                    jnp.where(m, scat(pk[r]), dirs_full[r]))
                thrs_full = thrs_full.at[r].set(
                    jnp.where(m, scat(pk[3 * n_samples + r]),
                              thrs_full[r]))
        for c in range(3):
            emis_full = emis_full.at[c].add(scat(pk[6 * n_samples + c]))

    state, pix_p, valid_p, s0_p, ok = compact(dom_pix, dom_valid, dom_s,
                                              dnm0, ok)
    for cap_rounds, dnm in rest:
        packed, s_out = _hdr_emit_window(
            *base_args, max_rounds=cap_rounds, emit_state=True,
            continuation_state=state, **base_kw)
        dom_s = s_out.reshape(-1)
        merge(packed, pix_p, valid_p, s0_p, dom_s)
        state, pix_p, valid_p, s0_p, ok = compact(pix_p, valid_p, dom_s,
                                                  dnm, ok)
    (packed,) = _hdr_emit_window(*base_args, continuation_state=state,
                                 **base_kw)
    merge(packed, pix_p, valid_p, s0_p,
          jnp.full_like(s0_p, spp_f))
    laddered = (dirs_full.reshape(3 * n_samples, hp, wp),
                thrs_full.reshape(3 * n_samples, hp, wp),
                emis_full.reshape(3, hp, wp))

    def _fallback(_):
        return _hdr_emit_window(*base_args, **base_kw)

    return jax.lax.cond(ok, lambda _: laddered, _fallback, None)


def supports_grad_hdr(scene: Scene, cfg: RenderConfig) -> bool:
    """HDR-sky scenes the backward kernel covers: supports_mesh's HDR
    conditions (tone-mapped sky < 1 and albedos <= 1 so the per-sample
    clamp is a no-op for sky contributions; uniform mesh material behind
    a box when triangles exist) up to GRAD_MAX_SPHERES spheres.  The sky
    IMAGE cotangent is real (per-texel scatter of thr * g_pixel from the
    emit pass — the complete environment-map gradient, since the
    nearest-texel index has zero direction-derivative); triangle VERTEX
    cotangents are real (see supports_grad_mesh); per-triangle MATERIAL
    fields are held fixed."""
    from .megamesh import supports_mesh
    return (scene.sky.kind == KIND_HDR
            and scene.spheres.count <= GRAD_MAX_SPHERES
            and supports_mesh(scene, cfg))


def supports_grad_mesh(scene: Scene, cfg: RenderConfig) -> bool:
    """Mesh scenes the backward kernel covers: triangles with one uniform
    material behind >= 1 gating box (reference semantics,
    gpu_kernel.cl:374-391), gradient/constant sky, <= GRAD_MAX_SPHERES
    spheres.  Triangle VERTEX cotangents (p0/p1/p2) are real: interior
    derivatives accumulated per triangle via the plane-cotangent ring
    (_tri_vertex_cots); silhouette gradients stay in tracer/soft.py.
    Triangle MATERIAL cotangents (albedo/fuzz/ior per triangle) are
    real since round 5 (per-winner accumulation of the uniform-material
    plane leaves, _tri_material_cots) — exact at the uniform primal the
    scope requires, matching the jnp VJP per triangle.  FITTING
    per-triangle materials still needs the jnp path: one step breaks
    the uniformity this scope depends on."""
    from .megamesh import _mesh_uniform_material
    return (scene.triangles.count > 0
            and scene.boxes.count >= 1
            and scene.sky.kind in (KIND_GRADIENT, KIND_CONST)
            and scene.spheres.count <= GRAD_MAX_SPHERES
            and _mesh_uniform_material(scene) is not None)


def render_grad_scene(scene: Scene, cfg: RenderConfig, g_img, seed,
                      interpret: bool = False):
    """Scene-pytree cotangent for image cotangent g_img (H, W, 3).

    Equivalent to (but far faster than) the jnp wavefront VJP in
    render_grad_sampled: kernel-side table cotangents chained through the
    differentiable table builders.  The inner call is jitted (the Pallas
    kernel trace alone costs seconds); flags need the concrete scene, so
    they are derived out here.

    Mesh scenes (supports_grad_mesh) run the mesh variant: sphere /
    camera / const-sky cotangents flow through triangle bounces, and the
    triangle p0/p1/p2 leaves carry real interior vertex gradients
    (plane-cotangent accumulation; triangle material fields stay zero —
    see supports_grad_mesh).
    """
    if scene.sky.kind == KIND_HDR:
        from ..tracer.clusters import plan_for_scene
        from .megamesh import MESH_CHUNK, specialize_mesh_flags
        assert supports_grad_hdr(scene, cfg), \
            "scene outside HDR grad-kernel scope"
        plan = plan_for_scene(scene, MESH_CHUNK)
        mf = specialize_mesh_flags(scene)
        return _grad_scene_hdr_jit(scene, cfg, g_img, jnp.int32(seed),
                                   mf[:5], mf[5], plan, interpret)
    if scene.triangles.count > 0:
        from ..tracer.clusters import plan_for_scene
        from .megamesh import MESH_CHUNK, specialize_mesh_flags
        assert supports_grad_mesh(scene, cfg), \
            "scene outside mesh grad-kernel scope"
        plan = plan_for_scene(scene, MESH_CHUNK)
        mf = specialize_mesh_flags(scene)
        return _grad_scene_mesh_jit(scene, cfg, g_img, jnp.int32(seed),
                                    mf[:5], mf[5], plan, interpret)
    flags = specialize_flags(scene)
    return _grad_scene_jit(scene, cfg, g_img, jnp.int32(seed), flags,
                           interpret)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "flags", "interpret"))
def _grad_scene_jit(scene, cfg, g_img, seed, flags, interpret):
    def build(s):
        return _camera_table(s), _sphere_table(s)

    (cam_tab, sph_tab), build_vjp = jax.vjp(build, scene)
    # the kernel accumulates raw per-sample contributions; the rendered
    # image is their mean, so the mean-image cotangent carries 1/spp
    tables = (_grad_tables_laddered if cfg.spp >= GRAD_LADDER_MIN_SPP
              else _grad_tables_inner)
    gcam, gsph = tables(
        cam_tab, sph_tab, scene.spheres.count, scene.sky.kind, cfg,
        g_img / jnp.float32(cfg.spp), seed, jnp.int32(0),
        cfg.spp, flags, interpret)
    (s_bar,) = build_vjp((gcam, gsph))
    return s_bar


def _tri_vertex_cots(scene, plan, gtri):
    """Chain per-triangle plane cotangents to vertex cotangents.

    gtri: (4, T_pad) accumulated (d_nx, d_ny, d_nz, d_c) in PLAN order.
    The kernel's triangle leaves are exactly the stored plane quantities
    (mesh_accel._features_from): n = (p1-p0) x (p2-p0) and c = n . p0
    (the weight table's t columns are [n, -c]); one vjp through that
    builder and an un-permute gives (dp0, dp1, dp2) in scene order.
    This is analytically the Moller-Trumbore interior derivative: t =
    (c - n.o)/(n.d) is the same function of the vertices as MT's
    t = e2.qvec/det.
    """
    from ..tracer.clusters import permute
    p0 = permute(scene.triangles.p0, plan)
    p1 = permute(scene.triangles.p1, plan)
    p2 = permute(scene.triangles.p2, plan)

    def plane(q0, q1, q2):
        n = jnp.cross(q1 - q0, q2 - q0)
        return n, jnp.sum(n * q0, axis=-1)

    _, pvjp = jax.vjp(plane, p0, p1, p2)
    dp0, dp1, dp2 = pvjp((gtri[0:3].T, gtri[3]))
    perm = plan.perm                       # numpy (T_pad,), -1 padding
    idx = perm[perm >= 0]                  # static fancy index

    def unperm(dp, ref):
        return jnp.zeros_like(ref).at[idx].add(dp[perm >= 0])

    tris = scene.triangles
    return (unperm(dp0, tris.p0), unperm(dp1, tris.p1),
            unperm(dp2, tris.p2))


def _tri_material_cots(scene, plan, gtri):
    """Chain per-triangle material-plane cotangents to the Triangles
    material leaves.  gtri rows 4:10 hold (d_albedo rgb, d_fuzz, d_ior,
    d_invior) accumulated per winner id in PLAN order; the kernel reads
    inv_ior = 1/max(ior, 1e-8) as a separate leaf, so its cotangent
    chains back with d(1/x)/dx = -1/x^2.  Exact per-triangle gradients
    at the uniform-material primal (supports_grad_mesh)."""
    from ..tracer.clusters import permute
    perm = plan.perm
    idx = perm[perm >= 0]

    def unperm(dp, ref):
        return jnp.zeros_like(ref).at[idx].add(dp[perm >= 0])

    tris = scene.triangles
    d_alb = unperm(gtri[4:7].T, tris.albedo)
    d_fuzz = unperm(gtri[7], tris.fuzz)
    ior_p = permute(tris.ior, plan, fill=1.0)
    safe = jnp.maximum(ior_p, 1e-8)
    d_ior_plan = gtri[8] - gtri[9] / (safe * safe)
    d_ior = unperm(d_ior_plan, tris.ior)
    return d_alb, d_fuzz, d_ior


def _add_tri_cots(s_bar, scene, plan, gtri):
    """Add vertex AND material cotangents into the Scene cotangent
    pytree."""
    import dataclasses
    dp0, dp1, dp2 = _tri_vertex_cots(scene, plan, gtri)
    d_alb, d_fuzz, d_ior = _tri_material_cots(scene, plan, gtri)
    tri_bar = s_bar.triangles
    tri_bar = dataclasses.replace(tri_bar, p0=tri_bar.p0 + dp0,
                                  p1=tri_bar.p1 + dp1,
                                  p2=tri_bar.p2 + dp2,
                                  albedo=tri_bar.albedo + d_alb,
                                  fuzz=tri_bar.fuzz + d_fuzz,
                                  ior=tri_bar.ior + d_ior)
    return dataclasses.replace(s_bar, triangles=tri_bar)


def render_grad_hdr_fused(scene: Scene, cfg: RenderConfig, loss_fn,
                          seed, interpret: bool = False):
    """(loss, image, scene-cotangent) for an HDR-sky scene in ONE fused
    pipeline — the forward render is free.

    Phase A emits every sample window once (miss directions +
    throughputs + the non-sky contribution sums); the forward image is
    reconstructed from them (img = non-sky + sum_s thr_s * sky(dir_s),
    exactly the megamesh deferred-sky estimator under the "zero" NaN
    policy).  Phase B computes the loss cotangent from that image.
    Phase C consumes each window (fill + reverse) with the phase-A sky
    values resident and scatters the per-texel sky cotangents.  vs
    render() + render_grad_scene this saves one full path trace of the
    scene per call (the separate forward render — the round-4 VERDICT's
    "emit/consume two-pass tax" item).

    Memory: phase A stashes each window's miss directions + throughputs
    in HBM until its phase-C consume (6 f32 planes per sample ≈ 22 MB
    per sample at 720p — ~5.5 GB at 250 spp; fine on a 16 GB chip, but
    very high spp x resolution combinations should fall back to
    render() + render_grad_scene, which holds one window at a time)."""
    from ..tracer.clusters import plan_for_scene
    from .megamesh import MESH_CHUNK, specialize_mesh_flags
    assert supports_grad_hdr(scene, cfg), \
        "scene outside HDR grad-kernel scope"
    plan = plan_for_scene(scene, MESH_CHUNK)
    mf = specialize_mesh_flags(scene)
    return _grad_hdr_fused_jit(scene, cfg, loss_fn, jnp.int32(seed),
                               mf[:5], mf[5], plan, interpret)


@functools.partial(jax.jit, static_argnames=("cfg", "loss_fn", "flags",
                                             "m_type", "plan",
                                             "interpret"))
def _grad_hdr_fused_jit(scene, cfg, loss_fn, seed, flags, m_type, plan,
                        interpret):
    from ..scene import sky_colour
    from .megamesh import _mesh_camera_table, _mesh_tables

    def build(s):
        return _mesh_camera_table(s), _sphere_table(s)

    (cam_tab, sph_tab), build_vjp = jax.vjp(build, scene)
    w_flat, aabb, boxes, n_chunks, chunk, bids = _mesh_tables(
        jax.lax.stop_gradient(scene), plan)
    mesh = (n_chunks, chunk, bids, max(1, scene.boxes.count), m_type)
    n_spheres = scene.spheres.count
    h, w = cfg.height, cfg.width
    tile_rows = MESH_TILE_ROWS
    n_tr = -(-h // tile_rows)
    n_tc = -(-w // LANES)
    hp, wp = n_tr * tile_rows, n_tc * LANES
    sky = scene.sky
    sg = jax.lax.stop_gradient
    windows = [(s0, min(GRAD_HDR_SPP_CHUNK, cfg.spp - s0))
               for s0 in range(0, cfg.spp, GRAD_HDR_SPP_CHUNK)]
    n_slots = _mesh_slots(cfg)

    def emit_fn(spp_c):
        return (_hdr_emit_laddered
                if spp_c * cfg.max_depth + 1 > n_slots
                else _hdr_emit_window)

    def consume_fn(spp_c):
        return (_hdr_consume_laddered
                if spp_c * cfg.max_depth + 1 > n_slots
                else _hdr_consume_window)

    # ---- phase A: emit every window; reconstruct the forward image ----
    img_sum = jnp.zeros((hp, wp, 3), jnp.float32)
    stash = []
    for s_base, spp_c in windows:
        dirs, thrs, emis = emit_fn(spp_c)(
            cam_tab, sph_tab, w_flat, aabb, boxes, mesh, n_spheres, cfg,
            h, w, seed, jnp.int32(s_base), spp_c, flags, interpret)
        d_v = dirs.reshape(spp_c, 3, hp, wp).transpose(0, 2, 3, 1)
        thr_v = thrs.reshape(spp_c, 3, hp, wp).transpose(0, 2, 3, 1)
        sk = sg(sky_colour(sky, d_v))
        # per-sample miss contribution = clamp(thr * sky) with NaN -> 0
        # (the estimator's own quirks; clamp is a value no-op under
        # supports_grad_hdr but applied anyway for exactness)
        prod = thr_v * sk
        if cfg.clamp_samples:
            prod = jnp.clip(prod, 0.0, 1.0)
        prod = jnp.where(jnp.isnan(prod), 0.0, prod)
        img_sum = img_sum + emis.transpose(1, 2, 0) + jnp.sum(prod, 0)
        stash.append((dirs, thrs))

    img = (img_sum * jnp.float32(1.0 / cfg.spp))[:h, :w]
    loss, g_img = jax.value_and_grad(loss_fn)(img)
    g_scaled = g_img / jnp.float32(cfg.spp)

    # ---- phase C: consume each window with the stashed sky values ----
    gcam = jnp.zeros((1, LANES), jnp.float32)
    gsph = jnp.zeros((N_FIELDS, LANES), jnp.float32)
    gtri = jnp.zeros((N_GTRI, max(1, n_chunks) * chunk), jnp.float32)
    g_sky = jnp.zeros_like(sky.image)
    for (s_base, spp_c), (dirs, thrs) in zip(windows, stash):
        d_v = dirs.reshape(spp_c, 3, hp, wp).transpose(0, 2, 3, 1)
        sk = sg(sky_colour(sky, d_v))
        sky_rows = sk.transpose(0, 3, 1, 2).reshape(3 * spp_c, hp, wp)
        g_sky = g_sky + _hdr_sky_cot(sky, cfg, d_v, thrs, sk, g_scaled,
                                     hp, wp, h, w, spp_c)
        gc, gs, gt = consume_fn(spp_c)(
            cam_tab, sph_tab, w_flat, aabb, boxes, mesh, n_spheres, cfg,
            g_scaled, seed, jnp.int32(s_base), spp_c, flags, interpret,
            sky_rows)
        gcam = gcam + gc
        gsph = gsph + gs
        gtri = gtri + gt
    (s_bar,) = build_vjp((gcam, gsph))
    if scene.triangles.count > 0 and n_chunks > 0:
        s_bar = _add_tri_cots(s_bar, scene, plan, gtri)
    import dataclasses
    s_bar = dataclasses.replace(
        s_bar, sky=dataclasses.replace(s_bar.sky,
                                       image=s_bar.sky.image + g_sky))
    return loss, img, s_bar


@functools.partial(jax.jit, static_argnames=("cfg", "flags", "m_type",
                                             "plan", "interpret"))
def _grad_scene_hdr_jit(scene, cfg, g_img, seed, flags, m_type, plan,
                        interpret):
    from .megamesh import _mesh_camera_table, _mesh_tables

    def build(s):
        return _mesh_camera_table(s), _sphere_table(s)

    (cam_tab, sph_tab), build_vjp = jax.vjp(build, scene)
    w_flat, aabb, boxes, n_chunks, chunk, bids = _mesh_tables(
        jax.lax.stop_gradient(scene), plan)
    mesh = (n_chunks, chunk, bids, max(1, scene.boxes.count), m_type)
    g_scaled = g_img / jnp.float32(cfg.spp)
    gcam = jnp.zeros((1, LANES), jnp.float32)
    gsph = jnp.zeros((N_FIELDS, LANES), jnp.float32)
    gtri = jnp.zeros((N_GTRI, max(1, n_chunks) * chunk), jnp.float32)
    g_sky = jnp.zeros_like(scene.sky.image)
    # sample windows bound the per-tile dirs/sky VMEM rows; window sums
    # are exact (the estimator is sample-linear under the "zero" policy)
    for s_base in range(0, cfg.spp, GRAD_HDR_SPP_CHUNK):
        spp_c = min(GRAD_HDR_SPP_CHUNK, cfg.spp - s_base)
        gc, gs, gt, gk = _grad_tables_hdr_window(
            cam_tab, sph_tab, w_flat, aabb, boxes, mesh,
            scene.spheres.count, scene.sky, cfg, g_scaled, seed,
            jnp.int32(s_base), spp_c, flags, interpret)
        gcam = gcam + gc
        gsph = gsph + gs
        gtri = gtri + gt
        g_sky = g_sky + gk
    (s_bar,) = build_vjp((gcam, gsph))
    if scene.triangles.count > 0 and n_chunks > 0:
        s_bar = _add_tri_cots(s_bar, scene, plan, gtri)
    # per-texel environment-map cotangent (real since round 5; the
    # nearest-texel lookup has zero direction-derivative, so this is the
    # complete sky.image gradient, matching the jnp VJP)
    import dataclasses
    sky_bar = dataclasses.replace(s_bar.sky,
                                  image=s_bar.sky.image + g_sky)
    return dataclasses.replace(s_bar, sky=sky_bar)


@functools.partial(jax.jit, static_argnames=("cfg", "flags", "m_type",
                                             "plan", "interpret"))
def _grad_scene_mesh_jit(scene, cfg, g_img, seed, flags, m_type, plan,
                         interpret):
    from .megamesh import _mesh_camera_table, _mesh_tables

    def build(s):
        return _mesh_camera_table(s), _sphere_table(s)

    (cam_tab, sph_tab), build_vjp = jax.vjp(build, scene)
    # triangle tables are built OUTSIDE the vjp: the kernel instead
    # accumulates per-triangle PLANE cotangents (gtri) which are chained
    # through the plane builder below — the exact vertex gradients of the
    # interior-derivative convention.  The C_MA_* slots of the mesh
    # camera table are never accumulated by the kernel, so build_vjp
    # returns exactly-zero cotangents for the triangle material leaves
    # (uniform mesh material held fixed, reference semantics).
    w_flat, aabb, boxes, n_chunks, chunk, bids = _mesh_tables(
        jax.lax.stop_gradient(scene), plan)
    mesh_tables = (_grad_tables_mesh_laddered
                   if _mesh_ladder_applicable(cfg)
                   else _grad_tables_mesh_inner)
    gcam, gsph, gtri = mesh_tables(
        cam_tab, sph_tab, w_flat, aabb, boxes,
        (n_chunks, chunk, bids, max(1, scene.boxes.count), m_type),
        scene.spheres.count, scene.sky.kind, cfg,
        g_img / jnp.float32(cfg.spp), seed, jnp.int32(0), cfg.spp,
        flags, interpret)
    (s_bar,) = build_vjp((gcam, gsph))
    if scene.triangles.count > 0 and n_chunks > 0:
        s_bar = _add_tri_cots(s_bar, scene, plan, gtri)
    return s_bar
