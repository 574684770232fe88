"""Pallas TPU megakernel: wavefront path tracer with path regeneration.

This is the TPU-native answer to the reference's OpenCL megakernel
(``pixel_colour``, ``gpu_kernel.cl:595-648``) — but where the reference maps
one work item to one pixel and loops samples-then-bounces, this kernel maps
one grid cell to a (TILE_ROWS x 128)-pixel tile and runs a single
**wavefront loop with path regeneration**: every loop iteration advances one
bounce for every lane, and the moment a lane's path terminates it is
reloaded with that pixel's NEXT camera sample.  Lanes never idle waiting for
the longest path in the tile to finish a sample — total iterations per tile
drop from ``spp x E[max over lanes of path length]`` to
``~max over lanes of (total bounces across its spp samples)``, a multi-x win
for heavy-tailed path lengths (diffuse/metal interreflections).  The
counter-based RNG (keyed on global pixel id, sample id, bounce slot) makes
regeneration exact: the same draws a sequential run would use.

Performance notes baked in (measured on v5e):
- All vector state lives in VMEM scratch refs; loops carry scalars only.
- Dependent-chain vector ops are LATENCY-bound (fma ~3cyc, div/sin ~65cyc):
  (64,128) tiles = 8 vregs amortize instruction latency over 4x more pixels
  than a minimal (16,128) tile.
- ONE divide + one rsqrt per bounce (inv_a, inv_len); per-sphere
  reciprocals (1/r, r^2, 1/ior) precomputed on the host into the table.
- Material blocks are specialized statically: scenes without dielectric /
  emissive / fuzzy-metal spheres skip those code paths at trace time.

Estimator semantics are exact (per pixel, samples complete in order):
clamp-before-average (gpu_kernel.cl:632-638), NaN -> running-sum channel
(:640-642), depth exhaustion -> black (:337-340), miss -> sky with
accumulated throughput (:342-347).

Scope: spheres + gradient/constant sky (the benchmark scenes).  HDR-sky and
triangle scenes use the fused mesh kernel (kernels/megamesh.py).

Large sphere counts (the book-cover scene, ~100 spheres) use a grouped
fold: spheres are ordered into spatial groups of <=16 (the same
median-split ordering as the mesh clusters), each group carries an AABB in
SMEM, and per bounce a group is skipped (``@pl.when``) unless some live
lane's ray enters its box closer than the running best t.  Attribute
selection folds INSIDE the intersection loop (only tested spheres pay
selects), replacing the O(n_spheres)-per-field gather fold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene import Scene, camera_frame
from ..scene import materials as mat
from ..scene.sky import KIND_CONST, KIND_GRADIENT

LANES = 128
TILE_ROWS = 64
TILE = TILE_ROWS * LANES

# Sphere-table field rows (host-precomputed reciprocals included).
(F_CX, F_CY, F_CZ, F_R, F_ALR, F_ALG, F_ALB, F_FUZZ, F_IOR, F_TYPE,
 F_R2, F_INVR, F_INVIOR) = range(13)
N_FIELDS = 16

# Camera-table slots (row 0 of a (1,128) f32 array).
(C_OX, C_OY, C_OZ, C_HX, C_HY, C_HZ, C_VX, C_VY, C_VZ,
 C_LX, C_LY, C_LZ, C_DUX, C_DUY, C_DUZ, C_DVX, C_DVY, C_DVZ,
 C_APERTURE, C_SKY0, C_SKY1, C_SKY2) = range(22)

# State-scratch slots.  S_SAMPLE/S_DEPTH are f32 counters (exact integers
# far below 2^24).
(S_OX, S_OY, S_OZ, S_DX, S_DY, S_DZ, S_TR, S_TG, S_TB,
 S_RR, S_RG, S_RB, S_SAMPLE, S_DEPTH) = range(14)
N_STATE = 16

_U32 = jnp.uint32
BIG = 3.4e38
TWO_PI = 6.283185307179586


def _pcg4d(a, b, c, d):
    """pcg4d hash — identical math to rng.pcg4d."""
    mul = _U32(1664525)
    inc = _U32(1013904223)
    a = a * mul + inc
    b = b * mul + inc
    c = c * mul + inc
    d = d * mul + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _to_f(bits):
    # Mosaic has no uint32->f32 cast; go via int32 (safe: value < 2^24).
    return ((bits >> _U32(8)).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(1.0 / (1 << 24)))


def _uniform4(seed_arr, pix, samp, slot):
    a, b, c, d = _pcg4d(pix, samp, slot, seed_arr)
    return _to_f(a), _to_f(b), _to_f(c), _to_f(d)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def scatter_block(shape, dx, dy, dz, inv_len, nx, ny, nz, front,
                  alr, alg, alb, mtype, get_fuzz, get_ior, get_inv_ior,
                  a0, a1, a2, a3, b0, b1,
                  has_metal, has_diel, has_fuzz):
    """Branchless material scatter shared by the sphere and mesh
    megakernels (LambertianScatter/MetalScatter/TransparentScatter,
    gpu_kernel.cl:398-451, statically specialized by material presence).

    get_fuzz/get_ior/get_inv_ior are thunks so per-lane material tables
    are only folded when the material class exists in the scene.
    Returns (new_dx, new_dy, new_dz, at_r, at_g, at_b, absorbed).
    """
    zu = 2.0 * a0 - 1.0
    phi = TWO_PI * a1
    ru = jnp.sqrt(jnp.maximum(0.0, 1.0 - zu * zu))
    lam_x = nx + ru * jnp.cos(phi)
    lam_y = ny + ru * jnp.sin(phi)
    lam_z = nz + zu
    near0 = ((jnp.abs(lam_x) < 1e-8) & (jnp.abs(lam_y) < 1e-8)
             & (jnp.abs(lam_z) < 1e-8))
    lam_x = jnp.where(near0, nx, lam_x)
    lam_y = jnp.where(near0, ny, lam_y)
    lam_z = jnp.where(near0, nz, lam_z)
    new_dx, new_dy, new_dz = lam_x, lam_y, lam_z
    at_r, at_g, at_b = alr, alg, alb
    absorbed = jnp.zeros(shape, bool)

    if has_metal or has_diel:
        udx = dx * inv_len
        udy = dy * inv_len
        udz = dz * inv_len
        ud_dot_n = _dot3(udx, udy, udz, nx, ny, nz)
        refx = udx - 2.0 * ud_dot_n * nx
        refy = udy - 2.0 * ud_dot_n * ny
        refz = udz - 2.0 * ud_dot_n * nz

    if has_metal:
        if has_fuzz:
            fz = get_fuzz()
            zs = 2.0 * a2 - 1.0
            phs = TWO_PI * a3
            rs = jnp.sqrt(jnp.maximum(0.0, 1.0 - zs * zs))
            # cbrt is unimplemented in Mosaic; exp(log(x)/3) matches to
            # ~1 ulp on (0, 1].
            rad3 = jnp.exp(jnp.log(jnp.maximum(b0, 1e-30))
                           * jnp.float32(1.0 / 3.0))
            met_x = refx + fz * (rs * jnp.cos(phs) * rad3)
            met_y = refy + fz * (rs * jnp.sin(phs) * rad3)
            met_z = refz + fz * (zs * rad3)
        else:
            met_x, met_y, met_z = refx, refy, refz
        met_absorb = _dot3(met_x, met_y, met_z, nx, ny, nz) <= 0.0
        is_metal = mtype == float(mat.METAL)
        new_dx = jnp.where(is_metal, met_x, new_dx)
        new_dy = jnp.where(is_metal, met_y, new_dy)
        new_dz = jnp.where(is_metal, met_z, new_dz)
        absorbed = is_metal & met_absorb

    if has_diel:
        inv_ior = get_inv_ior()
        ior = get_ior()
        ratio = jnp.where(front, inv_ior, ior)
        cos_t = jnp.minimum(-_dot3(udx, udy, udz, nx, ny, nz), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-20))
        cannot = ratio * sin_t > 1.0
        rr0 = (1.0 - ratio) / (1.0 + ratio)
        rr0 = rr0 * rr0
        om = 1.0 - cos_t
        om2 = om * om
        refl = rr0 + (1.0 - rr0) * om2 * om2 * om
        choose_refl = cannot | (refl > b1)
        rpx = ratio * (udx + cos_t * nx)
        rpy = ratio * (udy + cos_t * ny)
        rpz = ratio * (udz + cos_t * nz)
        rp2 = _dot3(rpx, rpy, rpz, rpx, rpy, rpz)
        par = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - rp2), 1e-20))
        die_x = jnp.where(choose_refl, refx, rpx + par * nx)
        die_y = jnp.where(choose_refl, refy, rpy + par * ny)
        die_z = jnp.where(choose_refl, refz, rpz + par * nz)
        is_diel = mtype == float(mat.DIELECTRIC)
        new_dx = jnp.where(is_diel, die_x, new_dx)
        new_dy = jnp.where(is_diel, die_y, new_dy)
        new_dz = jnp.where(is_diel, die_z, new_dz)
        at_r = jnp.where(is_diel, 1.0, at_r)
        at_g = jnp.where(is_diel, 1.0, at_g)
        at_b = jnp.where(is_diel, 1.0, at_b)
        absorbed = absorbed & ~is_diel

    return new_dx, new_dy, new_dz, at_r, at_g, at_b, absorbed


def sphere_winner_fold(n_spheres, sph_ref, shape, zero, sphere_test,
                       sphere_spec):
    """Lean closest-hit fold over spheres (only best_t/best_i live — more
    live values spill vector registers, measured slower) + winner-attribute
    gather factory, shared by the sphere and mesh megakernels.

    With sphere_spec (from _sphere_fold_spec) the gathers are SPARSE: each
    field tests only the spheres whose value differs from the scene
    majority (e.g. the book-cover's 97 same-radius spheres cost 3 selects
    for 1/r instead of 100; all-1.5-IOR glass costs zero).  Sound because
    the gather tests the final winner index, not a running fold.  Without a
    spec the dense fold over all spheres is used.
    """
    best_t = jnp.full(shape, BIG)
    best_i = jnp.zeros(shape, jnp.int32)
    for i in range(n_spheres):
        t_i = sphere_test(i)
        upd = t_i < best_t
        best_t = jnp.minimum(t_i, best_t)
        best_i = jnp.where(upd, i, best_i)

    gather = make_winner_gather(best_i, sph_ref, shape, zero, n_spheres,
                                sphere_spec)
    return best_t, best_i, gather


def make_winner_gather(best_i, sph_ref, shape, zero, n_spheres,
                       sphere_spec, float_index: bool = False):
    """Winner-attribute gather factory over a winner-index array (int32,
    or f32 exact small ints with float_index).  With a sphere_spec the
    folds are SPARSE (majority-default; see sphere_winner_fold)."""
    cast = (lambda i: float(i)) if float_index else (lambda i: i)
    if sphere_spec is not None:
        types, fold_fields = sphere_spec
        spec_by_field = {f: (d, m) for f, d, m in fold_fields}
        type_counts = {}
        for t in types:
            type_counts[t] = type_counts.get(t, 0) + 1
        majority_type = max(type_counts, key=type_counts.get)

        def gather(field, init=0.0):
            if field == F_TYPE:
                v = jnp.full(shape, float(majority_type))
                for i in range(n_spheres):
                    if types[i] != majority_type:
                        v = jnp.where(best_i == cast(i),
                                      jnp.float32(types[i]), v)
                return v
            dflt_idx, mask = spec_by_field[field]
            v = sph_ref[field, dflt_idx] + zero
            for i in range(n_spheres):
                if mask[i]:
                    v = jnp.where(best_i == cast(i), sph_ref[field, i], v)
            return v
    else:
        def gather(field, init=0.0):
            v = jnp.full(shape, init, jnp.float32)
            for i in range(n_spheres):
                v = jnp.where(best_i == cast(i), sph_ref[field, i], v)
            return v

    return gather


def _make_kernel(n_spheres: int, width: int, height: int,
                 spp: int, max_depth: int, t_min: float,
                 sky_kind: int, clamp_samples: bool, nan_policy: str,
                 has_metal: bool, has_diel: bool, has_emit: bool,
                 has_fuzz: bool, has_aperture: bool,
                 sphere_groups=None, sphere_spec=None,
                 mean: bool = True, with_acc0: bool = False):
    """Build the kernel body with all config baked in statically.

    sphere_groups: optional tuple of tuples of (permuted) sphere indices —
    the grouped fold for large sphere counts (module docstring).
    sphere_spec: optional (types, fold_fields) static per-sphere
    specialization from _sphere_fold_spec — enables the register-fold
    winner-attribute path (fold only spheres whose value differs from the
    scene's majority value; material classes resolved at trace time).
    mean=False emits the raw radiance SUM over the spp window (checkpoint
    accumulation); with_acc0 seeds the running sum from 3 input planes so
    windowed renders reproduce the running-sum NaN policy of an
    uninterrupted run bit-for-bit (the policy reads the sum over ALL
    prior samples, gpu_kernel.cl:640-642).  The sample window's global
    base rides off_ref[0, 2] (traced).
    """
    def kernel(off_ref, cam_ref, sph_ref, grp_ref, *rest):
        if with_acc0:
            (r0_ref, g0_ref, b0_ref, r_ref, g_ref, b_ref,
             st, acc, *rest) = rest
        else:
            r_ref, g_ref, b_ref, st, acc, *rest = rest
        sph_sc = rest[0] if sphere_groups is not None else None
        tile = pl.program_id(0)
        shape = (TILE_ROWS, LANES)
        # off_ref row 0: [global pixel offset, seed, sample base] — all
        # traced so neither a new seed, a shard offset, nor a resume
        # window forces a recompile; global pixel ids keep RNG streams
        # and camera uv shard-invariant.
        lin = (off_ref[0, 0] + tile * TILE
               + jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
               + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        pix_u = lin.astype(_U32)
        px = (lin % width).astype(jnp.float32)
        py = (lin // width).astype(jnp.float32)

        def cam(i):
            return cam_ref[0, i]

        seed_arr = jnp.zeros(shape, _U32) + off_ref[0, 1].astype(_U32)
        sample_base = off_ref[0, 2]
        zero = jnp.zeros(shape, jnp.float32)
        one = zero + 1.0

        def camera_ray(sample_f):
            """Camera ray for per-lane sample ids (f32).  GetRay
            (gpu_kernel.cl:559-578)."""
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

        # ---- initial state: sample 0 camera rays, acc = 0 ----
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
        st[S_RR] = zero
        st[S_RG] = zero
        st[S_RB] = zero
        st[S_SAMPLE] = zero
        st[S_DEPTH] = zero
        if with_acc0:
            acc[0] = r0_ref[...]
            acc[1] = g0_ref[...]
            acc[2] = b0_ref[...]
        else:
            acc[0] = zero
            acc[1] = zero
            acc[2] = zero

        spp_f = jnp.float32(spp)
        max_iters = spp * max_depth + 1

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
            s_u = (sample_f.astype(jnp.int32) + sample_base).astype(_U32)

            # ---- closest hit over all spheres (HitSphere,
            # gpu_kernel.cl:455-487; closest-so-far fold :358-372) ----
            a = _dot3(dx, dy, dz, dx, dy, dz)
            inv_a = 1.0 / a              # the bounce's one divide
            neg_inv_a = -inv_a
            inv_len = jax.lax.rsqrt(a)

            def sphere_test(i):
                """Candidate t for sphere i.  Root selection is the fused
                equivalent of the reference's near-then-far ladder
                (gpu_kernel.cl:469-480): r0<=r1 always, so try-near-else-
                far == select(r0>=tMin, r0, r1) + one validity test."""
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

            if sphere_groups is None:
                best_t, best_i, gather = sphere_winner_fold(
                    n_spheres, sph_ref, shape, zero, sphere_test,
                    sphere_spec)
            else:
                # grouped fold: per-group AABB skip + entry-t culling.
                # Only (t, winner index) live in scratch (pl.when bodies
                # can't return registers); attribute gathers stay in
                # registers afterwards — a 12-row attribute fold in scratch
                # measured SLOWER than the selects it saved.
                sph_sc[0] = jnp.full(shape, BIG)
                sph_sc[1] = zero
                inv_dx = 1.0 / dx
                inv_dy = 1.0 / dy
                inv_dz = 1.0 / dz
                active_now = sample_f < spp_f
                for g, members in enumerate(sphere_groups):
                    t1x = (grp_ref[g, 0] - ox) * inv_dx
                    t2x = (grp_ref[g, 3] - ox) * inv_dx
                    t1y = (grp_ref[g, 1] - oy) * inv_dy
                    t2y = (grp_ref[g, 4] - oy) * inv_dy
                    t1z = (grp_ref[g, 2] - oz) * inv_dz
                    t2z = (grp_ref[g, 5] - oz) * inv_dz
                    lo = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                                 jnp.minimum(t1y, t2y)),
                                     jnp.minimum(t1z, t2z))
                    hi = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                                 jnp.maximum(t1y, t2y)),
                                     jnp.maximum(t1z, t2z))
                    m_g = ((hi > jnp.maximum(lo, 0.0))
                           & (lo < sph_sc[0]) & active_now)
                    s_g = jnp.max(m_g.astype(jnp.int32))

                    @pl.when(s_g > 0)
                    def _group(members=members, m_g=m_g):
                        bt = sph_sc[0]
                        bi = sph_sc[1]
                        for i in members:
                            t_i = sphere_test(i)
                            upd = (t_i < bt) & m_g
                            bt = jnp.where(upd, t_i, bt)
                            bi = jnp.where(upd, float(i), bi)
                        sph_sc[0] = bt
                        sph_sc[1] = bi

                best_t = sph_sc[0]
                best_i = sph_sc[1]  # f32 winner index (exact small ints)

                def gather(field, init=0.0):
                    v = jnp.full(shape, init, jnp.float32)
                    for i in range(n_spheres):
                        v = jnp.where(best_i == float(i), sph_ref[field, i],
                                      v)
                    return v

            hit = best_t < BIG
            t_safe = jnp.where(hit, best_t, 1.0)
            hx = ox + t_safe * dx
            hy = oy + t_safe * dy
            hz = oz + t_safe * dz

            inv_r = gather(F_INVR, 1.0)
            alr = gather(F_ALR)
            alg = gather(F_ALG)
            alb = gather(F_ALB)
            mtype = gather(F_TYPE)

            nx = (hx - gather(F_CX)) * inv_r
            ny = (hy - gather(F_CY)) * inv_r
            nz = (hz - gather(F_CZ)) * inv_r
            front = _dot3(dx, dy, dz, nx, ny, nz) < 0.0
            sgn = jnp.where(front, 1.0, -1.0)
            nx = nx * sgn
            ny = ny * sgn
            nz = nz * sgn

            # ---- RNG for this bounce (slots match rng/) ----
            slot = (jnp.zeros_like(pix_u) + _U32(4)
                    + depth_f.astype(jnp.int32).astype(_U32) * _U32(2))
            a0, a1, a2, a3 = _uniform4(seed_arr, pix_u, s_u, slot)
            if has_fuzz or has_diel:
                b0, b1, _, _ = _uniform4(seed_arr, pix_u, s_u,
                                         slot + _U32(1))

            # ---- scatter (branchless; shared scatter_block) ----
            if not (has_fuzz or has_diel):
                b0 = b1 = None
            (new_dx, new_dy, new_dz, at_r, at_g, at_b,
             absorbed) = scatter_block(
                shape, dx, dy, dz, inv_len, nx, ny, nz, front,
                alr, alg, alb, mtype,
                lambda: gather(F_FUZZ),
                lambda: gather(F_IOR),
                lambda: gather(F_INVIOR, 1.0),
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
            absorb_now = active & hit & absorbed
            would_cont = active & hit & ~is_emit & ~absorbed
            # scatter at depth max_depth-1 leaves the loop with depth ==
            # max_depth -> black (gpu_kernel.cl:337-340)
            exhaust_now = would_cont & (depth_f + 1.0 >= float(max_depth))
            cont = would_cont & ~exhaust_now
            term = active & ~cont  # this sample finished this iteration

            # sky on miss (gradient or constant)
            if sky_kind == KIND_GRADIENT:
                tsky = 0.5 * (dy * inv_len + 1.0)
                sk_r = (1.0 - tsky) + tsky * 0.5
                sk_g = (1.0 - tsky) + tsky * 0.7
                sk_b = (1.0 - tsky) + tsky * 1.0
            else:
                sk_r = cam(C_SKY0) + zero
                sk_g = cam(C_SKY1) + zero
                sk_b = cam(C_SKY2) + zero

            # final sample radiance for terminated lanes (black unless
            # miss -> sky or emissive -> throughput * albedo)
            c_r = jnp.where(miss_now, tr * sk_r,
                            jnp.where(emit_now, tr * alr, zero))
            c_g = jnp.where(miss_now, tg * sk_g,
                            jnp.where(emit_now, tg * alg, zero))
            c_b = jnp.where(miss_now, tb * sk_b,
                            jnp.where(emit_now, tb * alb, zero))

            # clamp-before-average + NaN policy (gpu_kernel.cl:632-642)
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

            # ---- regeneration: terminated lanes load their next sample —
            # made exact by the counter RNG ----
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

        if mean:
            inv = jnp.float32(1.0 / spp)
            r_ref[:] = acc[0] * inv
            g_ref[:] = acc[1] * inv
            b_ref[:] = acc[2] * inv
        else:
            r_ref[:] = acc[0]
            g_ref[:] = acc[1]
            b_ref[:] = acc[2]

    return kernel


def supports(scene: Scene, cfg: RenderConfig) -> bool:
    """True when the megakernel covers this scene/config."""
    return (scene.triangles.count == 0
            and scene.sky.kind in (KIND_GRADIENT, KIND_CONST)
            and 0 < scene.spheres.count <= 128)


def _camera_table(scene: Scene):
    f = camera_frame(scene.camera)
    vals = jnp.concatenate([
        f["origin"], f["horizontal"], f["vertical"], f["lower_left_corner"],
        f["defocus_disc_u"], f["defocus_disc_v"],
        jnp.stack([f["aperture_rad"]]),
        scene.sky.const_colour.reshape(3),
    ]).astype(jnp.float32)
    return jnp.pad(vals, (0, LANES - vals.shape[0])).reshape(1, LANES)


def _sphere_table(scene: Scene, perm=None):
    s = scene.spheres
    n = s.count
    if perm is not None:
        import dataclasses as _dc
        p = jnp.asarray(np.asarray(perm, np.int32))
        s = _dc.replace(
            s, center=s.center[p], radius=s.radius[p], albedo=s.albedo[p],
            fuzz=s.fuzz[p], ior=s.ior[p], mat_type=s.mat_type[p])
    tab = jnp.zeros((N_FIELDS, max(LANES, n)), jnp.float32)
    tab = tab.at[F_CX, :n].set(s.center[:, 0])
    tab = tab.at[F_CY, :n].set(s.center[:, 1])
    tab = tab.at[F_CZ, :n].set(s.center[:, 2])
    tab = tab.at[F_R, :n].set(s.radius)
    tab = tab.at[F_ALR, :n].set(s.albedo[:, 0])
    tab = tab.at[F_ALG, :n].set(s.albedo[:, 1])
    tab = tab.at[F_ALB, :n].set(s.albedo[:, 2])
    tab = tab.at[F_FUZZ, :n].set(s.fuzz)
    tab = tab.at[F_IOR, :n].set(s.ior)
    tab = tab.at[F_TYPE, :n].set(s.mat_type.astype(jnp.float32))
    tab = tab.at[F_R2, :n].set(s.radius * s.radius)
    tab = tab.at[F_INVR, :n].set(1.0 / s.radius)
    tab = tab.at[F_INVIOR, :n].set(1.0 / jnp.maximum(s.ior, 1e-8))
    return tab


def _sphere_group_aabbs(scene: Scene, perm, groups):
    """(n_groups, 6) [min(3), max(3)] over each group's spheres (traced),
    slightly padded (slab-test conservatism)."""
    p = jnp.asarray(np.asarray(perm, np.int32))
    c = scene.spheres.center[p]
    r = scene.spheres.radius[p][:, None]
    lo = c - r
    hi = c + r
    rows = []
    for members in groups:
        i0, i1 = members[0], members[-1] + 1
        gmin = lo[i0:i1].min(axis=0)
        gmax = hi[i0:i1].max(axis=0)
        pad = (gmax - gmin).max() * 1e-5 + 1e-6
        rows.append(jnp.concatenate([gmin - pad, gmax + pad]))
    return jnp.stack(rows)


def render_pallas(scene: Scene, cfg: RenderConfig, seed: int = 0,
                  interpret: bool = False, rows: int | None = None,
                  pix_offset=0, sample_offset=0, mean: bool = True,
                  acc0=None):
    """Forward render via the megakernel; ((rows or H), W, 3) f32.

    Semantics match tracer.render (same RNG streams, same estimator quirks);
    forward only.  interpret=True runs the Pallas interpreter (CPU testing).
    rows/pix_offset render a row block starting at global pixel pix_offset
    (traced scalar ok) — the shard_map entry point (parallel/sharded.py).
    sample_offset/mean/acc0 select a global sample window and raw-sum
    output seeded with acc0 — kernel-rate checkpoint/resume
    (parallel/checkpoint.py): window chunks reproduce a monolithic render
    bit-for-bit under every nan_policy (render_rows acc0 semantics).
    """
    assert supports(scene, cfg), "megakernel: unsupported scene"
    flags = specialize_flags(scene)
    return _render_pallas_jit(scene, cfg, jnp.int32(seed), interpret, flags,
                              rows if rows is not None else cfg.height,
                              jnp.int32(pix_offset),
                              sample_offset=jnp.int32(sample_offset),
                              mean=mean, acc0=acc0)


# Grouped-fold threshold.  Measured on v5e (book-cover, 100 spheres,
# 250spp/d50): plain loop 2.16 s; grouped with 12-row attribute scratch
# 3.14 s; grouped with 2-row scratch + near-to-far ordering 2.75 s — the
# group slab tests + scratch round-trips cost more than the skipped sphere
# tests save (camera frusta see most groups in that scene).  Row-granular
# gating inside groups (the megamesh trick) was also measured and LOST:
# vs the 1.85 s plain loop, per-(1,128)-row gates ran 21.5 s (row ops
# can't fill the 8-sublane VPU) and 8-row gates 4.6 s (the ds-sliced
# scratch loads/stores per gate outweigh skipped sphere tests at this
# density).  Disabled by default; the code path stays tested for
# spatially sparse scenes where callers can lower the threshold.
SPHERE_GROUP_MIN = 10**9
SPHERE_GROUP_SIZE = 16
# Sparse winner gathers won A/B on BOTH benchmark scenes (README 5-sphere
# 0.292 -> 0.283 s min-of-8; book-cover 100-sphere 2.16 -> 1.82 s), so the
# spec path is always on when no grouping plan is active.
SPHERE_SPEC_MIN = 0


def _fold_entry(field, vals, relevant, conservative=False):
    """(field, default_idx, mask) for one winner attribute: gather
    post-loop via the winner index over ONLY the spheres whose value
    differs from the majority value among the `relevant` spheres (the
    ones whose material class can read the field); the register is
    initialized to the majority value.  Sound because the gather tests
    the final winner index, not a running fold.  A field uniform across
    the relevant spheres costs nothing (empty mask); irrelevant winners
    read the default, which their material path never uses.

    conservative marks EVERY relevant sphere as differing (value-
    independent masks) — required when the field's values may change
    between calls under one compilation, i.e. fitted parameters traced
    through the table (optimize.fit_scene's pallas path).

    (An in-loop register-fold variant was measured SLOWER on both the
    5-sphere and 100-sphere scenes: carrying ~11 live (64,128) values
    through the unrolled intersection loop spills vector registers —
    the same failure mode as the round-2 scratch attribute folds.)"""
    vals = np.asarray(vals, np.float64)
    idx = np.nonzero(relevant)[0]
    if idx.size == 0:
        return (field, 0, tuple(False for _ in vals))
    if conservative:
        return (field, int(idx[0]), tuple(bool(r) for r in relevant))
    vv = vals[idx]
    uniq, counts = np.unique(vv, return_counts=True)
    dflt = uniq[np.argmax(counts)]
    default_idx = int(idx[np.nonzero(vv == dflt)[0][0]])
    differing = tuple(bool(relevant[i] and vals[i] != dflt)
                      for i in range(len(vals)))
    return (field, default_idx, differing)


def sphere_chunk_plan(scene: Scene, size: int = SPHERE_GROUP_SIZE):
    """Near-to-far spatial chunking of the sphere table for gated folds:
    (perm, spans) where perm reorders spheres into spatially-compact runs
    (median-split, tracer/clusters._bvh_order) and spans lists contiguous
    (start, end) chunks of the PERMUTED table, sorted by distance from the
    camera (the running best t then screens far chunks via entry-t)."""
    n = scene.spheres.count
    from ..tracer.clusters import _bvh_order
    centers = np.asarray(scene.spheres.center)
    radii = np.asarray(scene.spheres.radius)
    runs = _bvh_order(np.arange(n, dtype=np.int32), centers, size)
    order = np.concatenate(runs)
    spans = [(s, min(n, s + size)) for s in range(0, n, size)]
    eye = np.asarray(scene.camera.look_from)
    key = [float((np.linalg.norm(centers[order[a:b]] - eye, axis=1)
                  - radii[order[a:b]]).min()) for a, b in spans]
    spans = [spans[i] for i in np.argsort(key)]
    order = np.concatenate([order[a:b] for a, b in spans])
    out_spans = []
    s0 = 0
    for a, b in spans:
        out_spans.append((s0, s0 + (b - a)))
        s0 += b - a
    return tuple(int(i) for i in order), tuple(out_spans)


def _sphere_fold_spec(scene: Scene, perm=None, conservative=False):
    """Static per-sphere specialization for the register-fold winner path:
    (types, fold_fields) where types is the per-sphere material class and
    fold_fields lists (field, default_idx, fold_mask) for each attribute
    the kernel must carry.  A field is only folded for spheres whose value
    differs from the scene majority AND whose material class can read it
    (fuzz: metals; ior: dielectrics; albedo: non-dielectrics).

    perm (from sphere_chunk_plan) builds the spec in PERMUTED table order
    so it matches a chunk-ordered sphere table."""
    s = scene.spheres
    if perm is not None:
        import dataclasses as _dc
        p = np.asarray(perm, np.int32)
        s = _dc.replace(
            s, center=s.center[p], radius=s.radius[p], albedo=s.albedo[p],
            fuzz=s.fuzz[p], ior=s.ior[p], mat_type=s.mat_type[p])
    types = tuple(int(t) for t in np.asarray(s.mat_type))
    t_arr = np.asarray(s.mat_type)
    is_metal = t_arr == mat.METAL
    is_diel = t_arr == mat.DIELECTRIC
    radius = np.asarray(s.radius)
    albedo = np.asarray(s.albedo)
    center = np.asarray(s.center)
    every = np.ones_like(is_metal)
    fields = [
        _fold_entry(F_CX, center[:, 0], every, conservative),
        _fold_entry(F_CY, center[:, 1], every, conservative),
        _fold_entry(F_CZ, center[:, 2], every, conservative),
        _fold_entry(F_INVR, 1.0 / np.maximum(radius, 1e-30), every,
                    conservative),
        _fold_entry(F_ALR, albedo[:, 0], ~is_diel, conservative),
        _fold_entry(F_ALG, albedo[:, 1], ~is_diel, conservative),
        _fold_entry(F_ALB, albedo[:, 2], ~is_diel, conservative),
    ]
    if bool(is_metal.any()) and (conservative
                                 or bool((np.asarray(s.fuzz)[is_metal]
                                          > 0).any())):
        fields.append(_fold_entry(F_FUZZ, np.asarray(s.fuzz), is_metal,
                                  conservative))
    if bool(is_diel.any()):
        ior = np.asarray(s.ior)
        fields.append(_fold_entry(F_IOR, ior, is_diel, conservative))
        fields.append(_fold_entry(F_INVIOR,
                                  1.0 / np.maximum(ior, 1e-8), is_diel,
                                  conservative))
    return (types, tuple(fields))


def specialize_flags(scene: Scene, conservative: bool = False):
    """Static material-presence specialization flags: scenes without
    dielectric / emissive / fuzzy-metal spheres compile without those code
    paths.  Must be called on a CONCRETE scene (outside jit/shard_map);
    pass the result to render_pallas_inner from traced contexts.

    For large sphere counts the flags carry a spatial grouping plan
    (permutation + group partition, both static) for the grouped fold.
    The last element is the register-fold spec (_sphere_fold_spec).

    conservative produces VALUE-INDEPENDENT flags (fuzz/aperture paths
    compiled unconditionally, fold-spec masks cover every relevant
    sphere): one compilation stays correct as float parameter values
    change across calls — required when the scene's float leaves are
    fitted parameters (optimize.fit_scene / parallel.make_train_step
    pallas paths).  Material types and sphere count stay static.
    """
    types = np.asarray(scene.spheres.mat_type)
    fuzz = np.asarray(scene.spheres.fuzz)
    aperture = float(np.asarray(scene.camera.aperture_deg))
    has_metal = bool((types == mat.METAL).any())
    has_diel = bool((types == mat.DIELECTRIC).any())
    has_emit = bool((types == mat.EMISSIVE).any())
    has_fuzz = has_metal if conservative else (
        bool((fuzz[types == mat.METAL] > 0).any()) if has_metal else False)
    n = scene.spheres.count
    plan = None
    if n > SPHERE_GROUP_MIN:
        from ..tracer.clusters import _bvh_order
        centers = np.asarray(scene.spheres.center)
        radii = np.asarray(scene.spheres.radius)
        runs = _bvh_order(np.arange(n, dtype=np.int32), centers,
                          SPHERE_GROUP_SIZE)
        order = np.concatenate(runs)
        spans = [(s, min(n, s + SPHERE_GROUP_SIZE))
                 for s in range(0, n, SPHERE_GROUP_SIZE)]
        # near-to-far group processing (distance from the camera): the
        # running best t shrinks early, so entry-t culling screens the
        # far groups for primary rays
        eye = np.asarray(scene.camera.look_from)
        key = [float((np.linalg.norm(centers[order[a:b]] - eye, axis=1)
                      - radii[order[a:b]]).min()) for a, b in spans]
        spans = [spans[i] for i in np.argsort(key)]
        order = np.concatenate([order[a:b] for a, b in spans])
        groups = []
        s = 0
        for a, b in spans:
            groups.append(tuple(range(s, s + (b - a))))
            s += b - a
        plan = (tuple(int(i) for i in order), tuple(groups))
    spec = (_sphere_fold_spec(scene, conservative=conservative)
            if plan is None and len(types) >= SPHERE_SPEC_MIN else None)
    has_aperture = True if conservative else aperture > 0.0
    return (has_metal, has_diel, has_emit, has_fuzz, has_aperture, plan,
            spec)


def render_pallas_inner(scene: Scene, cfg: RenderConfig, seed, interpret,
                        flags, rows, pix_offset, sample_offset=0,
                        mean: bool = True, acc0=None):
    """Trace-safe megakernel call: flags from specialize_flags, scene may
    be traced (used inside shard_map, parallel/sharded.py).
    sample_offset/mean/acc0: sample-window raw-sum mode (render_pallas)."""
    (has_metal, has_diel, has_emit, has_fuzz, has_aperture, plan,
     spec) = flags
    n_pix = cfg.width * rows
    n_tiles = -(-n_pix // TILE)
    perm, groups = plan if plan is not None else (None, None)
    with_acc0 = acc0 is not None

    kernel = _make_kernel(
        n_spheres=scene.spheres.count, width=cfg.width, height=cfg.height,
        spp=cfg.spp, max_depth=cfg.max_depth,
        t_min=cfg.t_min, sky_kind=scene.sky.kind,
        clamp_samples=cfg.clamp_samples, nan_policy=cfg.nan_policy,
        has_metal=has_metal, has_diel=has_diel, has_emit=has_emit,
        has_fuzz=has_fuzz, has_aperture=has_aperture,
        sphere_groups=groups, sphere_spec=spec,
        mean=mean, with_acc0=with_acc0)

    if plan is not None:
        grp_tab = _sphere_group_aabbs(scene, perm, groups)
    else:
        grp_tab = jnp.zeros((1, 6), jnp.float32)

    scratch_shapes = [
        pltpu.VMEM((N_STATE, TILE_ROWS, LANES), jnp.float32),
        pltpu.VMEM((3, TILE_ROWS, LANES), jnp.float32),
    ]
    if groups is not None:
        # grouped fold: (best t, winner index) scratch
        scratch_shapes.append(
            pltpu.VMEM((2, TILE_ROWS, LANES), jnp.float32))

    plane_spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 3), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N_FIELDS, LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),   # group AABBs
    ]
    args = [jnp.stack([jnp.int32(pix_offset), jnp.int32(seed),
                       jnp.int32(sample_offset)]).reshape(1, 3),
            _camera_table(scene), _sphere_table(scene, perm), grp_tab]
    if with_acc0:
        a0 = jnp.asarray(acc0, jnp.float32).reshape(n_pix, 3)
        pad = n_tiles * TILE - n_pix
        if pad:
            a0 = jnp.pad(a0, ((0, pad), (0, 0)))
        a0 = a0.T.reshape(3, n_tiles * TILE_ROWS, LANES)
        in_specs += [plane_spec] * 3
        args += [a0[0], a0[1], a0[2]]

    out_shape = jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, LANES),
                                     jnp.float32)
    r, g, b = pl.pallas_call(
        kernel,
        out_shape=[out_shape, out_shape, out_shape],
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[plane_spec for _ in range(3)],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)

    img = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    return img[:n_pix].reshape(rows, cfg.width, 3)


_render_pallas_jit = functools.partial(jax.jit, static_argnames=(
    "cfg", "interpret", "flags", "rows", "mean"))(render_pallas_inner)
