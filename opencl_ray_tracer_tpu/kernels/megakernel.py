"""Pallas TPU megakernel: the whole path tracer in one kernel.

This is the TPU-native answer to the reference's OpenCL megakernel
(``pixel_colour``, ``gpu_kernel.cl:595-648``) — but where the reference maps
one work item to one pixel, this kernel maps one *grid cell* to a pixel tile
shaped for the VPU ((TILE_ROWS, 128) f32 vregs) and keeps the ENTIRE
estimator state (ray, throughput, status, accumulator) resident in VMEM for
all samples and bounces.  Zero HBM traffic between bounces — the pure-jnp
path re-reads/writes ~50 MB of HBM state per bounce per sample; this kernel
touches HBM once per tile (the final RGB write).

Key structure (and the perf lesson baked into it):
- All vector state lives in explicit VMEM **scratch refs**; the sample/
  bounce loops carry only scalars.  Loop-carried vector tuples are
  catastrophically slow under Mosaic (~0.8 ms/iteration for a 14-array
  carry, measured on v5e — the carry is spilled and reloaded every
  iteration), while scratch-ref traffic is plain VMEM bandwidth.
- sample loop: ``fori_loop`` (sequential, like gpu_kernel.cl:624) so the
  clamp-before-average and NaN running-sum quirks are exact;
- bounce loop: ``while_loop`` with scalar carry (depth, any-alive) — a
  PER-TILE early exit: sky tiles stop after 1 bounce while the lax.scan
  path pays max_depth everywhere;
- intersection: static Python loop over spheres, scalar sphere fields read
  from a (fields x spheres) VMEM table, vector math on (TILE_ROWS, 128)
  registers;
- RNG: the same pcg4d counter hash as rng/ (plain jnp uint32 ops work
  inside Pallas), keyed on global (pixel, sample, slot) — so this kernel's
  output is sample-for-sample comparable with the jnp tracer.

Scope: spheres + gradient/constant sky (the benchmark scenes).  HDR-sky and
triangle scenes fall back to the jnp path (render.py dispatches) — per-lane
gathers from an HDR image and large triangle soups want the separate
matmul-form intersection path (tracer/mesh_accel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..scene import Scene, camera_frame
from ..scene import materials as mat
from ..scene.sky import KIND_CONST, KIND_GRADIENT

# Tile geometry: one grid cell = TILE_ROWS x 128 pixels.
LANES = 128
TILE_ROWS = 16
TILE = TILE_ROWS * LANES

# Sphere-table field rows.
F_CX, F_CY, F_CZ, F_R, F_ALR, F_ALG, F_ALB, F_FUZZ, F_IOR, F_TYPE = range(10)
N_FIELDS = 16  # padded to a sublane multiple

# Camera-table slots (row 0 of a (1,128) f32 array).
(C_OX, C_OY, C_OZ, C_HX, C_HY, C_HZ, C_VX, C_VY, C_VZ,
 C_LX, C_LY, C_LZ, C_DUX, C_DUY, C_DUZ, C_DVX, C_DVY, C_DVZ,
 C_APERTURE, C_SKY0, C_SKY1, C_SKY2) = range(22)

# State-scratch slots (first axis of the (16, TILE_ROWS, LANES) scratch).
(S_OX, S_OY, S_OZ, S_DX, S_DY, S_DZ, S_TR, S_TG, S_TB,
 S_RR, S_RG, S_RB, S_ALIVE) = range(13)
N_STATE = 16

_U32 = jnp.uint32
BIG = 3.4e38
TWO_PI = 6.283185307179586


def _pcg4d(a, b, c, d):
    """pcg4d on uint32 arrays — identical math to rng.pcg4d."""
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
    # Mosaic has no uint32->f32 cast; go via int32 (safe: value < 2^24
    # after the shift).
    return ((bits >> _U32(8)).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(1.0 / (1 << 24)))


def _uniform4(seed_arr, pix, samp, slot):
    a, b, c, d = _pcg4d(pix, samp, slot, seed_arr)
    return _to_f(a), _to_f(b), _to_f(c), _to_f(d)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _make_kernel(n_spheres: int, width: int, height: int,
                 spp: int, max_depth: int, t_min: float, seed: int,
                 sky_kind: int, clamp_samples: bool, nan_policy: str):
    """Build the kernel body with all config baked in statically."""

    def kernel(cam_ref, sph_ref, r_ref, g_ref, b_ref, st, acc):
        tile = pl.program_id(0)
        lin = (tile * TILE
               + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 0)
               * LANES
               + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1))
        pix_u = lin.astype(_U32)
        px = (lin % width).astype(jnp.float32)
        py = (lin // width).astype(jnp.float32)

        def cam(i):
            return cam_ref[0, i]

        seed_arr = jnp.full((TILE_ROWS, LANES), _U32(seed))
        acc[0] = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
        acc[1] = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
        acc[2] = jnp.zeros((TILE_ROWS, LANES), jnp.float32)

        def sample_body(s, carry):
            s_u = jnp.full((TILE_ROWS, LANES), _U32(0)) + s.astype(_U32)
            u0, u1, u2, u3 = _uniform4(seed_arr, pix_u, s_u,
                                       jnp.zeros_like(pix_u))
            uu = (px + u0) * jnp.float32(1.0 / width)
            vv = (py + u1) * jnp.float32(1.0 / height)

            # GetRay (gpu_kernel.cl:559-578): defocus disc or pinhole.
            dr = jnp.sqrt(u2)
            th = TWO_PI * u3
            lens_x = dr * jnp.cos(th)
            lens_y = dr * jnp.sin(th)
            ap = jnp.where(cam(C_APERTURE) > 0.0, 1.0, 0.0)
            ox = cam(C_OX) + ap * (cam(C_DUX) * lens_x + cam(C_DVX) * lens_y)
            oy = cam(C_OY) + ap * (cam(C_DUY) * lens_x + cam(C_DVY) * lens_y)
            oz = cam(C_OZ) + ap * (cam(C_DUZ) * lens_x + cam(C_DVZ) * lens_y)
            st[S_OX] = ox + jnp.zeros_like(px)
            st[S_OY] = oy + jnp.zeros_like(px)
            st[S_OZ] = oz + jnp.zeros_like(px)
            st[S_DX] = cam(C_LX) + uu * cam(C_HX) + vv * cam(C_VX) - ox
            st[S_DY] = cam(C_LY) + uu * cam(C_HY) + vv * cam(C_VY) - oy
            st[S_DZ] = cam(C_LZ) + uu * cam(C_HZ) + vv * cam(C_VZ) - oz
            one = jnp.ones((TILE_ROWS, LANES), jnp.float32)
            zero = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
            st[S_TR] = one
            st[S_TG] = one
            st[S_TB] = one
            st[S_RR] = zero
            st[S_RG] = zero
            st[S_RB] = zero
            st[S_ALIVE] = one

            def cond(dc):
                depth, alive_any = dc
                return (depth < max_depth) & alive_any

            def body(dc):
                depth, _ = dc
                ox = st[S_OX]
                oy = st[S_OY]
                oz = st[S_OZ]
                dx = st[S_DX]
                dy = st[S_DY]
                dz = st[S_DZ]
                tr = st[S_TR]
                tg = st[S_TG]
                tb = st[S_TB]
                alive = st[S_ALIVE] > 0.5

                # ---- closest hit over all spheres (HitSphere,
                # gpu_kernel.cl:455-487; closest-so-far fold :358-372) ----
                best_t = jnp.full((TILE_ROWS, LANES), BIG)
                best_i = jnp.zeros((TILE_ROWS, LANES), jnp.int32)
                a = _dot3(dx, dy, dz, dx, dy, dz)
                for i in range(n_spheres):
                    ocx = ox - sph_ref[F_CX, i]
                    ocy = oy - sph_ref[F_CY, i]
                    ocz = oz - sph_ref[F_CZ, i]
                    rad = sph_ref[F_R, i]
                    half_b = _dot3(ocx, ocy, ocz, dx, dy, dz)
                    c_t = _dot3(ocx, ocy, ocz, ocx, ocy, ocz) - rad * rad
                    disc = half_b * half_b - a * c_t
                    sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
                    r0 = (-half_b - sq) / a
                    r1 = (-half_b + sq) / a
                    ok0 = (disc >= 0.0) & (r0 >= t_min)
                    ok1 = (disc >= 0.0) & (r1 >= t_min)
                    t_i = jnp.where(ok0, r0, jnp.where(ok1, r1, BIG))
                    upd = t_i < best_t
                    best_t = jnp.where(upd, t_i, best_t)
                    best_i = jnp.where(upd, i, best_i)

                hit = best_t < BIG
                t_safe = jnp.where(hit, best_t, 1.0)
                hx = ox + t_safe * dx
                hy = oy + t_safe * dy
                hz = oz + t_safe * dz

                # gather winner sphere fields via where-fold
                scx = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
                scy = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
                scz = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
                srad = jnp.ones((TILE_ROWS, LANES), jnp.float32)
                alr = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
                alg = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
                alb = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
                fz = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
                ior = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
                mtype = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
                for i in range(n_spheres):
                    sel = best_i == i
                    scx = jnp.where(sel, sph_ref[F_CX, i], scx)
                    scy = jnp.where(sel, sph_ref[F_CY, i], scy)
                    scz = jnp.where(sel, sph_ref[F_CZ, i], scz)
                    srad = jnp.where(sel, sph_ref[F_R, i], srad)
                    alr = jnp.where(sel, sph_ref[F_ALR, i], alr)
                    alg = jnp.where(sel, sph_ref[F_ALG, i], alg)
                    alb = jnp.where(sel, sph_ref[F_ALB, i], alb)
                    fz = jnp.where(sel, sph_ref[F_FUZZ, i], fz)
                    ior = jnp.where(sel, sph_ref[F_IOR, i], ior)
                    mtype = jnp.where(sel, sph_ref[F_TYPE, i], mtype)

                inv_r = 1.0 / srad
                nx = (hx - scx) * inv_r
                ny = (hy - scy) * inv_r
                nz = (hz - scz) * inv_r
                d_dot_n = _dot3(dx, dy, dz, nx, ny, nz)
                front = d_dot_n < 0.0
                sgn = jnp.where(front, 1.0, -1.0)
                nx = nx * sgn
                ny = ny * sgn
                nz = nz * sgn

                # ---- RNG for this bounce (slots match rng/) ----
                slot = jnp.zeros_like(pix_u) + (
                    _U32(4) + depth.astype(_U32) * _U32(2))
                a0, a1, a2, a3 = _uniform4(seed_arr, pix_u, s_u, slot)
                b0, b1, b2, b3 = _uniform4(seed_arr, pix_u, s_u,
                                           slot + _U32(1))

                # ---- scatter (branchless; scatter.py semantics) ----
                # lambertian: n + unit_vector(a0, a1)
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

                # metal: reflect(unit(d), n) + fuzz * in_sphere(a2, a3, b0)
                dlen = jnp.sqrt(a)
                udx = dx / dlen
                udy = dy / dlen
                udz = dz / dlen
                ud_dot_n = _dot3(udx, udy, udz, nx, ny, nz)
                refx = udx - 2.0 * ud_dot_n * nx
                refy = udy - 2.0 * ud_dot_n * ny
                refz = udz - 2.0 * ud_dot_n * nz
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
                absorbed = _dot3(met_x, met_y, met_z, nx, ny, nz) <= 0.0

                # dielectric (TransparentScatter, gpu_kernel.cl:425-451)
                ratio = jnp.where(front, 1.0 / jnp.maximum(ior, 1e-8), ior)
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

                is_metal = mtype == float(mat.METAL)
                is_diel = mtype == float(mat.DIELECTRIC)
                is_emit = mtype == float(mat.EMISSIVE)
                new_dx = jnp.where(is_diel, die_x,
                                   jnp.where(is_metal, met_x, lam_x))
                new_dy = jnp.where(is_diel, die_y,
                                   jnp.where(is_metal, met_y, lam_y))
                new_dz = jnp.where(is_diel, die_z,
                                   jnp.where(is_metal, met_z, lam_z))
                at_r = jnp.where(is_diel, 1.0, alr)
                at_g = jnp.where(is_diel, 1.0, alg)
                at_b = jnp.where(is_diel, 1.0, alb)

                miss_now = alive & ~hit
                emit_now = alive & hit & is_emit
                absorb_now = alive & hit & is_metal & absorbed
                cont = alive & hit & ~is_emit & ~(is_metal & absorbed)

                # sky on miss (gradient or constant), applied immediately
                if sky_kind == KIND_GRADIENT:
                    tsky = 0.5 * (dy / dlen + 1.0)
                    sk_r = (1.0 - tsky) + tsky * 0.5
                    sk_g = (1.0 - tsky) + tsky * 0.7
                    sk_b = (1.0 - tsky) + tsky * 1.0
                else:
                    sk_r = cam(C_SKY0) + jnp.zeros_like(dx)
                    sk_g = cam(C_SKY1) + jnp.zeros_like(dx)
                    sk_b = cam(C_SKY2) + jnp.zeros_like(dx)

                st[S_RR] = jnp.where(miss_now, st[S_RR] + tr * sk_r,
                                     jnp.where(emit_now, tr * alr,
                                               st[S_RR]))
                st[S_RG] = jnp.where(miss_now, st[S_RG] + tg * sk_g,
                                     jnp.where(emit_now, tg * alg,
                                               st[S_RG]))
                st[S_RB] = jnp.where(miss_now, st[S_RB] + tb * sk_b,
                                     jnp.where(emit_now, tb * alb,
                                               st[S_RB]))
                new_alive = cont
                st[S_ALIVE] = jnp.where(new_alive, 1.0, 0.0)
                st[S_OX] = jnp.where(cont, hx, ox)
                st[S_OY] = jnp.where(cont, hy, oy)
                st[S_OZ] = jnp.where(cont, hz, oz)
                st[S_DX] = jnp.where(cont, new_dx, dx)
                st[S_DY] = jnp.where(cont, new_dy, dy)
                st[S_DZ] = jnp.where(cont, new_dz, dz)
                st[S_TR] = jnp.where(cont, tr * at_r, tr)
                st[S_TG] = jnp.where(cont, tg * at_g, tg)
                st[S_TB] = jnp.where(cont, tb * at_b, tb)
                return (depth + 1, jnp.any(new_alive))

            jax.lax.while_loop(cond, body, (jnp.int32(0), True))

            # depth exhaustion: rays still alive contribute 0 (their result
            # was never written) — matches gpu_kernel.cl:337-340.
            c_r = st[S_RR]
            c_g = st[S_RG]
            c_b = st[S_RB]
            # clamp-before-average (gpu_kernel.cl:632-638); NaN policy
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
            acc[0] = acc[0] + c_r
            acc[1] = acc[1] + c_g
            acc[2] = acc[2] + c_b
            return carry

        jax.lax.fori_loop(0, spp, sample_body, 0)
        inv = jnp.float32(1.0 / spp)
        r_ref[:] = acc[0] * inv
        g_ref[:] = acc[1] * inv
        b_ref[:] = acc[2] * inv

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


def _sphere_table(scene: Scene):
    s = scene.spheres
    n = s.count
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
    return tab


@functools.partial(jax.jit, static_argnames=("cfg", "seed", "interpret"))
def render_pallas(scene: Scene, cfg: RenderConfig, seed: int = 0,
                  interpret: bool = False):
    """Full-image forward render via the megakernel; (H,W,3) f32.

    Semantics match tracer.render (same RNG streams, same estimator quirks);
    forward only.  interpret=True runs the Pallas interpreter (CPU testing).
    """
    assert supports(scene, cfg), "megakernel: unsupported scene"
    n_pix = cfg.width * cfg.height
    n_tiles = -(-n_pix // TILE)

    kernel = _make_kernel(
        n_spheres=scene.spheres.count, width=cfg.width, height=cfg.height,
        spp=cfg.spp, max_depth=cfg.max_depth,
        t_min=cfg.t_min, seed=seed, sky_kind=scene.sky.kind,
        clamp_samples=cfg.clamp_samples, nan_policy=cfg.nan_policy)

    out_shape = jax.ShapeDtypeStruct((n_tiles * TILE_ROWS, LANES),
                                     jnp.float32)
    r, g, b = pl.pallas_call(
        kernel,
        out_shape=[out_shape, out_shape, out_shape],
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FIELDS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        scratch_shapes=[
            pltpu.VMEM((N_STATE, TILE_ROWS, LANES), jnp.float32),
            pltpu.VMEM((3, TILE_ROWS, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(_camera_table(scene), _sphere_table(scene))

    img = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
    return img[:n_pix].reshape(cfg.height, cfg.width, 3)
