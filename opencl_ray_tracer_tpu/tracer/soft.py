"""Soft-visibility renderer for geometry gradients.

Hard visibility (argmin hit selection, ``intersect.closest_hit``) gives
interior-only gradients: moving a sphere's *silhouette* across a pixel is a
step function the autodiff never sees, so losses dominated by silhouette
motion (fitting sphere centers/radii to an image) get near-zero or
wrong-sign gradients (SURVEY.md §7 hard part (a); verified empirically in
tests/test_soft.py).

This module renders **primary visibility softly**: every sphere contributes
to the pixel with a weight

    alpha_i = sigmoid(beta * m_i),   m_i = (r_i^2 - d_perp,i^2) / r_i^2

where d_perp is the ray's closest-approach distance — a smooth signed
silhouette margin — composited front-to-back by t order with transmittance

    w_i = alpha_i * prod_{j closer} (1 - alpha_j),   w_sky = prod (1-alpha_j)

(the soft-rasterizer / NeRF-style aggregation).  Each candidate sphere's
shaded radiance L_i is its primary-surface interaction followed by a *hard*
path-traced continuation (secondary silhouettes stay hard: their boundary
terms are minor next to primary ones, and Monte Carlo noise dwarfs them).

As beta -> inf this converges to the hard render.  Forward cost is
O(n_spheres + n_triangles) x the hard render, so use it for
inverse-rendering loops (small configs), not production forwards.

Triangles participate with the analogous smooth silhouette margin: the
ray-plane intersection is smooth in the vertices, and the coverage margin
is the minimum barycentric coordinate min(u, v, 1-u-v) — positive inside,
negative outside, zero exactly on the silhouette edge — so vertex
gradients see silhouette motion (tests/test_soft.py FD oracle).  Meant for
small meshes (each triangle is a composited candidate); large-mesh
silhouette gradients would need edge sampling, out of scope here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..rng import SLOT_PIXEL_U, uniform4, BOUNCE_BASE
from ..scene import Scene, make_rays, sky_colour
from ..scene import materials as mat
from .estimator import trace
from .scatter import scatter


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _primary_candidates(scene: Scene, o, d, beta, t_min):
    """Per (ray, sphere): soft coverage alpha and a smooth depth t.

    Returns alpha (R,S), t (R,S), point (R,S,3), normal (R,S,3).
    """
    c = scene.spheres.center            # (S,3)
    r = scene.spheres.radius            # (S,)
    oc = c[None, :, :] - o[:, None, :]  # (R,S,3) center relative to origin
    dlen2 = _dot(d, d)[:, None]
    proj = jnp.einsum("rsk,rk->rs", oc, d) / dlen2        # t of closest approach
    closest = o[:, None, :] + proj[..., None] * d[:, None, :]
    d_perp2 = jnp.sum((closest - c[None]) ** 2, axis=-1)  # (R,S)
    r2 = (r * r)[None, :]
    margin = (r2 - d_perp2) / r2                           # smooth, signed
    # in front of the ray and not behind t_min
    front = proj > t_min
    alpha = jax.nn.sigmoid(beta * margin) * front

    # Smooth surface depth: the near root where it exists, closest-approach
    # depth on the outside (keeps t defined and smooth across the edge).
    inside = jnp.sqrt(jnp.maximum(r2 - d_perp2, 1e-12) / dlen2)
    t = proj - inside * (margin > 0)
    point = o[:, None, :] + t[..., None] * d[:, None, :]
    normal = (point - c[None]) / r[None, :, None]
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nn, 1e-8)
    return alpha, t, point, normal


def _tri_candidates(scene: Scene, o, d, beta, t_min):
    """Per (ray, triangle): soft coverage alpha and smooth plane depth.

    The ray-plane hit t is smooth in the vertices; the signed silhouette
    margin is the minimum barycentric coordinate (zero on the edge).
    Returns alpha (R,T), t (R,T), point (R,T,3), normal (R,T,3).
    """
    tris = scene.triangles
    p0, p1, p2 = tris.p0, tris.p1, tris.p2          # (T,3)
    e0 = p1 - p0
    e1 = p2 - p0
    n = jnp.cross(e0, e1)                            # (T,3)
    denom = jnp.einsum("rk,tk->rt", d, n)            # (R,T)
    # parallel rays: push t behind the camera (alpha -> 0 via t <= t_min)
    safe = jnp.where(jnp.abs(denom) < 1e-8,
                     jnp.where(denom < 0, -1e-8, 1e-8), denom)
    num = jnp.einsum("tk,tk->t", p0, n)[None, :] \
        - jnp.einsum("rk,tk->rt", o, n)
    t = num / safe                                   # (R,T)
    point = o[:, None, :] + t[..., None] * d[:, None, :]
    # barycentrics of the plane point (smooth in vertices)
    s = point - p0[None, :, :]
    d00 = jnp.einsum("tk,tk->t", e0, e0)
    d01 = jnp.einsum("tk,tk->t", e0, e1)
    d11 = jnp.einsum("tk,tk->t", e1, e1)
    det = jnp.maximum(d00 * d11 - d01 * d01, 1e-20)
    s0 = jnp.einsum("rtk,tk->rt", s, e0)
    s1 = jnp.einsum("rtk,tk->rt", s, e1)
    u = (d11 * s0 - d01 * s1) / det
    v = (d00 * s1 - d01 * s0) / det
    margin = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
    alpha = jax.nn.sigmoid(beta * margin) * (t > t_min)
    nn = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    normal = jnp.broadcast_to(nn[None, :, :], point.shape)
    return alpha, t, point, normal


def _shade_candidate(scene: Scene, d, point, normal, albedo, fuzz, ior,
                     mtype, pixel_ids, sample_id, seed, max_depth, t_min):
    """Radiance assuming the primary ray hits a surface with the given
    material at `point`: one scatter + hard-traced continuation."""
    front_face = _dot(d, normal) < 0.0
    n_faced = jnp.where(front_face[:, None], normal, -normal)

    a0, a1, a2, a3 = uniform4(seed, pixel_ids, sample_id, BOUNCE_BASE)
    b0, b1, b2, b3 = uniform4(seed, pixel_ids, sample_id, BOUNCE_BASE + 1)
    u = jnp.stack([a0, a1, a2, a3, b0, b1, b2, b3], axis=-1)

    sc = scatter(d, n_faced, front_face, albedo, fuzz, ior, mtype, u)
    cont = trace(scene, point, sc.direction, pixel_ids, sample_id, seed,
                 max_depth - 1, t_min=t_min, first_bounce=1,
                 throughput=sc.attenuation)
    live = ~(sc.absorbed | sc.emitted)
    out = jnp.where(live[:, None], cont, 0.0)
    out = jnp.where(sc.emitted[:, None], albedo, out)
    return out


def render_soft_rays(scene: Scene, o, d, pixel_ids, sample_id, seed,
                     max_depth, t_min=1e-3, beta=80.0):
    """Soft-primary radiance for a ray batch (R,3).  Candidates = all
    spheres + all triangles, composited front-to-back by smooth depth."""
    s_count = scene.spheres.count
    t_count = scene.triangles.count
    parts_alpha, parts_t = [], []
    if s_count > 0:
        sa, stt, s_point, s_normal = _primary_candidates(scene, o, d, beta,
                                                         t_min)
        parts_alpha.append(sa)
        parts_t.append(stt)
    if t_count > 0:
        ta, ttt, t_point, t_normal = _tri_candidates(scene, o, d, beta,
                                                     t_min)
        parts_alpha.append(ta)
        parts_t.append(ttt)
    alpha = jnp.concatenate(parts_alpha, axis=1)         # (R, S+T)
    t = jnp.concatenate(parts_t, axis=1)

    # Depth-order compositing: sort candidates by t per ray.
    order = jnp.argsort(t, axis=1)                       # (R,S+T)
    alpha_sorted = jnp.take_along_axis(alpha, order, axis=1)
    trans = jnp.cumprod(1.0 - alpha_sorted + 1e-12, axis=1)
    trans_before = jnp.concatenate(
        [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1)
    w_sorted = alpha_sorted * trans_before               # (R,S+T)
    w_sky = trans[:, -1]

    # Shade each candidate (python loop — candidate count is small and
    # static; XLA sees independent shade+trace pipelines).
    l_sky = sky_colour(scene.sky, d)
    out = w_sky[:, None] * l_sky
    r_count = o.shape[0]

    def bcast(x, shape):
        return jnp.broadcast_to(x, shape)

    for i in range(s_count + t_count):
        if i < s_count:
            pt, nm = s_point[:, i], s_normal[:, i]
            al = bcast(scene.spheres.albedo[i], (r_count, 3))
            fz = bcast(scene.spheres.fuzz[i], (r_count,))
            io = bcast(scene.spheres.ior[i], (r_count,))
            mt = bcast(scene.spheres.mat_type[i], (r_count,))
        else:
            j = i - s_count
            pt, nm = t_point[:, j], t_normal[:, j]
            al = bcast(scene.triangles.albedo[j], (r_count, 3))
            fz = bcast(scene.triangles.fuzz[j], (r_count,))
            io = bcast(scene.triangles.ior[j], (r_count,))
            mt = bcast(scene.triangles.mat_type[j], (r_count,))
        li = _shade_candidate(scene, d, pt, nm, al, fz, io, mt,
                              pixel_ids, sample_id, seed, max_depth, t_min)
        wi = jnp.sum(jnp.where(order == i, w_sorted, 0.0), axis=1)
        out = out + wi[:, None] * li
    return out


def render_soft(scene: Scene, cfg: RenderConfig, seed: int = 0,
                beta: float = 80.0):
    """Full-image soft render, (H,W,3); same conventions as tracer.render."""
    w, h = cfg.width, cfg.height
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
    pixel_ids = rows * w + cols

    def body(acc, sample_id):
        u0, u1, u2, u3 = uniform4(seed, pixel_ids, sample_id, SLOT_PIXEL_U)
        uu = (cols.astype(jnp.float32) + u0) / jnp.float32(w)
        vv = (rows.astype(jnp.float32) + u1) / jnp.float32(h)
        o, d = make_rays(scene.camera, uu, vv, u2, u3)
        colour = render_soft_rays(scene, o, d, pixel_ids, sample_id,
                                  jnp.uint32(seed), cfg.max_depth,
                                  t_min=cfg.t_min, beta=beta)
        colour = jnp.clip(colour, 0.0, 1.0)
        return acc + jnp.where(jnp.isnan(colour), 0.0, colour), None

    acc = jnp.zeros((h * w, 3), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, jnp.arange(cfg.spp, dtype=jnp.int32))
    return (acc / jnp.float32(cfg.spp)).reshape(h, w, 3)
