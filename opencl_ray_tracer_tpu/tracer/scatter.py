"""Branchless material scattering (the 4 BRDFs).

Replaces the reference's per-ray switch dispatch (``gpu_kernel.cl:282-330``)
and the scatter functions (``LambertianScatter`` ``:398-413``,
``MetalScatter`` ``:415-423``, ``TransparentScatter`` ``:425-451``, emissive
termination ``:326-329``) with a compute-everything / ``jnp.where``-select
formulation: all three scatter candidates are evaluated for every ray and
selected by material type.  On the VPU this is cheaper than divergence would
be, and it keeps everything differentiable w.r.t. albedo / fuzz / ior.

RNG consumption is slot-indexed, so (unlike the reference's sequential LCG,
where e.g. a zero-fuzz metal consumes fewer draws, ``gpu_kernel.cl:419``)
draw positions never shift between material branches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..rng import (in_unit_sphere_from_uniforms, unit_vector_from_uniforms)
from ..scene import materials as mat

NEAR_ZERO = 1e-8  # Vec3NearZero, gpu_kernel.cl:203-207


class ScatterResult(NamedTuple):
    direction: jnp.ndarray    # (R,3) scattered direction
    attenuation: jnp.ndarray  # (R,3)
    absorbed: jnp.ndarray     # (R,) bool — metal absorb -> black
    emitted: jnp.ndarray      # (R,) bool — emissive terminate


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _unit(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def reflect(v, n):
    """Vec3Reflect (gpu_kernel.cl:209-212)."""
    return v - n * (2.0 * _dot(v, n))[..., None]


def refract(uv, n, etai_over_etat):
    """Vec3Refract (gpu_kernel.cl:214-220)."""
    cos_theta = jnp.minimum(_dot(-uv, n), 1.0)
    r_perp = (uv + n * cos_theta[..., None]) * etai_over_etat[..., None]
    # max(.., tiny) keeps the sqrt derivative finite at exact TIR grazing
    # (primal change < 1e-10; NaN-safe gradients through jnp.where).
    r_par = -n * jnp.sqrt(jnp.maximum(
        jnp.abs(1.0 - jnp.sum(r_perp * r_perp, axis=-1)), 1e-20))[..., None]
    return r_perp + r_par


def reflectance(cosine, ref_idx):
    """Schlick approximation (Vec3Reflectance, gpu_kernel.cl:222-227)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def scatter(d, normal, front_face, albedo, fuzz, ior, mat_type,
            u) -> ScatterResult:
    """All-material scatter for a ray batch.

    d: (R,3) incoming direction; normal: (R,3) front-facing; u: (R,8)
    uniforms for this bounce (slots: 0-1 lambertian unit vector, 2-4 metal
    fuzz sphere, 5 dielectric reflect choice).
    """
    # --- Lambertian (gpu_kernel.cl:398-413) ---
    rand_unit = unit_vector_from_uniforms(u[:, 0], u[:, 1])
    lam_dir = normal + rand_unit
    near_zero = jnp.all(jnp.abs(lam_dir) < NEAR_ZERO, axis=-1)
    lam_dir = jnp.where(near_zero[:, None], normal, lam_dir)

    # --- Metal (gpu_kernel.cl:415-423) ---
    reflected = reflect(_unit(d), normal)
    fuzz_vec = in_unit_sphere_from_uniforms(u[:, 2], u[:, 3], u[:, 4])
    # fuzz == 0 adds exactly 0 -> same as the reference's fuzz>0 branch.
    metal_dir = reflected + fuzz_vec * fuzz[:, None]
    metal_absorbed = _dot(metal_dir, normal) <= 0.0

    # --- Dielectric (gpu_kernel.cl:425-451) ---
    ratio = jnp.where(front_face, 1.0 / jnp.maximum(ior, 1e-8), ior)
    unit_d = _unit(d)
    cos_theta = jnp.minimum(_dot(-unit_d, normal), 1.0)
    # Tiny floor keeps sqrt' finite at exact normal incidence (cos = 1).
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 1e-20))
    cannot_refract = ratio * sin_theta > 1.0
    choose_reflect = cannot_refract | (reflectance(cos_theta, ratio) > u[:, 5])
    diel_dir = jnp.where(choose_reflect[:, None],
                         reflect(unit_d, normal),
                         refract(unit_d, normal, ratio))

    is_metal = mat_type == mat.METAL
    is_diel = mat_type == mat.DIELECTRIC
    is_emit = mat_type == mat.EMISSIVE

    direction = jnp.where(is_diel[:, None], diel_dir,
                          jnp.where(is_metal[:, None], metal_dir, lam_dir))
    attenuation = jnp.where(is_diel[:, None], jnp.ones_like(albedo), albedo)
    absorbed = is_metal & metal_absorbed
    return ScatterResult(direction=direction, attenuation=attenuation,
                         absorbed=absorbed, emitted=is_emit)
