"""Counter-based, order-invariant RNG + analytic samplers.

The reference uses a stateful 48-bit java.util.Random LCG per work item
(``gpu_kernel.cl:582-591``), seeded on the host from ``rand()``
(``main.cpp:147-152`` — with the precedence quirk that truncates seeds to 32
bits, and the device-side bug that every pixel block reuses the same seed set
because the kernel indexes seeds by block-local id, ``gpu_kernel.cl:606``).

A stateful-sequential RNG is unusable on TPU: under jit/vmap/shard_map the
draw order is not the C loop order.  We replace it with a *counter-based*
hash RNG: every uniform draw is a pure function of
``(pixel_id, sample_id, bounce_slot, stream)``.  This makes images
bit-identical under any sharding or batch order — the property the sharding
tests rely on.  The hash is pcg4d (Jarzynski & Olano, "Hash Functions for GPU
Rendering", JCGT 2020) — 4x uint32 in, 4x uint32 out, cheap enough for the
VPU and usable verbatim inside Pallas kernels (it is plain jnp uint32 math).

Rejection sampling (``Vec3RandInUnitSphere`` at ``gpu_kernel.cl:182-196``,
``Vec3RandInUnitDisk`` at ``:243-257``) is replaced by exact analytic
samplers: rejection loops have data-dependent trip counts (not jittable) and
break differentiability.  The analytic samplers draw from the *same
distributions*, so images agree in distribution (and in mean as spp grows)
though not sample-for-sample with the OpenCL original.
"""

from __future__ import annotations

import jax.numpy as jnp

# Draw-slot layout within one (pixel, sample) stream.  Slots 0..3 are the
# camera draws; each bounce d consumes slots BOUNCE_BASE + d*BOUNCE_STRIDE ..
# + 5.  Keeping a fixed layout means RNG consumption never shifts between
# material types (unlike the reference, where e.g. a fuzz-0 metal consumes
# fewer LCG steps than a fuzzy one, gpu_kernel.cl:419).
SLOT_PIXEL_U = 0
SLOT_PIXEL_V = 1
SLOT_LENS = 2          # 2 uniforms (disk) drawn from one hash
BOUNCE_BASE = 4
BOUNCE_STRIDE = 2      # 2 pcg4d hashes per bounce = 8 uniforms

_U32 = jnp.uint32


def pcg4d(a, b, c, d):
    """pcg4d hash: 4x uint32 -> 4x uint32 (public domain construction)."""
    a = a.astype(_U32)
    b = b.astype(_U32)
    c = c.astype(_U32)
    d = d.astype(_U32)
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


def _to_unit_float(bits):
    """uint32 -> float32 uniform in [0, 1).  Uses the top 24 bits."""
    return (bits >> _U32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def uniform4(seed, pixel_id, sample_id, slot):
    """Four independent U[0,1) draws for counter (pixel, sample, slot).

    All args are integer arrays (broadcastable); ``seed`` is the render-level
    base seed (the analog of the host ``srand(time(NULL))`` at main.cpp:18,
    but reproducible).
    """
    a, b, c, d = pcg4d(
        jnp.asarray(pixel_id, _U32),
        jnp.asarray(sample_id, _U32),
        jnp.asarray(slot, _U32),
        jnp.asarray(seed, _U32),
    )
    return (_to_unit_float(a), _to_unit_float(b),
            _to_unit_float(c), _to_unit_float(d))


# ---------------------------------------------------------------------------
# Analytic samplers (replacing the reference's rejection loops).
# ---------------------------------------------------------------------------

def unit_vector_from_uniforms(u1, u2):
    """Uniform direction on S^2 from two uniforms (exact, no rejection).

    Replaces ``Vec3RandUnitVector`` (gpu_kernel.cl:198-201).
    Returns (..., 3).
    """
    z = 2.0 * u1 - 1.0
    phi = (2.0 * jnp.pi) * u2
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def in_unit_sphere_from_uniforms(u1, u2, u3):
    """Uniform point in the unit ball (exact).

    Replaces ``Vec3RandInUnitSphere`` (gpu_kernel.cl:182-196).
    """
    dirs = unit_vector_from_uniforms(u1, u2)
    radius = jnp.cbrt(u3)
    return dirs * radius[..., None]


def in_unit_disk_from_uniforms(u1, u2):
    """Uniform point in the unit disk, z = 0 (exact).

    Replaces ``Vec3RandInUnitDisk`` (gpu_kernel.cl:243-257).
    """
    r = jnp.sqrt(u1)
    theta = (2.0 * jnp.pi) * u2
    zero = jnp.zeros_like(r)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), zero], axis=-1)
