"""Sky models.

The current reference kernel samples an equirectangular HDR environment on
ray miss (``gpu_kernel.cl:342-347`` via ``Vec3ToUV`` at ``:234-241``).  The
README benchmark scene predates the HDR sky and uses the classic RTiOW
gradient sky, whose vestige survives as dead code at ``gpu_kernel.cl:268-269``
(``t = 0.5*(unit_dir.y + 1)``).  Both are supported; ``kind`` selects.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

KIND_GRADIENT = 0
KIND_HDR = 1
KIND_CONST = 2


@dataclasses.dataclass(frozen=True)
class Sky:
    """kind: static int (pytree meta).  image: (H,W,3) f32 for HDR skies
    (a 1x1 dummy otherwise).  const_colour: (3,) for constant skies."""

    image: jnp.ndarray
    const_colour: jnp.ndarray
    kind: int = KIND_GRADIENT

    @staticmethod
    def gradient() -> "Sky":
        return Sky(jnp.zeros((1, 1, 3), jnp.float32),
                   jnp.zeros((3,), jnp.float32), KIND_GRADIENT)

    @staticmethod
    def hdr(image) -> "Sky":
        return Sky(jnp.asarray(image, jnp.float32),
                   jnp.zeros((3,), jnp.float32), KIND_HDR)

    @staticmethod
    def constant(colour) -> "Sky":
        return Sky(jnp.zeros((1, 1, 3), jnp.float32),
                   jnp.asarray(colour, jnp.float32), KIND_CONST)


jax.tree_util.register_dataclass(
    Sky, data_fields=["image", "const_colour"], meta_fields=["kind"])


def direction_to_uv(d):
    """Equirect direction -> (u, v) (Vec3ToUV, gpu_kernel.cl:234-241).

    d: (..., 3), need not be normalized (the reference normalizes inside).
    """
    n = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    u = 0.5 + jnp.arctan2(n[..., 2], n[..., 0]) / (2.0 * jnp.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(n[..., 1], -1.0, 1.0)) / jnp.pi
    return u, v


def sky_colour(sky: Sky, d):
    """Radiance for a miss ray with direction d (..., 3)."""
    if sky.kind == KIND_GRADIENT:
        # RTiOW gradient (the dead-code vestige at gpu_kernel.cl:268-269).
        n = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        t = 0.5 * (n[..., 1] + 1.0)
        white = jnp.array([1.0, 1.0, 1.0], jnp.float32)
        blue = jnp.array([0.5, 0.7, 1.0], jnp.float32)
        return (1.0 - t)[..., None] * white + t[..., None] * blue
    if sky.kind == KIND_CONST:
        return jnp.broadcast_to(sky.const_colour, d.shape[:-1] + (3,))
    # HDR equirect lookup (gpu_kernel.cl:342-346): x = int(u*W), y = int(v*H),
    # truncation toward zero, no wrap; clamp to the valid range for the u==1 /
    # v==1 edge (the reference reads out of bounds there — UB we don't copy).
    h, w = sky.image.shape[0], sky.image.shape[1]
    u, v = direction_to_uv(d)
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return sky.image[y, x]
