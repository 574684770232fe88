"""Render configuration.

TPU-native equivalent of the reference's compile-time config
(``src/cpp/globals.hpp:8-14``: 1280x720, 16:9, TARGET_BLOCK_NUM 4, SPP 5,
MAX_DEPTH 32) plus the "Scene descriptor JSON file" item from the reference's
own to-do list (``README.md:56``).  Everything the reference hardcodes as
``#define``s or literals in ``main()`` is a runtime dataclass here.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (non-traced) render settings.

    width/height/spp/max_depth mirror ``globals.hpp:9-14``.  ``t_min`` is the
    reference's hardcoded 0.001 epsilon (``gpu_kernel.cl:278``).

    nan_policy:
      - "running_sum": exact reproduction of the reference estimator quirk at
        ``gpu_kernel.cl:640-642`` (a NaN sample channel is replaced by the
        running *sum* of that channel so far).  Requires sequential samples.
      - "zero": NaN samples contribute 0 (order-invariant; used when the
        sample axis is sharded across devices).
    clamp_samples: per-sample clamp to [0,1] *before* averaging, the estimator
      quirk at ``gpu_kernel.cl:632-638``.
    backend: "jnp" = pure-jnp lax.scan tracer (differentiable, runs on any
      backend); "pallas" = TPU megakernel fast path (forward only);
      "auto" = pallas on TPU when available else jnp.
    tri_backend: triangle-intersection form — "mt" = direct Moller-Trumbore
      fold (tracer/intersect.py), "mm" = MXU matmul form
      (tracer/mesh_accel.py), "auto" = mm when the mesh is large enough to
      pay for the matmul.
    """

    width: int = 1280
    height: int = 720
    spp: int = 5
    max_depth: int = 32
    t_min: float = 1e-3
    gamma: float = 2.0
    clamp_samples: bool = True
    nan_policy: str = "running_sum"
    backend: str = "auto"
    tri_backend: str = "auto"
    # Pixel rows per chunk for the jnp tracer (bounds peak memory).  None =
    # whole image at once.
    row_chunk: int | None = None
    # Forward-only early exit: stop the bounce loop once every ray in the
    # batch is terminated (lax.while_loop; not reverse-differentiable).
    early_stop: bool = True

    @property
    def aspect_ratio(self) -> float:
        return self.width / self.height

    def replace(self, **kw: Any) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "RenderConfig":
        return RenderConfig(**json.loads(s))


# The reference's default build config (globals.hpp:8-14).
REFERENCE_DEFAULTS = RenderConfig(width=1280, height=720, spp=5, max_depth=32)

# The reference's README benchmark config (README.md:24-29).
README_BENCH = RenderConfig(width=1280, height=720, spp=250, max_depth=50)
