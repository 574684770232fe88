"""Multi-device execution: mesh, sharded render, geometry ring, checkpoint,
multi-host init (reference L2 runtime reimagined as SPMD)."""

from .checkpoint import load_state, render_checkpointed, save_state
from .distributed import init_distributed, is_multi_host
from .mesh import SAMPLE_AXIS, TILE_AXIS, describe, make_mesh
from .ring import ring_hit_fn, ring_hit_fn_mm, shard_triangles
from .sharded import (make_train_step, render_grad_sharded, render_sharded,
                      render_sharded_jit)

__all__ = [
    "make_mesh", "describe", "TILE_AXIS", "SAMPLE_AXIS",
    "render_sharded", "render_sharded_jit", "make_train_step",
    "render_grad_sharded",
    "ring_hit_fn", "ring_hit_fn_mm", "shard_triangles",
    "render_checkpointed", "save_state", "load_state",
    "init_distributed", "is_multi_host",
]
