"""Device mesh construction.

Replaces the reference's sequential pixel-block scheduler
(``GetIdealBlockSize`` + the serial block loop, ``src/cpp/utility.cpp:192-236``
and ``main.cpp:229-269``) with a 2-D ``jax.sharding.Mesh``:

- axis "tile": image-row tiles, rendered *concurrently* (real data
  parallelism over what the reference iterated serially);
- axis "sample": the per-pixel sample loop, sharded for variance /
  gradient-noise reduction (each shard renders a disjoint global sample-id
  window; radiance is pmean-reduced over the axis).

The reference's squarest-largest block-factor heuristic is unnecessary: row
tiles are exact (height % tiles == 0 enforced at call sites), and the
per-block camera re-upload (``main.cpp:234-237``) disappears because each
shard derives its row offset from ``lax.axis_index``.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

TILE_AXIS = "tile"
SAMPLE_AXIS = "sample"


def make_mesh(n_tile: int | None = None, n_sample: int = 1,
              devices=None) -> Mesh:
    """Build a (tile, sample) mesh.  Default: all devices on the tile axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_tile is None:
        assert n % n_sample == 0, (n, n_sample)
        n_tile = n // n_sample
    assert n_tile * n_sample == n, (n_tile, n_sample, n)
    arr = np.array(devices).reshape(n_tile, n_sample)
    return Mesh(arr, (TILE_AXIS, SAMPLE_AXIS))


def describe(mesh: Mesh) -> str:
    """Startup mesh-topology dump — the analog of the reference's OpenCL
    device-capability dump (PrintOpenCLInfo, utility.cpp:3-61)."""
    lines = [f"mesh axes: {dict(zip(mesh.axis_names, mesh.devices.shape))}"]
    for d in mesh.devices.flat:
        lines.append(f"  {d.id}: {d.device_kind} (process {d.process_index})")
    return "\n".join(lines)
