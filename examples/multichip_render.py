"""Multi-device sharded rendering demo.

Renders the README benchmark scene over a (tile x sample) device mesh with
shard_map; on a multi-chip host this uses all chips over ICI, and the tile
sharding is bit-identical to a single-device render (counter RNG).

Without TPU hardware, emulate 8 devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_render.py --cpu
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=144)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--sample-axis", type=int, default=1)
    ap.add_argument("--out", default="multichip.png")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import opencl_ray_tracer_tpu as ort
    from opencl_ray_tracer_tpu import parallel as par
    from opencl_ray_tracer_tpu.io import tonemap_u8, write_png
    from opencl_ray_tracer_tpu.utils import print_device_info

    par.init_distributed()  # no-op single host
    print_device_info()

    n = len(jax.devices())
    mesh = par.make_mesh(n_sample=args.sample_axis)
    print(par.describe(mesh))

    cfg = ort.RenderConfig(width=args.width, height=args.height,
                           spp=args.spp, max_depth=8, early_stop=False)
    assert cfg.height % mesh.shape[par.TILE_AXIS] == 0, \
        "height must divide by the tile axis"
    scene = ort.readme_scene()

    t0 = time.time()
    img = par.render_sharded_jit(scene, cfg, mesh, seed=0)
    jax.block_until_ready(img)
    t1 = time.time()
    img = par.render_sharded_jit(scene, cfg, mesh, seed=1)
    jax.block_until_ready(img)
    dt = time.time() - t1
    print(f"compile+run {t1 - t0:.2f}s; steady-state {dt:.3f}s "
          f"({cfg.width * cfg.height * cfg.spp / max(dt, 1e-9):.3e} "
          f"samples/s over {n} device(s))")
    write_png(args.out, tonemap_u8(np.asarray(img)))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
