"""Render the reference's default scene end-to-end on the fused kernel.

The scene hardcoded in the reference's ``main.cpp:80-152``: 8 spheres (all
four materials), the 15,329-triangle F1 car (``assets/models/f1_car.obj``
with the exact scale/translate of ``main.cpp:118-120``), and an
equirectangular HDR skybox (procedural substitute — the reference's
``skybox.hdr`` is a missing LFS blob) at the default build config
(1280x720, 5 spp, depth 32; ``globals.hpp:9-14``).

On a TPU this takes the fused mesh/HDR wavefront megakernel
(kernels/megamesh.py): ~4 s on one v5e chip vs 27.9 s for the round-1
jnp wavefront path.  On CPU it falls back to the jnp tracer (slow at
full size — pass --small).

    python examples/reference_scene_render.py [--small] [--obj PATH]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obj", default="/root/reference/src/assets/models/"
                    "f1_car.obj")
    ap.add_argument("--small", action="store_true",
                    help="320x180x2spp (CPU-friendly)")
    ap.add_argument("-o", "--output", default="reference_scene.png")
    args = ap.parse_args()

    import jax

    import opencl_ray_tracer_tpu as ort
    from opencl_ray_tracer_tpu.io import tonemap_u8, write_png
    from opencl_ray_tracer_tpu.io.hdr import tone_map
    from opencl_ray_tracer_tpu.io.obj import load_obj, parse_obj
    from opencl_ray_tracer_tpu.io.procgen import make_sky_image, \
        make_torus_obj
    from opencl_ray_tracer_tpu.scene import Sky

    if os.path.exists(args.obj):
        # the reference's exact mesh transform (main.cpp:118-120)
        tris, aabb = load_obj(args.obj, scale=(0.15, 0.15, 0.15),
                              translate=(0.0, -0.5, -1.0))
    else:
        print(f"# {args.obj} not found; using a procedural torus")
        tris, aabb = parse_obj(make_torus_obj(24, 12),
                               scale=(0.5, 0.5, 0.5),
                               translate=(0.3, 0.0, -1.6))
    sky = Sky.hdr(tone_map(make_sky_image(1024, 512)))
    scene = ort.reference_scene(mesh_tris=tris, mesh_aabb=aabb, sky=sky)

    if args.small:
        cfg = ort.RenderConfig(width=320, height=180, spp=2, max_depth=8)
    else:
        cfg = ort.RenderConfig()  # the reference defaults (globals.hpp)
    print(f"# backend={jax.default_backend()}  {cfg.width}x{cfg.height} "
          f"spp={cfg.spp} depth={cfg.max_depth} "
          f"tris={scene.triangles.count}")

    t0 = time.perf_counter()
    img = ort.render(scene, cfg, seed=0)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    sps = cfg.width * cfg.height * cfg.spp / dt
    print(f"# render: {dt:.3f} s  ({sps:.3e} camera samples/s)")

    import numpy as np
    write_png(args.output, tonemap_u8(np.asarray(img)))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
