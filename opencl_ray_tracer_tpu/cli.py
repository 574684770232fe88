"""Command-line interface.

The reference's only entry point is its executable ``main()``
(``src/cpp/main.cpp:13``) with everything hardcoded; this CLI exposes the
same pipeline (device dump -> scene -> render -> BMP/PNG) with runtime
config and the scene-descriptor JSON the reference left as a to-do
(``README.md:56``).

    python -m opencl_ray_tracer_tpu.cli render --scene readme \
        --width 640 --height 360 --spp 32 -o output.bmp
    python -m opencl_ray_tracer_tpu.cli render --scene scene.json ...
    python -m opencl_ray_tracer_tpu.cli info
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_scene(name: str):
    from . import (book_cover_scene, flagship_scene, readme_scene,
                   reference_scene, scene_from_json)
    if name == "readme":
        return readme_scene()
    if name == "reference":
        # the reference executable's default render (main.cpp:118-133):
        # F1 car mesh + 8 spheres + HDR skybox, auto-resolved from assets
        return flagship_scene()
    if name == "reference-bare":
        return reference_scene()   # the 8 spheres alone (no assets)
    if name == "cover":
        return book_cover_scene()
    return scene_from_json(name)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="opencl_ray_tracer_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="render a scene to an image file")
    pr.add_argument("--scene", default="readme",
                    help="readme | reference (F1 car + HDR skybox, the "
                         "reference binary's default) | reference-bare | "
                         "cover | path/to/scene.json")
    pr.add_argument("--width", type=int, default=1280)
    pr.add_argument("--height", type=int, default=720)
    pr.add_argument("--spp", type=int, default=5)
    pr.add_argument("--max-depth", type=int, default=32)
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("-o", "--output", default="output.bmp",
                    help=".bmp (reference-compatible) or .png")
    pr.add_argument("--checkpoint", default=None,
                    help="npz accumulation state for resume")
    pr.add_argument("--chunk-spp", type=int, default=16)
    pr.add_argument("--progress-image", default=None,
                    help="incremental PNG dumped as samples accumulate")
    pr.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")

    pi = sub.add_parser("info", help="device/topology dump")
    pi.add_argument("--json", action="store_true")

    args = p.parse_args(argv)

    if args.cmd == "info":
        from .utils import device_info, print_device_info
        if args.json:
            print(json.dumps(device_info(), indent=2, default=str))
        else:
            print_device_info()
        return 0

    if getattr(args, "cpu", False):
        import jax
        jax.config.update("jax_platforms", "cpu")
        # `python -m` imports the package before main() runs; if anything
        # initialized a backend at import time, drop it so the platform
        # selection takes effect.
        from jax._src import xla_bridge
        if xla_bridge.backends_are_initialized():
            from jax.extend.backend import clear_backends
            clear_backends()

    from . import RenderConfig, render
    from .io import tonemap_u8, write_bmp, write_png
    from .utils import PhaseTimer, ProgressReporter, print_device_info
    from .utils.timing import rays_per_second

    print_device_info()
    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.max_depth)
    timer = PhaseTimer()
    with timer.phase("scene build"):
        scene = _build_scene(args.scene)

    with timer.phase("render"):
        if args.checkpoint:
            from .parallel import render_checkpointed
            progress = ProgressReporter(args.progress_image)
            img = render_checkpointed(scene, cfg, args.checkpoint,
                                      seed=args.seed,
                                      chunk_spp=args.chunk_spp,
                                      progress=progress)
        elif args.progress_image:
            # plain render with the reference's per-block growing image
            # (main.cpp:263-265): row blocks through the fast path
            progress = ProgressReporter(args.progress_image)
            img = render(scene, cfg, seed=args.seed, progress=progress)
        else:
            img = render(scene, cfg, seed=args.seed)
        import jax
        jax.block_until_ready(img)

    stats = rays_per_second(cfg.width, cfg.height, cfg.spp,
                            timer["render"])
    print(f"{stats['camera_samples_per_s']:.3e} camera samples/s")

    import numpy as np
    img = np.asarray(img)
    if args.output.endswith(".png"):
        write_png(args.output, tonemap_u8(img))
    else:
        write_bmp(args.output, img)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
