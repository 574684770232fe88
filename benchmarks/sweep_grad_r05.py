"""Round-5 TPU sweep: fast-acc reverse + multi-level grad ladder.

Times the sphere backward kernel (kernels/megagrad.py) on the README
benchmark config (1280x720, 250 spp, depth 50) across:
  - fast_acc off/on (one-hot MXU cotangent accumulation vs per-scalar
    reduces) for the plain uncapped kernel, and
  - ladder schedules (multi-level tail compaction) with fast_acc on.

One long-lived process (remote-compile warmup amortized); results go to
stdout as JSON lines.  Run ON TPU:  python benchmarks/sweep_grad_r05.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

import os  # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))

import opencl_ray_tracer_tpu as ort  # noqa: E402
from opencl_ray_tracer_tpu.kernels import megagrad as mg  # noqa: E402
from opencl_ray_tracer_tpu.kernels.megakernel import (  # noqa: E402
    _camera_table, _sphere_table, specialize_flags)


def main(argv):
    spp = int(argv[1]) if len(argv) > 1 else 250
    reps = int(argv[2]) if len(argv) > 2 else 3
    scene = ort.readme_scene()
    cfg = ort.RenderConfig(width=1280, height=720, spp=spp, max_depth=50,
                           nan_policy="zero")
    flags = specialize_flags(scene)
    cam = _camera_table(scene)
    sph = _sphere_table(scene)
    h, w = cfg.height, cfg.width
    g_img = jnp.full((h, w, 3), 1.0 / (h * w * 3), jnp.float32)
    seed = jnp.int32(0)

    @functools.partial(jax.jit, static_argnames=("fast", "fill_only",
                                                 "skip"))
    def run_inner(g, fast, fill_only=False, skip=""):
        return mg._grad_tables_inner(
            cam, sph, scene.spheres.count, scene.sky.kind, cfg, g, seed,
            jnp.int32(0), cfg.spp, flags, False, fast_acc=fast,
            fill_only=fill_only, profile_skip=skip)

    @functools.partial(jax.jit, static_argnames=("levels",))
    def run_ladder(g, levels):
        return mg._grad_tables_laddered(
            cam, sph, scene.spheres.count, scene.sky.kind, cfg, g, seed,
            jnp.int32(0), cfg.spp, flags, False, levels=levels)

    def timeit(tag, fn):
        t0 = time.time()
        jax.block_until_ready(fn())
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn())
            best = min(best, time.time() - t0)
        print(json.dumps({"tag": tag, "best_s": round(best, 4),
                          "first_s": round(compile_s, 2)}), flush=True)
        return best

    mode = argv[3] if len(argv) > 3 else "profile"
    mg.GRAD_FAST_ACC = True
    if mode == "profile":
        # decompose per-slot cost (timing only; skipped pieces produce
        # wrong gradients)
        timeit("fill_only", lambda: run_inner(g_img, True, True))
        timeit("fill_only skip=draws",
               lambda: run_inner(g_img, True, True, "draws"))
        timeit("fill_only skip=draws,fray",
               lambda: run_inner(g_img, True, True, "draws,fray"))
        timeit("plain", lambda: run_inner(g_img, True))
        timeit("plain skip=draws,fray",
               lambda: run_inner(g_img, True, skip="draws,fray"))
        timeit("plain skip=cam", lambda: run_inner(g_img, True,
                                                   skip="cam"))
        timeit("plain skip=acc", lambda: run_inner(g_img, True,
                                                   skip="acc"))
        timeit("plain skip=cam,acc,draws,fray",
               lambda: run_inner(g_img, True, skip="cam,acc,draws,fray"))
        return
    if mode == "survival":
        # count survivors after r capped rounds -> the curve that sets
        # ladder capacities
        @functools.partial(jax.jit, static_argnames=("r",))
        def surv(g, r):
            _, _, s_out = mg._grad_tables_inner(
                cam, sph, scene.spheres.count, scene.sky.kind, cfg, g,
                seed, jnp.int32(0), cfg.spp, flags, False,
                max_rounds=r, emit_state=True)
            s = s_out.reshape(-1)[:h * w]
            return jnp.sum((s < cfg.spp).astype(jnp.int32))
        for r in (6, 7, 8, 9, 10, 11, 12, 14, 16, 20, 24, 28):
            n = int(surv(g_img, r))
            print(json.dumps({"rounds": r,
                              "alive_frac": round(n / (h * w), 4)}),
                  flush=True)
        return
    # multi-level schedules: (rounds, denom) per capped level
    schedules = [
        ((12, 2), (6, 4), (6, 8), (8, 32)),
        ((8, 1.45), (4, 2.2), (4, 3.6), (4, 7), (6, 20), (8, 64)),
        ((9, 1.5), (4, 2.5), (4, 4.5), (5, 10), (8, 40)),
        ((10, 1.7), (4, 3), (4, 6), (6, 16), (8, 64)),
        ((8, 1.5), (3, 2), (3, 3), (3, 4.7), (4, 8), (6, 24), (8, 80)),
    ]
    for sch in schedules:
        timeit(f"ladder {sch}", lambda: run_ladder(g_img, sch))


if __name__ == "__main__":
    main(sys.argv)
