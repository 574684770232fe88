"""Round-5 TPU sweep: flagship (F1 + HDR sky) forward+backward.

Times the reference-default-scene gradient pipeline variants:
  - forward render alone (megamesh)
  - round-4 two-pass grad (render + render_grad_scene)
  - round-5 fused pipeline (render_grad_hdr_fused — no separate forward)
  - the gradient-sky variant (emit/consume tax reference point)

Run ON TPU:  python benchmarks/sweep_flagship_r05.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))

import jax.numpy as jnp  # noqa: E402

import opencl_ray_tracer_tpu as ort  # noqa: E402

LOSS = lambda im: jnp.mean(im ** 2)


def timeit(tag, fn, reps=3):
    t0 = time.time()
    jax.block_until_ready(fn())
    first = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn())
        best = min(best, time.time() - t0)
    print(json.dumps({"tag": tag, "best_s": round(best, 4),
                      "first_s": round(first, 2)}), flush=True)
    return best


def main(argv):
    from opencl_ray_tracer_tpu.kernels.megagrad import (
        render_grad_hdr_fused, render_grad_scene)
    from opencl_ray_tracer_tpu.tracer.render import render_grad_sampled

    scene = ort.flagship_scene()
    cfg = ort.RenderConfig()          # 1280x720, 5 spp, depth 32
    which = argv[1] if len(argv) > 1 else "all"

    if which in ("all", "fwd"):
        timeit("forward F1+HDR", lambda: ort.render(scene, cfg, seed=22))

    if which in ("all", "old"):
        def old_grad():
            img = ort.render(scene, cfg, seed=32)
            _, g_img = jax.value_and_grad(LOSS)(img)
            return render_grad_scene(scene, cfg, g_img, 32)
        timeit("r4 two-pass grad (render + grad_scene)", old_grad)

    if which in ("all", "fused"):
        timeit("fused grad (render_grad_hdr_fused)",
               lambda: render_grad_hdr_fused(scene, cfg, LOSS, 33))

    if which in ("all", "gsky"):
        import dataclasses as dc

        from opencl_ray_tracer_tpu.scene import Sky
        g_scene = dc.replace(scene, sky=Sky.gradient())

        def gsky_grad():
            _, _, g = render_grad_sampled(g_scene, cfg, LOSS, seed=34,
                                          grad_backend="pallas")
            return g
        timeit("gradient-sky flagship fwd+bwd", gsky_grad)


if __name__ == "__main__":
    main(sys.argv)
