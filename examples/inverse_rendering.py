"""Inverse rendering demo (BASELINE.json config 5).

Recovers perturbed sphere material + position from a rendered target image
by gradient descent on pixel MSE — a capability the reference renderer
(forward-only OpenCL) cannot express.

Run (CPU is fine for the demo size):
    python examples/inverse_rendering.py [--steps 80] [--soft]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--out", default="inverse_demo")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import opencl_ray_tracer_tpu as ort
    from opencl_ray_tracer_tpu.io import tonemap_u8, write_png

    w = args.size
    h = int(w * 9 / 16)
    cfg = ort.RenderConfig(width=w, height=h, spp=4, max_depth=4,
                           early_stop=False)

    true_scene = ort.readme_scene()
    target = ort.render(true_scene, cfg, seed=123)
    write_png(f"{args.out}_target.png", tonemap_u8(np.asarray(target)))

    # Perturb: center sphere albedo + x position
    bad_albedo = true_scene.spheres.albedo.at[1].set(
        jnp.array([0.2, 0.9, 0.9]))
    bad_center = true_scene.spheres.center.at[1, 0].add(0.15)
    init = dataclasses.replace(
        true_scene, spheres=dataclasses.replace(
            true_scene.spheres, albedo=bad_albedo, center=bad_center))
    write_png(f"{args.out}_init.png",
              tonemap_u8(np.asarray(ort.render(init, cfg, seed=0))))

    # Stage 1: materials with hard visibility (smooth gradients).
    print("stage 1: albedo (hard visibility)")
    fitted, losses = ort.fit_scene(
        target, init, cfg, param_paths=("spheres.albedo",),
        steps=args.steps, learning_rate=5e-2, seed=7)
    print(f"  loss {losses[0]:.4f} -> {losses[-1]:.4f}")

    # Stage 2: geometry with soft visibility (silhouette gradients).
    print("stage 2: center (soft visibility)")
    mask = np.zeros_like(np.asarray(init.spheres.center))
    mask[1] = 1.0
    fitted, losses = ort.fit_scene(
        target, fitted, cfg, param_paths=("spheres.center",),
        steps=args.steps, learning_rate=4e-3, seed=11, soft=True,
        beta=40.0, param_mask={"spheres.center": mask})
    print(f"  loss {losses[0]:.4f} -> {losses[-1]:.4f}")

    got_albedo = np.asarray(fitted.spheres.albedo[1])
    want_albedo = np.asarray(true_scene.spheres.albedo[1])
    got_x = float(fitted.spheres.center[1, 0])
    want_x = float(true_scene.spheres.center[1, 0])
    print(f"albedo: recovered {got_albedo.round(3)} true {want_albedo}")
    print(f"center.x: recovered {got_x:+.4f} true {want_x:+.4f} "
          f"(init was {want_x + 0.15:+.4f})")
    write_png(f"{args.out}_fitted.png",
              tonemap_u8(np.asarray(ort.render(fitted, cfg, seed=0))))
    print(f"wrote {args.out}_{{target,init,fitted}}.png")


if __name__ == "__main__":
    main()
