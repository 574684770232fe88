"""Recover a mesh deformation through kernel-rate vertex gradients.

Round-4 capability demo: the mesh backward megakernel
(``kernels/megagrad.py``) returns exact interior cotangents for every
triangle vertex (per-winner plane-cotangent accumulation, chained through
n = (p1-p0) x (p2-p0), c = n.p0).  Here a torus is SHEARED (every p0
shifted by a scalar s along (1,1,1) — tilting all faces, so the metal
surface's reflected sky shifts over covered pixels) and s is recovered by
chaining the kernel's per-vertex cotangents onto the 1-D deformation
parameter.  The reference renderer (forward-only OpenCL) cannot express
any of this.

Full vertex-FIELD fitting from interior derivatives alone is noise-
dominated at demo sizes (and rigid translations are silhouette-dominated:
measured dot(grad, perturbation) < 0 for the kernel AND the jnp VJP —
use tracer/soft.py's soft-visibility gradients for those); a
low-dimensional deformation is the honest, robust demonstration.

Run (CPU interpret mode is fine for the demo size):
    python examples/fit_mesh_vertices.py [--steps 12] [--cpu]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (interpret-mode kernels)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import opencl_ray_tracer_tpu as ort
    from opencl_ray_tracer_tpu.io.obj import parse_obj
    from opencl_ray_tracer_tpu.io.procgen import make_torus_obj
    from opencl_ray_tracer_tpu.tracer.render import render_grad_sampled

    tris, aabb = parse_obj(make_torus_obj(8, 6), scale=(0.5, 0.5, 0.5),
                           translate=(0.3, 0.0, -1.6))
    scene = ort.reference_scene(mesh_tris=tris, mesh_aabb=aabb)
    cfg = ort.RenderConfig(width=64, height=36, spp=2, max_depth=5,
                           nan_policy="zero")
    target = ort.render(scene, cfg, seed=7)
    loss_fn = lambda im: jnp.mean((im - target) ** 2)
    direction = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)

    def deformed(s):
        return dataclasses.replace(
            scene, triangles=dataclasses.replace(
                scene.triangles,
                p0=scene.triangles.p0 + s * direction))

    s0 = s = 0.02                  # the unknown shear to recover (-> 0)
    lr = 40.0                      # 1-D problem; plain gradient descent
    print(f"s0 = {s:.5f}")
    for it in range(args.steps):
        loss, _, g = render_grad_sampled(
            deformed(jnp.float32(s)), cfg, loss_fn, seed=7,
            grad_backend="pallas")
        # chain rule onto the scalar: dL/ds = sum(dL/dp0 . direction)
        ds = float(jnp.sum(g.triangles.p0 * direction))
        s = s - lr * ds
        print(f"step {it:2d}: loss {float(loss):.3e}  s -> {s:+.5f}")
    # relative-improvement check: descent must at least halve the shear
    # (an absolute threshold equal to s0 aborts on any no-progress step
    # at this tiny spp/size — seed sensitive)
    assert abs(s) < 0.5 * s0, s
    print(f"recovered shear |s| = {abs(s):.5f} (true 0)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
