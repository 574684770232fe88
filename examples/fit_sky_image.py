"""Recover an HDR environment map through kernel-rate sky cotangents.

Round-5 capability demo: the HDR backward path (``kernels/megagrad.py``)
returns REAL per-texel environment-map gradients — the emit pass dumps
each miss sample's direction and throughput, and the jnp epilogue
scatters ``thr * g_pixel`` at the hit texel (exactly the jnp VJP's
interior derivative; the nearest-texel lookup has zero
direction-derivative).  Here the sky of the reference-scene-with-HDR
setup is globally DIMMED by an unknown scalar gain and the gain is
recovered by chaining the per-texel cotangents onto it.  The reference
renderer (forward-only OpenCL) cannot express any of this.

A 1-D gain keeps the demo honest and robust at demo sizes, the same
reasoning as examples/fit_mesh_vertices.py; ``fit_scene(...,
["sky.image"], grad_backend="pallas")`` fits the full texel field (see
tests/test_megagrad.py::test_fit_scene_sky_image_pallas).

Run (CPU interpret mode is fine for the demo size):
    python examples/fit_sky_image.py [--steps 10] [--cpu]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (interpret-mode kernels)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import opencl_ray_tracer_tpu as ort
    from opencl_ray_tracer_tpu.io.hdr import tone_map
    from opencl_ray_tracer_tpu.io.procgen import make_sky_image
    from opencl_ray_tracer_tpu.scene import Sky
    from opencl_ray_tracer_tpu.tracer.render import render_grad_sampled

    sky_img = tone_map(make_sky_image(64, 32))
    scene = dataclasses.replace(ort.readme_scene(),
                                sky=Sky.hdr(sky_img))
    cfg = ort.RenderConfig(width=64, height=36, spp=2, max_depth=4,
                           nan_policy="zero")
    target = ort.render(scene, cfg, seed=7)
    loss_fn = lambda img: jnp.mean((img - target) ** 2)

    def dimmed(gain):
        return dataclasses.replace(
            scene, sky=Sky.hdr(sky_img * gain))

    g0 = gain = 0.6                # the unknown gain to recover (-> 1)
    lr = 4.0
    print(f"gain0 = {gain:.4f}")
    for it in range(args.steps):
        loss, _, g = render_grad_sampled(
            dimmed(jnp.float32(gain)), cfg, loss_fn, seed=7,
            grad_backend="pallas")
        # chain rule onto the scalar: dL/dgain = sum(dL/dsky * sky_img)
        dg = float(jnp.sum(g.sky.image * sky_img))
        gain = gain - lr * dg
        print(f"step {it:2d}: loss {float(loss):.3e}  "
              f"gain -> {gain:.4f}")
    # descent must close at least half the gap to the true gain of 1
    assert abs(gain - 1.0) < 0.5 * abs(g0 - 1.0), gain
    print(f"recovered gain = {gain:.4f} (true 1.0)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
