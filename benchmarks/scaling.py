"""Multi-device scaling-efficiency benchmark (SURVEY.md §6 target:
>=85% efficiency scaling out over the mesh).

Measures samples/s for 1..N devices on the tile axis with the sharded
renderer and reports efficiency vs linear scaling.  On a single-chip host
this degenerates to N=1 (the sharding path still runs); emulate more with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python \
        benchmarks/scaling.py --cpu

Modes:
  (default)  strong scaling: fixed image, 1..N devices.
  --weak     weak scaling: image height grows with n (constant per-device
             work) — on shared-core virtual devices the honest signal is
             per-device throughput staying flat.
  --phases   per-phase overhead breakdown on ONE device: bare jitted
             kernel vs the same inside a 1-device shard_map (dispatch
             overhead) vs shard_map + psum (collective overhead).  This
             bounds the non-compute budget the >=85% ICI target must fit
             in: efficiency >= t_kernel / (t_kernel + dispatch + psum +
             ICI transfer), with only the transfer term unmeasurable on
             one chip.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _phases(args, scene):
    """1-device overhead breakdown: bare kernel vs shard_map dispatch vs
    shard_map + collective.  Returns a JSON-able dict with the implied
    lower bound on multi-chip efficiency (everything but the ICI
    transfer, which needs real chips)."""
    import time

    import jax
    import jax.numpy as jnp

    import opencl_ray_tracer_tpu as ort
    from opencl_ray_tracer_tpu import parallel as par
    from opencl_ray_tracer_tpu.tracer.render import render_rows

    cfg = ort.RenderConfig(width=args.width, height=args.height,
                           spp=args.spp, max_depth=args.depth,
                           early_stop=False)
    devices = jax.devices()
    mesh = par.make_mesh(n_tile=1, n_sample=1, devices=devices[:1])

    use_pl = args.pallas
    ring = args.scene == "ring"
    if args.scene == "mesh":
        from opencl_ray_tracer_tpu.kernels.megamesh import (
            render_pallas_mesh_inner, specialize_mesh_flags,
            supports_mesh)
        from opencl_ray_tracer_tpu.kernels.megamesh import \
            MESH_CHUNK as _MC
        from opencl_ray_tracer_tpu.tracer.clusters import plan_for_scene
        assert supports_mesh(scene, cfg)
        use_pl = True
        mflags = specialize_mesh_flags(scene)
        mplan = plan_for_scene(scene, _MC)
        interp = jax.default_backend() != "tpu"
        bare = jax.jit(lambda sd: render_pallas_mesh_inner(
            scene, cfg, sd, interp, mflags, mplan, cfg.height, 0))
        shard = jax.jit(lambda sd: par.render_sharded(
            scene, cfg, mesh, sd, use_pallas=True,
            pallas_interpret=interp))
    elif ring:
        # the MXU geometry ring on ONE device: ppermute degenerates to
        # an identity rotation, so (shard - bare) isolates the ring's
        # dispatch + fold + feature-rotation overhead minus real ICI
        from opencl_ray_tracer_tpu.tracer.mesh_accel import \
            make_mm_hit_fn
        hf = make_mm_hit_fn(scene, cfg.t_min,
                            expected_rays=cfg.height * cfg.width)
        bare = jax.jit(lambda sd: render_rows(
            scene, cfg, jnp.int32(0), cfg.height, jnp.uint32(sd),
            hit_fn=hf))
        shard = jax.jit(lambda sd: par.render_sharded(
            scene, cfg, mesh, sd, geometry_ring=True))
    elif use_pl:
        from opencl_ray_tracer_tpu.kernels.megakernel import (
            render_pallas_inner, specialize_flags, supports)
        assert supports(scene, cfg)
        flags = specialize_flags(scene)
        bare = jax.jit(lambda sd: render_pallas_inner(
            scene, cfg, sd, False, flags, cfg.height, 0))
        shard = jax.jit(lambda sd: par.render_sharded(
            scene, cfg, mesh, sd, use_pallas=True))
    else:
        bare = jax.jit(lambda sd: render_rows(
            scene, cfg, jnp.int32(0), cfg.height, jnp.uint32(sd)))
        shard = jax.jit(lambda sd: par.render_sharded(
            scene, cfg, mesh, sd, use_pallas=False))

    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(),),
             out_specs=P(), check_vma=False)
    def with_psum(sd):
        if args.scene == "mesh":
            img = render_pallas_mesh_inner(scene, cfg, sd,
                                           jax.default_backend() != "tpu",
                                           mflags, mplan, cfg.height, 0)
        elif ring:
            from opencl_ray_tracer_tpu.parallel.ring import ring_hit_fn_mm
            rhf = ring_hit_fn_mm(scene, par.TILE_AXIS)
            img = render_rows(scene, cfg, jnp.int32(0), cfg.height,
                              jnp.uint32(sd), hit_fn=rhf)
        elif use_pl:
            from opencl_ray_tracer_tpu.kernels.megakernel import \
                render_pallas_inner
            img = render_pallas_inner(scene, cfg, sd, False, flags,
                                      cfg.height, 0)
        else:
            img = render_rows(scene, cfg, jnp.int32(0), cfg.height,
                              jnp.uint32(sd))
        # the worst-case collective on the render path: a full-image
        # reduction (sample-axis pmean); grad-path psums are (16, 128)
        # tables, far smaller
        return jax.lax.psum(img, par.TILE_AXIS)

    def best_of(f, n=3):
        jax.block_until_ready(f(jnp.int32(0)))      # compile + warm
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(jnp.int32(i + 1)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_kernel = best_of(bare)
    t_shard = best_of(shard)
    t_psum = best_of(with_psum)
    if ring:
        # the ring has no un-sharded form ("bare" here is the REPLICATED
        # mm-fold reference point, a different kernel); the isolatable
        # overhead on one chip is the collective on top of the sharded
        # ring itself (the 1-device ppermute is an identity rotation)
        dispatch = 0.0
        collective = max(0.0, t_psum - t_shard)
        eff_bound = t_shard / max(t_shard + collective, 1e-12)
    else:
        dispatch = max(0.0, t_shard - t_kernel)
        collective = max(0.0, t_psum - t_shard)
        eff_bound = t_kernel / max(t_kernel + dispatch + collective,
                                   1e-12)
    return {
        "mode": "phases",
        "backend": jax.default_backend(),
        "scene": args.scene,
        "config": {"width": args.width, "height": args.height,
                   "spp": args.spp, "depth": args.depth,
                   "pallas": bool(use_pl)},
        "seconds": {"kernel": round(t_kernel, 4),
                    "shard_map": round(t_shard, 4),
                    "shard_map_psum": round(t_psum, 4)},
        "overhead_seconds": {"dispatch": round(dispatch, 4),
                             "collective_full_image_psum":
                                 round(collective, 4)},
        "implied_efficiency_bound_excl_ici": round(eff_bound, 4),
        "note": (("ring: kernel = the REPLICATED mm-fold reference "
                  "(different code); shard_map = the 1-device geometry "
                  "ring (identity ppermute) — faster than replicated "
                  "here; the bound uses ring/(ring+collective+ICI).")
                 if ring else
                 ("efficiency >= kernel/(kernel+dispatch+collective+ICI); "
                 "only the ICI transfer term needs real chips.  The "
                  "full-image psum is the worst-case collective; the "
                  "render path's real collectives are smaller.")),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--pallas", action="store_true",
                    help="use the megakernel per shard (TPU)")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: height scales with device count")
    ap.add_argument("--phases", action="store_true",
                    help="1-device overhead breakdown (see module doc)")
    ap.add_argument("--scene", default="readme",
                    choices=("readme", "mesh", "ring"),
                    help="phases scene: readme (sphere megakernel), "
                         "mesh (sharded megamesh), ring (MXU geometry "
                         "ring, 1-device identity rotation)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

    import opencl_ray_tracer_tpu as ort
    from opencl_ray_tracer_tpu import parallel as par

    par.init_distributed()
    devices = jax.devices()
    n_max = len(devices)
    if args.phases and args.scene == "mesh":
        scene = ort.flagship_scene()
    elif args.phases and args.scene == "ring":
        import dataclasses as dc

        from opencl_ray_tracer_tpu.io.obj import parse_obj
        from opencl_ray_tracer_tpu.io.procgen import make_torus_obj
        tris, aabb = parse_obj(make_torus_obj(48, 32),
                               scale=(1.2, 1.2, 1.2),
                               translate=(0.0, 0.5, -1.8))
        scene = ort.reference_scene(mesh_tris=tris, mesh_aabb=aabb)
    else:
        scene = ort.readme_scene()

    if args.phases:
        print(json.dumps(_phases(args, scene)))
        return

    results = []
    n = 1
    base_rows = max(8, args.height // n_max)
    while n <= n_max:
        height = base_rows * n if args.weak else args.height
        if height % n:
            n *= 2
            continue
        cfg = ort.RenderConfig(width=args.width, height=height,
                               spp=args.spp, max_depth=args.depth,
                               early_stop=False)
        mesh = par.make_mesh(n_tile=n, n_sample=1, devices=devices[:n])

        # jit ONCE with a traced seed: rebuilding the shard_map per call
        # would retrace (and recompile the Pallas kernel) every time
        import jax.numpy as jnp
        render = jax.jit(lambda sd: par.render_sharded(
            scene, cfg, mesh, sd, use_pallas=args.pallas))

        img = render(jnp.int32(0))
        jax.block_until_ready(img)
        t0 = time.time()
        jax.block_until_ready(render(jnp.int32(1)))
        dt = time.time() - t0
        sps = args.width * cfg.height * args.spp / dt
        results.append({"devices": n, "seconds": round(dt, 4),
                        "samples_per_s": round(sps, 1)})
        print(f"# {n} device(s): {dt:.3f}s  {sps:.3e} samples/s",
              file=sys.stderr)
        n *= 2

    base = results[0]["samples_per_s"]
    for r in results:
        r["efficiency"] = round(r["samples_per_s"]
                                / (base * r["devices"]), 4)
    backend = jax.default_backend()
    virtual = (backend == "cpu"
               and "host_platform_device_count"
               in os.environ.get("XLA_FLAGS", ""))
    out = {
        "backend": backend,
        "mode": "weak" if args.weak else "strong",
        "devices_available": n_max,
        "config": {"width": args.width, "height": args.height,
                   "spp": args.spp, "depth": args.depth,
                   "pallas": bool(args.pallas)},
        "note": ("virtual CPU devices share the same physical cores: this "
                 "run validates the sharded code path and its overheads "
                 "(total throughput should stay ~flat), not real speedup — "
                 "ICI scaling needs real chips"
                 if virtual else
                 "per-device efficiency vs linear scaling of the 1-device "
                 "throughput"),
        "results": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
