"""Multi-device scaling-efficiency benchmark (SURVEY.md §6 target:
>=85% efficiency scaling out over the mesh).

Measures samples/s for 1..N devices on the tile axis with the sharded
renderer and reports efficiency vs linear scaling.  On a single-chip host
this degenerates to N=1 (the sharding path still runs); emulate more with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python \
        benchmarks/scaling.py --cpu
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--pallas", action="store_true",
                    help="use the megakernel per shard (TPU)")
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
    scene = ort.readme_scene()
    results = []
    n = 1
    while n <= n_max:
        if args.height % n:
            n *= 2
            continue
        cfg = ort.RenderConfig(width=args.width, height=args.height,
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
        sps = args.width * args.height * args.spp / dt
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
