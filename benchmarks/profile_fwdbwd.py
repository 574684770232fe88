"""Breakdown profiling for the forward+backward path (run on TPU).

Isolates the components of render_grad_sampled (tracer/render.py) on one
(row_chunk x spp_chunk) block of the README benchmark scene:

  probe   — non-differentiable forward wavefront while_loop (iteration count)
  fwd     — the fixed-length differentiable wavefront scan, forward only
  fwd+bwd — jax.vjp of the same scan

Run inside a long-lived process (remote-compile warmup is minutes):
    python -i benchmarks/profile_fwdbwd.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.tracer.diffhit import make_grad_hit_fn
from opencl_ray_tracer_tpu.tracer.wavefront import (
    render_rows_wavefront, render_rows_wavefront_scan)

W, H, SPP, DEPTH = 1280, 720, 250, 50
scene = ort.readme_scene(aspect_ratio=W / H)
cfg = ort.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH)
dcfg = cfg.replace(early_stop=False, nan_policy="zero")


def grid(row_start, n_rows):
    rows = (row_start
            + jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 0)).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_rows, W), 1).reshape(-1)
    return rows, cols, rows * W + cols


def timed(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


@functools.partial(jax.jit, static_argnames=("n_rows", "n_spp", "winner"))
def probe(s, row_start, s0, n_rows, n_spp, winner=True):
    rows, cols, pids = grid(row_start, n_rows)
    hf = make_grad_hit_fn(s, dcfg.t_min) if winner else None
    return render_rows_wavefront(s, dcfg, rows, cols, pids, jnp.uint32(0),
                                 s0, n_spp, hit_fn=hf, return_iters=True)


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "n_spp", "n_iters", "winner",
                                    "remat"))
def fwd_scan(s, row_start, s0, n_rows, n_spp, n_iters, winner=True,
             remat=True):
    rows, cols, pids = grid(row_start, n_rows)
    hf = make_grad_hit_fn(s, dcfg.t_min) if winner else None
    return render_rows_wavefront_scan(s, dcfg, rows, cols, pids,
                                      jnp.uint32(0), s0, n_spp, n_iters,
                                      hit_fn=hf, remat=remat)


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "n_spp", "n_iters", "winner",
                                    "remat"))
def fwdbwd_scan(s, row_start, s0, g, n_rows, n_spp, n_iters, winner=True,
                remat=True):
    def fn(s):
        rows, cols, pids = grid(row_start, n_rows)
        hf = make_grad_hit_fn(s, dcfg.t_min) if winner else None
        return render_rows_wavefront_scan(s, dcfg, rows, cols, pids,
                                          jnp.uint32(0), s0, n_spp, n_iters,
                                          hit_fn=hf, remat=remat)
    _, vjp = jax.vjp(fn, s)
    return vjp(g)[0]


def block(n_rows=90, n_spp=50):
    """Profile one (n_rows x n_spp) block end to end."""
    r0 = jnp.int32(0)
    s0 = jnp.int32(0)
    t_probe, (acc, it) = timed(probe, scene, r0, s0, n_rows, n_spp)
    it = int(it)
    n_iters = min(n_spp * DEPTH + 1, -(-(it * 13 // 10 + 128) // 256) * 256)
    print(f"probe: {t_probe*1e3:.1f} ms  iters={it} -> n_iters={n_iters}")
    t_f, _ = timed(fwd_scan, scene, r0, s0, n_rows, n_spp, n_iters)
    print(f"fwd scan (remat):    {t_f*1e3:.1f} ms "
          f"({t_f/n_iters*1e6:.0f} us/iter)")
    t_fnr, _ = timed(fwd_scan, scene, r0, s0, n_rows, n_spp, n_iters,
                     remat=False)
    print(f"fwd scan (no remat): {t_fnr*1e3:.1f} ms")
    g = jnp.ones((n_rows * W, 3), jnp.float32) / (W * H * SPP)
    t_fb, _ = timed(fwdbwd_scan, scene, r0, s0, g, n_rows, n_spp, n_iters)
    print(f"fwd+bwd (remat):     {t_fb*1e3:.1f} ms "
          f"({t_fb/n_iters*1e6:.0f} us/iter, {t_fb/t_f:.2f}x fwd)")
    t_fbn, _ = timed(fwdbwd_scan, scene, r0, s0, g, n_rows, n_spp, n_iters,
                     remat=False)
    print(f"fwd+bwd (no remat):  {t_fbn*1e3:.1f} ms")
    rays = n_rows * W
    print(f"fwd+bwd ray-bounces/s: {rays*n_iters/t_fb:.3e}")
    total = t_fb * (H // n_rows) * (SPP // n_spp)
    print(f"extrapolated full image fwd+bwd: {total:.1f} s")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    block()
