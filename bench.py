"""Headline benchmark (driver-run on real TPU hardware).

Scene + config = the reference's only published numbers (README.md:24-46):
README 5-sphere scene, 1280x720, 250 spp, max depth 50.  Baseline:
0.38 s on the author's GPU => 6.06e8 camera samples/s (BASELINE.md).

Output contract (driver-proof, learned from round 3's rc:124/parsed:null):
the headline JSON line is printed IMMEDIATELY after the forward timing, so
a hang in any later stage cannot zero out the round's evidence.  Extras
(reference default F1+HDR scene, fwd+bwd) each run under a SIGALRM budget
and a global deadline; when they finish, the merged headline line is
printed AGAIN (same "metric"/"value", richer "extra") — a driver taking
either the first or the last JSON line parses the same headline number.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

BASELINE_SAMPLES_PER_S = 1280 * 720 * 250 / 0.38  # ~6.06e8 (README.md:42-46)

# wall-clock budgets (seconds); remote cold compiles can take 1-18 min, so
# extras are bounded individually and by a global deadline.
SECTION_BUDGET_S = int(os.environ.get("BENCH_SECTION_BUDGET_S", "600"))
GLOBAL_BUDGET_S = int(os.environ.get("BENCH_GLOBAL_BUDGET_S", "1800"))
_T_START = time.monotonic()


class _SectionTimeout(Exception):
    pass


def _alarm_handler(signum, frame):
    raise _SectionTimeout()


def _budgeted(name, fn, budget_s=SECTION_BUDGET_S):
    """Run fn() under a SIGALRM budget + the global deadline; on timeout or
    error, log and return None instead of killing the bench."""
    remaining = GLOBAL_BUDGET_S - (time.monotonic() - _T_START)
    budget = int(min(budget_s, remaining))
    if budget <= 5:
        print(f"# skipping {name}: global budget exhausted", file=sys.stderr)
        return None
    old = signal.signal(signal.SIGALRM, _alarm_handler)
    signal.alarm(budget)
    try:
        return fn()
    except _SectionTimeout:
        print(f"# {name} timed out after {budget} s", file=sys.stderr)
        return None
    except Exception as e:
        print(f"# {name} failed: {e}", file=sys.stderr)
        return None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _emit(samples_per_s, extra):
    print(json.dumps({
        "metric": "camera_samples_per_s_fwd_1280x720x250spp_d50",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / BASELINE_SAMPLES_PER_S, 4),
        "extra": extra,
    }), flush=True)


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__),
                                       ".jax_cache"))
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import opencl_ray_tracer_tpu as ort

    width, height, spp, depth = 1280, 720, 250, 50
    scene = ort.readme_scene(aspect_ratio=width / height)
    cfg = ort.RenderConfig(width=width, height=height, spp=spp,
                           max_depth=depth)

    def run(seed):
        # the axon tunnel occasionally drops a request; retry once
        for attempt in range(2):
            try:
                img = ort.render(scene, cfg, seed=seed)
                jax.block_until_ready(img)
                return img
            except Exception as e:  # jax.errors.JaxRuntimeError etc.
                if attempt == 1:
                    raise
                print(f"# retrying after device error: {e}",
                      file=sys.stderr)
                time.sleep(5)

    t_compile = time.perf_counter()
    img = run(0)
    t_first = time.perf_counter() - t_compile
    print(f"# first call (compile + run): {t_first:.2f} s", file=sys.stderr)

    # timed runs (different seed to defeat any result caching); min of 3
    # — the tunnel adds ~±5% run-to-run jitter
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        img = run(i + 1)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # Sanity checks on-device: fetching the full image through the sandbox
    # tunnel runs at ~32 KB/s, so only scalars come back.
    import jax.numpy as jnp
    mean = float(jnp.mean(img))
    has_nan = bool(jnp.isnan(img).any())
    assert not has_nan, "NaNs in benchmark render"
    assert mean > 0.05, "suspiciously dark benchmark render"

    samples_per_s = width * height * spp / dt
    print(f"# render: {dt:.3f} s  mean {mean:.4f}", file=sys.stderr)

    # ---- headline, printed NOW so a later hang can't erase it ----
    extra = {"fwd_seconds": round(dt, 3),
             "fwd_first_call_seconds": round(t_first, 2)}
    _emit(samples_per_s, dict(extra))

    # ---- the reference's DEFAULT scene (main.cpp:80-152): F1 car mesh +
    # 8 spheres + HDR skybox at the reference build config ----
    def f1_section():
        # reference default scene one-shot (F1 car -> torus fallback + HDR)
        f1 = ort.flagship_scene()
        f1_cfg = ort.RenderConfig()   # 1280x720x5spp/d32 defaults
        img1 = ort.render(f1, f1_cfg, seed=21)
        jax.block_until_ready(img1)
        t0 = time.perf_counter()
        img1 = ort.render(f1, f1_cfg, seed=22)
        jax.block_until_ready(img1)
        dt1 = time.perf_counter() - t0
        assert not bool(jnp.isnan(img1).any())
        print(f"# reference default scene (F1+HDR, 5spp/d32): "
              f"{dt1:.3f} s", file=sys.stderr)
        return {
            "reference_scene_seconds": round(dt1, 3),
            "reference_scene_samples_per_s": round(
                f1_cfg.width * f1_cfg.height * f1_cfg.spp / dt1, 1),
        }

    r = _budgeted("reference-scene measurement", f1_section)
    if r:
        extra.update(r)

    # ---- forward+backward (BASELINE.json metric) ----
    def fwdbwd_section():
        from opencl_ray_tracer_tpu.tracer.render import render_grad_sampled

        loss_fn = lambda im: jnp.mean(im ** 2)

        def run_grad(seed):
            loss, img_g, grads = render_grad_sampled(
                scene, cfg, loss_fn, seed=seed, spp_chunk=50)
            jax.block_until_ready(grads)
            return grads

        t0 = time.perf_counter()
        grads = run_grad(11)
        t_grad_first = time.perf_counter() - t0
        print(f"# fwd+bwd first (compile + run): {t_grad_first:.2f} s",
              file=sys.stderr)
        t0 = time.perf_counter()
        grads = run_grad(12)
        dt_grad = time.perf_counter() - t0
        gmax = float(jnp.max(jnp.abs(grads.spheres.center)))
        assert gmax > 0, "zero gradients in fwd+bwd benchmark"
        fb = width * height * spp / dt_grad
        print(f"# fwd+bwd: {dt_grad:.3f} s  grad max {gmax:.2e}",
              file=sys.stderr)
        return {
            "fwd_bwd_samples_per_s": round(fb, 1),
            "fwd_bwd_seconds": round(dt_grad, 3),
            "fwd_bwd_vs_gpu_fwd_baseline": round(
                fb / BASELINE_SAMPLES_PER_S, 4),
        }

    r = _budgeted("fwd+bwd measurement", fwdbwd_section)
    if r:
        extra.update(r)

    # ---- flagship fwd+bwd: the reference DEFAULT scene (F1 + HDR sky)
    # differentiated at kernel rate, incl. triangle-vertex cotangents —
    # a capability the reference lacks entirely ----
    def flagship_grad_section():
        from opencl_ray_tracer_tpu.tracer.render import render_grad_sampled

        f1 = ort.flagship_scene()
        f1_cfg = ort.RenderConfig()   # 1280x720x5spp/d32 defaults
        loss_fn = lambda im: jnp.mean(im ** 2)

        def run_g(seed):
            _, _, grads = render_grad_sampled(f1, f1_cfg, loss_fn,
                                              seed=seed,
                                              grad_backend="pallas")
            jax.block_until_ready(grads)
            return grads

        t0 = time.perf_counter()
        grads = run_g(31)
        print(f"# flagship fwd+bwd first (compile + run): "
              f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
        t0 = time.perf_counter()
        grads = run_g(32)
        dt_g = time.perf_counter() - t0
        # under the HDR sky the nearest-texel lookup has zero
        # direction-derivative, so interior GEOMETRY gradients are
        # exactly zero (matching the jnp VJP); albedo carries the signal
        gmax = float(jnp.max(jnp.abs(grads.spheres.albedo)))
        assert gmax > 0, "zero gradients in flagship fwd+bwd"
        print(f"# flagship fwd+bwd (F1+HDR 5spp/d32): {dt_g:.3f} s",
              file=sys.stderr)
        return {"flagship_fwd_bwd_seconds": round(dt_g, 3)}

    r = _budgeted("flagship fwd+bwd measurement", flagship_grad_section)
    if r:
        extra.update(r)

    # ---- book-cover (100-sphere RTiOW) scene at the headline config ----
    def book_cover_section():
        bc = ort.book_cover_scene(aspect_ratio=width / height)
        img2 = ort.render(bc, cfg, seed=41)
        jax.block_until_ready(img2)
        t0 = time.perf_counter()
        img2 = ort.render(bc, cfg, seed=42)
        jax.block_until_ready(img2)
        dt2 = time.perf_counter() - t0
        assert not bool(jnp.isnan(img2).any())
        print(f"# book-cover 100 spheres (250spp/d50): {dt2:.3f} s",
              file=sys.stderr)
        return {"book_cover_seconds": round(dt2, 3)}

    r = _budgeted("book-cover measurement", book_cover_section)
    if r:
        extra.update(r)

    # ---- book-cover fwd+bwd (100-sphere scene gradients at the headline
    # config through the laddered backward megakernel) ----
    def book_cover_grad_section():
        from opencl_ray_tracer_tpu.tracer.render import render_grad_sampled

        bc = ort.book_cover_scene(aspect_ratio=width / height)
        loss_fn = lambda im: jnp.mean(im ** 2)

        def run_g(seed):
            _, _, grads = render_grad_sampled(bc, cfg, loss_fn, seed=seed,
                                              grad_backend="pallas")
            jax.block_until_ready(grads)
            return grads

        grads = run_g(51)
        t0 = time.perf_counter()
        grads = run_g(52)
        dt_g = time.perf_counter() - t0
        gmax = float(jnp.max(jnp.abs(grads.spheres.albedo)))
        assert gmax > 0, "zero gradients in book-cover fwd+bwd"
        print(f"# book-cover fwd+bwd (100 spheres, 250spp/d50): "
              f"{dt_g:.3f} s", file=sys.stderr)
        return {"book_cover_fwd_bwd_seconds": round(dt_g, 3)}

    r = _budgeted("book-cover fwd+bwd measurement", book_cover_grad_section)
    if r:
        extra.update(r)

    # re-emit the same headline with the full extras (drivers taking the
    # last JSON line get this one; the value is identical either way)
    _emit(samples_per_s, extra)
    return 0


if __name__ == "__main__":
    sys.exit(main())
