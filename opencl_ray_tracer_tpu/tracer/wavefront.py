"""Wavefront estimator with path regeneration (jnp path).

The scan-form estimator (render.py) runs samples sequentially and pays, for
every sample, the bounce loop until the LAST ray in the batch terminates —
heavy-tailed path lengths make that expensive.  This module is the jnp
counterpart of the megakernel's wavefront loop (kernels/megakernel.py): one
``lax.while_loop`` advances every ray one bounce per iteration, and the
moment a ray's path terminates it is reloaded with that pixel's next camera
sample.  The counter RNG (keyed on global pixel id, sample id, bounce slot)
makes regeneration draw exactly the samples a sequential run would, and per
pixel the samples complete in order, so the clamp-before-average and NaN
running-sum quirks (gpu_kernel.cl:632-642) are preserved exactly — the
output matches the scan path to fp identity.

The while_loop form is forward-only, but the loop BODY is pure
where-select arithmetic — so the same body under a fixed-length
``lax.scan`` (``render_rows_wavefront_scan``) is reverse-differentiable.
A cheap non-differentiable forward probe measures the true iteration count
(~spp x E[path length] + tail), and the differentiable scan runs exactly
that many steps instead of the sample-scan's spp x max_depth — a ~15x cut
in backward bounce-work at depth 50 (render.render_grad_sampled).

render.py uses the while form when cfg.early_stop is set (the forward
default) and the sample-scan path otherwise.  Works with any hit_fn
(direct, MXU matmul, fused Pallas).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..rng import BOUNCE_BASE, SLOT_PIXEL_U, uniform4
from ..scene import Scene, make_rays, sky_colour
from .intersect import closest_hit
from .scatter import scatter


class WaveState(NamedTuple):
    o: jnp.ndarray           # (R,3)
    d: jnp.ndarray           # (R,3)
    throughput: jnp.ndarray  # (R,3)
    acc: jnp.ndarray         # (R,3) running sum of finished samples
    sample: jnp.ndarray      # (R,) i32 current sample id
    depth: jnp.ndarray       # (R,) i32 bounce depth within current sample


def _wave_setup(scene: Scene, cfg, rows, cols, pixel_ids, seed,
                sample_offset, n_samples, hit_fn, acc0):
    """Shared initial state + one-iteration body for the while and scan
    forms."""
    r = pixel_ids.shape[0]
    width = jnp.float32(cfg.width)
    height = jnp.float32(cfg.height)
    sample_end = jnp.int32(sample_offset + n_samples)

    def camera_ray(sample_id):
        u0, u1, u2, u3 = uniform4(seed, pixel_ids, sample_id, SLOT_PIXEL_U)
        uu = (cols.astype(jnp.float32) + u0) / width
        vv = (rows.astype(jnp.float32) + u1) / height
        return make_rays(scene.camera, uu, vv, u2, u3)

    o0, d0 = camera_ray(jnp.full((r,), sample_offset, jnp.int32))
    state = WaveState(
        o=o0, d=d0,
        throughput=jnp.ones((r, 3), jnp.float32),
        acc=(jnp.zeros((r, 3), jnp.float32) if acc0 is None
             else jnp.asarray(acc0, jnp.float32).reshape(-1, 3)),
        sample=jnp.full((r,), sample_offset, jnp.int32),
        depth=jnp.zeros((r,), jnp.int32))

    def body(st: WaveState) -> WaveState:
        active = st.sample < sample_end
        h = hit_fn(st.o, st.d) if hit_fn is not None else \
            closest_hit(scene, st.o, st.d, cfg.t_min)

        slot = BOUNCE_BASE + st.depth * 2
        a0, a1, a2, a3 = uniform4(seed, pixel_ids, st.sample, slot)
        b0, b1, b2, b3 = uniform4(seed, pixel_ids, st.sample, slot + 1)
        u = jnp.stack([a0, a1, a2, a3, b0, b1, b2, b3], axis=-1)
        sc = scatter(st.d, h.normal, h.front_face, h.albedo, h.fuzz, h.ior,
                     h.mat_type, u)

        miss_now = active & ~h.hit
        emit_now = active & h.hit & sc.emitted
        would_cont = active & h.hit & ~sc.emitted & ~sc.absorbed
        # scatter at depth max_depth-1 -> depth == max_depth -> black
        # (gpu_kernel.cl:337-340)
        exhaust_now = would_cont & (st.depth + 1 >= cfg.max_depth)
        cont = would_cont & ~exhaust_now
        term = active & ~cont

        sky = sky_colour(scene.sky, st.d)
        c_smp = jnp.where(miss_now[:, None], st.throughput * sky,
                          jnp.where(emit_now[:, None],
                                    st.throughput * h.albedo, 0.0))
        # clamp-before-average + NaN policy (gpu_kernel.cl:632-642)
        if cfg.clamp_samples:
            c_smp = jnp.clip(c_smp, 0.0, 1.0)
        if cfg.nan_policy == "running_sum":
            c_smp = jnp.where(jnp.isnan(c_smp), st.acc, c_smp)
        else:
            c_smp = jnp.where(jnp.isnan(c_smp), 0.0, c_smp)
        acc = st.acc + jnp.where(term[:, None], c_smp, 0.0)

        new_sample = jnp.where(term, st.sample + 1, st.sample)
        regen = term & (new_sample < sample_end)
        co, cd = camera_ray(new_sample)
        rn = regen[:, None]
        cn = cont[:, None]
        return WaveState(
            o=jnp.where(rn, co, jnp.where(cn, h.point, st.o)),
            d=jnp.where(rn, cd, jnp.where(cn, sc.direction, st.d)),
            throughput=jnp.where(
                rn, 1.0, jnp.where(cn, st.throughput * sc.attenuation,
                                   st.throughput)),
            acc=acc,
            sample=new_sample,
            depth=jnp.where(regen, 0,
                            jnp.where(cont, st.depth + 1, st.depth)))

    return state, body, sample_end


def render_rows_wavefront(scene: Scene, cfg, rows, cols, pixel_ids, seed,
                          sample_offset, n_samples, hit_fn=None, acc0=None,
                          return_iters=False):
    """Radiance sum over n_samples per pixel (R,3); divide by n_samples for
    the mean.  rows/cols/pixel_ids: (R,) i32.  acc0 optionally seeds the
    running sum (see render.render_rows).  return_iters additionally
    returns the number of loop iterations taken (the probe for the
    differentiable scan form)."""
    state, body, sample_end = _wave_setup(
        scene, cfg, rows, cols, pixel_ids, seed, sample_offset, n_samples,
        hit_fn, acc0)
    max_iters = n_samples * cfg.max_depth + 1

    def cond(c):
        it, st = c
        return (it < max_iters) & jnp.any(st.sample < sample_end)

    it, state = jax.lax.while_loop(
        cond, lambda c: (c[0] + 1, body(c[1])), (jnp.int32(0), state))
    if return_iters:
        return state.acc, it
    return state.acc


def render_rows_wavefront_scan(scene: Scene, cfg, rows, cols, pixel_ids,
                               seed, sample_offset, n_samples, n_iters,
                               hit_fn=None, acc0=None, remat=True,
                               return_done=False):
    """Reverse-differentiable wavefront: the same regeneration body under a
    fixed-length lax.scan.  n_iters (static) must be >= the iteration count
    the while form would take (probe with return_iters; round up to bound
    recompiles) — extra iterations are no-ops (all lanes exhausted).
    Identical output to render_rows_wavefront.  return_done additionally
    returns a bool scalar: every lane finished all its samples (callers
    reusing a cached n_iters check this and re-run larger if False)."""
    state, body, sample_end = _wave_setup(
        scene, cfg, rows, cols, pixel_ids, seed, sample_offset, n_samples,
        hit_fn, acc0)
    step = lambda st, _: (body(st), None)
    if remat:
        step = jax.checkpoint(step)
    state, _ = jax.lax.scan(step, state, None, length=n_iters)
    if return_done:
        return state.acc, jnp.all(state.sample >= sample_end)
    return state.acc
