"""Path-tracing estimator: bounce loop + per-pixel sample loop.

TPU-native re-expression of the reference's hottest code:

- ``RayColour`` (``gpu_kernel.cl:266-348``): the iterative bounce loop
  becomes a ``lax.scan`` over a fixed depth with an alive mask
  (differentiable, unrollable by XLA), or a ``lax.while_loop`` with batch
  early-exit for forward-only rendering.
- ``pixel_colour`` (``gpu_kernel.cl:595-648``): the per-pixel sample loop
  becomes a scan over samples, reproducing the estimator quirks that change
  the image: per-sample clamp to [0,1] *before* averaging
  (``gpu_kernel.cl:632-638``) and the NaN policy (a NaN channel is replaced
  by the running-sum channel value, ``:640-642``).

Semantics notes (verified against the C):
- A ray that scatters at bounce max_depth-1 leaves the loop with
  currentDepth == maxDepth and returns black (``gpu_kernel.cl:337-340``):
  accumulated throughput is *discarded*, not emitted.
- A miss at any bounce < max_depth samples the sky with the accumulated
  throughput (``:342-347``).  The sky evaluation (equirect atan2/asin +
  gather) is deferred to a single post-loop pass here — it leaves the hot
  scan and runs once per ray instead of once per bounce.
- Metal absorb (scattered . normal <= 0) returns black (``:309``).
- Emissive returns throughput * albedo (``:326-329``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..rng import BOUNCE_BASE, uniform4
from ..scene import Scene, sky_colour
from .intersect import closest_hit
from .scatter import scatter

# Ray status codes.
ALIVE = 0
DONE_BLACK = 1   # absorbed / emissive handled via result
DONE_MISS = 2    # sky applied post-loop


class TraceState(NamedTuple):
    o: jnp.ndarray           # (R,3)
    d: jnp.ndarray           # (R,3)
    throughput: jnp.ndarray  # (R,3)
    result: jnp.ndarray      # (R,3)
    miss_dir: jnp.ndarray    # (R,3)
    status: jnp.ndarray      # (R,) i32
    depth: jnp.ndarray       # () i32


def _bounce_step(scene: Scene, t_min, pixel_ids, sample_id, seed,
                 state: TraceState, first_bounce=0,
                 hit_fn=None) -> TraceState:
    o, d, throughput, result, miss_dir, status, depth = state
    alive = status == ALIVE

    # hit_fn hook: parallel/ring.py substitutes a ppermute geometry-ring
    # closest-hit here (triangles sharded across chips) without touching the
    # estimator.
    h = hit_fn(o, d) if hit_fn is not None else closest_hit(scene, o, d,
                                                            t_min)

    # 8 uniforms for this bounce from two pcg4d hashes (slot layout in rng/).
    slot = BOUNCE_BASE + (depth + first_bounce) * 2
    a0, a1, a2, a3 = uniform4(seed, pixel_ids, sample_id, slot)
    b0, b1, b2, b3 = uniform4(seed, pixel_ids, sample_id, slot + 1)
    u = jnp.stack([a0, a1, a2, a3, b0, b1, b2, b3], axis=-1)

    sc = scatter(d, h.normal, h.front_face, h.albedo, h.fuzz, h.ior,
                 h.mat_type, u)

    # Transitions for currently-alive rays:
    miss_now = alive & ~h.hit
    emit_now = alive & h.hit & sc.emitted
    absorb_now = alive & h.hit & sc.absorbed & ~sc.emitted
    continue_now = alive & h.hit & ~sc.emitted & ~sc.absorbed

    new_o = jnp.where(continue_now[:, None], h.point, o)
    new_d = jnp.where(continue_now[:, None], sc.direction, d)
    new_throughput = jnp.where(continue_now[:, None],
                               throughput * sc.attenuation, throughput)
    # Emissive: result = throughput * albedo (gpu_kernel.cl:326-329).
    new_result = jnp.where(emit_now[:, None], throughput * h.albedo, result)
    new_miss_dir = jnp.where(miss_now[:, None], d, miss_dir)
    new_status = jnp.where(miss_now, DONE_MISS,
                           jnp.where(emit_now | absorb_now, DONE_BLACK,
                                     status))
    return TraceState(new_o, new_d, new_throughput, new_result, new_miss_dir,
                      new_status, depth + 1)


def trace(scene: Scene, o, d, pixel_ids, sample_id, seed, max_depth,
          t_min=1e-3, early_stop=False, first_bounce=0, throughput=None,
          hit_fn=None, remat=False):
    """Trace a ray batch to completion; returns per-ray radiance (R,3).

    early_stop=True uses lax.while_loop with an any-alive condition (forward
    only); False uses a fixed-depth lax.scan (reverse-differentiable).
    first_bounce offsets the RNG slot numbering (used by the soft renderer,
    which consumes bounce-0 draws itself); throughput optionally seeds the
    path throughput (default ones).  remat=True checkpoints each bounce
    step (reverse pass stores only the (R,16)-float carry per bounce and
    recomputes intermediates — the recompute-vs-store trade of SURVEY.md §7
    hard part (e)).
    """
    r = o.shape[0]
    state = TraceState(
        o=o, d=d,
        throughput=(jnp.ones((r, 3), jnp.float32) if throughput is None
                    else throughput),
        result=jnp.zeros((r, 3), jnp.float32),
        # Nonzero init: sky_colour normalizes miss_dir, and a zero vector in
        # the unselected jnp.where branch would put NaN into gradients.
        miss_dir=jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (r, 3)),
        status=jnp.zeros((r,), jnp.int32),
        depth=jnp.int32(0))

    step = lambda s: _bounce_step(scene, t_min, pixel_ids, sample_id, seed,
                                  s, first_bounce, hit_fn)
    if remat:
        step = jax.checkpoint(step)

    if early_stop:
        state = jax.lax.while_loop(
            lambda s: (s.depth < max_depth) & jnp.any(s.status == ALIVE),
            step, state)
    else:
        state = jax.lax.scan(lambda s, _: (step(s), None), state, None,
                             length=max_depth)[0]

    # Depth exhaustion -> black (gpu_kernel.cl:337-340): rays still ALIVE
    # keep result 0.  Misses get throughput * sky in one deferred pass.
    sky = sky_colour(scene.sky, state.miss_dir)
    is_miss = (state.status == DONE_MISS)[:, None]
    return jnp.where(is_miss, state.result + state.throughput * sky,
                     state.result)


def accumulate_sample(acc, colour, nan_policy: str, clamp: bool):
    """One sample's contribution with the reference estimator quirks.

    acc: (R,3) running SUM; colour: (R,3) this sample's radiance.
    Clamp-before-average: gpu_kernel.cl:632-638 (NaN passes through the
    clamp unchanged, as in the C code where NaN comparisons are false).
    NaN policy "running_sum": NaN channel -> running-sum channel value
    (gpu_kernel.cl:640-642); "zero": NaN -> 0 (order-invariant).
    """
    c = colour
    if clamp:
        c = jnp.clip(c, 0.0, 1.0)  # NaN propagates, like the C compares
    if nan_policy == "running_sum":
        c = jnp.where(jnp.isnan(c), acc, c)
    elif nan_policy == "zero":
        c = jnp.where(jnp.isnan(c), 0.0, c)
    else:
        raise ValueError(f"unknown nan_policy: {nan_policy}")
    return acc + c
