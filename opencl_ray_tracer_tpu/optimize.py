"""Inverse rendering: recover scene parameters from a target image.

This is a capability the reference renderer cannot express at all (its
estimator lives in an OpenCL C kernel): because the whole tracer is
differentiable jnp, scene parameters (sphere centers/radii/albedo/fuzz,
camera pose) can be fitted to a target image by gradient descent on pixel
loss (BASELINE.json config 5).  Multi-chip gradient reduction is handled in
``parallel/`` (psum over the mesh); this module is the single-logical-device
optimizer loop.

Gradient regimes:
- Material parameters (albedo/fuzz/ior/emission) and shading-dominated
  camera params are smooth: hard-visibility gradients (the default
  renderer) descend correctly.
- Geometry parameters (sphere centers/radii) are dominated by *silhouette*
  terms that hard visibility's interior-only gradients miss (they can even
  carry the wrong net sign).  Fit geometry with ``soft=True``, which
  renders with soft visibility (differentiable alpha compositing; see
  tracer/soft.py) — slightly blurred forward, correct geometry gradients.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .scene import Scene
from .tracer.render import render_rows


def _get_path(scene: Scene, path: str):
    obj = scene
    for part in path.split("."):
        obj = getattr(obj, part)
    return obj


def _set_path(scene: Scene, path: str, value):
    parts = path.split(".")

    def rec(obj, parts):
        if len(parts) == 1:
            return dataclasses.replace(obj, **{parts[0]: value})
        child = getattr(obj, parts[0])
        return dataclasses.replace(obj, **{parts[0]: rec(child, parts[1:])})

    return rec(scene, parts)


def extract_params(scene: Scene, paths: Sequence[str]) -> dict:
    return {p: _get_path(scene, p) for p in paths}


def insert_params(scene: Scene, params: dict) -> Scene:
    for p, v in params.items():
        scene = _set_path(scene, p, v)
    return scene


def fit_scene(
    target,
    init_scene: Scene,
    cfg: RenderConfig,
    param_paths: Sequence[str] = ("spheres.center", "spheres.albedo"),
    steps: int = 100,
    learning_rate: float = 1e-2,
    loss_fn: Callable | None = None,
    seed: int = 0,
    sample_new_noise: bool = True,
    callback: Callable | None = None,
    soft: bool = False,
    beta: float = 80.0,
    param_mask: dict | None = None,
    grad_backend: str = "auto",
    pallas_interpret: bool = False,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 10,
):
    """Gradient-descent fit of the listed scene parameters to ``target``.

    target: (H,W,3) radiance image (same config as cfg).
    sample_new_noise: re-randomize the Monte Carlo seed each step (SGD over
      the estimator noise); False = deterministic objective.
    grad_backend: "pallas" runs each step through the forward + backward
      megakernels (kernels/megakernel.py + megagrad.py — kernel-rate
      fwd+bwd, hard-visibility interior gradients, so geometry fits should
      still use soft=True); "jnp" is the differentiable scan; "auto" =
      pallas when the scene is in kernel scope, on TPU, and soft is off.
      The kernels are compiled with value-independent specialization
      (specialize_flags conservative mode) so one compilation serves every
      optimizer step.
    checkpoint_path: optimizer-state checkpoint/resume (atomic npz of
      params + optax state + loss history, every ``checkpoint_every``
      steps and at the end); an interrupted fit restarted with the same
      arguments continues from the last saved step and — with
      ``sample_new_noise`` seeds being step-indexed — reproduces the
      uninterrupted run exactly.
    Returns (fitted_scene, losses list).
    """
    import optax  # deferred: optax creates arrays at import time, which
    # would pin the backend before callers can select one

    dcfg = cfg.replace(early_stop=False)
    target = jnp.asarray(target, jnp.float32)
    if loss_fn is None:
        loss_fn = lambda img: jnp.mean((img - target) ** 2)

    use_pallas = False
    fit_kind = "sphere"
    if grad_backend in ("auto", "pallas") and not soft:
        from .kernels.megagrad import (supports_grad, supports_grad_hdr,
                                       supports_grad_mesh)
        from .scene.sky import KIND_HDR
        # triangle VERTEX gradients are real in the mesh/HDR grad kernels
        # (plane-cotangent accumulation; megagrad._tri_vertex_cots), so
        # fitting triangles.p0/p1/p2 is in scope, and so is the HDR
        # sky IMAGE (per-texel cotangents from the emit pass since round
        # 5).  Triangle MATERIAL fields are still held fixed — those
        # parameters keep the jnp path.  Note: the clamp-no-op condition
        # (supports_mesh: sky < 1) is checked on init_scene; a sky.image
        # fit that drives texels past 1 leaves kernel scope.
        fits_tri_mat = any(
            p.startswith("triangles.")
            and not p.startswith(("triangles.p0", "triangles.p1",
                                  "triangles.p2"))
            for p in param_paths)
        fits_sky = any(p.startswith("sky.")
                       and p != "sky.image" for p in param_paths)
        if init_scene.sky.kind == KIND_HDR:
            in_scope = (supports_grad_hdr(init_scene, dcfg)
                        and not fits_tri_mat and not fits_sky)
            fit_kind = "hdr"
        elif init_scene.triangles.count > 0:
            in_scope = (supports_grad_mesh(init_scene, dcfg)
                        and not fits_tri_mat)
            fit_kind = "mesh"
        else:
            in_scope = supports_grad(init_scene, dcfg)
        if grad_backend == "pallas":
            assert in_scope, "fit_scene: scene outside pallas grad scope"
            use_pallas = True
        else:
            use_pallas = in_scope and jax.default_backend() == "tpu"

    params = extract_params(init_scene, param_paths)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    if use_pallas:
        interp = pallas_interpret or jax.default_backend() != "tpu"
        # the kernel's NaN policy for sample contributions is the
        # order-invariant "zero" (as render_grad_sampled's chunks)
        gcfg = dcfg.replace(nan_policy="zero")
        fused = None
        if fit_kind in ("mesh", "hdr"):
            from .kernels.megagrad import (_grad_hdr_fused_jit,
                                           _grad_scene_mesh_jit)
            from .kernels.megamesh import (MESH_CHUNK,
                                           render_pallas_mesh_inner,
                                           specialize_mesh_flags)
            from .tracer.clusters import plan_for_scene
            plan = plan_for_scene(init_scene, MESH_CHUNK)
            mflags = specialize_mesh_flags(init_scene, conservative=True)

            if fit_kind == "hdr":
                # fused pipeline: phase-A emit reconstructs the forward
                # image, so each optimizer step pays ONE path trace less
                # than a separate fwd render + emit/consume backward
                def fused(scene, step_seed):
                    return _grad_hdr_fused_jit(
                        scene, gcfg, loss_fn, step_seed,
                        mflags[:5], mflags[5], plan, interp)

            def fwd(scene, step_seed):
                return render_pallas_mesh_inner(
                    scene, gcfg, step_seed, interp, mflags, plan,
                    gcfg.height, 0)

            def bwd(scene, g_img, step_seed):
                return _grad_scene_mesh_jit(scene, gcfg, g_img, step_seed,
                                            mflags[:5], mflags[5], plan,
                                            interp)
        else:
            from .kernels.megagrad import _grad_scene_jit
            from .kernels.megakernel import (render_pallas_inner,
                                             specialize_flags)
            flags = specialize_flags(init_scene, conservative=True)

            def fwd(scene, step_seed):
                return render_pallas_inner(scene, gcfg, step_seed, interp,
                                           flags, gcfg.height, 0)

            def bwd(scene, g_img, step_seed):
                return _grad_scene_jit(scene, gcfg, g_img, step_seed,
                                       flags, interp)

        @jax.jit
        def step_fn(params, opt_state, step_seed):
            scene = insert_params(init_scene, params)
            if fused is not None:
                loss, _img, s_bar = fused(scene, step_seed)
            else:
                img = fwd(scene, step_seed)
                loss, g_img = jax.value_and_grad(loss_fn)(img)
                s_bar = bwd(scene, g_img, step_seed)
            grads = {p: _get_path(s_bar, p) for p in param_paths}
            if param_mask is not None:
                grads = {k: g * jnp.asarray(param_mask[k], g.dtype)
                         if k in param_mask else g
                         for k, g in grads.items()}
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
    else:
        @jax.jit
        def step_fn(params, opt_state, step_seed):
            def objective(p):
                scene = insert_params(init_scene, p)
                if soft:
                    from .tracer.soft import render_soft
                    img = render_soft(scene, dcfg, step_seed, beta=beta)
                else:
                    img = render_rows(scene, dcfg, jnp.int32(0),
                                      dcfg.height, step_seed)
                return loss_fn(img)

            loss, grads = jax.value_and_grad(objective)(params)
            if param_mask is not None:
                grads = {k: g * jnp.asarray(param_mask[k], g.dtype)
                         if k in param_mask else g
                         for k, g in grads.items()}
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

    losses = []
    start = 0
    if checkpoint_path is not None:
        st = _load_fit_state(checkpoint_path, params, opt_state)
        if st is not None:
            params, opt_state, losses, start = st
    for i in range(start, steps):
        step_seed = jnp.uint32(seed + i + 1 if sample_new_noise else seed)
        params, opt_state, loss = step_fn(params, opt_state, step_seed)
        losses.append(float(loss))
        if callback is not None:
            callback(i, losses[-1], insert_params(init_scene, params))
        if (checkpoint_path is not None
                and ((i + 1) % checkpoint_every == 0 or i + 1 == steps)):
            _save_fit_state(checkpoint_path, params, opt_state, losses,
                            i + 1)
    return insert_params(init_scene, params), losses


def _save_fit_state(path, params, opt_state, losses, step):
    """Atomic optimizer-state checkpoint (same temp+rename discipline as
    parallel/checkpoint.py — a crash mid-write must not corrupt it)."""
    import os
    import tempfile

    import numpy as np

    flat, _ = jax.tree.flatten((params, opt_state))
    tmp_fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                                   suffix=".tmp.npz")
    os.close(tmp_fd)
    np.savez(tmp, step=np.int64(step),
             losses=np.asarray(losses, np.float64),
             **{f"leaf_{j}": np.asarray(x) for j, x in enumerate(flat)})
    os.replace(tmp, path)


def _load_fit_state(path, params, opt_state):
    """Resume state saved by _save_fit_state; None when absent.  The leaf
    layout must match the current (params, opt_state) treedef — the
    checkpoint stores leaves positionally."""
    import os

    import numpy as np

    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        step = int(z["step"])
        losses = [float(v) for v in z["losses"]]
        flat, treedef = jax.tree.flatten((params, opt_state))
        assert len(flat) == sum(1 for k in z.files
                                if k.startswith("leaf_")), \
            "fit checkpoint does not match the optimizer/param structure"
        leaves = [jnp.asarray(z[f"leaf_{j}"]) for j in range(len(flat))]
    params, opt_state = jax.tree.unflatten(treedef, leaves)
    return params, opt_state, losses, step
