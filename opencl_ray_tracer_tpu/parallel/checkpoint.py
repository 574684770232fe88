"""Sample-accumulation checkpoint / resume.

The reference has no checkpointing: its full-frame BMP rewrite after every
block (``main.cpp:263-265``) is only a progress snapshot — a crash recomputes
everything (SURVEY.md §5).  Here the checkpoint is the *estimator state
itself*: the per-pixel radiance running sum and the number of samples folded
in.  Resume continues sampling at the next global sample id (the counter RNG
makes resumed streams identical to an uninterrupted run), so a preempted job
loses at most one sample chunk.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from ..config import RenderConfig
from ..scene import Scene
from ..tracer.render import _render_rows_jit


def save_state(path: str, acc, n_samples: int, seed: int) -> None:
    """Atomic npz write of the accumulation state."""
    # suffix must be ".npz" — np.savez appends it to other names, which
    # would leave the real tmp file empty.
    tmp_fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                                   suffix=".tmp.npz")
    os.close(tmp_fd)
    np.savez(tmp, acc=np.asarray(acc), n_samples=np.int64(n_samples),
             seed=np.uint32(seed))
    os.replace(tmp, path)


def load_state(path: str):
    with np.load(path) as z:
        return z["acc"], int(z["n_samples"]), int(z["seed"])


def render_checkpointed(scene: Scene, cfg: RenderConfig, path: str,
                        seed: int = 0, chunk_spp: int = 8,
                        progress=None):
    """Render cfg.spp samples, checkpointing every chunk_spp samples.

    Returns the (H,W,3) mean image.  If ``path`` exists, resumes from the
    recorded sample count.  ``progress(done_spp, total_spp, mean_img)`` is
    called after each chunk (the analog of the reference's per-block
    progress line + incremental BMP, main.cpp:263-267).

    Backend routing matches render(): megakernel-scope scenes run each
    sample window through the Pallas kernel's raw-sum/acc0 mode
    (kernels/megakernel.py) — a resumable render at kernel rate — and
    everything else uses the jnp row path.  Both reproduce an
    uninterrupted render bit-for-bit (acc0 seeds the running-sum NaN
    policy, and window sums add in the same per-sample order).
    """
    import jax

    h, w = cfg.height, cfg.width
    done = 0
    acc = np.zeros((h, w, 3), np.float32)
    if os.path.exists(path):
        acc, done, saved_seed = load_state(path)
        assert acc.shape == (h, w, 3), "checkpoint shape mismatch"
        assert saved_seed == seed, "checkpoint seed mismatch"

    use_kernel = None
    if cfg.backend in ("pallas", "auto"):
        from ..kernels.megakernel import render_pallas, supports
        from ..kernels.megamesh import render_pallas_mesh, supports_mesh
        on_tpu = jax.default_backend() == "tpu"
        if cfg.backend == "pallas" or on_tpu:
            def use_kernel(n, done, acc):
                # per-chunk dispatch, mirroring render()'s order
                # (megamesh first): support depends on the CHUNK's spp
                # for sphere-only scenes (the high-spp ladder threshold)
                ccfg = cfg.replace(spp=n)
                if supports_mesh(scene, ccfg):
                    return render_pallas_mesh(
                        scene, ccfg, seed=seed, interpret=not on_tpu,
                        sample_offset=done, mean=False,
                        acc0=jnp.asarray(acc))
                if supports(scene, ccfg):
                    return render_pallas(
                        scene, ccfg, seed=seed, interpret=not on_tpu,
                        sample_offset=done, mean=False,
                        acc0=jnp.asarray(acc))
                return _render_rows_jit(
                    ccfg, cfg.height, scene=scene,
                    row_start=jnp.int32(0), seed=jnp.uint32(seed),
                    sample_offset=jnp.int32(done), mean=False,
                    acc0=jnp.asarray(acc))

    # The running-sum NaN policy reads the radiance sum over ALL prior
    # samples (gpu_kernel.cl:640-642), so each chunk is seeded with the
    # accumulated sum so far (acc0): a chunked/resumed render is exactly
    # equal to an uninterrupted render() under every nan_policy.
    while done < cfg.spp:
        n = min(chunk_spp, cfg.spp - done)
        if use_kernel is not None:
            chunk = use_kernel(n, done, acc)
        else:
            chunk = _render_rows_jit(cfg.replace(spp=n), h, scene=scene,
                                     row_start=jnp.int32(0),
                                     seed=jnp.uint32(seed),
                                     sample_offset=jnp.int32(done),
                                     mean=False, acc0=jnp.asarray(acc))
        acc = np.asarray(chunk).reshape(h, w, 3)
        done += n
        save_state(path, acc, done, seed)
        if progress is not None:
            progress(done, cfg.spp, acc / done)
    return acc / cfg.spp
