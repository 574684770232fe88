"""Device-level profiling helpers.

The reference's only profiling is two host wall-clock spans
(``main.cpp:33,207-208,219,276-277``); the TPU equivalent (SURVEY.md §5) is
a real device trace: ``jax.profiler`` captures XLA/TPU timelines viewable in
TensorBoard/Perfetto (tensorboard_plugin_profile is available in this
image).
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/oclrt_trace",
                 host_tracer_level: int = 2):
    """Capture a device trace around a block:

        with device_trace("/tmp/trace"):
            img = render(...)
            jax.block_until_ready(img)

    View with: tensorboard --logdir /tmp/trace  (Profile tab), or open the
    .perfetto-trace file in ui.perfetto.dev.
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (context manager)."""
    return jax.profiler.TraceAnnotation(name)
