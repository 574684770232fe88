"""Phase timing + throughput metrics.

The reference prints two wall-clock spans (kernel compile, render —
``main.cpp:33,207-208,219,276-277``); this module generalizes that to named
phases with device-synchronized boundaries (``block_until_ready``) and
computes the headline rays/s metric (SURVEY.md §5 "tracing/profiling").
For deep profiles use ``jax.profiler.trace`` around a phase.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


class PhaseTimer:
    def __init__(self, verbose: bool = True):
        self.spans: dict[str, float] = {}
        self.verbose = verbose

    @contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.spans[name] = self.spans.get(name, 0.0) + dt
            if self.verbose:
                print(f" === {name}: {dt:.6f} s ===")

    def __getitem__(self, name: str) -> float:
        return self.spans[name]


def rays_per_second(width: int, height: int, spp: int, seconds: float,
                    mean_bounces: float = 1.0) -> dict:
    """Throughput metrics: camera samples/s and total rays/s
    (W*H*spp*(1+E[bounces])/t, SURVEY.md §5)."""
    samples = width * height * spp
    return {
        "camera_samples_per_s": samples / seconds,
        "rays_per_s": samples * (1.0 + mean_bounces) / seconds,
        "seconds": seconds,
    }
