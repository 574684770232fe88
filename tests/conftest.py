"""Test config: force the CPU backend with 8 virtual devices.

The sharding tests use JAX's standard multi-chip-without-a-cluster trick
(``--xla_force_host_platform_device_count=8``): the same Mesh/shard_map code
paths run over 8 host devices, so tile/sample/geometry sharding is validated
without TPU hardware (SURVEY.md §4).  The environment's axon TPU plugin
forces ``jax_platforms="axon,cpu"`` from sitecustomize, so we must override
via jax.config, not the JAX_PLATFORMS env var.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """XLA:CPU's compiler segfaults deterministically once a single
    process accumulates most of this suite's compilations (reproduced at
    whatever test compiles ~115 tests in — first test_mm_f1_car_mesh,
    then, after isolating that one, the next test in line).  Clearing the
    compilation caches between modules keeps the per-process pressure
    bounded; ``pytest -n 4`` (fresh worker processes) avoids it too and
    is the faster way to run the full suite."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def readme_scene_small():
    import opencl_ray_tracer_tpu as ort
    return ort.readme_scene()


@pytest.fixture(scope="session")
def small_cfg():
    import opencl_ray_tracer_tpu as ort
    return ort.RenderConfig(width=64, height=36, spp=4, max_depth=6)


@pytest.fixture()
def rng_np():
    return np.random.default_rng(0)
