"""Multi-host (DCN) logic spoofed over localhost processes (SURVEY.md §4):
two processes jax.distributed.initialize over 127.0.0.1, build a global
(tile x sample) mesh, render their shards with shard_map, and each asserts
its addressable rows are bit-identical to the single-device reference."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update('jax_platforms', 'cpu')
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                               num_processes=nproc, process_id=pid)
    import numpy as np, jax.numpy as jnp
    sys.path.insert(0, %r)
    import opencl_ray_tracer_tpu as ort
    from opencl_ray_tracer_tpu import parallel as par
    from opencl_ray_tracer_tpu.tracer.render import render_rows

    assert jax.process_count() == nproc
    assert par.is_multi_host()
    mesh = par.make_mesh(n_tile=nproc, n_sample=1)
    cfg = ort.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           early_stop=False)
    scene = ort.readme_scene()
    img = par.render_sharded(scene, cfg, mesh, seed=0)
    ref = np.asarray(render_rows(scene, cfg, jnp.int32(0), cfg.height,
                                 jnp.uint32(0)))
    for shard in img.addressable_shards:
        got = np.asarray(shard.data)
        want = ref[shard.index[0]]
        assert np.array_equal(got, want), (pid, shard.index)
    print(f'proc {pid}: OK', flush=True)
""" % REPO)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_bit_identical(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i}: OK" in out
