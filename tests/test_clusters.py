"""Cluster plan (BVH-leaf ordering) correctness: the culled Pallas
intersection must be identical to the brute-force jnp fold."""

import numpy as np
import jax.numpy as jnp

import opencl_ray_tracer_tpu as ort
from opencl_ray_tracer_tpu.io.obj import parse_obj
from opencl_ray_tracer_tpu.io.procgen import make_torus_obj
from opencl_ray_tracer_tpu.kernels.intersect_mm import make_pallas_hit_fn
from opencl_ray_tracer_tpu.tracer.clusters import (build_mesh_plan,
                                                   plan_for_scene)
from opencl_ray_tracer_tpu.tracer.intersect import closest_hit


def _mesh_scene(chunk=128):
    tris, aabb = parse_obj(make_torus_obj(24, 12), scale=(1, 1, 1),
                           translate=(0, 0, -2.5))
    scene = ort.reference_scene(mesh_tris=tris, mesh_aabb=aabb)
    return scene, plan_for_scene(scene, chunk)


def test_plan_is_a_permutation():
    scene, plan = _mesh_scene()
    perm = plan.perm
    real = perm[perm >= 0]
    t = scene.triangles.count
    assert sorted(real.tolist()) == list(range(t))
    assert perm.size % plan.chunk == 0
    assert plan.n_chunks == perm.size // plan.chunk
    assert len(plan.chunk_box_id) == plan.n_chunks


def test_plan_groups_by_box_id():
    # two boxes: plan must give every chunk a single gating box id
    rng = np.random.default_rng(1)
    t = 300
    p0 = rng.normal(0, 1, (t, 3)).astype(np.float32)
    p0[t // 2:] += 10.0
    p1 = p0 + rng.normal(0, 0.1, (t, 3)).astype(np.float32)
    p2 = p0 + rng.normal(0, 0.1, (t, 3)).astype(np.float32)
    box_id = np.where(np.arange(t) < t // 2, 0, 1).astype(np.int32)
    plan = build_mesh_plan(p0, p1, p2, box_id, chunk=64)
    perm = plan.perm
    for c in range(plan.n_chunks):
        ids = perm[c * 64:(c + 1) * 64]
        ids = ids[ids >= 0]
        assert (box_id[ids] == plan.chunk_box_id[c]).all()


def test_cluster_culled_pallas_matches_brute_force():
    scene, plan = _mesh_scene()
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(0, 1.5, (700, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (700, 3)).astype(np.float32))
    ref = closest_hit(scene, o, d, 1e-3)
    got = make_pallas_hit_fn(scene, 1e-3, interpret=True, plan=plan)(o, d)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got.normal)[m],
                               np.asarray(ref.normal)[m], atol=2e-5)


def test_plan_cache_and_tracer_fallback():
    scene, plan = _mesh_scene()
    assert plan_for_scene(scene, 128) is plan  # cached
    import jax

    @jax.jit
    def inside(s):
        assert plan_for_scene(s, 128) is None  # traced -> no plan
        return s.triangles.p0

    inside(scene)


def test_split_axis_pick_tightens_chunk_area():
    """The SAH-lite axis pick (minimum summed child AABB surface area,
    clusters._bvh_order) must produce chunk AABBs whose total surface
    area is no worse than the old always-longest-axis split — the
    objective that bought the measured F1 forward win (1.731 -> 1.649 s
    on TPU across both A/Bs; benchmarks/sweep_sah_r05.txt)."""
    from opencl_ray_tracer_tpu.tracer import clusters

    rng = np.random.default_rng(7)
    # anisotropic two-lobe cloud: longest-axis is a poor split for the
    # off-axis lobe, so the area objective has something to win
    t = 2000
    p0 = rng.normal(0, (3.0, 0.3, 1.0), (t, 3)).astype(np.float32)
    p0[t // 2:, 1] += 4.0
    p1 = p0 + rng.normal(0, 0.05, (t, 3)).astype(np.float32)
    p2 = p0 + rng.normal(0, 0.05, (t, 3)).astype(np.float32)
    box_id = np.zeros((t,), np.int32)

    def longest_axis_order(idx, cent, leaf, *_aabb):
        out, stack = [], [idx]
        while stack:
            ids = stack.pop()
            if ids.size <= leaf:
                out.append(ids)
                continue
            c = cent[ids]
            ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            k = ids.size // 2
            part = np.argpartition(c[:, ax], k)
            stack.append(ids[part[k:]])
            stack.append(ids[part[:k]])
        return out

    def total_area(plan):
        pts = np.stack([p0, p1, p2], 1)
        tlo, thi = pts.min(1), pts.max(1)
        perm, tot = plan.perm, 0.0
        for c in range(plan.n_chunks):
            ids = perm[c * plan.chunk:(c + 1) * plan.chunk]
            ids = ids[ids >= 0]
            if ids.size:
                d = thi[ids].max(0) - tlo[ids].min(0)
                tot += 2 * (d[0] * d[1] + d[1] * d[2] + d[0] * d[2])
        return tot

    new = total_area(build_mesh_plan(p0, p1, p2, box_id, chunk=128))
    orig = clusters._bvh_order
    clusters._bvh_order = longest_axis_order
    try:
        old = total_area(build_mesh_plan(p0, p1, p2, box_id, chunk=128))
    finally:
        clusters._bvh_order = orig
    assert new <= old * (1 + 1e-6), (new, old)
