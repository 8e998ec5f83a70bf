"""Two-level TLAS/BLAS instancing vs the baked-soup oracle.

The baked flatten path (instances baked into a world-space triangle soup)
is the oracle: the instanced structure must produce the same hits, the same
occlusion, the same light table power, and the same rendered image in
expectation — with geometry memory O(meshes) instead of O(instances)
(parity with renderer_pt.cpp:653-749's BLAS-per-mesh + instanced TLAS).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from platinum_tpu.core import primitives
from platinum_tpu.core.camera import Camera
from platinum_tpu.core.material import Material
from platinum_tpu.core.scene import Scene
from platinum_tpu.core.transform import Transform
from platinum_tpu.ops.intersect import make_brute_tracer
from platinum_tpu.render.flatten import analyze_features, flatten_scene
from platinum_tpu.render.integrator import make_tracers, render
from platinum_tpu.render.types import RenderSettings


def _instanced_scene(n_inst=24, emissive=True, seed=0):
    rng = np.random.default_rng(seed)
    scene = Scene()
    meshes = [scene.add_asset(primitives.sphere(0.5, 12, 8)),
              scene.add_asset(primitives.cube(0.8)),
              scene.add_asset(primitives.plane(1.5))]
    mats = [scene.add_asset(Material(name="diff", base_color=(0.8, 0.4, 0.3, 1),
                                     roughness=0.9)),
            scene.add_asset(Material(name="metal", base_color=(0.9, 0.9, 0.7, 1),
                                     roughness=0.3, metallic=1.0))]
    if emissive:
        mats.append(scene.add_asset(Material(
            name="emit", base_color=(0, 0, 0, 1), emission=(1, 1, 1),
            emission_strength=8.0)))
    for k in range(n_inst):
        n = scene.create_node(f"i{k}")
        scene.set_mesh(n.id, meshes[k % len(meshes)])
        n.transform = Transform(translation=rng.uniform(-4, 4, 3),
                                rotation=rng.uniform(0, 6.28, 3),
                                scale=[rng.uniform(0.5, 2.0)] * 3)
        scene.set_material(n.id, 0, mats[k % len(mats)])
    scene.environment.constant_color = (0.4, 0.45, 0.5)
    cam = scene.create_node("cam")
    cam.camera = Camera.with_focal_length(35.0)
    cam.camera.focus_distance = 10.0
    cam.transform = Transform(translation=[0, 2, 10], target=[0, 0, 0],
                              track=True)
    return scene, cam.id


def _flats(scene, cam):
    si = RenderSettings(width=48, height=48, instancing="on", tracer="packet")
    sb = RenderSettings(width=48, height=48, instancing="off", tracer="brute")
    return (flatten_scene(scene, cam, si, accel_min_tris=1), si,
            flatten_scene(scene, cam, sb, accel_min_tris=1), sb)


def test_instanced_trace_matches_baked_brute():
    scene, cam = _instanced_scene()
    flat_i, si, flat_b, _ = _flats(scene, cam)
    # geometry memory is O(meshes): far fewer library tris than baked
    assert flat_i.geometry.indices.shape[0] * 4 < flat_b.geometry.indices.shape[0]
    assert flat_i.instances is not None and flat_b.instances is None

    tci, tai = make_tracers(flat_i, si)
    tcb, tab = make_brute_tracer(flat_b.geometry)
    rng = np.random.default_rng(7)
    r = 2048
    o = jnp.asarray(rng.uniform(-6, 6, (r, 3)).astype(np.float32))
    d = rng.normal(0, 1, (r, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    ri = jax.jit(lambda o, d: tci(o, d, 1e-3, jnp.inf))(o, d)
    rb = jax.jit(lambda o, d: tcb(o, d, 1e-3, jnp.inf))(o, d)
    hi, hb = np.asarray(ri.hit), np.asarray(rb.hit)
    assert (hi == hb).mean() > 0.995
    both = hi & hb
    np.testing.assert_allclose(np.asarray(ri.t)[both], np.asarray(rb.t)[both],
                               rtol=1e-4, atol=1e-4)
    inst = np.asarray(ri.inst)[both]
    assert inst.min() >= 0 and inst.max() == 23   # every instance reachable
    occ_i = np.asarray(jax.jit(lambda o, d: tai(o, d, 1e-3, 6.0))(o, d))
    occ_b = np.asarray(jax.jit(lambda o, d: tab(o, d, 1e-3, 6.0))(o, d))
    assert (occ_i == occ_b).mean() > 0.995


def test_instanced_lights_match_baked():
    scene, cam = _instanced_scene()
    flat_i, _, flat_b, _ = _flats(scene, cam)
    assert int(flat_i.lights.count) == int(flat_b.lights.count) > 0
    np.testing.assert_allclose(float(flat_i.lights.total_power),
                               float(flat_b.lights.total_power), rtol=1e-4)
    # same multiset of light-triangle areas (ordering differs)
    ai = np.sort(np.asarray(flat_i.lights.area))
    ab = np.sort(np.asarray(flat_b.lights.area))
    np.testing.assert_allclose(ai, ab, rtol=1e-4)


def test_instanced_render_matches_baked():
    scene, cam = _instanced_scene()
    imgs = {}
    for mode, tracer in (("on", "packet"), ("off", "brute")):
        settings = RenderSettings(width=48, height=48, spp=8, max_bounces=4,
                                  sampler="pcg4d", kernel="mis",
                                  instancing=mode, tracer=tracer)
        flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
        imgs[mode] = np.asarray(render(flat, settings,
                                       features=analyze_features(flat)))
    a, b = imgs["on"], imgs["off"]
    assert np.isfinite(a).all()
    # identical hits; per-pixel floats can flip stochastic lobe decisions,
    # so compare in expectation (tight: same sampler streams)
    assert abs(a.mean() - b.mean()) / b.mean() < 0.01
    # diffuse-dominated rows agree per-pixel much tighter
    assert np.median(np.abs(a - b)) < 5e-3


def test_transform_edit_refit_matches_rebuild():
    """update_instance_transform (no rebuild) must trace identically to a
    full rebuild with the new matrices."""
    from platinum_tpu.accel.tlas import update_instance_transform
    from platinum_tpu.ops.pallas_trace import make_packet_tracer

    scene, cam = _instanced_scene(n_inst=12, emissive=False, seed=3)
    host = {}
    si = RenderSettings(width=8, height=8, instancing="on", tracer="packet")
    flat = flatten_scene(scene, cam, si, accel_min_tris=1,
                         host_accel_out=host)
    ibvh, wides, instances = host["ibvh"], host["mesh_wides"], host["instances"]

    # move instance 5, refit in place
    node = scene.node(instances[5].node_id)
    node.transform = Transform(translation=[2.0, 1.0, -1.5],
                               rotation=[0.3, 0.2, 0.1], scale=[1.4] * 3)
    m = scene.world_transform(node.id)
    update_instance_transform(ibvh, wides, 5, m)

    # fresh build with the new scene state
    host2 = {}
    flat2 = flatten_scene(scene, cam, si, accel_min_tris=1,
                          host_accel_out=host2)

    tc1, _ = make_packet_tracer(jnp.asarray(ibvh.nodes), jnp.asarray(ibvh.tri_blocks),
                                jnp.asarray(ibvh.meta),
                                jnp.asarray(ibvh.tri_of_slot.astype(np.int32)),
                                inst_feat=jnp.asarray(ibvh.inst_feat))
    tc2, _ = make_packet_tracer(flat2.wbvh_nodes, flat2.wbvh_tris,
                                flat2.wbvh_meta, flat2.wbvh_slot,
                                inst_feat=flat2.instances.feat)
    rng = np.random.default_rng(1)
    r = 1024
    o = jnp.asarray(rng.uniform(-6, 6, (r, 3)).astype(np.float32))
    d = rng.normal(0, 1, (r, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    r1 = jax.jit(lambda o, d: tc1(o, d, 1e-3, jnp.inf))(o, d)
    r2 = jax.jit(lambda o, d: tc2(o, d, 1e-3, jnp.inf))(o, d)
    h1, h2 = np.asarray(r1.hit), np.asarray(r2.hit)
    assert (h1 == h2).mean() > 0.995
    both = h1 & h2
    np.testing.assert_allclose(np.asarray(r1.t)[both], np.asarray(r2.t)[both],
                               rtol=1e-4, atol=1e-4)


def test_feature_transform_matrix():
    """F(o', d') == T @ F(o, d) for random affine transforms."""
    from platinum_tpu.accel.tlas import feature_transform

    rng = np.random.default_rng(0)
    for _ in range(10):
        m = np.eye(4)
        m[:3, :3] = rng.normal(0, 1, (3, 3))
        while abs(np.linalg.det(m[:3, :3])) < 0.1:
            m[:3, :3] = rng.normal(0, 1, (3, 3))
        m[:3, 3] = rng.normal(0, 2, 3)
        T = feature_transform(m).astype(np.float64)
        o = rng.normal(0, 3, 3)
        d = rng.normal(0, 1, 3)
        b = np.linalg.inv(m[:3, :3])
        op = b @ (o - m[:3, 3])
        dp = b @ d

        def feat(o, d):
            return np.concatenate([d, np.cross(o, d), o, [1.0]])

        np.testing.assert_allclose(T @ feat(o, d), feat(op, dp),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Partition-of-TLAS: beyond-VMEM INSTANCED scenes (accel.tlas.
# partition_instanced) — composes the two round-3 structures that
# previously did not compose (COVERAGE.md known-gaps item).
# ---------------------------------------------------------------------------

def _partitioned_flats(scene, cam, budget=60_000):
    import dataclasses

    si = RenderSettings(width=48, height=48, instancing="on",
                        tracer="packet")
    sp = dataclasses.replace(si, partition_bytes=budget, stream="off")
    host1, host2 = {}, {}
    flat1 = flatten_scene(scene, cam, si, accel_min_tris=1,
                          host_accel_out=host1)
    flat2 = flatten_scene(scene, cam, sp, accel_min_tris=1,
                          host_accel_out=host2)
    return flat1, si, flat2, sp, host1, host2


def test_partitioned_instanced_matches_single():
    """Forcing a tiny partition budget splits the instanced scene into
    several resident TLAS/BLAS structures; the carried-best-t partitioned
    tracer must agree with the single structure on hits, t, GLOBAL
    instance ids, and occlusion."""
    scene, cam = _instanced_scene(n_inst=24)
    flat1, si, flat2, sp, _, host2 = _partitioned_flats(scene, cam)
    assert flat1.wbvh_nodes is not None and flat1.wbvh_parts is None
    assert flat2.wbvh_parts is not None and flat2.wbvh_nodes is None
    assert len(flat2.wbvh_parts) >= 2
    # every instance lands in exactly one partition
    gids = np.concatenate([np.asarray(g) for _, g, _ in host2["ibvh_parts"]])
    assert sorted(gids.tolist()) == list(range(24))

    tc1, ta1 = make_tracers(flat1, si)
    tc2, ta2 = make_tracers(flat2, sp)
    rng = np.random.default_rng(7)
    r = 2048
    o = jnp.asarray(rng.uniform(-6, 6, (r, 3)).astype(np.float32))
    d = rng.normal(0, 1, (r, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    r1 = jax.jit(lambda o, d: tc1(o, d, 1e-3, jnp.inf))(o, d)
    r2 = jax.jit(lambda o, d: tc2(o, d, 1e-3, jnp.inf))(o, d)
    h1, h2 = np.asarray(r1.hit), np.asarray(r2.hit)
    assert (h1 == h2).mean() > 0.999
    both = h1 & h2
    np.testing.assert_allclose(np.asarray(r1.t)[both], np.asarray(r2.t)[both],
                               rtol=1e-4, atol=1e-4)
    # instance ids must be the GLOBAL ones after the per-partition remap
    same_t = np.isclose(np.asarray(r1.t), np.asarray(r2.t),
                        rtol=1e-5, atol=1e-6)
    check = both & same_t
    np.testing.assert_array_equal(np.asarray(r1.inst)[check],
                                  np.asarray(r2.inst)[check])
    occ1 = np.asarray(jax.jit(lambda o, d: ta1(o, d, 1e-3, 6.0))(o, d))
    occ2 = np.asarray(jax.jit(lambda o, d: ta2(o, d, 1e-3, 6.0))(o, d))
    assert (occ1 == occ2).mean() > 0.999


def test_partitioned_instanced_render_matches_single():
    scene, cam = _instanced_scene(n_inst=24)
    import dataclasses

    imgs = {}
    for budget in (None, 60_000):
        settings = RenderSettings(width=48, height=48, spp=6, max_bounces=3,
                                  sampler="pcg4d", kernel="mis",
                                  instancing="on", tracer="packet")
        if budget:
            settings = dataclasses.replace(settings, partition_bytes=budget,
                                           stream="off")
        flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
        imgs[budget] = np.asarray(render(flat, settings,
                                         features=analyze_features(flat)))
    a, b = imgs[None], imgs[60_000]
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) / b.mean() < 0.01
    assert np.median(np.abs(a - b)) < 5e-3


def test_partitioned_transform_edit_refits_one_partition():
    """Renderer.update_instance_transform on a partitioned instanced scene
    refits only the owning partition and traces like a full re-flatten."""
    import dataclasses

    from platinum_tpu.render.renderer import Renderer

    scene, cam = _instanced_scene(n_inst=24, emissive=False, seed=3)
    settings = RenderSettings(width=8, height=8, spp=1, instancing="on",
                              tracer="packet", partition_bytes=60_000,
                              stream="off")
    r = Renderer(scene)
    r.start_render(cam, settings)
    assert r.flat.wbvh_parts is not None and len(r.flat.wbvh_parts) >= 2

    node_id = r._host_accel["instances"][5].node_id
    from platinum_tpu.core.transform import Transform

    r.update_instance_transform(node_id, Transform(
        translation=[2.0, 1.0, -1.5], rotation=[0.3, 0.2, 0.1],
        scale=[1.4] * 3))

    flat2 = flatten_scene(scene, cam, settings, accel_min_tris=1)
    tc1, _ = make_tracers(r.flat, settings)
    tc2, _ = make_tracers(flat2, settings)
    rng = np.random.default_rng(1)
    n = 1024
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    r1 = jax.jit(lambda o, d: tc1(o, d, 1e-3, jnp.inf))(o, d)
    r2 = jax.jit(lambda o, d: tc2(o, d, 1e-3, jnp.inf))(o, d)
    h1, h2 = np.asarray(r1.hit), np.asarray(r2.hit)
    assert (h1 == h2).mean() > 0.995
    both = h1 & h2
    np.testing.assert_allclose(np.asarray(r1.t)[both], np.asarray(r2.t)[both],
                               rtol=1e-4, atol=1e-4)
