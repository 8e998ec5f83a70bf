"""Partitioned (beyond-VMEM) traversal vs single-structure oracle.

accel.partition splits the binary SAH tree into resident subtrees traced
sequentially with carried best-t; results must match the one-structure
packet tracer and the brute oracle exactly (same triangles, same hits).
"""

import numpy as np
import jax
import jax.numpy as jnp

from platinum_tpu.accel.bvh import build_bvh
from platinum_tpu.accel.partition import make_partitioned_tracer, partition_bvh
from platinum_tpu.accel.wide import build_wide_bvh
from platinum_tpu.ops.intersect import make_brute_tracer
from platinum_tpu.render.types import Geometry


def _soup(t, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-6, 6, (t, 3)).astype(np.float32)
    v0 = c + rng.normal(0, 0.25, (t, 3)).astype(np.float32)
    v1 = c + rng.normal(0, 0.25, (t, 3)).astype(np.float32)
    v2 = c + rng.normal(0, 0.25, (t, 3)).astype(np.float32)
    return v0, v1, v2


def test_partitioned_trace_matches_oracle():
    t = 6000
    v0, v1, v2 = _soup(t)
    bvh = build_bvh(v0, v1, v2, max_leaf=4)
    order = bvh.tri_order
    v0o, v1o, v2o = v0[order], v1[order], v2[order]
    tri_geo = np.concatenate(
        [v0o, v1o - v0o, v2o - v0o, np.zeros((t, 3), np.float32)], -1)

    parts = partition_bvh(bvh, budget_tris=1500)
    assert len(parts) >= 3
    assert sum(p.tri_count for p in parts) == t
    arrays = []
    for p in parts:
        w = build_wide_bvh(p.bvh, tri_geo[p.tri_base:p.tri_base + p.tri_count],
                           leaf_cap=16)
        slot_g = np.where(w.tri_of_slot >= 0, w.tri_of_slot + p.tri_base, -1)
        arrays.append((jnp.asarray(w.nodes), jnp.asarray(w.tri_blocks),
                       jnp.asarray(w.meta),
                       jnp.asarray(slot_g.astype(np.int32))))
    tcp, tap = make_partitioned_tracer(arrays)

    idx = np.arange(3 * t, dtype=np.int32).reshape(t, 3)
    pos = np.stack([v0o, v1o, v2o], 1).reshape(-1, 3)
    geom = Geometry(
        positions=jnp.asarray(pos), normals=jnp.asarray(pos),
        tangents=jnp.zeros((3 * t, 4)), uvs=jnp.zeros((3 * t, 2)),
        indices=jnp.asarray(idx), tri_material=jnp.zeros((t,), jnp.int32),
    )
    bc, ba = make_brute_tracer(geom)

    rng = np.random.default_rng(3)
    r = 1536
    o = jnp.asarray(rng.uniform(-8, 8, (r, 3)).astype(np.float32))
    d = rng.normal(0, 1, (r, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    rp = jax.jit(lambda o, d: tcp(o, d, 1e-3, jnp.inf))(o, d)
    rb = jax.jit(lambda o, d: bc(o, d, 1e-3, jnp.inf))(o, d)
    hp, hb = np.asarray(rp.hit), np.asarray(rb.hit)
    assert (hp == hb).mean() > 0.995
    both = hp & hb
    np.testing.assert_allclose(np.asarray(rp.t)[both], np.asarray(rb.t)[both],
                               rtol=1e-4, atol=1e-5)
    tie = ~np.isclose(np.asarray(rp.t)[both], np.asarray(rb.t)[both],
                      rtol=1e-5, atol=1e-6)
    assert ((np.asarray(rp.tri)[both] == np.asarray(rb.tri)[both])
            | tie).mean() > 0.995

    op = np.asarray(jax.jit(lambda o, d: tap(o, d, 1e-3, 8.0))(o, d))
    ob = np.asarray(jax.jit(lambda o, d: ba(o, d, 1e-3, 8.0))(o, d))
    assert (op == ob).mean() > 0.995


def test_partitioned_flatten_end_to_end():
    """A scene over the partition budget renders identically to the same
    scene with one resident structure (budget raised)."""
    from dataclasses import replace

    from platinum_tpu.app.scenes import make_cornell_scene
    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render
    from platinum_tpu.render.types import RenderSettings

    scene, cam = make_cornell_scene()
    base = RenderSettings(width=32, height=32, spp=2, max_bounces=3,
                          sampler="pcg4d", tracer="packet",
                          instancing="off")
    imgs = {}
    for name, s in (("single", base),
                    ("parts", replace(base, partition_tris=4, stream="off"))):
        flat = flatten_scene(scene, cam, s, accel_min_tris=1)
        if name == "parts":
            assert flat.wbvh_parts is not None and len(flat.wbvh_parts) >= 2
        else:
            assert flat.wbvh_parts is None
        imgs[name] = np.asarray(render(flat, s,
                                       features=analyze_features(flat)))
    np.testing.assert_allclose(imgs["single"], imgs["parts"],
                               rtol=2e-3, atol=2e-3)
