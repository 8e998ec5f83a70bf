"""HBM-streamed leaf blocks (ops.pallas_trace stream mode).

Stream mode keeps the MT coefficient blocks in HBM and DMA-stages each
enqueued block into a per-queue-slot VMEM ring (see _make_kernel). The
arithmetic per block is identical to the resident kernel, so results
must match BITWISE on generic scenes; these tests pin that, plus the
flatten integration (settings.stream replaces partitioning with one
streamed structure).
"""

import sys
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")

from test_pallas_trace import _build, _random_soup  # noqa: E402

from platinum_tpu.ops.pallas_trace import make_packet_tracer  # noqa: E402


def _rays(r=1024, seed=5):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-6, 6, (r, 3)).astype(np.float32))
    d = rng.normal(0, 1, (r, 3)).astype(np.float32)
    return o, jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))


def test_stream_matches_resident_bitwise():
    v0, v1, v2 = _random_soup(t=900, seed=3)
    wide, _ = _build(v0, v1, v2, leaf_cap=16)
    args = (wide.nodes, wide.tri_blocks, wide.meta, wide.tri_of_slot)
    tc_r, ta_r = make_packet_tracer(*args)
    tc_s, ta_s = make_packet_tracer(*args, stream=True)
    o, d = _rays()
    rr = jax.jit(lambda o, d: tc_r(o, d, 1e-3, jnp.inf))(o, d)
    rs = jax.jit(lambda o, d: tc_s(o, d, 1e-3, jnp.inf))(o, d)
    np.testing.assert_array_equal(np.asarray(rr.hit), np.asarray(rs.hit))
    np.testing.assert_array_equal(np.asarray(rr.tri), np.asarray(rs.tri))
    np.testing.assert_array_equal(np.asarray(rr.t), np.asarray(rs.t))
    np.testing.assert_array_equal(np.asarray(rr.bary), np.asarray(rs.bary))
    occ_r = jax.jit(lambda o, d: ta_r(o, d, 1e-3, 8.0))(o, d)
    occ_s = jax.jit(lambda o, d: ta_s(o, d, 1e-3, 8.0))(o, d)
    np.testing.assert_array_equal(np.asarray(occ_r), np.asarray(occ_s))


def test_stream_instanced_matches_resident_bitwise():
    """Two-level TLAS/BLAS structure with streamed mesh-library blocks."""
    from test_tlas import _instanced_scene  # noqa: E402

    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    scene, cam = _instanced_scene()
    settings = RenderSettings(width=32, height=32, instancing="on",
                              tracer="packet")
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    assert not flat.wbvh_stream
    flat_s = flatten_scene(scene, cam, replace(settings, stream="on"),
                           accel_min_tris=1)
    assert flat_s.wbvh_stream and flat_s.wbvh_parts is None

    def mk(f, stream):
        return make_packet_tracer(f.wbvh_nodes, f.wbvh_tris, f.wbvh_meta,
                                  f.wbvh_slot, inst_feat=f.instances.feat,
                                  stream=stream)

    tc_r, ta_r = mk(flat, False)
    tc_s, ta_s = mk(flat_s, True)
    o, d = _rays(r=768, seed=9)
    rr = jax.jit(lambda o, d: tc_r(o, d, 1e-3, jnp.inf))(o, d)
    rs = jax.jit(lambda o, d: tc_s(o, d, 1e-3, jnp.inf))(o, d)
    np.testing.assert_array_equal(np.asarray(rr.hit), np.asarray(rs.hit))
    np.testing.assert_array_equal(np.asarray(rr.tri), np.asarray(rs.tri))
    np.testing.assert_array_equal(np.asarray(rr.t), np.asarray(rs.t))
    np.testing.assert_array_equal(np.asarray(rr.inst), np.asarray(rs.inst))
    occ_r = jax.jit(lambda o, d: ta_r(o, d, 1e-3, 6.0))(o, d)
    occ_s = jax.jit(lambda o, d: ta_s(o, d, 1e-3, 6.0))(o, d)
    np.testing.assert_array_equal(np.asarray(occ_r), np.asarray(occ_s))


def test_stream_flatten_end_to_end():
    """settings.stream='on' renders the Cornell scene identically to the
    resident default, through the full flatten + integrator path."""
    from platinum_tpu.app.scenes import make_cornell_scene
    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render
    from platinum_tpu.render.types import RenderSettings

    scene, cam = make_cornell_scene()
    base = RenderSettings(width=32, height=32, spp=2, max_bounces=3,
                          sampler="pcg4d", tracer="packet",
                          instancing="off")
    imgs = {}
    for name, s in (("resident", base), ("stream", replace(base, stream="on"))):
        flat = flatten_scene(scene, cam, s, accel_min_tris=1)
        assert flat.wbvh_stream == (name == "stream")
        assert flat.wbvh_parts is None
        imgs[name] = np.asarray(render(flat, s,
                                       features=analyze_features(flat)))
    np.testing.assert_allclose(imgs["resident"], imgs["stream"],
                               rtol=1e-6, atol=1e-6)


def test_stream_auto_replaces_partitioning():
    """stream='auto' + a tiny partition budget: the scene that would have
    partitioned builds ONE streamed structure and renders identically to
    the partitioned trace."""
    from platinum_tpu.app.scenes import make_cornell_scene
    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render
    from platinum_tpu.render.types import RenderSettings

    scene, cam = make_cornell_scene()
    base = RenderSettings(width=32, height=32, spp=2, max_bounces=3,
                          sampler="pcg4d", tracer="packet",
                          instancing="off", partition_tris=4, stream="off")
    imgs = {}
    for name, s in (("parts", base), ("stream", replace(base, stream="auto"))):
        flat = flatten_scene(scene, cam, s, accel_min_tris=1)
        if name == "parts":
            assert flat.wbvh_parts is not None and not flat.wbvh_stream
        else:
            assert flat.wbvh_parts is None and flat.wbvh_stream
        imgs[name] = np.asarray(render(flat, s,
                                       features=analyze_features(flat)))
    np.testing.assert_allclose(imgs["parts"], imgs["stream"],
                               rtol=2e-3, atol=2e-3)
