import numpy as np
import jax.numpy as jnp
import pytest

from platinum_tpu.accel.bvh import build_bvh, validate_bvh


def _random_tris(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    v2 = base + rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    return v0, v1, v2


def test_bvh_invariants():
    v0, v1, v2 = _random_tris(500)
    bvh = build_bvh(v0, v1, v2, max_leaf=4)
    validate_bvh(bvh, v0, v1, v2)
    # DFS/skip structure: node 0 is the root covering everything
    assert bvh.skip[0] == bvh.num_nodes
    lo = np.minimum(np.minimum(v0, v1), v2).min(axis=0)
    hi = np.maximum(np.maximum(v0, v1), v2).max(axis=0)
    assert np.allclose(bvh.bounds_lo[0], lo, atol=1e-4)
    assert np.allclose(bvh.bounds_hi[0], hi, atol=1e-4)


def _flat_with_bvh(n_tris=300, seed=1):
    """Build a minimal FlatScene-like object carrying geometry + BVH."""
    from platinum_tpu.render.types import Geometry

    v0, v1, v2 = _random_tris(n_tris, seed)
    bvh = build_bvh(v0, v1, v2, max_leaf=4)
    order = bvh.tri_order
    positions = np.concatenate([v0[order], v1[order], v2[order]])
    t = n_tris
    indices = np.stack(
        [np.arange(t), np.arange(t) + t, np.arange(t) + 2 * t], -1
    ).astype(np.int32)

    geom = Geometry(
        positions=jnp.asarray(positions),
        normals=jnp.zeros_like(jnp.asarray(positions)),
        tangents=jnp.zeros((3 * t, 4)),
        uvs=jnp.zeros((3 * t, 2)),
        indices=jnp.asarray(indices),
        tri_material=jnp.zeros((t,), jnp.int32),
    )

    class FakeFlat:
        geometry = geom
        bvh_bounds_lo = jnp.asarray(bvh.bounds_lo)
        bvh_bounds_hi = jnp.asarray(bvh.bounds_hi)
        bvh_skip = jnp.asarray(bvh.skip)
        bvh_tri_start = jnp.asarray(bvh.tri_start)
        bvh_tri_count = jnp.asarray(bvh.tri_count)

    return FakeFlat()


def test_bvh_traversal_matches_brute_force():
    from platinum_tpu.ops.intersect import make_brute_tracer
    from platinum_tpu.ops.traverse import make_bvh_tracer

    flat = _flat_with_bvh()
    rng = np.random.default_rng(7)
    r = 512
    o = jnp.asarray(rng.uniform(-12, 12, (r, 3)).astype(np.float32))
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    brute_c, brute_a = make_brute_tracer(flat.geometry)
    bvh_c, bvh_a = make_bvh_tracer(flat)

    rb = brute_c(o, d, 1e-3, jnp.inf)
    rv = bvh_c(o, d, 1e-3, jnp.inf)

    hit_b = np.asarray(rb.hit)
    hit_v = np.asarray(rv.hit)
    assert (hit_b == hit_v).all()
    tb, tv = np.asarray(rb.t)[hit_b], np.asarray(rv.t)[hit_b]
    assert np.allclose(tb, tv, rtol=1e-5, atol=1e-5)
    assert (np.asarray(rb.tri)[hit_b] == np.asarray(rv.tri)[hit_b]).all()

    # any-hit occlusion agrees with "some hit within tmax"
    tmax = jnp.asarray(rng.uniform(1.0, 20.0, (r,)).astype(np.float32))
    occ_b = np.asarray(brute_a(o, d, 1e-3, tmax))
    occ_v = np.asarray(bvh_a(o, d, 1e-3, tmax))
    assert (occ_b == occ_v).all()


def test_cornell_render_with_bvh_matches_brute():
    """Force-BVH Cornell render equals the brute-force tracer image."""
    from platinum_tpu.app.scenes import make_cornell_scene
    from platinum_tpu.render import integrator
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    scene, cam = make_cornell_scene()
    s_bvh = RenderSettings(width=24, height=24, spp=4, max_bounces=4,
                           sampler="pcg4d", tracer="bvh")
    s_brute = RenderSettings(width=24, height=24, spp=4, max_bounces=4,
                             sampler="pcg4d", tracer="brute")
    flat = flatten_scene(scene, cam, s_bvh, accel_min_tris=1)
    img_bvh = np.asarray(integrator.render(flat, s_bvh))
    img_brute = np.asarray(integrator.render(flat, s_brute))
    assert np.allclose(img_bvh, img_brute, atol=1e-5)


def test_native_builder_equivalent_to_numpy():
    from platinum_tpu.accel.native import build_bvh_native, native_available

    if not native_available():
        pytest.skip("C++ builder unavailable (no compiler)")
    v0, v1, v2 = _random_tris(2000, seed=3)
    b = build_bvh_native(v0, v1, v2, max_leaf=4)
    validate_bvh(b, v0, v1, v2)

    # Traversal through the native-built tree matches brute force
    from platinum_tpu.ops.intersect import make_brute_tracer
    from platinum_tpu.ops.traverse import make_bvh_tracer
    from platinum_tpu.render.types import Geometry

    order = b.tri_order
    t = len(v0)
    positions = np.concatenate([v0[order], v1[order], v2[order]])
    indices = np.stack([np.arange(t), np.arange(t) + t, np.arange(t) + 2 * t], -1)

    geom = Geometry(
        positions=jnp.asarray(positions),
        normals=jnp.zeros((3 * t, 3)),
        tangents=jnp.zeros((3 * t, 4)),
        uvs=jnp.zeros((3 * t, 2)),
        indices=jnp.asarray(indices.astype(np.int32)),
        tri_material=jnp.zeros((t,), jnp.int32),
    )

    class FakeFlat:
        geometry = geom
        bvh_bounds_lo = jnp.asarray(b.bounds_lo)
        bvh_bounds_hi = jnp.asarray(b.bounds_hi)
        bvh_skip = jnp.asarray(b.skip)
        bvh_tri_start = jnp.asarray(b.tri_start)
        bvh_tri_count = jnp.asarray(b.tri_count)

    rng = np.random.default_rng(11)
    r = 256
    o = jnp.asarray(rng.uniform(-12, 12, (r, 3)).astype(np.float32))
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    rb = make_brute_tracer(geom)[0](o, d, 1e-3, jnp.inf)
    rv = make_bvh_tracer(FakeFlat())[0](o, d, 1e-3, jnp.inf)
    assert (np.asarray(rb.hit) == np.asarray(rv.hit)).all()
    hb = np.asarray(rb.hit)
    assert np.allclose(np.asarray(rb.t)[hb], np.asarray(rv.t)[hb], rtol=1e-5)
