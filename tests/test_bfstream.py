"""All-Pallas breadth-first tracer (ops/bfstream.py) vs the brute oracle
and the packet kernel.

Correctness contract (same as ops/raystream.py): closest-hit t matches the
packet kernel exactly (same MXU MT math at the same precision); triangle
ids may differ only on exactly-equal-t ties; occlusion matches exactly.

Runs in a CPU subprocess with the kernels in interpreter mode — the
hardware path is exercised by perf/bench_bf.py and the integrator A/B.
"""

import textwrap

from conftest import run_in_cpu_mesh


def test_bf_tracer_matches_brute_and_packet(cpu_mesh_env):
    out = run_in_cpu_mesh(textwrap.dedent("""
        import sys
        sys.path.insert(0, "tests")
        import numpy as np
        import jax.numpy as jnp
        from platinum_tpu.ops.intersect import make_brute_tracer
        from platinum_tpu.ops.pallas_trace import make_packet_tracer
        from platinum_tpu.ops.bfstream import make_bf_tracer
        from test_pallas_trace import _build, _random_soup

        v0, v1, v2 = _random_soup(t=700, seed=3)
        wide, geom = _build(v0, v1, v2, leaf_cap=16)
        brute_c, brute_a = make_brute_tracer(geom)
        pc, pa = make_packet_tracer(wide.nodes, wide.tri_blocks, wide.meta,
                                    wide.tri_of_slot)
        bc, ba = make_bf_tracer(wide.nodes, wide.tri_blocks, wide.meta,
                                wide.tri_of_slot)

        rng = np.random.default_rng(1)
        o = jnp.asarray(rng.uniform(-6, 6, (1024, 3)).astype(np.float32))
        d = rng.normal(size=(1024, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)

        rb = brute_c(o, d, 1e-3, 1e30)
        rp = pc(o, d, 1e-3, 1e30)
        rs, ovf = bc.with_overflow(o, d, 1e-3, 1e30, None)
        assert int(ovf) == 0, int(ovf)
        hp = np.asarray(rp.hit); hs = np.asarray(rs.hit)
        assert np.array_equal(hp, hs), (hp.sum(), hs.sum())
        tp, ts = np.asarray(rp.t), np.asarray(rs.t)
        assert np.array_equal(tp[hp], ts[hp])
        diff = np.asarray(rp.tri) != np.asarray(rs.tri)
        assert np.all(tp[diff] == ts[diff])          # ties only
        tb = np.asarray(rb.t)
        both = hp & np.asarray(rb.hit)
        assert np.abs(tb[both] - ts[both]).max() < 1e-4

        # barycentrics of agreeing winners match the packet kernel exactly
        same = np.asarray(rp.tri) == np.asarray(rs.tri)
        bp = np.asarray(rp.bary); bs = np.asarray(rs.bary)
        assert np.array_equal(bp[hp & same], bs[hp & same])

        # any-hit occlusion exact
        occ_b = np.asarray(brute_a(o, d, 1e-3, 12.0))
        occ_s = np.asarray(ba(o, d, 1e-3, 12.0))
        assert np.array_equal(occ_b, occ_s)

        # active-mask handling: inactive rays never occlude / hit
        act = jnp.asarray(rng.random(1024) < 0.5)
        occ_m = np.asarray(ba(o, d, 1e-3, 12.0, act))
        assert not occ_m[~np.asarray(act)].any()
        assert np.array_equal(occ_m[np.asarray(act)],
                              occ_s[np.asarray(act)])
        print("BF_TRACER_OK")
    """), cpu_mesh_env, timeout=1800)
    assert "BF_TRACER_OK" in out


def test_bf_tracer_on_scene_segmented(cpu_mesh_env):
    """Camera wave on a real flattened scene, with a segment size that
    forces the multi-segment path; equality vs the packet kernel."""
    out = run_in_cpu_mesh(textwrap.dedent("""
        import numpy as np
        import jax.numpy as jnp
        from platinum_tpu.app.scenes import make_spheres_scene
        from platinum_tpu.models.camera_rays import spawn_camera_rays
        from platinum_tpu.ops.pallas_trace import make_packet_tracer
        from platinum_tpu.ops.bfstream import make_bf_tracer
        from platinum_tpu.render.flatten import flatten_scene
        from platinum_tpu.render.types import RenderSettings

        scene, cam = make_spheres_scene(grid=2)
        settings = RenderSettings(width=24, height=24, spp=1,
                                  tracer="packet", instancing="off")
        flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
        args = (flat.wbvh_nodes, flat.wbvh_tris, flat.wbvh_meta,
                flat.wbvh_slot)
        tc, _ = make_packet_tracer(*args)
        bc, _ = make_bf_tracer(*args, seg_rays=256)   # forces 3 segments
        n = 24 * 24
        px = jnp.arange(n, dtype=jnp.uint32) % 24
        py = jnp.arange(n, dtype=jnp.uint32) // 24
        o, d = spawn_camera_rays(flat.camera, px, py,
                                 jnp.zeros((n, 2)) + 0.5,
                                 jnp.zeros((n, 2)) + 0.5)
        r1 = tc(o, d, 1e-3, 1e30)
        r2, ovf = bc.with_overflow(o, d, 1e-3, 1e30, None)
        assert int(ovf) == 0
        assert np.array_equal(np.asarray(r1.hit), np.asarray(r2.hit))
        m = np.asarray(r1.hit)
        assert np.array_equal(np.asarray(r1.t)[m], np.asarray(r2.t)[m])
        diff = np.asarray(r1.tri) != np.asarray(r2.tri)
        assert np.all(np.asarray(r1.t)[diff] == np.asarray(r2.t)[diff])
        print("BF_SCENE_OK")
    """), cpu_mesh_env, timeout=1800)
    assert "BF_SCENE_OK" in out


def test_bf_tracer_e2e_integrator(cpu_mesh_env):
    """tracer='bf' through the FULL integrator (render_step under jit,
    with bf_depth plumbing) matches tracer='packet' to fp-fusion noise.
    Regression-pins the inf-tmax clamp: the integrator passes tmax=inf,
    which would NaN the exact-split emission matmuls unclamped."""
    out = run_in_cpu_mesh(textwrap.dedent("""
        import dataclasses
        import numpy as np
        import jax.numpy as jnp
        from platinum_tpu.app.scenes import make_spheres_scene
        from platinum_tpu.render.flatten import (
            analyze_features, flatten_scene,
        )
        from platinum_tpu.render import integrator
        from platinum_tpu.render.types import RenderSettings
        from platinum_tpu.ops.bfstream import _tree_depth

        scene, cam = make_spheres_scene(grid=2)
        imgs = {}
        for tracer in ("packet", "bf"):
            s = RenderSettings(width=16, height=16, spp=2, max_bounces=3,
                               sampler="pcg4d", tracer=tracer,
                               instancing="off")
            flat = flatten_scene(scene, cam, s, accel_min_tris=1)
            if tracer == "bf":
                s = dataclasses.replace(
                    s, bf_depth=_tree_depth(np.asarray(flat.wbvh_meta)))
            img = integrator.render_step(
                flat, s, jnp.zeros((256, 3)), jnp.int32(0),
                features=analyze_features(flat))
            imgs[tracer] = np.asarray(img)
        d = np.abs(imgs["packet"] - imgs["bf"]).max()
        assert np.isfinite(imgs["bf"]).all()
        assert d < 1e-4, d
        print("BF_E2E_OK")
    """), cpu_mesh_env, timeout=1800)
    assert "BF_E2E_OK" in out
