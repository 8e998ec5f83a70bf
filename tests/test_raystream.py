"""Ray-stream (breadth-first level-synchronous) tracer vs the brute oracle
and the packet kernel (ops/raystream.py; sim in perf/sim_raystream.py).

Correctness contract: closest-hit t and occlusion must match the packet
kernel exactly (same MXU MT math); triangle ids may differ only on
exactly-equal-t ties (stream breaks ties by smallest global slot id, the
packet kernel by drain order); the scalar brute oracle agrees within fp32
matmul-reassociation tolerance.

Runs in a CPU subprocess: the tracer is reference-only on the TPU backend
— its wave-scale XLA scatter/argsort glue faults the axon TPU runtime
(localized by bisect: the Pallas MT kernel itself passes on hardware; the
fault reproduces with the kernel in interpret mode). See PERFORMANCE.md
round-4 ray-stream section; make_stream_tracer raises on non-CPU backends
unless PLATINUM_TPU_RAYSTREAM_HW=1.
"""

import textwrap

from conftest import run_in_cpu_mesh


def test_stream_tracer_reference_correctness(cpu_mesh_env):
    out = run_in_cpu_mesh(textwrap.dedent("""
        import sys
        sys.path.insert(0, "tests")
        import numpy as np
        import jax.numpy as jnp
        from platinum_tpu.ops.intersect import make_brute_tracer
        from platinum_tpu.ops.pallas_trace import make_packet_tracer
        from platinum_tpu.ops.raystream import make_stream_tracer
        from test_pallas_trace import _build, _random_soup

        v0, v1, v2 = _random_soup(t=700, seed=3)
        wide, geom = _build(v0, v1, v2, leaf_cap=16)
        brute_c, brute_a = make_brute_tracer(geom)
        pc, pa = make_packet_tracer(wide.nodes, wide.tri_blocks, wide.meta,
                                    wide.tri_of_slot)
        sc, sa = make_stream_tracer(wide.nodes, wide.tri_blocks, wide.meta,
                                    wide.tri_of_slot)

        rng = np.random.default_rng(1)
        o = jnp.asarray(rng.uniform(-6, 6, (1024, 3)).astype(np.float32))
        d = rng.normal(size=(1024, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)

        rb = brute_c(o, d, 1e-3, 1e30)
        rp = pc(o, d, 1e-3, 1e30)
        rs = sc(o, d, 1e-3, 1e30)
        assert np.array_equal(np.asarray(rp.hit), np.asarray(rs.hit))
        tp, ts = np.asarray(rp.t), np.asarray(rs.t)
        m = np.asarray(rp.hit)
        assert np.array_equal(tp[m], ts[m])
        diff = np.asarray(rp.tri) != np.asarray(rs.tri)
        assert np.all(tp[diff] == ts[diff])          # ties only
        tb = np.asarray(rb.t)
        both = m & np.asarray(rb.hit)
        assert np.abs(tb[both] - ts[both]).max() < 1e-4

        # any-hit occlusion, exact vs the packet kernel
        occ_p = np.asarray(pa(o, d, 1e-3, jnp.full((1024,), 6.0)))
        occ_s = np.asarray(sa(o, d, 1e-3, jnp.full((1024,), 6.0)))
        assert np.array_equal(occ_p, occ_s)
        assert 0.05 < occ_s.mean() < 1.0

        # active-mask handling + overflow counter
        act = jnp.asarray(rng.random(1024) < 0.5)
        rec, ovf = sc.with_overflow(o, d, 1e-3, 1e30, act)
        assert int(ovf) == 0
        assert not np.asarray(rec.hit)[~np.asarray(act)].any()
        full = sc(o, d, 1e-3, 1e30)
        msk = np.asarray(act) & np.asarray(full.hit)
        assert np.array_equal(np.asarray(full.t)[msk],
                              np.asarray(rec.t)[msk])
        print("STREAM_SOUP_OK", float(occ_s.mean()))
    """), cpu_mesh_env, timeout=900)
    assert "STREAM_SOUP_OK" in out


def test_stream_matches_packet_on_scene(cpu_mesh_env):
    out = run_in_cpu_mesh(textwrap.dedent("""
        import numpy as np
        import jax.numpy as jnp
        from platinum_tpu.app.scenes import make_spheres_scene
        from platinum_tpu.models.camera_rays import spawn_camera_rays
        from platinum_tpu.ops.pallas_trace import make_packet_tracer
        from platinum_tpu.ops.raystream import make_stream_tracer
        from platinum_tpu.render.flatten import flatten_scene
        from platinum_tpu.render.types import RenderSettings

        scene, cam = make_spheres_scene(grid=2)
        settings = RenderSettings(width=24, height=24, spp=1,
                                  tracer="packet")
        flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
        args = (flat.wbvh_nodes, flat.wbvh_tris, flat.wbvh_meta,
                flat.wbvh_slot)
        tc, _ = make_packet_tracer(*args)
        sc, _ = make_stream_tracer(*args)
        n = 24 * 24
        px = jnp.arange(n, dtype=jnp.uint32) % 24
        py = jnp.arange(n, dtype=jnp.uint32) // 24
        o, d = spawn_camera_rays(flat.camera, px, py,
                                 jnp.zeros((n, 2)) + 0.5,
                                 jnp.zeros((n, 2)) + 0.5)
        r1 = tc(o, d, 1e-3, 1e30)
        r2 = sc(o, d, 1e-3, 1e30)
        assert np.array_equal(np.asarray(r1.hit), np.asarray(r2.hit))
        m = np.asarray(r1.hit)
        assert np.array_equal(np.asarray(r1.t)[m], np.asarray(r2.t)[m])
        diff = np.asarray(r1.tri) != np.asarray(r2.tri)
        assert np.all(np.asarray(r1.t)[diff] == np.asarray(r2.t)[diff])
        print("STREAM_SCENE_OK")
    """), cpu_mesh_env, timeout=900)
    assert "STREAM_SCENE_OK" in out
