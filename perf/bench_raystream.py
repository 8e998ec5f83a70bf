"""Ray-stream tracer vs packet tracer: on-chip wave-level A/B.

perf/sim_raystream.py's work counts said GO (~8-12x fewer 128-lane node
expansions / MT matmuls); this measures the real thing on the colonnade:
primary, realistic bounce, and any-hit shadow waves, 262k rays each,
equality-checked against the packet tracer. Same-process A/B.

Usage: python perf/bench_raystream.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from platinum_tpu.app.scenes import make_colonnade_scene
from platinum_tpu.models.camera_rays import spawn_camera_rays
from platinum_tpu.ops.pallas_trace import make_packet_tracer
from platinum_tpu.ops.raystream import make_stream_tracer
from platinum_tpu.render.flatten import flatten_scene
from platinum_tpu.render.types import RenderSettings


def _timeit(fn, n_iters, repeats=3):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(n_iters):
            out = fn(i)
        jax.tree_util.tree_map(
            lambda x: float(np.asarray(x).ravel()[0]), out)
        dt = (time.perf_counter() - t0) / n_iters
        best = dt if best is None else min(best, dt)
    return best


def bounce_wave(flat, n, rng):
    geo = np.asarray(flat.geometry.positions)
    idx = np.asarray(flat.geometry.indices)
    tsel = rng.integers(0, len(idx), n)
    bv0 = geo[idx[tsel, 0]]
    be1 = geo[idx[tsel, 1]] - bv0
    be2 = geo[idx[tsel, 2]] - bv0
    r1, r2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    fl = r1 + r2 > 1
    r1 = np.where(fl, 1 - r1, r1)
    r2 = np.where(fl, 1 - r2, r2)
    borg = (bv0 + r1[:, None] * be1 + r2[:, None] * be2).astype(np.float32)
    bnrm = np.cross(be1, be2)
    bnrm /= np.maximum(np.linalg.norm(bnrm, axis=1, keepdims=True), 1e-20)
    u1, u2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    rr = np.sqrt(u1)
    ph = 2 * np.pi * u2
    up = np.where(np.abs(bnrm[:, 2:3]) < 0.9, [[0.0, 0, 1]], [[1.0, 0, 0]])
    t1 = np.cross(bnrm, up)
    t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-20)
    t2 = np.cross(bnrm, t1)
    bdir = (rr * np.cos(ph))[:, None] * t1 \
        + (rr * np.sin(ph))[:, None] * t2 \
        + np.sqrt(np.maximum(1 - u1, 0))[:, None] * bnrm
    bdir /= np.maximum(np.linalg.norm(bdir, axis=1, keepdims=True), 1e-20)
    return (jnp.asarray(borg + 1e-4 * bnrm),
            jnp.asarray(bdir.astype(np.float32)))


def main():
    import os

    if os.environ.get("PLATINUM_TPU_RAYSTREAM_HW") != "1":
        print("# ray-stream tracer is reference-only on this backend: its "
              "wave-scale XLA scatter/argsort glue faults the axon TPU "
              "runtime (bisected: the Pallas MT kernel passes alone; the "
              "fault reproduces with the kernel in interpret mode). See "
              "PERFORMANCE.md round-4. Set PLATINUM_TPU_RAYSTREAM_HW=1 "
              "to run anyway.", flush=True)
        return
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    n = size * size
    print(f"# colonnade {int(flat.geometry.indices.shape[0])} tris, "
          f"{n} rays/wave", flush=True)

    args = (flat.wbvh_nodes, flat.wbvh_tris, flat.wbvh_meta, flat.wbvh_slot)
    tc, ta = make_packet_tracer(*args)
    sc, sa = make_stream_tracer(*args)

    px = jnp.arange(n, dtype=jnp.uint32) % size
    py = jnp.arange(n, dtype=jnp.uint32) // size
    o, d = spawn_camera_rays(flat.camera, px, py,
                             jnp.zeros((n, 2)) + 0.5, jnp.zeros((n, 2)) + 0.5)
    rng = np.random.default_rng(0)
    bo, bd = bounce_wave(flat, n, rng)

    # the representative wave only: each stream-tracer jit is a giant
    # XLA program (per-level sorts/scatters) with a multi-minute compile,
    # so the A/B sticks to the bounce wave the plateau analysis names
    waves = {
        "bounce": (bo, bd, 1e-3, 1e30),
    }
    for name, (wo, wd, t0_, t1_) in waves.items():
        pk = jax.jit(lambda k, wo=wo, wd=wd: tc(wo, wd + 0.0 * k, t0_, t1_).t)
        st = jax.jit(lambda k, wo=wo, wd=wd: sc(wo, wd + 0.0 * k, t0_, t1_).t)
        print(f"# compiling {name}...", flush=True)
        a = pk(jnp.float32(0))
        b = st(jnp.float32(0))
        fin = jnp.isfinite(a)
        eq = bool(jnp.all(jnp.where(fin, a == b, ~jnp.isfinite(b))))
        dt_pk = _timeit(lambda i: pk(jnp.float32(i)), iters)
        dt_st = _timeit(lambda i: st(jnp.float32(i)), iters)
        print({"wave": name, "t_equal": eq,
               "packet_ms": round(dt_pk * 1e3, 1),
               "stream_ms": round(dt_st * 1e3, 1),
               "speedup": round(dt_pk / dt_st, 2)}, flush=True)

    smax = jnp.full((n,), 9.0)
    pk = jax.jit(lambda k: ta(bo, bd + 0.0 * k, 1e-3, smax))
    st = jax.jit(lambda k: sa(bo, bd + 0.0 * k, 1e-3, smax))
    print("# compiling any-hit...", flush=True)
    a = pk(jnp.float32(0))
    b = st(jnp.float32(0))
    eq = bool(jnp.all(a == b))
    dt_pk = _timeit(lambda i: pk(jnp.float32(i)), iters)
    dt_st = _timeit(lambda i: st(jnp.float32(i)), iters)
    print({"wave": "any_hit", "occ_equal": eq,
           "occ_frac": round(float(jnp.mean(b)), 3),
           "packet_ms": round(dt_pk * 1e3, 1),
           "stream_ms": round(dt_st * 1e3, 1),
           "speedup": round(dt_pk / dt_st, 2)}, flush=True)


if __name__ == "__main__":
    main()
