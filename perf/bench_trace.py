"""Raw traversal-kernel microbenchmark over (POPS, ORDERED) variants.

Times the Pallas packet tracer alone (no shading) on the Sponza-class
colonnade scene: coherent primary rays and a scrambled incoherent wave,
closest-hit and any-hit. Used to pick kernel tunables on real hardware —
every variant is a separate 2-8 min Mosaic compile, so runs are cached by
the persistent compilation cache.

Usage: python perf/bench_trace.py [variant ...]  (default: all)
       variant = "P,O" e.g. "1,0" "2,1"
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
from platinum_tpu.render.flatten import flatten_scene
from platinum_tpu.render.types import RenderSettings


def _timeit(fn, n_iters, repeats=3):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(n_iters):
            out = fn(i)
        float(np.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / n_iters
        best = dt if best is None else min(best, dt)
    return best


def main():
    variants = sys.argv[1:] or ["1,0", "1,1", "2,0", "2,1", "3,1"]
    # variant = "pops,ordered[,fscr[,packets[,fused_drain[,pipe[,drain]]]]]"
    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    n = size * size
    print(f"# colonnade: {int(flat.geometry.indices.shape[0])} tris,"
          f" {n} rays/wave", flush=True)

    # primary rays
    px = jnp.arange(n, dtype=jnp.uint32) % size
    py = jnp.arange(n, dtype=jnp.uint32) // size
    o, d = spawn_camera_rays(flat.camera, px, py,
                             jnp.zeros((n, 2)) + 0.5, jnp.zeros((n, 2)) + 0.5)
    # incoherent wave: scramble pixel order + random directions from hits
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    oi = jnp.asarray(np.asarray(o)[perm])
    di = np.asarray(d)[perm] + rng.normal(0, 0.35, (n, 3)).astype(np.float32)
    di = jnp.asarray(di / np.linalg.norm(di, axis=-1, keepdims=True))

    # realistic diffuse-bounce wave: origins on scene surfaces, cosine-
    # hemisphere directions (the synthetic scramble above is a point-source
    # wave and overstates incoherence; see perf/sim_union.py sortkeys2)
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
    bnrm /= np.linalg.norm(bnrm, -1, keepdims=True) + 1e-20
    u1, u2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t0v = np.where(np.abs(bnrm[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0])
    btx = np.cross(bnrm, t0v)
    btx /= np.linalg.norm(btx, -1, keepdims=True) + 1e-20
    bty = np.cross(bnrm, btx)
    bd = (btx * (rad * np.cos(phi))[:, None]
          + bty * (rad * np.sin(phi))[:, None]
          + bnrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(np.float32)
    bd /= np.linalg.norm(bd, -1, keepdims=True) + 1e-20
    ob = jnp.asarray(borg + bnrm * 1e-3)
    db = jnp.asarray(bd)

    for var in variants:
        parts = [int(x) for x in var.split(",")]
        pops, ordered = parts[0], parts[1]
        import platinum_tpu.ops.pallas_trace as pt
        pt.FEAT_SCRATCH = bool(parts[2]) if len(parts) > 2 else True
        packets = parts[3] if len(parts) > 3 else None
        pt.FUSED_DRAIN = bool(parts[4]) if len(parts) > 4 else True
        pipe = bool(parts[5]) if len(parts) > 5 else False
        drain = parts[6] if len(parts) > 6 else None
        profile = ({0: "none", 1: "empty", 2: "nomt", 3: "fix64",
                    4: "count"}[parts[7]]
                   if len(parts) > 7 else "none")
        fw = bool(parts[8]) if len(parts) > 8 else False
        oct_on = bool(parts[9]) if len(parts) > 9 else False
        worder = None
        if oct_on:
            from platinum_tpu.accel.wide import build_octant_orders
            worder = build_octant_orders(np.asarray(flat.wbvh_nodes))
        pt._build_call.cache_clear()
        tc, ta = make_packet_tracer(
            flat.wbvh_nodes, flat.wbvh_tris, flat.wbvh_meta, flat.wbvh_slot,
            pops=pops, ordered=bool(ordered), packets=packets,
            pipe=pipe, drain=drain, profile=profile, flat_walk=fw,
            worder=worder)
        jc = jax.jit(lambda o, d: tc(o, d, 1e-3, jnp.inf).t)
        ja = jax.jit(lambda o, d: ta(o, d, 1e-3, 60.0))
        t0 = time.perf_counter()
        jc(o, d).block_until_ready()
        compile_s = time.perf_counter() - t0
        res = {}
        res["primary"] = _timeit(lambda i: jc(o, d), 4)
        res["bounce"] = _timeit(lambda i: jc(ob, db), 4)
        res["incoher"] = _timeit(lambda i: jc(oi, di), 4)
        res["any_inc"] = _timeit(lambda i: ja(oi, di), 4)
        res["any_bnc"] = _timeit(lambda i: ja(ob, db), 4)
        line = {
            "pops": pops, "ordered": ordered, "fscr": int(pt.FEAT_SCRATCH),
            "pk": packets or pt.PACKETS, "fd": int(pt.FUSED_DRAIN),
            "pipe": int(pipe), "drain": drain or pt.PIPE_DRAIN,
            "prof": profile, "fw": int(fw), "oct": int(oct_on),
            "compile_s": round(compile_s, 1),
        }
        for k, v in res.items():
            line[k + "_ms"] = round(v * 1e3, 2)
            line[k + "_mrays"] = round(n / v / 1e6, 2)
        print(line, flush=True)


if __name__ == "__main__":
    main()
