"""BF-vs-packet traversal A/B on the colonnade (VERDICT r4 #1 done-rule).

Same-process comparison of ops/bfstream.py (all-Pallas breadth-first
pipeline) against ops/pallas_trace.py (the production packet kernel) on
the headline wave set: coherent primary rays, a realistic diffuse-bounce
wave, a scrambled incoherent wave, and the any-hit variants — the exact
waves perf/bench_trace.py and perf/sim_raystream.py use. Also verifies
equality (hits + exact t) on every wave before timing.

Usage: python perf/bench_bf.py [n_rays] [seg_rays]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from platinum_tpu.app.scenes import make_colonnade_scene
from platinum_tpu.models.camera_rays import spawn_camera_rays
from platinum_tpu.ops.bfstream import make_bf_tracer
from platinum_tpu.ops.pallas_trace import make_packet_tracer
from platinum_tpu.render.flatten import flatten_scene
from platinum_tpu.render.types import RenderSettings


def _timeit(fn, n_iters=4, repeats=3):
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


def make_waves(flat, n, size, seed=0):
    px = jnp.arange(n, dtype=jnp.uint32) % size
    py = jnp.arange(n, dtype=jnp.uint32) // size
    o, d = spawn_camera_rays(flat.camera, px, py,
                             jnp.zeros((n, 2)) + 0.5,
                             jnp.zeros((n, 2)) + 0.5)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    oi = jnp.asarray(np.asarray(o)[perm])
    di = np.asarray(d)[perm] + rng.normal(0, 0.35, (n, 3)).astype(np.float32)
    di = jnp.asarray(di / np.linalg.norm(di, axis=-1, keepdims=True))

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
    bnrm /= np.linalg.norm(bnrm, axis=-1, keepdims=True) + 1e-20
    u1, u2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t0v = np.where(np.abs(bnrm[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0])
    btx = np.cross(bnrm, t0v)
    btx /= np.linalg.norm(btx, axis=-1, keepdims=True) + 1e-20
    bty = np.cross(bnrm, btx)
    bd = (btx * (rad * np.cos(phi))[:, None]
          + bty * (rad * np.sin(phi))[:, None]
          + bnrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]
          ).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True) + 1e-20
    ob = jnp.asarray(borg + bnrm * 1e-3)
    db = jnp.asarray(bd)
    return dict(primary=(o, d), bounce=(ob, db), incoher=(oi, di))


def check_equal(name, rp, rs):
    hp, hs = np.asarray(rp.hit), np.asarray(rs.hit)
    assert np.array_equal(hp, hs), (name, int(hp.sum()), int(hs.sum()))
    tp, ts = np.asarray(rp.t), np.asarray(rs.t)
    # the two kernels compute the MT feature cross-products in separate
    # Mosaic compilations; FMA contraction differs by ~1 ulp, so t agrees
    # to fp-fusion noise (bitwise in interpret mode — tests/test_bfstream)
    rel = np.abs(tp[hp] - ts[hp]) / np.maximum(np.abs(tp[hp]), 1e-6)
    assert rel.max() < 1e-5, (name, float(rel.max()))
    exact = float(np.mean(tp[hp] == ts[hp]))
    print(f"# {name}: equality OK ({int(hp.sum())} hits, "
          f"{exact:.4f} bit-exact, rel<=1e-5)", flush=True)


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    seg = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    size = int(np.sqrt(n_rays))
    n = size * size
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    print(f"# colonnade: {int(flat.geometry.indices.shape[0])} tris, "
          f"{n} rays/wave, seg={seg}", flush=True)

    waves = make_waves(flat, n, size)
    args = (flat.wbvh_nodes, flat.wbvh_tris, flat.wbvh_meta, flat.wbvh_slot)
    pc, pa = make_packet_tracer(*args)
    bc, ba = make_bf_tracer(*args, seg_rays=seg)

    jpc = jax.jit(lambda o, d: pc(o, d, 1e-3, jnp.inf).t)
    jpa = jax.jit(lambda o, d: pa(o, d, 1e-3, 60.0))
    jbc = jax.jit(lambda o, d: bc(o, d, 1e-3, 1e30).t)
    jba = jax.jit(lambda o, d: ba(o, d, 1e-3, 60.0))

    # full-record jits for the equality check (+ overflow surfaced)
    fpc = jax.jit(lambda o, d: pc(o, d, 1e-3, 1e30))

    def fbc_overflow(o, d):
        rec, ovf = bc.with_overflow(o, d, 1e-3, 1e30, None)
        return rec, ovf

    fbc_o = jax.jit(fbc_overflow)

    def fbc(o, d):
        rec, ovf = fbc_o(o, d)
        ov = int(ovf)
        if ov:
            print(f"# WARNING: bf overflow {ov} pairs dropped", flush=True)
        return rec

    t0 = time.perf_counter()
    jbc(*waves["primary"]).block_until_ready()
    print(f"# bf compile: {time.perf_counter() - t0:.1f}s", flush=True)

    for wname in ("primary", "bounce"):
        o, d = waves[wname]
        check_equal(wname, fpc(o, d), fbc(o, d))
    for wname in ("bounce",):
        o, d = waves[wname]
        occ_p = np.asarray(jpa(o, d))
        occ_b = np.asarray(jba(o, d))
        assert np.array_equal(occ_p, occ_b), "any-hit mismatch"
        print(f"# any-hit {wname}: equality OK ({int(occ_p.sum())} occl)",
              flush=True)

    out = {}
    for wname in ("primary", "bounce", "incoher"):
        o, d = waves[wname]
        pk = _timeit(lambda i: jpc(o, d))
        bf = _timeit(lambda i: jbc(o, d))
        out[wname] = dict(packet_ms=round(pk * 1e3, 1),
                          bf_ms=round(bf * 1e3, 1),
                          speedup=round(pk / bf, 3))
        print(json.dumps({wname: out[wname]}), flush=True)
    for wname in ("bounce", "incoher"):
        o, d = waves[wname]
        pk = _timeit(lambda i: jpa(o, d))
        bf = _timeit(lambda i: jba(o, d))
        out["any_" + wname] = dict(packet_ms=round(pk * 1e3, 1),
                                   bf_ms=round(bf * 1e3, 1),
                                   speedup=round(pk / bf, 3))
        print(json.dumps({"any_" + wname: out["any_" + wname]}),
              flush=True)
    print("@BF_AB " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
