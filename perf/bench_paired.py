"""Co-scheduled mixed-wave kernel A/B (VERDICT r4 #2).

Times trace_closest(bounce wave) + trace_any(shadow wave) as two separate
kernel launches vs trace_paired (ONE launch, half the packets of each
grid step walking each wave) on the Sponza-class colonnade. Same-process
A/B: the tunnel drifts across sessions (PERFORMANCE.md).

Usage: python perf/bench_paired.py [iters]
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
        jax.tree_util.tree_map(
            lambda x: float(np.asarray(x).ravel()[0]), out)
        dt = (time.perf_counter() - t0) / n_iters
        best = dt if best is None else min(best, dt)
    return best


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    n = size * size
    print(f"# colonnade {int(flat.geometry.indices.shape[0])} tris, "
          f"{n} rays/wave", flush=True)

    tc, ta = make_packet_tracer(
        flat.wbvh_nodes, flat.wbvh_tris, flat.wbvh_meta, flat.wbvh_slot)

    px = jnp.arange(n, dtype=jnp.uint32) % size
    py = jnp.arange(n, dtype=jnp.uint32) // size
    o, d = spawn_camera_rays(flat.camera, px, py,
                             jnp.zeros((n, 2)) + 0.5, jnp.zeros((n, 2)) + 0.5)

    # realistic bounce wave (surface origins, cosine dirs) + matching
    # shadow wave toward the emissive panels — the per-bounce pair the
    # integrator would co-schedule
    rng = np.random.default_rng(0)
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
    t1 = np.cross(bnrm, np.where(np.abs(bnrm[:, 2:3]) < 0.9,
                                 [[0, 0, 1]], [[1, 0, 0]]))
    t1 /= np.maximum(np.linalg.norm(t1, axis=1, keepdims=True), 1e-20)
    t2 = np.cross(bnrm, t1)
    bdir = (rr * np.cos(ph))[:, None] * t1 + (rr * np.sin(ph))[:, None] * t2 \
        + np.sqrt(np.maximum(1 - u1, 0))[:, None] * bnrm
    bdir = (bdir / np.linalg.norm(bdir, axis=1, keepdims=True)).astype(
        np.float32)
    bo, bd = jnp.asarray(borg + 1e-4 * bnrm), jnp.asarray(bdir)

    # shadow targets: random emissive-panel-height points
    tgt = np.stack([rng.uniform(-20, 20, n), np.full(n, 7.9),
                    rng.uniform(-10, 10, n)], 1).astype(np.float32)
    sdir = tgt - borg
    sdist = np.linalg.norm(sdir, axis=1)
    sdir = (sdir / np.maximum(sdist[:, None], 1e-9)).astype(np.float32)
    so, sd = jnp.asarray(borg + 1e-4 * bnrm), jnp.asarray(sdir)
    smax = jnp.asarray(sdist - 1e-3)

    @jax.jit
    def separate(k):
        rec = tc(bo, bd + 0.0 * k, 1e-3, 1e30)
        occ = ta(so, sd, 1e-3, smax)
        return rec.t, occ

    @jax.jit
    def paired(k):
        rec, occ = tc.paired(bo, bd + 0.0 * k, 1e-3, 1e30,
                             so, sd, 1e-3, smax)
        return rec.t, occ

    print("# compiling separate...", flush=True)
    t_s, occ_s = separate(jnp.float32(0))
    print("# compiling paired...", flush=True)
    t_p, occ_p = paired(jnp.float32(0))
    same_t = bool(jnp.all((t_s == t_p) | (~jnp.isfinite(t_s)
                                          & ~jnp.isfinite(t_p))))
    same_o = bool(jnp.all(occ_s == occ_p))
    print(f"# equality: t={same_t} occ={same_o} "
          f"occ_frac={float(occ_p.mean()):.3f}", flush=True)

    dt_sep = _timeit(lambda i: separate(jnp.float32(i)), iters)
    dt_par = _timeit(lambda i: paired(jnp.float32(i)), iters)
    print({"separate_ms": round(dt_sep * 1e3, 1),
           "paired_ms": round(dt_par * 1e3, 1),
           "speedup": round(dt_sep / dt_par, 3)}, flush=True)


if __name__ == "__main__":
    main()
