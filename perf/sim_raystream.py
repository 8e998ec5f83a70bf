"""Breadth-first ray-STREAM traversal: go/no-go simulation (VERDICT r4 #3).

The packet kernel's plateau is per-superstep serialization (~5.6-8k cycles
x ~20-40 supersteps per packet walk, PERFORMANCE.md §10). The candidate
alternative PERFORMANCE.md itself names: LEVEL-SYNCHRONOUS ray-stream
traversal — the whole wave advances one BVH level per phase as dense
batched ops (no per-packet stacks, no scalar walks):

  level L: pairs = (ray, node) worklist
           -> slab-test each pair's 16 children            [dense vector]
           -> inner survivors become level L+1 pairs        [compact]
           -> leaf survivors re-packed BY BLOCK and MT'd    [MXU, 128-fill]
           -> best-t updated before level L+1               [segment min]

It trades the superstep chain for bandwidth + sort/compact volume —
exactly the trade the chip prefers IF the work counts cooperate.

This sim walks the REAL wide BVH (colonnade) with the REAL MT blocks and
reports, per wave type (sorted primary / realistic bounce):

  - per-level pair counts, distinct nodes, VIRTUAL VISITS
    (sum ceil(rays_at_node / 128) — the 128-lane node-expansion count a
    node-major dense implementation pays) and their lane fill,
  - leaf-stage VIRTUAL BLOCKS (sum ceil(rays_at_block / 128)) and fill,
  - total sort/compact volume (elements argsorted per wave),

and compares against the packet kernel's measured-walk counts on the SAME
wave (sim_union.walk_packet): the kernel pays `visits` 128-lane expansions
+ `blocks` MT matmuls per 128-ray packet. Decision rule per VERDICT: only
implement the kernel if virtual work is >= 2x better after charging the
sort volume at the measured argsort+gather rate (~3 ms per 262k-lane
wave, PERFORMANCE.md §13/"other measured costs").

Caveat modeled honestly: BF best-t updates only between levels, so
culling is weaker than the depth-first packet walk's in-superstep best-t;
the per-level counts below INCLUDE that effect (the walk uses only
prior-level hits for culling).

Usage: JAX_PLATFORM_NAME=cpu python perf/sim_raystream.py [n_rays]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from sim_union import feat_rows, sort_key, walk_packet  # noqa: E402

LANES = 128


def bf_walk(nodes, meta, blocks, o, d, tmax=1e30, tmin=1e-3):
    """Level-synchronous breadth-first walk of the whole wave.

    Returns (per_level rows, totals dict). Exact slab tests and MT using
    the kernel's arrays; best-t advances between levels only.
    """
    R = len(o)
    best = np.full(R, tmax, np.float32)
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    F = feat_rows(o, d)

    pr = np.arange(R, dtype=np.int64)          # pair ray ids
    pn = np.zeros(R, dtype=np.int64)           # pair node ids (root)
    levels = []
    tot = dict(pairs=0, vvisits=0, vblocks=0, leaf_pairs=0, sort_elems=0)
    lvl = 0
    while len(pr):
        rec = nodes[pn].reshape(-1, 16, 8)     # (P, 16, 8)
        m16 = meta[(pn[:, None] * 16
                    + np.arange(16)[None, :]).reshape(-1)].reshape(-1, 16)
        lo = rec[:, :, 0:3]
        hi = rec[:, :, 3:6]
        t0 = (lo - o[pr, None, :]) * inv[pr, None, :]
        t1 = (hi - o[pr, None, :]) * inv[pr, None, :]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tn <= tf) & (tf >= tmin) & (tn <= best[pr, None]) \
            & (m16 != -1)

        pair_i, child_i = np.nonzero(hit)
        mc = m16[pair_i, child_i]
        inner = mc >= 0

        # distinct-node stats for THIS level's expansions (node-major
        # dense impl: each distinct node serves its rays in 128-lane
        # chunks)
        uniq, counts = np.unique(pn, return_counts=True)
        vvis = int(np.ceil(counts / LANES).sum())
        levels.append(dict(
            level=lvl, pairs=len(pr), nodes=len(uniq), vvisits=vvis,
            fill=round(len(pr) / (vvis * LANES), 3)))
        tot["pairs"] += len(pr)
        tot["vvisits"] += vvis
        tot["sort_elems"] += len(pr)           # node-major grouping sort

        # ---- leaf stage: re-pack by MT block, intersect, update best-t
        lmc = mc[~inner]
        lray = pr[pair_i[~inner]]
        val = (-lmc - 2).astype(np.int64)
        b0 = val >> 5
        nb = val & 31
        # expand leaf children into (ray, block) pairs
        reps = nb
        bray = np.repeat(lray, reps)
        boff = np.concatenate([np.arange(k) for k in reps]) if len(reps) \
            else np.zeros(0, np.int64)
        bblk = np.repeat(b0, reps) + boff
        tot["leaf_pairs"] += len(bray)
        tot["sort_elems"] += len(bray)         # block-major grouping sort
        if len(bray):
            order = np.argsort(bblk, kind="stable")
            bray, bblk = bray[order], bblk[order]
            ub, cb = np.unique(bblk, return_counts=True)
            tot["vblocks"] += int(np.ceil(cb / LANES).sum())
            # exact MT per distinct block (vectorized over its rays)
            starts = np.concatenate([[0], np.cumsum(cb)])
            for bi, blk in enumerate(ub):
                rays = bray[starts[bi]:starts[bi + 1]]
                out = F[rays] @ blocks[blk]     # (r, 256)
                det = out[:, 0:64]
                s = np.where(det >= 0, 1.0, -1.0).astype(np.float32)
                ad = det * s
                us = out[:, 64:128] * s
                vs = out[:, 128:192] * s
                ts = out[:, 192:256] * s
                ok = ((ad > 1e-12) & (us >= 0) & (vs >= 0)
                      & (us + vs <= ad) & (ts > tmin * ad)
                      & (ts < best[rays, None] * ad))
                t = np.where(ok, ts / np.maximum(ad, 1e-37), np.inf)
                np.minimum.at(best, rays, t.min(1).astype(np.float32))

        # ---- next level: inner pairs survive (culled by the UPDATED
        # best only at the NEXT level's slab test — the BF handicap)
        pr = pr[pair_i[inner]]
        pn = mc[inner]
        lvl += 1
    return levels, tot, best


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 64 * 1024
    import jax.numpy as jnp
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.models.camera_rays import spawn_camera_rays
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    nodes = np.asarray(flat.wbvh_nodes)
    meta = np.asarray(flat.wbvh_meta)
    blocks = np.asarray(flat.wbvh_tris)

    n = size * size
    px = np.arange(n, dtype=np.uint32) % size
    py = np.arange(n, dtype=np.uint32) // size
    o, d = spawn_camera_rays(flat.camera, jnp.asarray(px), jnp.asarray(py),
                             jnp.zeros((n, 2)) + 0.5, jnp.zeros((n, 2)) + 0.5)
    o, d = np.asarray(o), np.asarray(d)

    root = nodes[0].reshape(16, 8)
    valid = root[:, 6] != -1.0
    lo = root[valid, 0:3].min(0)
    hi = root[valid, 3:6].max(0)
    inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)

    # realistic bounce wave: surface origins + cosine-hemisphere dirs
    # (sim_union sortkeys2 recipe): trace primaries first for origins
    rng = np.random.default_rng(0)
    sub = rng.choice(n, size=n_rays, replace=False)
    o_p, d_p = o[sub], d[sub]
    _, _, best_p = bf_walk(nodes, meta, blocks, o_p, d_p)
    hit = np.isfinite(best_p) & (best_p < 1e29)
    surf = o_p[hit] + best_p[hit, None] * d_p[hit]
    k = len(surf)
    u1, u2 = rng.random(k), rng.random(k)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    local = np.stack([r * np.cos(phi), r * np.sin(phi),
                      np.sqrt(np.maximum(1 - u1, 0))], 1)
    up = rng.normal(size=(k, 3))
    up /= np.linalg.norm(up, axis=1, keepdims=True)
    d_b = local  # direction distribution only; frame alignment irrelevant
    d_b = d_b / np.linalg.norm(d_b, axis=1, keepdims=True)
    o_b = surf

    for label, (ro, rd) in [("primary", (o_p, d_p)),
                            ("bounce", (o_b, d_b))]:
        R = len(ro)
        key = sort_key(ro, rd, lo, inv_extent)
        order = np.argsort(key, kind="stable")
        so, sd = ro[order], rd[order]

        t0 = time.time()
        levels, tot, _ = bf_walk(nodes, meta, blocks, so, sd)
        bf_s = time.time() - t0

        # packet-kernel counts on the same sorted wave
        npk = R // LANES
        take = rng.choice(npk, size=min(48, npk), replace=False)
        vs, bs = [], []
        for pi in take:
            v, b = walk_packet(nodes, meta, blocks,
                               so[pi * LANES:(pi + 1) * LANES],
                               sd[pi * LANES:(pi + 1) * LANES], 1e30)
            vs.append(v)
            bs.append(b)
        pk_visits = np.mean(vs) * npk
        pk_blocks = np.mean(bs) * npk

        print(f"## {label} wave, {R} rays (sim {bf_s:.0f}s)")
        for row in levels:
            print("  ", row)
        # measured cost model: argsort+gather ~3 ms per 262k elements
        sort_ms = tot["sort_elems"] / 262144 * 3.0
        print({
            "bf_vvisits": tot["vvisits"], "bf_vblocks": tot["vblocks"],
            "bf_pairs": tot["pairs"], "bf_leaf_pairs": tot["leaf_pairs"],
            "bf_sort_elems": tot["sort_elems"],
            "bf_sort_ms_est": round(sort_ms, 2),
            "pk_visits": int(pk_visits), "pk_blocks": int(pk_blocks),
            "visit_ratio_pk_over_bf": round(pk_visits / max(tot["vvisits"],
                                                            1), 2),
            "block_ratio_pk_over_bf": round(pk_blocks / max(tot["vblocks"],
                                                            1), 2),
        }, flush=True)


if __name__ == "__main__":
    main()
