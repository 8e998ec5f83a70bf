"""Branching-factor sweep for the wide BVH — the one structural dimension
the round-3 campaign never varied (WIDTH is pinned at 16 in accel/wide.py).

Rationale: the kernel is superstep-serialization bound (~5.6-8k cycles per
REAL superstep vs ~1.4k empty, PERFORMANCE.md §10), and supersteps scale
with per-packet node VISITS (pops). A wider tree trades visits (fewer,
because each visit tests more children) for per-visit vector work (more
child slab lanes) and scalar pushes (same total count) — exactly the right
trade when serialization, not arithmetic, is the bottleneck. A 32-wide node
is two (128,) rows; the kernel change is mechanical if the sim says yes.

This sim collapses the SAME binary SAH BVH at widths 8/16/32/64 and walks
identical sorted 128-ray packets (primary + realistic diffuse bounce),
reporting per-packet visits and leaf blocks. Leaf blocks should be ~width-
independent (same fat-leaf criterion); visits should fall with width but
sublinearly (greedy collapse runs out of large children to split).

Usage: JAX_PLATFORM_NAME=cpu python perf/sim_branch.py [n_packets_sampled]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from sim_union import feat_rows, sort_key  # noqa: E402

F = np.float32
BLOCK_TRIS = 64


def collapse(bvh, tri_geo, width, leaf_cap=64):
    """accel.wide.build_wide_bvh's collapse at arbitrary width.

    Returns (nodes (N, width, 8) f32, meta (N*width,) i32, blocks) —
    same meta encoding as the 16-wide build.
    """
    from platinum_tpu.accel.wide import pack_tri_blocks

    n = bvh.num_nodes
    skip = bvh.skip.astype(np.int64)
    tri_count = bvh.tri_count.astype(np.int64)
    is_leaf = tri_count > 0
    csum = np.zeros(n + 1, np.int64)
    np.cumsum(tri_count, out=csum[1:])
    sub_start = csum[:n]
    sub_count = csum[skip] - sub_start
    ext = np.maximum(bvh.bounds_hi - bvh.bounds_lo, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] \
        + ext[:, 2] * ext[:, 0]

    def left(i):
        return i + 1

    def right(i):
        return int(skip[i + 1])

    queue = []
    node_count = 0

    def new_wide(b):
        nonlocal node_count
        queue.append((node_count, b))
        node_count += 1
        return node_count - 1

    leaves = []
    wide_rows = []

    def is_fat_leaf(b):
        return bool(is_leaf[b]) or sub_count[b] <= leaf_cap

    if is_fat_leaf(0):
        wide_rows.append([(0, "leaf", len(leaves))])
        leaves.append((int(sub_start[0]), int(sub_count[0])))
    else:
        new_wide(0)
        qi = 0
        while qi < len(queue):
            wid, b = queue[qi]
            qi += 1
            cluster = [left(b), right(b)]
            while len(cluster) < width:
                cand, cand_area = -1, -1.0
                for k, e in enumerate(cluster):
                    if not is_fat_leaf(e) and area[e] > cand_area:
                        cand, cand_area = k, float(area[e])
                if cand < 0:
                    break
                e = cluster.pop(cand)
                cluster.extend((left(e), right(e)))
            slots = []
            for e in cluster:
                if is_fat_leaf(e):
                    slots.append((e, "leaf", len(leaves)))
                    leaves.append((int(sub_start[e]), int(sub_count[e])))
                else:
                    slots.append((e, "inner", new_wide(e)))
            wide_rows.append(slots)

    leaf_block_start = np.zeros(len(leaves), np.int64)
    leaf_n_blocks = np.zeros(len(leaves), np.int64)
    cursor = 0
    for li, (s, c) in enumerate(leaves):
        nb = (c + BLOCK_TRIS - 1) // BLOCK_TRIS
        leaf_block_start[li] = cursor
        leaf_n_blocks[li] = nb
        cursor += nb
    total_blocks = max(int(cursor), 1)
    slot_tri = np.full(total_blocks * BLOCK_TRIS, -1, np.int64)
    for li, (s, c) in enumerate(leaves):
        base = leaf_block_start[li] * BLOCK_TRIS
        slot_tri[base: base + c] = np.arange(s, s + c)
    tg = np.asarray(tri_geo, F)
    blocks = pack_tri_blocks(tg[:, 0:3], tg[:, 3:6], tg[:, 6:9], slot_tri)

    n_wide = max(len(wide_rows), 1)
    nodes = np.zeros((n_wide, width, 8), F)
    nodes[:, :, 0:3] = 1e30
    nodes[:, :, 3:6] = -1e30
    meta = np.full((n_wide, width), -1, np.int32)
    for wid, slots in enumerate(wide_rows):
        for si, (b, kind, ref) in enumerate(slots):
            nodes[wid, si, 0:3] = bvh.bounds_lo[b]
            nodes[wid, si, 3:6] = bvh.bounds_hi[b]
            if kind == "inner":
                meta[wid, si] = ref
            else:
                val = int(leaf_block_start[ref]) * 32 + int(leaf_n_blocks[ref])
                meta[wid, si] = -(val + 2)
    return nodes, meta.reshape(-1), blocks


def walk_packet_steps(nodes, meta, blocks, o, d, tmax, width, pops,
                      mtd=4):
    """Walk under the KERNEL's superstep discipline and count supersteps.

    Each superstep pops min(stack, pops) nodes, expands them, pushes hit
    children, then drains the whole leaf queue in ceil(q/mtd) drain
    back-edges. Returns (supersteps, visits, blocks, drain_backedges) —
    the serialization-bound cost drivers. Masked (empty) pops still cost
    the superstep's fixed machinery, which is exactly why raw visit
    counts over-promise for wide trees: what matters is how often the
    stack actually holds >= pops nodes."""
    best = np.full(len(o), tmax, np.float32)
    tmin = np.float32(1e-3)
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    Fr = feat_rows(o, d)
    stack = [0]
    supersteps = 0
    visits = 0
    nblocks = 0
    drain_edges = 0
    while stack:
        supersteps += 1
        q = 0
        for _ in range(min(len(stack), pops)):
            n = stack.pop()
            visits += 1
            rec = nodes[n]
            m = meta[n * width: (n + 1) * width]
            lo = rec[:, None, 0:3]
            hi = rec[:, None, 3:6]
            t0 = (lo - o[None]) * inv[None]
            t1 = (hi - o[None]) * inv[None]
            tn = np.minimum(t0, t1).max(-1)
            tf = np.maximum(t0, t1).min(-1)
            hit = (tn <= tf) & (tf >= tmin) & (tn <= best[None, :])
            chit = hit.any(1) & (m != -1)
            for c in np.nonzero(chit)[0]:
                mc = m[c]
                if mc >= 0:
                    stack.append(mc)
                else:
                    val = -mc - 2
                    b0, nb = val >> 5, val & 31
                    nblocks += nb
                    q += nb
                    for b in range(b0, b0 + nb):
                        out = Fr @ blocks[b]
                        det = out[:, 0:64]
                        s = np.where(det >= 0, 1.0, -1.0).astype(np.float32)
                        ad = det * s
                        us = out[:, 64:128] * s
                        vs = out[:, 128:192] * s
                        ts = out[:, 192:256] * s
                        ok = ((ad > 1e-12) & (us >= 0) & (vs >= 0)
                              & (us + vs <= ad) & (ts > tmin * ad)
                              & (ts < best[:, None] * ad))
                        t = np.where(ok, ts / np.maximum(ad, 1e-37), np.inf)
                        best = np.minimum(best, t.min(1)).astype(np.float32)
        drain_edges += -(-q // mtd)
    return supersteps, visits, nblocks, drain_edges


def walk_packet_w(nodes, meta, blocks, o, d, tmax, width):
    """sim_union.walk_packet at arbitrary node width."""
    best = np.full(len(o), tmax, np.float32)
    tmin = np.float32(1e-3)
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    Fr = feat_rows(o, d)
    stack = [0]
    visits = 0
    nblocks = 0
    while stack:
        n = stack.pop()
        visits += 1
        rec = nodes[n]
        m = meta[n * width: (n + 1) * width]
        lo = rec[:, None, 0:3]
        hi = rec[:, None, 3:6]
        t0 = (lo - o[None]) * inv[None]
        t1 = (hi - o[None]) * inv[None]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tn <= tf) & (tf >= tmin) & (tn <= best[None, :])
        chit = hit.any(1) & (m != -1)
        for c in np.nonzero(chit)[0]:
            mc = m[c]
            if mc >= 0:
                stack.append(mc)
            else:
                val = -mc - 2
                b0, nb = val >> 5, val & 31
                nblocks += nb
                for b in range(b0, b0 + nb):
                    out = Fr @ blocks[b]
                    det = out[:, 0:64]
                    s = np.where(det >= 0, 1.0, -1.0).astype(np.float32)
                    ad = det * s
                    us = out[:, 64:128] * s
                    vs = out[:, 128:192] * s
                    ts = out[:, 192:256] * s
                    ok = ((ad > 1e-12) & (us >= 0) & (vs >= 0)
                          & (us + vs <= ad) & (ts > tmin * ad)
                          & (ts < best[:, None] * ad))
                    t = np.where(ok, ts / np.maximum(ad, 1e-37), np.inf)
                    best = np.minimum(best, t.min(1)).astype(np.float32)
    return visits, nblocks


def main():
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    import jax.numpy as jnp
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.models.camera_rays import spawn_camera_rays
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings
    from platinum_tpu.accel import get_builder

    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    geo = np.asarray(flat.geometry.positions)
    idx = np.asarray(flat.geometry.indices)
    n = size * size

    # Rebuild the binary BVH over the flattened soup (same builder + the
    # already-BVH-ordered triangles, so the rebuild reproduces flatten's
    # tree); each width then collapses the SAME binary tree.
    v0 = geo[idx[:, 0]]
    bvh = get_builder()(v0, geo[idx[:, 1]], geo[idx[:, 2]], max_leaf=4)
    tri_geo = np.asarray(flat.geometry.tri_geo)[bvh.tri_order]

    px = np.arange(n, dtype=np.uint32) % size
    py = np.arange(n, dtype=np.uint32) // size
    po, pd = spawn_camera_rays(flat.camera, jnp.asarray(px), jnp.asarray(py),
                               jnp.zeros((n, 2)) + 0.5,
                               jnp.zeros((n, 2)) + 0.5)
    po, pd = np.asarray(po), np.asarray(pd)

    rng = np.random.default_rng(1)
    tsel = rng.integers(0, len(idx), n)
    tv0 = geo[idx[tsel, 0]]
    te1 = geo[idx[tsel, 1]] - tv0
    te2 = geo[idx[tsel, 2]] - tv0
    r1, r2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    flip = r1 + r2 > 1
    r1 = np.where(flip, 1 - r1, r1)
    r2 = np.where(flip, 1 - r2, r2)
    org = (tv0 + r1[:, None] * te1 + r2[:, None] * te2).astype(np.float32)
    nrm = np.cross(te1, te2)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-20
    u1, u2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t0_ = np.where(np.abs(nrm[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0])
    tx = np.cross(nrm, t0_)
    tx /= np.linalg.norm(tx, axis=-1, keepdims=True) + 1e-20
    ty = np.cross(nrm, tx)
    dirs = (tx * (rad * np.cos(phi))[:, None]
            + ty * (rad * np.sin(phi))[:, None]
            + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(F)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-20
    org = org + nrm * 1e-3

    lo = v0.min(0)
    hi = v0.max(0)
    inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)

    for width in (8, 16, 32, 64):
        t0 = time.time()
        nodes, meta, blocks = collapse(bvh, tri_geo, width)
        build_s = time.time() - t0
        out = {"width": width, "nodes": len(nodes),
               "node_kb": int(nodes.nbytes / 1024),
               "blocks": len(blocks), "build_s": round(build_s, 1)}
        for label, (o_, d_) in [("pri", (po, pd)), ("bounce", (org, dirs))]:
            key = sort_key(o_, d_, lo, inv_extent)
            order_ = np.argsort(key, kind="stable")
            so, sd = o_[order_], d_[order_]
            take = rng.choice(n // 128, size=min(n_sample, n // 128),
                              replace=False)
            vs, bs = [], []
            for pi in take:
                v, b = walk_packet_w(nodes, meta, blocks,
                                     so[pi * 128:(pi + 1) * 128],
                                     sd[pi * 128:(pi + 1) * 128],
                                     1e30, width)
                vs.append(v)
                bs.append(b)
            out[label + "_visits"] = round(float(np.mean(vs)), 1)
            out[label + "_blocks"] = round(float(np.mean(bs)), 1)
        print(out, flush=True)


if __name__ == "__main__":
    main()
