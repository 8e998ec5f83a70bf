"""Simulate node-group leaf-block packing for the wide BVH.

Today every fat leaf owns ceil(c/64) private MT blocks (fill measured
~64% on colonnade: mean leaf = 41 tris in a 64-slot block). This sim
asks: if each wide node's leaf children were first-fit packed into
SHARED blocks (leaf meta then points at a sub-range that may straddle a
block shared with a sibling), how many block drains does a packet save?
Duplicate drains of a shared boundary block within one node visit are
deduped (the kernel change is a one-scalar compare at enqueue time —
drains are idempotent, so dedup is purely a perf matter).

Counting uses the REAL traversal (hits/best-t from the current private
blocks); only the block accounting is remapped, so the numbers answer
the sizing question without building the packed structure.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
       python perf/sim_packing.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from sim_union import feat_rows, sort_key  # noqa: E402


def build_packing(nodes, meta, blocks, aligned=True):
    """First-fit pack each wide node's leaf children into shared blocks.

    Returns {leaf_b0: (packed_start_slot, n_tris)} plus total packed
    block count. Packing is per node (leaf groups of different nodes
    never share blocks), children in slot order. With `aligned`, a child
    is placed at the cursor unless it would straddle MORE blocks than
    its private ceil(c/64) — then it skips to the next block boundary
    (so a lone visit never costs more blocks than today). With
    `aligned=False` children pack back-to-back (max VMEM saving; lone
    visits may straddle one extra block).
    """
    n = len(nodes)
    colnorm = np.abs(blocks).sum(axis=1)           # (B, 256)
    valid_slot = colnorm[:, 0:64] > 0
    leaf_tris = {}                                  # b0 -> tri count
    mapping = {}
    cursor = 0
    for wid in range(n):
        m = meta[wid * 16:(wid + 1) * 16]
        group = []
        for mc in m:
            if mc <= -2:
                val = -mc - 2
                b0, nb = val >> 5, val & 31
                c = int(valid_slot[b0:b0 + nb].sum())
                leaf_tris[b0] = c
                group.append((b0, c))
        if not group:
            continue
        # first-fit in slot order within this node's group
        start = cursor
        for b0, c in group:
            span_now = (cursor % 64 + c + 63) // 64 if c else 1
            span_aligned = (c + 63) // 64
            if aligned and cursor % 64 and span_now > span_aligned:
                cursor += 64 - cursor % 64       # skip to boundary
            mapping[b0] = (cursor, c)
            cursor += c
        if cursor % 64:
            cursor += 64 - cursor % 64           # group padding
    return mapping, cursor // 64


def walk_packet_pack(nodes, meta, blocks, mapping, o, d, tmax):
    """Real shared-stack walk; counts (visits, private_blocks,
    packed_blocks_deduped)."""
    R = len(o)
    best = np.full(R, tmax, np.float32)
    tmin = np.float32(1e-3)
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    F = feat_rows(o, d)
    stack = [0]
    visits = 0
    nblocks = 0
    npacked = 0
    while stack:
        nid = stack.pop()
        visits += 1
        rec = nodes[nid].reshape(16, 8)
        m = meta[nid * 16: nid * 16 + 16]
        lo = rec[:, None, 0:3]
        hi = rec[:, None, 3:6]
        t0 = (lo - o[None]) * inv[None]
        t1 = (hi - o[None]) * inv[None]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tn <= tf) & (tf >= tmin) & (tn <= best[None, :])
        chit = hit.any(1) & (m != -1)
        node_pb = set()
        for c in np.nonzero(chit)[0]:
            mc = m[c]
            if mc >= 0:
                stack.append(mc)
                continue
            val = -mc - 2
            b0, nb = val >> 5, val & 31
            nblocks += nb
            ps, cnt = mapping[b0]
            if cnt:
                node_pb.update(range(ps // 64, (ps + cnt - 1) // 64 + 1))
            for b in range(b0, b0 + nb):
                out = F @ blocks[b]
                det = out[:, 0:64]
                s = np.where(det >= 0, 1.0, -1.0).astype(np.float32)
                ad = det * s
                us, vs, ts = out[:, 64:128] * s, out[:, 128:192] * s, \
                    out[:, 192:256] * s
                ok = ((ad > 1e-12) & (us >= 0) & (vs >= 0)
                      & (us + vs <= ad) & (ts > tmin * ad)
                      & (ts < best[:, None] * ad))
                t = np.where(ok, ts / np.maximum(ad, 1e-37), np.inf)
                best = np.minimum(best, t.min(1)).astype(np.float32)
        npacked += len(node_pb)
    return visits, nblocks, npacked


def main():
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
    mappings = {}
    for name, aligned in [("aligned", True), ("contig", False)]:
        mapping, packed_total = build_packing(nodes, meta, blocks, aligned)
        mappings[name] = mapping
        print({"pack": name, "blocks_private": len(blocks),
               "blocks_packed": packed_total,
               "vmem_saving_pct": round(
                   100 * (1 - packed_total / len(blocks)), 1)})

    geo = np.asarray(flat.geometry.positions)
    idx = np.asarray(flat.geometry.indices)
    n = size * size
    px = np.arange(n, dtype=np.uint32) % size
    py = np.arange(n, dtype=np.uint32) // size
    po, pd = spawn_camera_rays(flat.camera, jnp.asarray(px), jnp.asarray(py),
                               jnp.zeros((n, 2)) + 0.5, jnp.zeros((n, 2)) + 0.5)
    po, pd = np.asarray(po), np.asarray(pd)

    rng = np.random.default_rng(1)
    tsel = rng.integers(0, len(idx), n)
    v0 = geo[idx[tsel, 0]]
    e1 = geo[idx[tsel, 1]] - v0
    e2 = geo[idx[tsel, 2]] - v0
    r1, r2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    flip = r1 + r2 > 1
    r1 = np.where(flip, 1 - r1, r1)
    r2 = np.where(flip, 1 - r2, r2)
    org = (v0 + r1[:, None] * e1 + r2[:, None] * e2).astype(np.float32)
    nrm = np.cross(e1, e2)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-20
    u1, u2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t0 = np.where(np.abs(nrm[:, 0:1]) < 0.9, [1.0, 0, 0], [0, 1.0, 0])
    tx = np.cross(nrm, t0)
    tx /= np.linalg.norm(tx, axis=-1, keepdims=True) + 1e-20
    ty = np.cross(nrm, tx)
    dirs = (tx * (rad * np.cos(phi))[:, None]
            + ty * (rad * np.sin(phi))[:, None]
            + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-20
    org2 = org + nrm * 1e-3

    root = nodes[0].reshape(16, 8)
    valid = root[:, 6] != -1.0
    lo = root[valid, 0:3].min(0)
    hi = root[valid, 3:6].max(0)
    inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)

    for label, (o_, d_) in [("primary", (po, pd)),
                            ("diffuse_bounce", (org2, dirs))]:
        key = sort_key(o_, d_, lo, inv_extent)
        order = np.argsort(key, kind="stable")
        so, sd = o_[order], d_[order]
        take = rng.choice(n // 128, size=64, replace=False)
        for name, mapping in mappings.items():
            vs, bs, ps = [], [], []
            for pi in take:
                v, b, p = walk_packet_pack(nodes, meta, blocks, mapping,
                                           so[pi * 128:(pi + 1) * 128],
                                           sd[pi * 128:(pi + 1) * 128], 1e30)
                vs.append(v)
                bs.append(b)
                ps.append(p)
            print({"wave": label, "pack": name,
                   "visits": round(np.mean(vs), 1),
                   "blocks_private": round(np.mean(bs), 1),
                   "blocks_packed": round(np.mean(ps), 1),
                   "block_saving_pct": round(
                       100 * (1 - np.mean(ps) / np.mean(bs)), 1)}, flush=True)


if __name__ == "__main__":
    main()
