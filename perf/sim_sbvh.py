"""Simulate SBVH (spatial splits, Stich et al. HPG 2009) vs the plain
binned-SAH tree: per-packet wide-node visits and MT block drains, exact
packet walk. MEASURED DEAD — see PERFORMANCE.md §12d.

Hypothesis: the colonnade's walls/floor/ceiling are a handful of
hall-sized triangles that any object partition must span, so sibling
bounds overlap nearly everywhere; spatial splits clip those references
(the classic SBVH win case). The builder below emits the same BVH layout
as accel.bvh except tri_order is a REFERENCE list (may repeat triangle
ids); build_wide_bvh consumes it unchanged and the walk resolves
duplicate references to identical (t, id) hits, so closest-hit results
are exact (asserted against the plain tree).

Result (both waves sorted into 128-ray packets):
  colonnade: visits +5-6%, blocks +2-4% WORSE (bounce waves); primary
    visits +6%, blocks flat. dup refs 4-7%.
  hay stress (30k long thin random tris, SBVH's textbook best case,
    `python perf/sim_sbvh.py hay`): visits +22%, blocks +33% WORSE at
    +100% refs.
Why: spatial splits optimize per-RAY SAH cost, but the packet kernel
traverses 128-ray UNIONS over fat (<=64-tri) leaves — every duplicated
reference is another block the union drains, while the tighter bounds
only pay when unions are small (coherent waves), where the plain SAH
bounds already suffice. Tree quality for this kernel ends at the 3-axis
binned SAH (PERFORMANCE.md "Tree quality").

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
       python perf/sim_sbvh.py [hay]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/perf")

from sim_union import feat_rows, sort_key  # noqa: E402

from platinum_tpu.accel.bvh import BVH  # noqa: E402

F = np.float32


_N_BINS = 16
# Spatial splits are only considered when the best object split's children
# overlap by more than this fraction of the root surface area (Stich's
# lambda/alpha criterion) — keeps the build fast on well-behaved geometry.
_ALPHA = 1e-5
# Reference budget: duplicated references may grow the leaf-slot total to
# at most this factor of the triangle count; once exhausted, nodes fall
# back to object splits.
_MAX_REF_FACTOR = 1.5


def _area(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    ext = np.maximum(hi - lo, 0.0)
    return (ext[..., 0] * ext[..., 1] + ext[..., 1] * ext[..., 2]
            + ext[..., 2] * ext[..., 0])


def _clip_aabb(tri: np.ndarray, axis: int, lo_p: float, hi_p: float):
    """AABB of a triangle clipped to the slab lo_p <= x[axis] <= hi_p.

    tri: (3, 3) vertices. Returns (lo, hi) float64 or None if the clipped
    polygon is empty. Sutherland-Hodgman against the two slab planes.
    """
    poly = [tri[0], tri[1], tri[2]]
    for plane, keep_ge in ((lo_p, True), (hi_p, False)):
        if not poly:
            return None
        out = []
        n = len(poly)
        for i in range(n):
            a, b = poly[i], poly[(i + 1) % n]
            da = a[axis] - plane
            db = b[axis] - plane
            ina = da >= 0 if keep_ge else da <= 0
            inb = db >= 0 if keep_ge else db <= 0
            if ina:
                out.append(a)
            if ina != inb:
                t = da / (da - db)
                out.append(a + t * (b - a))
        poly = out
    if not poly:
        return None
    p = np.asarray(poly)
    return p.min(axis=0), p.max(axis=0)


def build_sbvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
               max_leaf: int = 4, alpha: float = _ALPHA,
               max_ref_factor: float = _MAX_REF_FACTOR) -> BVH:
    """Binned-SAH BVH with spatial splits over triangles (T, 3) each.

    Returns a `BVH` whose tri_order is a REFERENCE list (may repeat ids);
    see module docstring for the consumption contract.
    """
    t = len(v0)
    tris = np.stack([v0, v1, v2], axis=1).astype(np.float64)  # (T, 3, 3)
    tlo = tris.min(axis=1)
    thi = tris.max(axis=1)

    root_lo = tlo.min(axis=0)
    root_hi = thi.max(axis=0)
    root_area = max(float(_area(root_lo, root_hi)), 1e-30)
    ref_budget = int(t * max_ref_factor) + 64

    n_lo, n_hi, n_left, n_right, n_items = [], [], [], [], []

    def add_node(lo_b, hi_b):
        n_lo.append(lo_b)
        n_hi.append(hi_b)
        n_left.append(-1)
        n_right.append(-1)
        n_items.append(None)
        return len(n_lo) - 1

    # A node's working set: (ids (n,), lo (n,3), hi (n,3)) per-REFERENCE
    root_ids = np.arange(t, dtype=np.int64)
    root = add_node(root_lo, root_hi)
    stack = [(root, root_ids, tlo.copy(), thi.copy())]
    total_refs = t

    def sweep_area(lo_b, hi_b):
        cl = np.minimum.accumulate(lo_b, axis=0)
        ch = np.maximum.accumulate(hi_b, axis=0)
        return _area(cl, ch)

    while stack:
        node, ids, rlo, rhi = stack.pop()
        n = len(ids)
        if n <= max_leaf:
            n_items[node] = (ids, rlo, rhi)
            continue

        cen = (rlo + rhi) * 0.5
        cmin = cen.min(axis=0)
        cmax = cen.max(axis=0)
        extent = cmax - cmin

        # ---------------- best OBJECT split (binned SAH, 3 axes) ----------
        best_obj_cost = np.inf
        obj_mask = None
        obj_overlap = -1.0
        for axis in range(3):
            if extent[axis] <= 1e-12:
                continue
            scale = _N_BINS * (1.0 - 1e-6) / extent[axis]
            bins = ((cen[:, axis] - cmin[axis]) * scale).astype(np.int32)
            bin_lo = np.full((_N_BINS, 3), np.inf)
            bin_hi = np.full((_N_BINS, 3), -np.inf)
            bin_n = np.zeros(_N_BINS, np.int64)
            np.minimum.at(bin_lo, bins, rlo)
            np.maximum.at(bin_hi, bins, rhi)
            np.add.at(bin_n, bins, 1)
            nl = np.cumsum(bin_n)
            al = sweep_area(bin_lo, bin_hi)
            nr = np.cumsum(bin_n[::-1])[::-1]
            ar = sweep_area(bin_lo[::-1], bin_hi[::-1])[::-1]
            cost = np.where((nl[:-1] > 0) & (nr[1:] > 0),
                            al[:-1] * nl[:-1] + ar[1:] * nr[1:], np.inf)
            b = int(np.argmin(cost))
            if np.isfinite(cost[b]) and cost[b] < best_obj_cost:
                best_obj_cost = float(cost[b])
                obj_mask = bins <= b
                # overlap of the two children's bounds (lambda criterion)
                llo = rlo[obj_mask].min(axis=0)
                lhi = rhi[obj_mask].max(axis=0)
                qlo = rlo[~obj_mask].min(axis=0)
                qhi = rhi[~obj_mask].max(axis=0)
                obj_overlap = float(_area(np.maximum(llo, qlo),
                                          np.minimum(lhi, qhi))
                                    if (np.minimum(lhi, qhi)
                                        > np.maximum(llo, qlo)).all() else 0.0)

        # ---------------- best SPATIAL split (chopped binning) ------------
        sp_axis, sp_plane, sp_cost = -1, 0.0, np.inf
        node_lo = np.asarray(n_lo[node])
        node_hi = np.asarray(n_hi[node])
        consider_spatial = (
            obj_mask is None
            or (obj_overlap / root_area > alpha and total_refs < ref_budget))
        if consider_spatial:
            for axis in range(3):
                w = node_hi[axis] - node_lo[axis]
                if w <= 1e-12:
                    continue
                scale = _N_BINS * (1.0 - 1e-6) / w
                entry = np.clip(((rlo[:, axis] - node_lo[axis]) * scale)
                                .astype(np.int32), 0, _N_BINS - 1)
                exit_ = np.clip(((rhi[:, axis] - node_lo[axis]) * scale)
                                .astype(np.int32), 0, _N_BINS - 1)
                bin_lo = np.full((_N_BINS, 3), np.inf)
                bin_hi = np.full((_N_BINS, 3), -np.inf)
                single = entry == exit_
                np.minimum.at(bin_lo, entry[single], rlo[single])
                np.maximum.at(bin_hi, entry[single], rhi[single])
                edges = node_lo[axis] + (np.arange(_N_BINS + 1) / scale)
                for ri in np.nonzero(~single)[0]:
                    tri = tris[ids[ri]]
                    for b in range(int(entry[ri]), int(exit_[ri]) + 1):
                        clip = _clip_aabb(tri, axis, edges[b], edges[b + 1])
                        if clip is None:
                            continue
                        clo = np.maximum(clip[0], rlo[ri])
                        chi = np.minimum(clip[1], rhi[ri])
                        if (clo > chi).any():
                            continue
                        bin_lo[b] = np.minimum(bin_lo[b], clo)
                        bin_hi[b] = np.maximum(bin_hi[b], chi)
                nl = np.cumsum(np.bincount(entry, minlength=_N_BINS))
                nr = np.cumsum(np.bincount(exit_, minlength=_N_BINS)[::-1])[::-1]
                al = sweep_area(bin_lo, bin_hi)
                ar = sweep_area(bin_lo[::-1], bin_hi[::-1])[::-1]
                cost = np.where((nl[:-1] > 0) & (nr[1:] > 0),
                                al[:-1] * nl[:-1] + ar[1:] * nr[1:], np.inf)
                b = int(np.argmin(cost))
                if np.isfinite(cost[b]) and cost[b] < sp_cost:
                    sp_cost = float(cost[b])
                    sp_axis = axis
                    sp_plane = float(edges[b + 1])

        # ---------------- choose and execute ------------------------------
        use_spatial = (sp_axis >= 0 and sp_cost < best_obj_cost
                       and total_refs < ref_budget)
        if use_spatial:
            left_of = rhi[:, sp_axis] <= sp_plane
            right_of = rlo[:, sp_axis] >= sp_plane
            strad = ~(left_of | right_of)
            sids = np.nonzero(strad)[0]
            if total_refs + len(sids) > ref_budget:
                use_spatial = False
            else:
                llo = [rlo[left_of]]
                lhi = [rhi[left_of]]
                lid = [ids[left_of]]
                qlo = [rlo[right_of]]
                qhi = [rhi[right_of]]
                qid = [ids[right_of]]
                for ri in sids:
                    tri = tris[ids[ri]]
                    cl = _clip_aabb(tri, sp_axis, -np.inf, sp_plane)
                    cr = _clip_aabb(tri, sp_axis, sp_plane, np.inf)
                    placed = False
                    if cl is not None:
                        a = np.maximum(cl[0], rlo[ri])
                        b_ = np.minimum(cl[1], rhi[ri])
                        if (a <= b_).all():
                            lid.append(ids[ri:ri + 1])
                            llo.append(a[None])
                            lhi.append(b_[None])
                            placed = True
                    if cr is not None:
                        a = np.maximum(cr[0], rlo[ri])
                        b_ = np.minimum(cr[1], rhi[ri])
                        if (a <= b_).all():
                            qid.append(ids[ri:ri + 1])
                            qlo.append(a[None])
                            qhi.append(b_[None])
                            placed = True
                    if not placed:   # degenerate clip: keep whole ref left
                        lid.append(ids[ri:ri + 1])
                        llo.append(rlo[ri][None])
                        lhi.append(rhi[ri][None])
                l_ids = np.concatenate(lid)
                l_lo = np.concatenate(llo)
                l_hi = np.concatenate(lhi)
                r_ids = np.concatenate(qid)
                r_lo = np.concatenate(qlo)
                r_hi = np.concatenate(qhi)
                if len(l_ids) == 0 or len(r_ids) == 0:
                    use_spatial = False
                else:
                    total_refs += len(l_ids) + len(r_ids) - n

        if not use_spatial:
            if obj_mask is None:
                widest = int(np.argmax(extent))
                order = np.argsort(cen[:, widest], kind="stable")
                half = n // 2
                m = np.zeros(n, bool)
                m[order[:half]] = True
                obj_mask = m
            l_ids, l_lo, l_hi = ids[obj_mask], rlo[obj_mask], rhi[obj_mask]
            r_ids, r_lo, r_hi = ids[~obj_mask], rlo[~obj_mask], rhi[~obj_mask]

        left = add_node(l_lo.min(axis=0), l_hi.max(axis=0))
        right = add_node(r_lo.min(axis=0), r_hi.max(axis=0))
        n_left[node] = left
        n_right[node] = right
        stack.append((right, r_ids, r_lo, r_hi))
        stack.append((left, l_ids, l_lo, l_hi))

    # ------------------------------------------------------------------
    # Flatten to DFS order with skip links (same layout as accel.bvh)
    # ------------------------------------------------------------------
    count = len(n_lo)
    bounds_lo = np.zeros((count, 3), F)
    bounds_hi = np.zeros((count, 3), F)
    skip = np.zeros(count, np.int32)
    tri_start = np.full(count, -1, np.int32)
    tri_count = np.zeros(count, np.int32)

    size = np.ones(count, np.int64)
    post = []
    walk = [root]
    while walk:
        nn = walk.pop()
        post.append(nn)
        if n_items[nn] is None:
            walk.append(n_left[nn])
            walk.append(n_right[nn])
    for nn in reversed(post):
        if n_items[nn] is None:
            size[nn] = 1 + size[n_left[nn]] + size[n_right[nn]]

    refs = []
    out_idx = 0
    cursor = 0
    walk = [root]
    while walk:
        nn = walk.pop()
        me = out_idx
        out_idx += 1
        bounds_lo[me] = n_lo[nn]
        bounds_hi[me] = n_hi[nn]
        skip[me] = me + size[nn]
        if n_items[nn] is not None:
            ids, _, _ = n_items[nn]
            tri_start[me] = cursor
            tri_count[me] = len(ids)
            refs.append(ids)
            cursor += len(ids)
        else:
            walk.append(n_right[nn])
            walk.append(n_left[nn])

    tri_order = (np.concatenate(refs) if refs
                 else np.zeros(0, np.int64)).astype(np.int64)
    assert cursor == len(tri_order)
    return BVH(bounds_lo, bounds_hi, skip, tri_start, tri_count, tri_order,
               max_leaf)


def validate_sbvh(bvh: BVH, v0, v1, v2) -> None:
    """Structural invariants for a reference-list (spatial-split) BVH."""
    n = bvh.num_nodes
    assert (bvh.skip > np.arange(n)).all() and (bvh.skip <= n).all()
    leaves = bvh.tri_count > 0
    assert bvh.tri_count[leaves].max() <= bvh.max_leaf
    assert bvh.tri_count.sum() == len(bvh.tri_order)
    # every triangle appears at least once
    assert len(np.unique(bvh.tri_order)) == max(len(v0), 1) or len(v0) == 0
    # leaf bounds contain a (clipped) part of each referenced triangle:
    # the reference box must at least intersect the triangle's AABB
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    for i in np.nonzero(leaves)[0][:64]:
        sel = bvh.tri_order[bvh.tri_start[i]: bvh.tri_start[i]
                            + bvh.tri_count[i]]
        assert (lo[sel] <= bvh.bounds_hi[i] + 1e-4).all()
        assert (hi[sel] >= bvh.bounds_lo[i] - 1e-4).all()


def walk_packet(nodes, meta, blocks, o, d, tmax, any_hit=False):
    """Shared-stack packet walk; returns (visits, blocks)."""
    R = len(o)
    best = np.full(R, tmax, np.float32)
    alive = np.ones(R, bool)
    tmin = np.float32(1e-3)
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d < 0, -1e-20, 1e-20), d)
    Ft = feat_rows(o, d)
    stack = [0]
    visits = 0
    nblocks = 0
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
        hit = (tn <= tf) & (tf >= tmin) & (tn <= best[None, :]) & alive[None]
        chit = hit.any(1) & (m != -1)
        for c in np.nonzero(chit)[0]:
            mc = m[c]
            if mc >= 0:
                stack.append(mc)
                continue
            val = -mc - 2
            b0, nb = val >> 5, val & 31
            nblocks += nb
            for b in range(b0, b0 + nb):
                out = Ft @ blocks[b]
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
                if any_hit:
                    alive &= ~ok.any(1)
        if any_hit and not alive.any():
            break
    return visits, nblocks, best


def main_hay():
    """SBVH's textbook best case: long thin randomly-oriented triangles.
    Even here the packet walk measures WORSE (visits +22%, blocks +33% at
    +100% refs) — see module docstring."""
    from platinum_tpu.accel.bvh import build_bvh
    from platinum_tpu.accel.wide import build_wide_bvh

    rng = np.random.default_rng(3)
    t_n = 30000
    a = rng.uniform(0, 10, (t_n, 3)).astype(np.float32)
    d = rng.normal(size=(t_n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    length = rng.uniform(1.0, 4.0, (t_n, 1)).astype(np.float32)
    w = rng.normal(size=(t_n, 3)).astype(np.float32)
    w = np.cross(d, w)
    w /= np.linalg.norm(w, axis=-1, keepdims=True) + 1e-9
    v0 = a
    v1 = a + d * length
    v2 = a + d * length * 0.5 + w * 0.02

    def widen(tree):
        order = tree.tri_order
        tg = np.zeros((len(order), 12), np.float32)
        tg[:, 0:3] = v0[order]
        tg[:, 3:6] = v1[order] - v0[order]
        tg[:, 6:9] = v2[order] - v0[order]
        return build_wide_bvh(tree, tg)

    t0 = time.perf_counter()
    plain = build_bvh(v0, v1, v2, 4)
    tp = time.perf_counter() - t0
    t0 = time.perf_counter()
    sb = build_sbvh(v0, v1, v2, 4, alpha=1e-5, max_ref_factor=2.0)
    ts = time.perf_counter() - t0
    validate_sbvh(sb, v0, v1, v2)
    wp, ws = widen(plain), widen(sb)
    print({"plain_build_s": round(tp, 1), "sbvh_build_s": round(ts, 1),
           "refs": len(sb.tri_order),
           "dup_pct": round(100 * (len(sb.tri_order) / t_n - 1), 1),
           "blocks": (len(wp.tri_blocks), len(ws.tri_blocks))}, flush=True)

    n = 64 * 128
    o = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    dd = rng.normal(size=(n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    key = sort_key(o, dd, np.zeros(3, np.float32),
                   np.full(3, 0.1, np.float32))
    order = np.argsort(key, kind="stable")
    so, sd = o[order], dd[order]
    ref_best = {}
    for name, w_ in [("plain", wp), ("sbvh", ws)]:
        vs, bs = [], []
        for pi in range(64):
            v, b, bt = walk_packet(w_.nodes, w_.meta, w_.tri_blocks,
                                   so[pi * 128:(pi + 1) * 128],
                                   sd[pi * 128:(pi + 1) * 128], 1e30)
            vs.append(v)
            bs.append(b)
            if name == "plain":
                ref_best[pi] = bt
            else:
                assert np.allclose(bt, ref_best[pi], rtol=1e-5,
                                   atol=1e-5), pi
        print({"tree": name, "visits": round(float(np.mean(vs)), 1),
               "blocks": round(float(np.mean(bs)), 1)}, flush=True)


def main():
    import jax.numpy as jnp
    from platinum_tpu.accel.bvh import build_bvh
    from platinum_tpu.accel.wide import build_wide_bvh
    from platinum_tpu.app.scenes import make_colonnade_scene
    from platinum_tpu.models.camera_rays import spawn_camera_rays
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    size = 512
    settings = RenderSettings(width=size, height=size, spp=1,
                              instancing="off")
    scene, cam = make_colonnade_scene()
    flat = flatten_scene(scene, cam, settings, accel_min_tris=1)
    geo = np.asarray(flat.geometry.positions)
    idx = np.asarray(flat.geometry.indices)
    tri_geo = np.asarray(flat.geometry.tri_geo)
    v0 = geo[idx[:, 0]]
    v1 = geo[idx[:, 1]]
    v2 = geo[idx[:, 2]]
    print(f"# tris={len(idx)}", flush=True)

    structs = {}
    t0 = time.perf_counter()
    plain = build_bvh(v0, v1, v2, max_leaf=4)
    t_plain = time.perf_counter() - t0
    wp = build_wide_bvh(plain, tri_geo[plain.tri_order])
    structs["plain"] = wp
    print({"tree": "plain", "build_s": round(t_plain, 2),
           "refs": len(plain.tri_order), "nodes": len(wp.nodes),
           "blocks": len(wp.tri_blocks),
           "vmem_mb": round(wp.vmem_bytes / 2**20, 1)}, flush=True)

    for alpha, factor in [(1e-5, 1.5), (1e-6, 2.0)]:
        t0 = time.perf_counter()
        sb = build_sbvh(v0, v1, v2, max_leaf=4, alpha=alpha,
                        max_ref_factor=factor)
        t_sb = time.perf_counter() - t0
        validate_sbvh(sb, v0, v1, v2)
        ws = build_wide_bvh(sb, tri_geo[sb.tri_order])
        name = f"sbvh_a{alpha:g}_f{factor:g}"
        structs[name] = ws
        print({"tree": name, "build_s": round(t_sb, 2),
               "refs": len(sb.tri_order),
               "dup_pct": round(100 * (len(sb.tri_order) / len(idx) - 1), 1),
               "nodes": len(ws.nodes), "blocks": len(ws.tri_blocks),
               "vmem_mb": round(ws.vmem_bytes / 2**20, 1)}, flush=True)

    # ---- ray waves (same generation as sim_packing) ----------------------
    n = size * size
    px = np.arange(n, dtype=np.uint32) % size
    py = np.arange(n, dtype=np.uint32) // size
    po, pd = spawn_camera_rays(flat.camera, jnp.asarray(px), jnp.asarray(py),
                               jnp.zeros((n, 2)) + 0.5,
                               jnp.zeros((n, 2)) + 0.5)
    po, pd = np.asarray(po), np.asarray(pd)

    rng = np.random.default_rng(1)
    tsel = rng.integers(0, len(idx), n)
    tv0 = geo[idx[tsel, 0]]
    e1 = geo[idx[tsel, 1]] - tv0
    e2 = geo[idx[tsel, 2]] - tv0
    r1, r2 = rng.uniform(0, 1, (2, n)).astype(np.float32)
    flip = r1 + r2 > 1
    r1 = np.where(flip, 1 - r1, r1)
    r2 = np.where(flip, 1 - r2, r2)
    org = (tv0 + r1[:, None] * e1 + r2[:, None] * e2).astype(np.float32)
    nrm = np.cross(e1, e2)
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
            + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-20
    org2 = org + nrm * 1e-3

    root = structs["plain"].nodes[0].reshape(16, 8)
    valid = root[:, 6] != -1.0
    lo = root[valid, 0:3].min(0)
    hi = root[valid, 3:6].max(0)
    inv_extent = 1.0 / np.clip(hi - lo, 1e-12, None)

    take = rng.choice(n // 128, size=64, replace=False)
    for label, (o_, d_) in [("primary", (po, pd)),
                            ("diffuse_bounce", (org2, dirs))]:
        key = sort_key(o_, d_, lo, inv_extent)
        order = np.argsort(key, kind="stable")
        so, sd = o_[order], d_[order]
        for name, w in structs.items():
            nodes = w.nodes
            meta = w.meta
            blocks = w.tri_blocks
            vs, bs = [], []
            bests = {}
            for pi in take:
                v, b, bt = walk_packet(nodes, meta, blocks,
                                       so[pi * 128:(pi + 1) * 128],
                                       sd[pi * 128:(pi + 1) * 128], 1e30)
                vs.append(v)
                bs.append(b)
                bests[pi] = bt
            if name == "plain":
                plain_best = bests
            else:
                # correctness: every tree must find the same closest t
                for pi, bt in bests.items():
                    mism = ~np.isclose(bt, plain_best[pi], rtol=1e-5,
                                       atol=1e-5)
                    assert mism.sum() == 0, (
                        name, pi, int(mism.sum()),
                        bt[mism][:4], plain_best[pi][mism][:4])
            print({"wave": label, "tree": name,
                   "visits": round(float(np.mean(vs)), 1),
                   "blocks": round(float(np.mean(bs)), 1)}, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "hay":
        main_hay()
    else:
        main()
