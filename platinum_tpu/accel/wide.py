"""16-wide BVH for the Pallas packet-traversal kernel.

Collapses the binary SAH BVH (accel.bvh / accel.cpp) into a 16-ary tree
packed in a TPU-native layout:

  * one inner node  = one (128,) f32 row = 16 child slots x 8 floats
    [lo.x, lo.y, lo.z, hi.x, hi.y, hi.z, meta0, meta1]
  * one leaf row    = one (128,) f32 row = 8 triangle slots x 16 floats
    [v0.xyz, e1.xyz, e2.xyz, tri_id, pad x6]

Both rows are lane-dense (128 f32 = one full VPU register row), so the whole
structure lives in VMEM at ~4x the raw triangle footprint with zero padding
waste — the enabling property for gather-free traversal (see
ops/pallas_trace.py). meta0 is a *plain float* (not a bitcast): integers are
exact in f32 up to 2^24, and plain floats survive the MXU permutation
transpose the kernel uses to move lane-major records into sublane-major
compute layout (bitcast bit patterns would not: NaN canonicalisation /
denormal flushes corrupt them).

meta0 encoding:
  >= 0 : inner child — index of the child's own (128,) node row
  -1   : empty slot (bounds are +inf/-inf so it can never be hit)
  <= -2: leaf — val = -meta0 - 2 = first_row * 32 + n_rows

The reference gets this structure for free from Metal's hardware BVH
(renderer_pt.cpp:653-749); the collapse-from-binary approach follows the
standard wide-BVH literature (Ylitie et al. style greedy collapse by
surface area).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from platinum_tpu.accel.bvh import BVH

F = np.float32

# Width of an inner node (children per node) and a leaf row (tris per row)
WIDTH = 16
LEAF_ROW = 8
# Max triangles referenced by one leaf slot (n_rows <= 31 by encoding;
# keep small — big leaves trade stack pops for MT rounds)
DEFAULT_LEAF_CAP = 16

EMPTY_META = np.float32(-1.0)


@dataclass
class WideBVH:
    nodes: np.ndarray      # (N, 128) f32 — inner nodes, root is row 0
    tri_rows: np.ndarray   # (L, 128) f32 — leaf triangle rows
    n_tris: int            # original triangle count


def _leaf_meta(row_start: int, n_rows: int) -> float:
    val = row_start * 32 + n_rows
    assert n_rows < 32 and val < (1 << 24), (row_start, n_rows)
    return float(-(val + 2))


def build_wide_bvh(bvh: BVH, tri_geo: np.ndarray,
                   leaf_cap: int = DEFAULT_LEAF_CAP) -> WideBVH:
    """Collapse `bvh` (binary, DFS/skip layout) into the 16-wide packed form.

    `tri_geo` is the (T, >=9) f32 array of BVH-ordered triangles
    ([v0, e1, e2, ...] rows, the same ordering `bvh.tri_start` indexes).
    Returned tri_id floats index into this same ordering.
    """
    n = bvh.num_nodes
    skip = bvh.skip.astype(np.int64)
    tri_count = bvh.tri_count.astype(np.int64)
    is_leaf = tri_count > 0

    # Subtree triangle ranges: DFS order means subtree [i, skip[i]) holds the
    # contiguous triangle range [csum[i], csum[skip[i]]).
    csum = np.zeros(n + 1, np.int64)
    np.cumsum(tri_count, out=csum[1:])
    sub_start = csum[:n]
    sub_count = csum[skip] - sub_start

    ext = np.maximum(bvh.bounds_hi - bvh.bounds_lo, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]

    def left(i):
        return i + 1

    def right(i):
        return int(skip[i + 1])

    leaf_cap = min(int(leaf_cap), 31 * LEAF_ROW)

    # --- Collapse ---------------------------------------------------------
    node_slots: list[list] = []   # per wide node: list of (binary_idx,)
    wide_children: list[list] = []
    queue = []

    def new_wide(binary_idx: int) -> int:
        node_slots.append(None)
        queue.append((len(node_slots) - 1, binary_idx))
        return len(node_slots) - 1

    leaves: list[tuple[int, int]] = []   # (tri_start, tri_count) per fat leaf
    wide_rows: list[list] = []           # slot descriptors per wide node

    def is_fat_leaf(b: int) -> bool:
        return bool(is_leaf[b]) or sub_count[b] <= leaf_cap

    if is_fat_leaf(0):
        # Degenerate: whole scene is one leaf — single wide node, one slot.
        wide_rows.append([(0, "leaf", len(leaves))])
        leaves.append((int(sub_start[0]), int(sub_count[0])))
    else:
        new_wide(0)
        qi = 0
        while qi < len(queue):
            wid, b = queue[qi]
            qi += 1
            cluster = [left(b), right(b)]
            while len(cluster) < WIDTH:
                # expand the expandable element with the largest area
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

    # --- Pack leaf triangle rows -------------------------------------------
    leaf_row_start = np.zeros(len(leaves), np.int64)
    leaf_n_rows = np.zeros(len(leaves), np.int64)
    cursor = 0
    for li, (s, c) in enumerate(leaves):
        rows = (c + LEAF_ROW - 1) // LEAF_ROW
        leaf_row_start[li] = cursor
        leaf_n_rows[li] = rows
        cursor += rows
    total_rows = max(int(cursor), 1)

    # slot -> original (BVH-ordered) triangle index, -1 = padding
    slot_tri = np.full(total_rows * LEAF_ROW, -1, np.int64)
    for li, (s, c) in enumerate(leaves):
        base = leaf_row_start[li] * LEAF_ROW
        slot_tri[base : base + c] = np.arange(s, s + c)

    tg = np.asarray(tri_geo, F)
    t_rows = np.zeros((total_rows * LEAF_ROW, 16), F)
    valid = slot_tri >= 0
    sel = slot_tri[valid]
    t_rows[valid, 0:9] = tg[sel, 0:9]
    t_rows[:, 9] = -1.0
    t_rows[valid, 9] = sel.astype(F)
    tri_rows = t_rows.reshape(total_rows, 128)

    # --- Pack inner nodes ---------------------------------------------------
    n_wide = max(len(wide_rows), 1)
    nodes = np.zeros((n_wide, WIDTH, 8), F)
    nodes[:, :, 0:3] = 1e30    # empty slots: inverted bounds, never hit
    nodes[:, :, 3:6] = -1e30
    nodes[:, :, 6] = EMPTY_META
    for wid, slots in enumerate(wide_rows):
        for si, (b, kind, ref) in enumerate(slots):
            nodes[wid, si, 0:3] = bvh.bounds_lo[b]
            nodes[wid, si, 3:6] = bvh.bounds_hi[b]
            if kind == "inner":
                nodes[wid, si, 6] = float(ref)
            else:
                nodes[wid, si, 6] = _leaf_meta(
                    int(leaf_row_start[ref]), int(leaf_n_rows[ref])
                )
    return WideBVH(nodes.reshape(n_wide, 128), tri_rows, len(tg))


def validate_wide(w: WideBVH) -> None:
    """Structural invariants (tests)."""
    nodes = w.nodes.reshape(-1, WIDTH, 8)
    meta = nodes[:, :, 6]
    inner = meta >= 0
    assert (meta[inner] < len(w.nodes)).all()
    # every non-root inner node referenced exactly once
    refs = meta[inner].astype(np.int64)
    counts = np.bincount(refs, minlength=len(w.nodes))
    assert counts[0] == 0 and (counts[1:] == 1).all(), "tree must be a tree"
    # every tri id present exactly once among leaf rows
    tids = w.tri_rows.reshape(-1, 16)[:, 9]
    tids = tids[tids >= 0].astype(np.int64)
    assert len(np.unique(tids)) == len(tids) == w.n_tris
    leaf = meta <= -2
    vals = (-meta[leaf] - 2).astype(np.int64)
    rows, nrows = vals // 32, vals % 32
    assert ((rows + nrows) <= len(w.tri_rows)).all() and (nrows > 0).all()
