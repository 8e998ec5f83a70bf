"""BVH traversal (pure JAX, vectorized over rays).

Stackless skip-link walk of the DFS-ordered BVH from `platinum_tpu.accel.bvh`:
every active ray holds a node pointer; one loop step slab-tests the pointed
node (early-rejecting against the current best hit), intersects the leaf's
(≤ max_leaf) triangles with Möller-Trumbore, and advances the pointer —
ptr+1 into a hit inner node, skip[ptr] otherwise. All rays advance in
lockstep (lax.while_loop until every pointer passes the end); gathers pull
node AABBs and leaf triangles per lane.

This replaces Metal's hardware `intersector` (kernel.metal:244-251). The
brute-force tracer in ops.intersect is the oracle; tests require exact
agreement on closest hits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.ops.intersect import DET_EPS, INF, HitRecord
from platinum_tpu.render.types import FlatScene


def _slab_test(o, inv_d, lo, hi, tmin, tmax):
    """Ray-AABB slab test; o/inv_d (R,3), lo/hi (R,3)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tnear <= tfar) & (tfar >= tmin) & (tnear <= tmax)


def _mt_single(o, d, v0, e1, e2, tmin, tmax):
    """Möller-Trumbore for one triangle per ray; all (R, 3)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > DET_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > DET_EPS)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin) & (t < tmax)
    )
    return t, u, v, valid


def make_bvh_tracer(flat: FlatScene, max_leaf: int | None = None):
    """Build (trace_closest, trace_any) closures over the flat BVH arrays.
    Triangles must already be in BVH leaf order (flatten does the reorder)."""
    geom = flat.geometry
    idx = geom.indices
    p = geom.positions
    v0 = p[idx[:, 0]]
    e1 = p[idx[:, 1]] - v0
    e2 = p[idx[:, 2]] - v0
    # Pad by one so leaf gathers past the end stay in-bounds (masked anyway)
    pad = jnp.zeros((1, 3), v0.dtype)
    v0p = jnp.concatenate([v0, pad])
    e1p = jnp.concatenate([e1, pad])
    e2p = jnp.concatenate([e2, pad])

    lo, hi = flat.bvh_bounds_lo, flat.bvh_bounds_hi
    skip = flat.bvh_skip
    tri_start = flat.bvh_tri_start
    tri_count = flat.bvh_tri_count
    n_nodes = lo.shape[0]
    n_tris = v0.shape[0]
    leaf_k = int(max_leaf if max_leaf is not None else np.max(
        np.asarray(jax.device_get(tri_count))
    )) or 1

    def _walk(o, d, tmin, tmax, any_hit: bool):
        r = o.shape[0]
        tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
        tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

        state = dict(
            ptr=jnp.zeros((r,), jnp.int32),
            best_t=tmax,
            best_tri=jnp.full((r,), -1, jnp.int32),
            u=jnp.zeros((r,)),
            v=jnp.zeros((r,)),
        )

        def cond(s):
            active = s["ptr"] < n_nodes
            if any_hit:
                active = active & (s["best_tri"] < 0)
            return jnp.any(active)

        def body(s):
            ptr = jnp.minimum(s["ptr"], n_nodes - 1)
            in_tree = s["ptr"] < n_nodes
            done_early = any_hit & (s["best_tri"] >= 0)
            live = in_tree & ~done_early

            node_lo = lo[ptr]
            node_hi = hi[ptr]
            hit_box = _slab_test(o, inv_d, node_lo, node_hi, tmin, s["best_t"]) & live

            count = tri_count[ptr]
            is_leaf = count > 0
            base = tri_start[ptr]

            best_t = s["best_t"]
            best_tri = s["best_tri"]
            bu, bv = s["u"], s["v"]
            do_leaf = hit_box & is_leaf
            for k in range(leaf_k):
                tri = jnp.where(do_leaf & (k < count), base + k, n_tris)
                t, u_, v_, ok = _mt_single(
                    o, d, v0p[tri], e1p[tri], e2p[tri], tmin, best_t
                )
                ok = ok & do_leaf & (k < count)
                best_tri = jnp.where(ok, tri, best_tri)
                bu = jnp.where(ok, u_, bu)
                bv = jnp.where(ok, v_, bv)
                best_t = jnp.where(ok, t, best_t)

            descend = hit_box & ~is_leaf
            new_ptr = jnp.where(descend, ptr + 1, skip[ptr])
            new_ptr = jnp.where(live, new_ptr, s["ptr"])
            return dict(ptr=new_ptr, best_t=best_t, best_tri=best_tri, u=bu, v=bv)

        out = jax.lax.while_loop(cond, body, state)
        hit = out["best_tri"] >= 0
        return HitRecord(
            t=jnp.where(hit, out["best_t"], INF),
            tri=out["best_tri"],
            bary=jnp.stack([out["u"], out["v"]], -1),
            hit=hit,
        )

    def trace_closest(o, d, tmin, tmax) -> HitRecord:
        return _walk(o, d, tmin, tmax, any_hit=False)

    def trace_any(o, d, tmin, tmax) -> jnp.ndarray:
        return _walk(o, d, tmin, tmax, any_hit=True).hit

    return trace_closest, trace_any
