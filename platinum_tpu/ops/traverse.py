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
    if geom.tri_geo is not None:
        tg = geom.tri_geo
    else:
        idx = geom.indices
        p = geom.positions
        v0_ = p[idx[:, 0]]
        tg = jnp.concatenate(
            [v0_, p[idx[:, 1]] - v0_, p[idx[:, 2]] - v0_,
             jnp.zeros((v0_.shape[0], 3), v0_.dtype)], axis=-1,
        )
    # Pad by one so leaf gathers past the end stay in-bounds (masked anyway)
    tgp = jnp.concatenate([tg, jnp.zeros((1, tg.shape[1]), tg.dtype)])

    nodes = getattr(flat, "bvh_nodes", None)
    if nodes is None:
        # Pack on the fly (tests / hand-built scenes)
        def as_f(x):
            return jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.float32)

        nodes = jnp.concatenate(
            [flat.bvh_bounds_lo, flat.bvh_bounds_hi,
             as_f(flat.bvh_skip)[:, None], as_f(flat.bvh_tri_start)[:, None],
             as_f(flat.bvh_tri_count)[:, None],
             jnp.zeros((flat.bvh_skip.shape[0], 3), jnp.float32)], axis=-1,
        )
    n_nodes = nodes.shape[0]
    n_tris = tg.shape[0]
    leaf_k = int(max_leaf) if max_leaf is not None else 4

    def _walk(o, d, tmin, tmax, any_hit: bool, active=None, max_steps=65536):
        r = o.shape[0]
        tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
        tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)

        # Masked-out rays never enter the tree: the lockstep walk runs until
        # the WORST ray finishes, so letting dead lanes traverse would both
        # waste bandwidth and stretch the loop.
        start_ptr = (jnp.zeros((r,), jnp.int32) if active is None
                     else jnp.where(active, 0, n_nodes).astype(jnp.int32))
        state = dict(
            ptr=start_ptr,
            best_t=tmax,
            best_tri=jnp.full((r,), -1, jnp.int32),
            u=jnp.zeros((r,)),
            v=jnp.zeros((r,)),
            steps=jnp.int32(0),
        )

        def cond(s):
            live = s["ptr"] < n_nodes
            if any_hit:
                live = live & (s["best_tri"] < 0)
            # Step cap: guards the device watchdog against pathological rays
            # (e.g. NaN directions passing every slab test)
            return jnp.any(live) & (s["steps"] < max_steps)

        def body(s):
            # Phase 1: walk inner nodes until every live ray is parked at a
            # hit leaf (or done). Inner steps cost ONE node-row gather; leaf
            # gathers only happen in phase 2, once per round, instead of
            # 4x per step (gathers dominate this backend's traversal cost).
            def walk_cond(w):
                ptr, best_t, parked, inner = w
                live = (ptr < n_nodes) & ~parked
                if any_hit:
                    live = live & (s["best_tri"] < 0)
                return jnp.any(live) & (inner < jnp.int32(64))

            def walk_body(w):
                ptr_raw, best_t, parked, inner = w
                ptr = jnp.minimum(ptr_raw, n_nodes - 1)
                live = (ptr_raw < n_nodes) & ~parked
                if any_hit:
                    live = live & (s["best_tri"] < 0)
                row = nodes[ptr]
                node_lo = row[..., 0:3]
                node_hi = row[..., 3:6]
                skip_to = jax.lax.bitcast_convert_type(row[..., 6], jnp.int32)
                count = jax.lax.bitcast_convert_type(row[..., 8], jnp.int32)
                hit_box = _slab_test(o, inv_d, node_lo, node_hi, tmin, best_t) & live
                is_leaf = count > 0
                park = hit_box & is_leaf
                new_ptr = jnp.where(
                    live & ~park,
                    jnp.where(hit_box & ~is_leaf, ptr + 1, skip_to),
                    ptr_raw,
                )
                return new_ptr, best_t, parked | park, inner + 1

            done_early = any_hit & (s["best_tri"] >= 0)
            ptr, best_t0, parked, _ = jax.lax.while_loop(
                walk_cond, walk_body,
                (s["ptr"], s["best_t"],
                 jnp.zeros_like(s["ptr"], bool) | done_early, jnp.int32(0)),
            )

            # Phase 2: intersect the parked leaves
            safe_ptr = jnp.minimum(ptr, n_nodes - 1)
            row = nodes[safe_ptr]
            skip_to = jax.lax.bitcast_convert_type(row[..., 6], jnp.int32)
            base = jax.lax.bitcast_convert_type(row[..., 7], jnp.int32)
            count = jax.lax.bitcast_convert_type(row[..., 8], jnp.int32)
            at_leaf = parked & (ptr < n_nodes) & ~done_early

            best_t = s["best_t"]
            best_tri = s["best_tri"]
            bu, bv = s["u"], s["v"]
            for k in range(leaf_k):
                tri = jnp.where(at_leaf & (k < count), base + k, n_tris)
                trow = tgp[tri]  # one wide gather per leaf slot
                t, u_, v_, ok = _mt_single(
                    o, d, trow[..., 0:3], trow[..., 3:6], trow[..., 6:9],
                    tmin, best_t,
                )
                ok = ok & at_leaf & (k < count)
                best_tri = jnp.where(ok, tri, best_tri)
                bu = jnp.where(ok, u_, bu)
                bv = jnp.where(ok, v_, bv)
                best_t = jnp.where(ok, t, best_t)

            new_ptr = jnp.where(at_leaf, skip_to, ptr)
            return dict(ptr=new_ptr, best_t=best_t, best_tri=best_tri, u=bu,
                        v=bv, steps=s["steps"] + 1)

        out = jax.lax.while_loop(cond, body, state)
        hit = out["best_tri"] >= 0
        return HitRecord(
            t=jnp.where(hit, out["best_t"], INF),
            tri=out["best_tri"],
            bary=jnp.stack([out["u"], out["v"]], -1),
            hit=hit,
        )

    def trace_closest(o, d, tmin, tmax, active=None) -> HitRecord:
        return _walk(o, d, tmin, tmax, any_hit=False, active=active)

    def trace_any(o, d, tmin, tmax, active=None) -> jnp.ndarray:
        return _walk(o, d, tmin, tmax, any_hit=True, active=active).hit

    return trace_closest, trace_any
