"""Ray-triangle intersection (pure JAX, vectorized Möller-Trumbore).

The reference delegates intersection to Metal's hardware ray tracing
(kernel.metal:244-251, renderer_pt.cpp:653-749); on TPU we implement it as
dense vector math. This module provides the *brute-force* tracer (every ray
against every triangle, chunked to bound memory) — the correctness oracle and
the small-scene fast path. The BVH tracer in `platinum_tpu.ops.traverse`
must produce identical hits (tested against this one).

Triangle data is pre-arranged as (v0, e1, e2) chunks at tracer-build time so
the inner loop is pure FMA + compare — VPU-friendly, no gathers.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from platinum_tpu.render.types import Geometry

INF = jnp.float32(np.inf)
DET_EPS = jnp.float32(1e-12)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HitRecord:
    t: jnp.ndarray      # (R,) distance, inf on miss
    tri: jnp.ndarray    # (R,) i32 triangle index, -1 on miss
    bary: jnp.ndarray   # (R, 2) barycentric (u, v) for vertices 1, 2
    hit: jnp.ndarray    # (R,) bool
    # (R,) i32 instance id — only set by the two-level TLAS/BLAS tracer
    # (accel.tlas); None for world-space-baked geometry
    inst: jnp.ndarray | None = None


def fold_closest(best: HitRecord, rec: HitRecord,
                 inst_override=None) -> HitRecord:
    """Carried-best-t fold shared by every sequential partition tracer
    (accel.partition, parallel.geometry): strict `<` keeps the EARLIER
    record on exact ties — the tie-breaking the bit-exactness tests pin.
    `inst_override` substitutes remapped (e.g. partition-local -> global)
    instance ids for rec.inst."""
    closer = rec.hit & (rec.t < best.t)
    inst = best.inst
    if best.inst is not None:
        src = inst_override if inst_override is not None else rec.inst
        inst = jnp.where(closer, src, best.inst)
    return HitRecord(
        t=jnp.where(closer, rec.t, best.t),
        tri=jnp.where(closer, rec.tri, best.tri),
        bary=jnp.where(closer[:, None], rec.bary, best.bary),
        hit=best.hit | closer,
        inst=inst,
    )


def fold_partition_tracers(tracers, inst_maps, o, d, tmin, tmax,
                           active=None, instanced=False) -> HitRecord:
    """Carried-best-t fold over a list of resident partition tracers —
    THE shared inner loop of accel.partition's sequential tracer and
    parallel.geometry's per-device shard (one copy so their pinned
    tie-breaking semantics cannot drift): each tracer is culled by the
    running best t, partition-local instance ids remap through the
    matching inst_maps entry (None = no remap). Returns the raw fold
    (best.t still carries tmax on misses — callers apply the INF
    convention or merge over ICI first)."""
    r = o.shape[0]
    best = HitRecord(
        t=jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,)),
        tri=jnp.full((r,), -1, jnp.int32),
        bary=jnp.zeros((r, 2)),
        hit=jnp.zeros((r,), bool),
        inst=(jnp.zeros((r,), jnp.int32) if instanced else None),
    )
    for tc, imap in zip(tracers, inst_maps):
        rec = tc(o, d, tmin, best.t, active=active)
        override = None
        if imap is not None:
            local = jnp.clip(rec.inst, 0, imap.shape[0] - 1)
            override = imap[local].astype(jnp.int32)
        best = fold_closest(best, rec, inst_override=override)
    return best


def _moller_trumbore(o, d, v0, e1, e2, tmin, tmax):
    """o, d: (R, 1, 3); v0/e1/e2: (1, C, 3). Returns t, u, v, valid (R, C)."""
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
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < tmax)
    )
    return t, u, v, valid


def _chunk_triangles(geometry: Geometry, chunk: int):
    """Pre-gather triangle vertices into (nc, C, 3) chunked (v0, e1, e2)."""
    idx = geometry.indices
    p = geometry.positions
    v0 = p[idx[:, 0]]
    v1 = p[idx[:, 1]]
    v2 = p[idx[:, 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    n_tri = v0.shape[0]
    n_pad = (-n_tri) % chunk
    if n_pad:
        # Degenerate padding triangles never hit (zero-area, det == 0)
        pad = jnp.zeros((n_pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, pad])
        e1 = jnp.concatenate([e1, pad])
        e2 = jnp.concatenate([e2, pad])
    nc = (n_tri + n_pad) // chunk
    shape = (nc, chunk, 3)
    return v0.reshape(shape), e1.reshape(shape), e2.reshape(shape), n_tri


def make_brute_tracer(geometry: Geometry, chunk: int = 256):
    """Build (trace_closest, trace_any) closures over chunked triangles.

    trace_closest(o, d, tmin, tmax) → HitRecord
    trace_any(o, d, tmin, tmax)     → (R,) bool occlusion
    tmin/tmax may be scalars or per-ray (R,) arrays.
    """
    n_tris = int(geometry.indices.shape[0])
    # Don't pad tiny scenes up to a full chunk (a 12-tri Cornell padded to
    # 256 wastes 20x the math/bandwidth)
    chunk = min(chunk, max(8, 1 << (n_tris - 1).bit_length()))
    v0c, e1c, e2c, _ = _chunk_triangles(geometry, chunk)
    nc = v0c.shape[0]

    def trace_closest(o, d, tmin, tmax, active=None) -> HitRecord:
        r = o.shape[0]
        if active is not None:
            tmax = jnp.where(active, jnp.asarray(tmax, jnp.float32), tmin)
        tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
        tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        o_b = o[:, None, :]
        d_b = d[:, None, :]

        def body(carry, xs):
            best_t, best_tri, best_u, best_v = carry
            v0, e1, e2, base = xs
            t, u, v, valid = _moller_trumbore(
                o_b, d_b, v0[None], e1[None], e2[None],
                tmin[:, None], jnp.minimum(tmax, best_t)[:, None],
            )
            # Winner extraction WITHOUT per-lane gathers (t[rows, argmin]
            # lowers to a serialized gather on this backend): masked min +
            # first-match payload selection, all dense VPU reductions.
            t = jnp.where(valid, t, INF)
            cand_t = jnp.min(t, axis=-1)
            is_best = (t <= cand_t[:, None]) & valid
            first = is_best & (jnp.cumsum(is_best.astype(jnp.int32), -1) == 1)
            cand_u = jnp.sum(jnp.where(first, u, 0.0), axis=-1)
            cand_v = jnp.sum(jnp.where(first, v, 0.0), axis=-1)
            cols = jnp.arange(t.shape[-1], dtype=jnp.int32)
            cand_j = jnp.sum(jnp.where(first, cols[None, :], 0), axis=-1)
            better = cand_t < best_t
            best_tri = jnp.where(better, base + cand_j, best_tri)
            best_u = jnp.where(better, cand_u, best_u)
            best_v = jnp.where(better, cand_v, best_v)
            best_t = jnp.where(better, cand_t, best_t)
            return (best_t, best_tri, best_u, best_v), None

        init = (
            jnp.full((r,), INF),
            jnp.full((r,), -1, jnp.int32),
            jnp.zeros((r,)),
            jnp.zeros((r,)),
        )
        bases = jnp.arange(nc, dtype=jnp.int32) * v0c.shape[1]
        (t, tri, u, v), _ = jax.lax.scan(body, init, (v0c, e1c, e2c, bases))
        hit = jnp.isfinite(t)
        return HitRecord(t=t, tri=tri, bary=jnp.stack([u, v], -1), hit=hit)

    def trace_any(o, d, tmin, tmax, active=None) -> jnp.ndarray:
        r = o.shape[0]
        if active is not None:
            tmax = jnp.where(active, jnp.asarray(tmax, jnp.float32), tmin)
        tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
        tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        o_b = o[:, None, :]
        d_b = d[:, None, :]

        def body(occluded, xs):
            v0, e1, e2 = xs
            _, _, _, valid = _moller_trumbore(
                o_b, d_b, v0[None], e1[None], e2[None],
                tmin[:, None], tmax[:, None],
            )
            return occluded | jnp.any(valid, axis=-1), None

        occluded, _ = jax.lax.scan(
            body, jnp.zeros((r,), bool), (v0c, e1c, e2c)
        )
        return occluded

    return trace_closest, trace_any
