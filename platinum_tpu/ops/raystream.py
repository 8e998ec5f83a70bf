"""Breadth-first ray-STREAM traversal of the 16-wide BVH (accel.wide).

The packet kernel (ops/pallas_trace.py) is bound by per-superstep
serialization: ~20-40 dependent supersteps per packet walk at ~5.6-8k
cycles each (PERFORMANCE.md §10), against which every structural variant
(ordering, pipelining, width, branching factor) measured dead. This module
is the alternative formulation PERFORMANCE.md names: LEVEL-SYNCHRONOUS
traversal — the whole wave advances one BVH level per phase, as dense
batched XLA ops plus one stackless Pallas kernel:

  per level L:
    1. (ray, node) pairs sorted by node              [argsort + take]
    2. node records + child metas fetched per pair   [gather]
    3. 16-child slab test, culled by per-ray best-t  [dense vector ops]
    4. surviving inner children -> level L+1 pairs   [cumsum + scatter]
       surviving leaf children  -> (ray, MT block) pairs
    5. leaf pairs sorted by block; a Pallas kernel walks each 128-pair
       chunk's few distinct blocks, one (10,256)x(10,128) MXU matmul per
       distinct block, lanes masked to their own block  [high MXU fill]
    6. per-ray closest-hit reduction + best-t update [scatter-min]

perf/sim_raystream.py (exact walk of the real tree, realistic waves)
measures ~8-12x fewer 128-lane node expansions and ~4-12x fewer MT
block matmuls than the packet walk pays for the same rays, because every
expansion/matmul here serves only rays that actually want that node/block
(fill 0.9+ at every level but the deepest) instead of a packet-union.
The price is the per-level argsort/scatter plumbing — bandwidth the chip
has, instead of serialization it chokes on.

Correctness contract: closest hits match the brute oracle exactly on t;
tie-breaking on exactly-equal t picks the smallest global slot id. Waves
with per-ray best-t culling only ever admit extra work, never skip a hit
(the per-level reduction commits exact minima). Restrictions (v1):
world-space-baked geometry only (no instancing), every leaf owns exactly
one MT block (the accel.wide build default), VMEM-resident blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from platinum_tpu.ops.intersect import INF, HitRecord
from platinum_tpu.ops.pallas_trace import _ray_sort_key  # octant+Morton

LANES = 128
DET_EPS = 1e-12
# chunks processed per Pallas grid step (amortises the ~9.5 us/step grid
# machinery over 16 chunks)
MT_CHUNKS_PER_STEP = 16
# static per-level pair capacities, as multiples of the wave size R
# (measured on the colonnade: level-1 pairs peak at ~1.6R, deeper levels
# ~0.7R; sim_raystream prints the profile for any scene)
PAIR_CAPS = (2.0, 2.0, 1.5, 1.5, 1.25, 1.25, 1.25, 1.25)
LEAF_CAP = 1.5   # leaf (ray, block) pairs per level, x R
# Small waves on dense trees need more than K*R pairs (a single ray can
# touch hundreds of nodes); every cap gets at least this floor. Overflow
# past a cap now raises through the public API instead of dropping pairs.
CAP_FLOOR = 16384


def _tree_depth(meta: np.ndarray) -> int:
    """Host-side BFS depth of the wide tree (root = level 0)."""
    depth = 0
    frontier = [0]
    seen = 0
    while frontier:
        nxt = []
        for n in frontier:
            for c in range(16):
                m = int(meta[n * 16 + c])
                if m >= 0:
                    nxt.append(m)
        seen += len(frontier)
        if nxt:
            depth += 1
        frontier = nxt
        if seen > len(meta):  # malformed tree guard
            raise ValueError("cycle in wide-BVH meta table")
    return depth


def _all_leaves_single_block(meta: np.ndarray) -> bool:
    leaf = meta <= -2
    vals = -meta[leaf] - 2
    return bool(np.all((vals & 31) == 1))


# ---------------------------------------------------------------------------
# Pallas MT kernel: sorted leaf-pair chunks, distinct-block walk
# ---------------------------------------------------------------------------

def _make_mt_kernel(any_hit: bool, mt_prec: str, m_chunks: int,
                    n_blocks: int):
    _MT_DN = (((0,), (0,)), ((), ()))
    MT_PRECISION = {"highest": jax.lax.Precision.HIGHEST,
                    "high": None,
                    "default": jax.lax.Precision.DEFAULT}[mt_prec]

    def mt_dot(blk, feat):
        if mt_prec != "high":
            return jax.lax.dot_general(
                blk, feat, dimension_numbers=_MT_DN,
                preferred_element_type=jnp.float32,
                precision=MT_PRECISION)
        bh = blk.astype(jnp.bfloat16)
        fh = feat.astype(jnp.bfloat16)
        bl = (blk - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        fl = (feat - fh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=_MT_DN,
                preferred_element_type=jnp.float32)

        return d(bh, fh) + d(bh, fl) + d(bl, fh)

    def kernel(bid_ref, feat_ref, lim_ref, tris_ref,
               t_ref, s_ref, u_ref, v_ref, state):
        slot_iota = jax.lax.broadcasted_iota(
            jnp.int32, (64, 1), 0).astype(jnp.float32)
        for m in range(m_chunks):
            bids = bid_ref[0, m, :].reshape(1, LANES)
            feat = feat_ref[0, m]                       # (16, 128), 10 real
            tmin = lim_ref[0, m, 0:1, :]
            best0 = lim_ref[0, m, 1:2, :]

            # state rows: t, slot, u, v
            state[0:1, :] = jnp.full((1, LANES), jnp.inf)
            state[1:2, :] = jnp.full((1, LANES), -1.0)
            state[2:3, :] = jnp.zeros((1, LANES))
            state[3:4, :] = jnp.zeros((1, LANES))

            valid = bids >= 0
            # min-reduce via f32 (ids < 2^24 are exact; the classic kernel
            # only ever exercises sum-reduce syncs on this toolchain)
            bids_f = bids.astype(jnp.float32)
            first = jnp.min(jnp.where(valid, bids_f, jnp.float32(1 << 30))
                            ).astype(jnp.int32)

            def cond(c):
                return c[0] < (1 << 30)

            def body(c):
                cur = c[0]
                # clamped: a garbage id must never become an OOB dynamic
                # VMEM read (hardware returns garbage / can fault the
                # worker; commit stays masked by `mine` regardless)
                safe = jnp.clip(cur, 0, n_blocks - 1)
                blk = tris_ref[safe, 0:10, :]           # (10, 256)
                out = mt_dot(blk, feat[0:10, :])        # (256, 128)
                det = out[0:64, :]
                udet = out[64:128, :]
                vdet = out[128:192, :]
                tdet = out[192:256, :]
                s = jnp.where(det >= 0.0, 1.0, -1.0)
                ad = det * s
                us, vs, ts = udet * s, vdet * s, tdet * s
                mine = (bids == cur) & valid
                if any_hit:
                    ok = ((ad > DET_EPS)
                          & (us >= 0.0) & (vs >= 0.0) & (us + vs <= ad)
                          & (ts > tmin * ad) & (ts < best0 * ad))
                    anyh = jnp.max(ok.astype(jnp.float32), axis=0,
                                   keepdims=True)
                    occ = (anyh > 0.0) & mine
                    state[0:1, :] = jnp.where(occ, 0.0, state[0:1, :])
                    state[1:2, :] = jnp.where(occ, 1.0, state[1:2, :])
                else:
                    ok = ((ad > DET_EPS)
                          & (us >= 0.0) & (vs >= 0.0) & (us + vs <= ad)
                          & (ts > tmin * ad) & (ts < best0 * ad))
                    t64 = jnp.where(ok, ts / jnp.maximum(ad, 1e-37),
                                    jnp.inf)
                    tb = jnp.min(t64, axis=0, keepdims=True)
                    found = (tb < state[0:1, :]) & mine
                    sel = (t64 == tb) & found
                    big = jnp.float32(3e38)
                    slot = jnp.min(jnp.where(sel, slot_iota, big), axis=0,
                                   keepdims=True)
                    sel = sel & (slot_iota == slot)
                    iad = 1.0 / jnp.maximum(
                        jnp.max(jnp.where(sel, ad, 0.0), axis=0,
                                keepdims=True), 1e-37)
                    u_s = jnp.max(jnp.where(sel, us, -big), axis=0,
                                  keepdims=True) * iad
                    v_s = jnp.max(jnp.where(sel, vs, -big), axis=0,
                                  keepdims=True) * iad
                    sid = jnp.asarray(cur, jnp.float32) * 64.0 + slot
                    state[0:1, :] = jnp.where(found, tb, state[0:1, :])
                    state[1:2, :] = jnp.where(found, sid, state[1:2, :])
                    state[2:3, :] = jnp.where(found, u_s, state[2:3, :])
                    state[3:4, :] = jnp.where(found, v_s, state[3:4, :])
                nxt = jnp.min(jnp.where(valid & (bids > cur), bids_f,
                                        jnp.float32(1 << 30))
                              ).astype(jnp.int32)
                return (nxt,)

            jax.lax.while_loop(cond, body, (first,))
            t_ref[0, m, :] = state[0:1, :].reshape(LANES)
            s_ref[0, m, :] = state[1:2, :].reshape(LANES)
            u_ref[0, m, :] = state[2:3, :].reshape(LANES)
            v_ref[0, m, :] = state[3:4, :].reshape(LANES)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_mt_call(g: int, n_blocks: int, any_hit: bool, interpret: bool,
                   mt_prec: str):
    M = MT_CHUNKS_PER_STEP
    kernel = _make_mt_kernel(any_hit, mt_prec, M, n_blocks)
    row = pl.BlockSpec((1, M, LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[
            row,                                     # block ids (VMEM)
            pl.BlockSpec((1, M, 16, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # features (10 real)
            pl.BlockSpec((1, M, 2, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # tmin / best
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri blocks resident
        ],
        out_specs=[row, row, row, row],
        scratch_shapes=[pltpu.VMEM((4, LANES), jnp.float32)],
    )
    out_shape = [jax.ShapeDtypeStruct((g, M, LANES), jnp.float32)
                 for _ in range(4)]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(20 * n_blocks * LANES * 4 + (64 << 20),
                                 128 << 20)),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Tracer
# ---------------------------------------------------------------------------

def make_stream_tracer(wnodes, wtris, wmeta, wslot=None,
                       interpret: bool | None = None,
                       mt_precision: str = "highest",
                       depth: int | None = None):
    """(trace_closest, trace_any) with the packet tracer's signature.

    wnodes: (N, 128) f32 node rows; wtris: (B, 10, 256) MT blocks; wmeta:
    (N*16,) i32 child metas; wslot: optional slot -> tri id map.
    """
    import os

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if jax.default_backend() != "cpu" and \
            os.environ.get("PLATINUM_TPU_RAYSTREAM_HW") != "1":
        # Measured on the axon TPU runtime: this program class (wave-scale
        # scatter/argsort glue) FAULTS the device ("TPU device error")
        # even with the Pallas MT kernel in interpret mode — the fault is
        # in the XLA-irregular-op program, not the kernel (which passes
        # its structural bisect on hardware). Combined with the measured
        # irregular-op costs (PERFORMANCE.md round-4 section) the stream
        # tracer is CPU/reference-only until the all-Pallas pipeline
        # exists. Set PLATINUM_TPU_RAYSTREAM_HW=1 to experiment anyway.
        raise RuntimeError(
            "ray-stream tracer is reference-only on this backend "
            "(XLA irregular-op glue faults the TPU runtime; see "
            "PERFORMANCE.md). Set PLATINUM_TPU_RAYSTREAM_HW=1 to force.")
    meta_np = np.asarray(wmeta)
    if depth is None:
        depth = _tree_depth(meta_np)
    if not _all_leaves_single_block(meta_np):
        raise ValueError("stream tracer v1 requires single-block leaves "
                         "(wide_leaf_cap <= 64, the build default)")
    wnodes = jnp.asarray(wnodes, jnp.float32)
    wtris = jnp.asarray(wtris, jnp.float32)
    wmeta = jnp.asarray(wmeta, jnp.int32)
    n_nodes = wnodes.shape[0]
    n_blocks = wtris.shape[0]
    nodes16 = wnodes.reshape(n_nodes, 16, 8)
    meta16 = wmeta.reshape(n_nodes, 16)
    if wslot is not None:
        wslot = jnp.asarray(wslot, jnp.int32)

    def _expand(pr, pn, o, iv, tmin, best):
        """One level: sorted pairs -> (hit children masks, child metas).
        pr/pn: (C,) pair ray/node ids (pn < 0 = invalid). Returns
        (C, 16) boolean hits and (C, 16) int32 metas."""
        rec = nodes16[jnp.maximum(pn, 0)]                # (C, 16, 8)
        mts = meta16[jnp.maximum(pn, 0)]                 # (C, 16)
        po = o[pr]                                       # (C, 3)
        piv = iv[pr]
        pt = tmin[pr]
        pb = best[pr]
        lo = rec[:, :, 0:3]
        hi = rec[:, :, 3:6]
        mc = rec[:, :, 6]
        t0 = (lo - po[:, None, :]) * piv[:, None, :]
        t1 = (hi - po[:, None, :]) * piv[:, None, :]
        tn = jnp.minimum(t0, t1).max(-1)
        tf = jnp.maximum(t0, t1).min(-1)
        hit = ((tn <= tf) & (tf >= pt[:, None]) & (tn <= pb[:, None])
               & ((mc >= 0.0) | (mc <= -1.5))
               & (pn >= 0)[:, None])
        return hit, mts

    def _compact(values, mask, cap, fill):
        """Scatter-compact `values` where `mask` into a (cap,) array.
        Returns (out, count). Extra entries beyond cap are dropped (the
        caller checks count for overflow)."""
        flat_m = mask.reshape(-1)
        pos = jnp.cumsum(flat_m.astype(jnp.int32)) - 1
        count = jnp.sum(flat_m.astype(jnp.int32))
        pos = jnp.where(flat_m & (pos < cap), pos, cap)
        out = jnp.full((cap + 1,), fill, values.dtype).at[pos].set(
            values.reshape(-1), mode="drop")
        return out[:cap], count

    def _run(o, d, tmin, tmax, active, any_hit):
        R = o.shape[0]
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)
        tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (R,))
        tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (R,))
        if active is not None:
            tmax = jnp.where(active, tmax, tmin - 1.0)

        tiny = jnp.where(d < 0, -1e-20, 1e-20)
        iv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, tiny, d)
        feat = jnp.concatenate([
            d,
            jnp.cross(o, d),
            o,
            jnp.ones((R, 1), jnp.float32),
        ], axis=1)                                       # (R, 10)

        best = tmax
        win_t = jnp.full((R,), jnp.inf)
        win_s = jnp.full((R,), -1, jnp.int32)
        win_u = jnp.zeros((R,))
        win_v = jnp.zeros((R,))
        occluded = jnp.zeros((R,), bool)
        overflow = jnp.int32(0)

        # level 0: every ray at the root — already "sorted by node"
        pr = jnp.arange(R, dtype=jnp.int32)
        pn = jnp.zeros((R,), jnp.int32)

        for level in range(depth + 1):
            if any_hit:
                # occluded rays cull everything (best < tmin)
                best = jnp.where(occluded, tmin - 1.0, best)
            hit, mts = _expand(pr, pn, o, iv, tmin, best)
            inner = hit & (mts >= 0)
            leaf = hit & (mts <= -2)

            # ---- leaf pairs -> sorted by block -> MT kernel
            lcap = -(-max(int(LEAF_CAP * R), CAP_FLOOR)
                     // (LANES * MT_CHUNKS_PER_STEP)) \
                * (LANES * MT_CHUNKS_PER_STEP)
            blocks_all = (-mts - 2) >> 5
            pair_rays = jnp.broadcast_to(pr[:, None], mts.shape)
            lb, lcnt = _compact(blocks_all, leaf, lcap, jnp.int32(-1))
            lr, _ = _compact(pair_rays, leaf, lcap, jnp.int32(0))
            overflow = overflow + jnp.maximum(lcnt - lcap, 0)

            order = jnp.argsort(jnp.where(lb >= 0, lb, jnp.int32(1 << 30)))
            lb_s = lb[order]
            lr_s = lr[order]

            g = lcap // (LANES * MT_CHUNKS_PER_STEP)
            feat_pairs = feat[lr_s]                      # (lcap, 10)
            feat_blk = jnp.zeros((lcap, 16), jnp.float32).at[:, 0:10].set(
                feat_pairs)
            feat_blk = feat_blk.reshape(
                g, MT_CHUNKS_PER_STEP, LANES, 16).transpose(0, 1, 3, 2)
            lims = jnp.stack([tmin[lr_s], best[lr_s]], 1)  # (lcap, 2)
            lims = lims.reshape(
                g, MT_CHUNKS_PER_STEP, LANES, 2).transpose(0, 1, 3, 2)
            bid3 = lb_s.reshape(g, MT_CHUNKS_PER_STEP, LANES)

            call = _build_mt_call(g, n_blocks, any_hit, interpret,
                                  mt_precision)
            t_o, s_o, u_o, v_o = call(bid3, feat_blk, lims, wtris)
            t_p = t_o.reshape(lcap)
            s_p = s_o.reshape(lcap)

            if any_hit:
                occ_new = (s_p > 0.0) & (lb_s >= 0)
                occluded = occluded.at[lr_s].max(occ_new)
            else:
                u_p = u_o.reshape(lcap)
                v_p = v_o.reshape(lcap)
                # per-ray reduction: exact min-t, ties -> smallest slot
                t_best = jnp.full((R,), jnp.inf).at[lr_s].min(
                    jnp.where(lb_s >= 0, t_p, jnp.inf))
                cand = (lb_s >= 0) & (t_p == t_best[lr_s]) \
                    & jnp.isfinite(t_p)
                skey = jnp.where(cand, s_p, jnp.float32(3e38))
                s_best = jnp.full((R,), 3e38).at[lr_s].min(skey)
                winner = cand & (s_p == s_best[lr_s])
                upd = t_best < win_t
                win_t = jnp.where(upd, t_best, win_t)
                newly = winner & upd[lr_s]
                # scatter winner payloads (unique winner per ray)
                win_s = win_s.at[jnp.where(newly, lr_s, R)].set(
                    s_p.astype(jnp.int32), mode="drop")
                win_u = win_u.at[jnp.where(newly, lr_s, R)].set(
                    u_p, mode="drop")
                win_v = win_v.at[jnp.where(newly, lr_s, R)].set(
                    v_p, mode="drop")
                best = jnp.minimum(best, win_t)

            # ---- next level pairs
            if level == depth:
                break
            cap = max(int(PAIR_CAPS[min(level, len(PAIR_CAPS) - 1)] * R),
                      CAP_FLOOR)
            npn, icnt = _compact(mts, inner, cap, jnp.int32(-1))
            npr, _ = _compact(pair_rays, inner, cap, jnp.int32(0))
            overflow = overflow + jnp.maximum(icnt - cap, 0)
            order = jnp.argsort(jnp.where(npn >= 0, npn,
                                          jnp.int32(1 << 30)))
            pn = npn[order]
            pr = npr[order]

        if any_hit:
            return occluded, overflow

        tri = win_s
        if wslot is not None:
            tri = jnp.where(tri >= 0, wslot[jnp.maximum(tri, 0)], -1)
        hit = tri >= 0
        rec = HitRecord(
            t=jnp.where(hit, win_t, INF),
            tri=tri,
            bary=jnp.stack([win_u, win_v], axis=-1),
            hit=hit,
            inst=None,
        )
        return rec, overflow

    def _checked(ovf):
        """Surface capacity overflow instead of silently dropping pairs.

        The static PAIR_CAPS/LEAF_CAP capacities bound each level's pair
        lists; _compact DROPS pairs beyond them, which would violate the
        "never skip a hit" contract. The public entry points therefore
        fail loudly when any level overflowed (io_callback is ordered, so
        the error fires before results are consumed; this module is
        CPU/reference-gated, where the callback cost is irrelevant)."""
        import jax.experimental

        def _raise(v):
            if int(v) > 0:
                raise RuntimeError(
                    f"ray-stream tracer overflowed its static pair "
                    f"capacities by {int(v)} pairs (PAIR_CAPS/LEAF_CAP); "
                    f"results would silently miss hits. Raise the caps or "
                    f"use .with_overflow to handle it.")
            return np.int32(0)

        return jax.experimental.io_callback(
            _raise, jax.ShapeDtypeStruct((), jnp.int32), ovf, ordered=True)

    def trace_closest(o, d, tmin, tmax, active=None):
        rec, ovf = _run(o, d, tmin, tmax, active, any_hit=False)
        _checked(ovf)
        return rec

    def trace_any(o, d, tmin, tmax, active=None):
        occ, ovf = _run(o, d, tmin, tmax, active, any_hit=True)
        _checked(ovf)
        return occ

    trace_closest.with_overflow = functools.partial(_run, any_hit=False)
    trace_any.with_overflow = functools.partial(_run, any_hit=True)
    return trace_closest, trace_any
