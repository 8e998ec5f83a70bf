"""All-Pallas breadth-first (level-synchronous) BVH traversal.

The round-4 campaign established three facts (PERFORMANCE.md):

  1. The packet kernel sits on a serialization plateau: each superstep is a
     DEPENDENT chain (~5.6-8k cycles) and every structural variant measured
     dead. It pays packet-UNION work: ~86k node expansions + ~85k MT block
     matmuls per incoherent 262k wave.
  2. Breadth-first traversal of the same tree on the same waves needs only
     ~7-8k 128-lane expansions + ~7k block matmuls (perf/sim_raystream.py,
     fill >= 0.9) — every expansion serves only rays that want that node.
  3. The XLA-glue formulation of (2) is dead on this backend: wave-scale
     argsort/scatter/gather cost 10-100 ms/op and the composed program
     faults the TPU runtime (ops/raystream.py is kept as the CPU-only
     executable spec).

This module is the identified fix: the SAME level-synchronous traversal
with ZERO wave-scale XLA ops — every irregular step is a Pallas kernel.
The enabling observation is that a BVH is a TREE, so *no sorting is ever
needed*: pairs grouped by parent node, emitted slot-major, are grouped by
child BY CONSTRUCTION (each child has exactly one (parent, slot)).

Pipeline per level L (each phase one `pallas_call`, all chained inside the
caller's jit — buffers flow between phases as plain arrays):

  EXPAND  per unit (= one node x one 128-lane tile of its pairs): load the
          node row, slab-test 16 children x 128 lanes, store the per-lane
          16-bit hit mask and accumulate per-(node, slot) counts.
  PREFIX  one sequential scalar walk over the level's children: assign each
          child a 128-ALIGNED region in the next level's pair list (so
          every next-level tile is PURE — exactly one node per unit, which
          is what makes expansion fill match the simulation), build the
          next level's unit table and the MT unit table (leaf children),
          and dead-mark each region's tail lanes.
  EMIT    per unit x active slot: lane ranks via one lower-triangular MXU
          matmul, a shifted one-hot (128,128) selection matrix, and one
          exact (HIGHEST) payload matmul compacts the slot's survivors
          into the child's region (masked stores; a region row crossing a
          tile boundary uses two shifted one-hots).
  MT      per unit (= one leaf block x one tile of its rays): the classic
          MXU Moller-Trumbore block matmul (same math as the packet
          kernel), writing per-pair (t, slot-id, u, v).
  BWD     after the deepest level, walk levels bottom-up re-deriving the
          same one-hot matrices from the stored masks and route results UP
          through their transposes — an exact per-ray min reduction with
          no scatter. Level-0 pairs ARE the rays in order, so the final
          results land ray-major for free.

Waves are processed in segments (SEG rays) so the pair buffers fit VMEM
next to the resident BVH. Per-pair payload is one (8, 128) f32 tile row
set [ox,oy,oz,dx,dy,dz,tmin,tmax]; dead/padding lanes carry tmax < tmin.
Correctness contract matches ops/raystream.py: closest hits exact vs the
packet kernel on t; ties broken by smallest slot id.

Reference: this replaces Metal's hardware `intersector`
(kernel.metal:244-251, renderer_pt.cpp:223-294) like ops/pallas_trace.py,
with a breadth-first schedule instead of per-packet stacks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from platinum_tpu.ops.intersect import INF, HitRecord
from platinum_tpu.ops.pallas_trace import _ray_sort_key

LANES = 128
DET_EPS = 1e-12
# static per-level pair-tile capacities as multiples of segment tiles
# (sim_raystream: level pair counts peak ~1.6R then decay; padded regions
# round each child up to 128 lanes)
PAIR_CAP_MULT = (1.0, 3.0, 3.0, 3.0, 2.5, 2.5, 2.5, 2.5, 2.5, 2.5)
MT_CAP_MULT = 14.0
MT_WIN = 512   # MT unit-window tiles per call
# extra tiles absorbing per-child round-up (<= 1 tile per active child)
CAP_SLACK_TILES = 768
SEG_RAYS = 65536          # rays per segment (VMEM budget)
B_EXPAND = 4              # units batched per expand loop iteration
# (emit/MT/BWD process one unit per iteration in v1 — batching their
# independent chains like B_EXPAND is the identified follow-on lever,
# PERFORMANCE.md round-5)


def _tree_depth(meta: np.ndarray) -> int:
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
        if seen > len(meta):
            raise ValueError("cycle in wide-BVH meta table")
    return depth


def _all_leaves_single_block(meta: np.ndarray, n_blocks: int) -> bool:
    """Single-block leaves AND plain (non-instanced) block ids. Instanced
    trees (accel.tlas) tag leaf values with inst << 19, so a decoded block
    id out of range is how an instanced tree presents — reject it (v1)."""
    leaf = meta <= -2
    vals = -meta[leaf] - 2
    if not np.all((vals & 31) == 1):
        return False
    return bool(np.all((vals >> 5) < n_blocks))


def _cdiv(a, b):
    return -(-a // b)


def _dead_tile():
    """(8, 128) f32 payload that fails every slab test: tmin=+BIG,
    tmax=-BIG, zero o/d (no inf/NaN can leak into matmuls)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    return jnp.where(row == 6, jnp.float32(1e30),
                     jnp.where(row == 7, jnp.float32(-1e30),
                               jnp.float32(0.0)))


BIG = 3e38   # finite miss sentinel (inf would NaN in 0*x); python float so
             # kernels close over it as a literal, not a captured array


# ---------------------------------------------------------------------------
# EXPAND: per unit, slab-test 16 children x 128 lanes; store per-lane
# 16-bit masks + packed per-slot counts.
# ---------------------------------------------------------------------------

def _make_expand_kernel(cap_t: int, n_nodes: int):
    def kernel(units_ref, n_ref, pairs_ref, nodes_ref, masks_ref, ucnt_ref):
        nu = n_ref[0]
        pow2c = (jnp.int32(1)
                 << jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0))
        # word weights: counts <= 128 pack 4-per-int32 (8 bits each)
        wshift = (jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) % 4) * 8

        def one(u):
            safe = jnp.minimum(u, cap_t - 1)
            # clamp: an invalid unit id must never become an OOB dynamic
            # VMEM read (returns garbage / can fault on hardware)
            un = jnp.clip(units_ref[safe], 0, n_nodes - 1)
            rec = nodes_ref[un]                    # (16, 8)
            pay = pairs_ref[safe]                  # (8, 128)
            ox, oy, oz = pay[0:1, :], pay[1:2, :], pay[2:3, :]
            dx, dy, dz = pay[3:4, :], pay[4:5, :], pay[5:6, :]
            tmin, tmax = pay[6:7, :], pay[7:8, :]

            def invd(v):
                tiny = jnp.where(v < 0, -1e-20, 1e-20)
                return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

            ix, iy, iz = invd(dx), invd(dy), invd(dz)
            lox, loy, loz = rec[:, 0:1], rec[:, 1:2], rec[:, 2:3]
            hix, hiy, hiz = rec[:, 3:4], rec[:, 4:5], rec[:, 5:6]
            meta = rec[:, 6:7]
            t0x = (lox - ox) * ix
            t1x = (hix - ox) * ix
            t0y = (loy - oy) * iy
            t1y = (hiy - oy) * iy
            t0z = (loz - oz) * iz
            t1z = (hiz - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            hit = ((tn <= tf) & (tf >= tmin) & (tn <= tmax)
                   & (tmax >= tmin)
                   & ((meta >= 0.0) | (meta <= -1.5)))
            hiti = hit.astype(jnp.int32)           # (16, 128)
            mask_lane = jnp.sum(hiti * pow2c, axis=0)      # (128,)
            counts = jnp.sum(hiti, axis=1, keepdims=True)  # (16, 1)
            packed = counts << wshift
            return mask_lane, packed

        def body(carry):
            i = carry

            for b in range(B_EXPAND):
                u = i * B_EXPAND + b
                valid = u < nu
                mask_lane, packed = one(u)

                @pl.when(valid)
                def _(u=u, mask_lane=mask_lane, packed=packed):
                    masks_ref[u, :] = mask_lane
                    for j in range(4):
                        w = jnp.sum(packed[4 * j:4 * j + 4, :]
                                    ).astype(jnp.int32)
                        ucnt_ref[u * 4 + j] = w

            return i + 1

        jax.lax.while_loop(lambda i: i * B_EXPAND < nu, body, jnp.int32(0))

    return kernel


@functools.lru_cache(maxsize=None)
def _build_expand(cap_t: int, n_nodes: int, interpret: bool):
    return pl.pallas_call(
        _make_expand_kernel(cap_t, n_nodes),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # units
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_units
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pairs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes (N,16,8)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # masks
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ucnt
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_t, LANES), jnp.int32),
            jax.ShapeDtypeStruct((cap_t * 4,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                (16 * n_nodes + 8 * cap_t + cap_t) * LANES * 4 + (32 << 20),
                100 << 20)),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# PREFIX: one sequential scalar walk — aggregate per-child counts across the
# level's units, allocate 128-aligned child regions (next-level pair list +
# global MT list), build unit tables, dead-mark region tails.
# ---------------------------------------------------------------------------

MT_TAG = 1 << 30   # base-table tag: this child is a leaf (region in MT list)


def _make_prefix_kernel(cap_t: int, cap_next: int, mt_cap: int):
    def kernel(units_ref, n_ref, ucnt_ref, meta_ref, mtcur_in,
               pairsN_in, mtp_in, mtu_in,
               dn_ref, base_ref, unitsN_ref, nN_ref, mtcur_out, ovf_ref,
               pairsN_ref, mtp_ref, mtu_ref, acc_ref):
        nu = n_ref[0]
        dead = _dead_tile()
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

        # COPY-IN: on hardware an output window is staged in VMEM and
        # written back WHOLE at kernel end — bytes this kernel never
        # stores would become staging garbage, destroying the aliased
        # input's pass-through data (earlier levels' regions). Interpret
        # mode pre-initializes aliased outputs; hardware does not. The
        # pass-through inputs live in HBM (zero VMEM) and are pulled in
        # with two whole-buffer DMAs.
        def copy_in(sems):
            c0 = pltpu.make_async_copy(pairsN_in, pairsN_ref, sems.at[0])
            c1 = pltpu.make_async_copy(mtp_in, mtp_ref, sems.at[1])
            c0.start()
            c1.start()
            c0.wait()
            c1.wait()

        pl.run_scoped(copy_in, pltpu.SemaphoreType.DMA((2,)))

        def cp_mtu(t, _):
            mtu_ref[t] = mtu_in[t]
            return 0

        jax.lax.fori_loop(0, mtu_ref.shape[0], cp_mtu, 0)

        def deadmark(ref, tile, rem):
            # tail lanes [rem, 128) of the region's last tile become dead
            # payload; live lanes untouched (pure masked store — every
            # live lane is covered by an EMIT masked store later)
            pltpu.store(ref.at[tile], dead, mask=lane >= rem)

        def finalize(do, cur_node, dn, pcur, mcur, ovf):
            """Predicated region allocation for node `cur_node`'s 16
            accumulated slot counts. Returns updated tile cursors."""
            safe_node = jnp.maximum(cur_node, 0)
            for c in range(16):
                cnt = acc_ref[c]
                meta_c = meta_ref[safe_node * 16 + c]
                ntiles = (cnt + LANES - 1) // LANES
                rem = cnt - (ntiles - 1) * LANES
                is_inner = meta_c >= 0
                active = do & (cnt > 0)
                fits_p = pcur + ntiles <= cap_next
                fits_m = mcur + ntiles <= mt_cap
                take_p = active & is_inner & fits_p
                take_m = active & (~is_inner) & fits_m

                @pl.when(do)
                def _(c=c):
                    base_ref[dn * 16 + c] = -1

                @pl.when(take_p)
                def _(meta_c=meta_c, ntiles=ntiles, rem=rem, c=c,
                      pcur=pcur):
                    base_ref[dn * 16 + c] = pcur

                    def put(t, _):
                        unitsN_ref[pcur + t] = meta_c
                        return 0

                    jax.lax.fori_loop(0, ntiles, put, 0)

                    @pl.when(rem < LANES)
                    def _():
                        deadmark(pairsN_ref, pcur + ntiles - 1, rem)

                @pl.when(take_m)
                def _(meta_c=meta_c, ntiles=ntiles, rem=rem, c=c,
                      mcur=mcur):
                    b0 = (-meta_c - 2) >> 5
                    base_ref[dn * 16 + c] = MT_TAG | mcur

                    def put(t, _):
                        mtu_ref[mcur + t] = b0
                        return 0

                    jax.lax.fori_loop(0, ntiles, put, 0)

                    @pl.when(rem < LANES)
                    def _():
                        deadmark(mtp_ref, mcur + ntiles - 1, rem)

                pcur = pcur + jnp.where(take_p, ntiles, 0)
                mcur = mcur + jnp.where(take_m, ntiles, 0)
                ovf = ovf + jnp.where(
                    active & is_inner & (~fits_p), cnt, 0)
                ovf = ovf + jnp.where(
                    active & (~is_inner) & (~fits_m), cnt, 0)
            return pcur, mcur, ovf

        def zero_acc(do):
            @pl.when(do)
            def _():
                for c in range(16):
                    acc_ref[c] = jnp.int32(0)

        zero_acc(jnp.bool_(True))

        def body(carry):
            u, cur, dn, pcur, mcur, ovf = carry
            un = units_ref[u]
            is_new = un != cur
            fin = is_new & (cur >= 0)
            pcur, mcur, ovf = finalize(fin, cur, dn, pcur, mcur, ovf)
            zero_acc(fin)
            dn2 = jnp.where(is_new, dn + 1, dn)
            dn_ref[u] = dn2
            for j in range(4):
                w = ucnt_ref[u * 4 + j]
                for s in range(4):
                    acc_ref[4 * j + s] = (acc_ref[4 * j + s]
                                          + ((w >> (8 * s)) & 255))
            return u + 1, un, dn2, pcur, mcur, ovf

        u, cur, dn, pcur, mcur, ovf = jax.lax.while_loop(
            lambda c: c[0] < nu, body,
            (jnp.int32(0), jnp.int32(-1), jnp.int32(-1),
             jnp.int32(0), mtcur_in[0], jnp.int32(0)))

        pcur, mcur, ovf = finalize(cur >= 0, cur, dn, pcur, mcur, ovf)

        nN_ref[0] = pcur
        mtcur_out[0] = mcur
        ovf_ref[0] = ovf

    return kernel


@functools.lru_cache(maxsize=None)
def _build_prefix(cap_t: int, cap_next: int, mt_cap: int, n16: int,
                  interpret: bool):
    return pl.pallas_call(
        _make_prefix_kernel(cap_t, cap_next, mt_cap),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # units
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_units
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ucnt
            pl.BlockSpec(memory_space=pltpu.SMEM),   # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mt cursor in
            pl.BlockSpec(memory_space=pltpu.HBM),    # pairs_next (alias)
            pl.BlockSpec(memory_space=pltpu.HBM),    # mt_pairs (alias)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mt_units (alias)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dn_of_unit
            pl.BlockSpec(memory_space=pltpu.SMEM),   # base
            pl.BlockSpec(memory_space=pltpu.SMEM),   # units_next
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_units_next
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mt cursor out
            pl.BlockSpec(memory_space=pltpu.SMEM),   # overflow
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pairs_next out
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mt_pairs out
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mt_units out
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_t,), jnp.int32),
            jax.ShapeDtypeStruct((cap_t * 16,), jnp.int32),
            jax.ShapeDtypeStruct((cap_next,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((cap_next, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((mt_cap, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((mt_cap,), jnp.int32),
        ],
        input_output_aliases={5: 6, 6: 7, 7: 8},
        scratch_shapes=[pltpu.SMEM((16,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                8 * (cap_next + mt_cap) * LANES * 4 + (16 << 20),
                100 << 20)),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# EMIT: per unit x active slot, compact the slot's surviving lanes into the
# child's 128-aligned region via an exact one-hot MXU matmul.
# ---------------------------------------------------------------------------

def _make_emit_kernel(cap_t: int, cap_next: int, mt_cap: int):
    def kernel(pairs_ref, masks_ref, n_ref, dn_ref, ucnt_ref, base_ref,
               pairsN_in, mtp_in, pairsN_ref, mtp_ref, wcur_ref):
        nu = n_ref[0]

        # COPY-IN (see prefix): preserve the aliased inputs' pass-through
        # data (prefix's dead-marked tails + earlier levels' MT regions)
        # against whole-window write-back of staging garbage
        def copy_in(sems):
            c0 = pltpu.make_async_copy(pairsN_in, pairsN_ref, sems.at[0])
            c1 = pltpu.make_async_copy(mtp_in, mtp_ref, sems.at[1])
            c0.start()
            c1.start()
            c0.wait()
            c1.wait()

        pl.run_scoped(copy_in, pltpu.SemaphoreType.DMA((2,)))
        tri = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
               >= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
               ).astype(jnp.bfloat16)           # lower-tri incl. diagonal
        iota_col = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        shifts16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

        def route(dest_ref, pay, selT, rT, k, tile0, shift):
            """Write `pay`'s selected lanes to dest tiles, columns
            [shift, shift+k) of tile0 spilling into tile0+1."""
            dst = rT + shift                    # (128,1) target column
            p0 = ((dst == iota_col) & (selT > 0.5)).astype(jnp.float32)
            out0 = jax.lax.dot_general(
                pay, p0, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            # PURE masked stores (no read-modify-write): successive units
            # write overlapping tiles at disjoint columns, and dynamic-
            # index RMW has no load/store ordering guarantee on hardware
            # (observed as payload corruption at scale)
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            m0 = (lane >= shift) & (lane < shift + k)
            pltpu.store(dest_ref.at[tile0], out0, mask=m0)

            @pl.when(shift + k > LANES)
            def _():
                p1 = ((dst - LANES == iota_col)
                      & (selT > 0.5)).astype(jnp.float32)
                out1 = jax.lax.dot_general(
                    pay, p1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                m1 = lane < (shift + k - LANES)
                t1 = jnp.minimum(tile0 + 1, dest_ref.shape[0] - 1)
                pltpu.store(dest_ref.at[t1], out1, mask=m1)

        def body(carry):
            u = carry
            dn = dn_ref[u]

            # first unit of this distinct node: reset its write cursors
            prev_dn = dn_ref[jnp.maximum(u - 1, 0)]
            first = (u == 0) | (prev_dn != dn)

            @pl.when(first)
            def _():
                for c in range(16):
                    wcur_ref[dn * 16 + c] = jnp.int32(0)

            mask = masks_ref[u, :].reshape(1, LANES)
            h16 = ((jax.lax.broadcast_in_dim(mask, (16, LANES), (0, 1))
                    >> shifts16) & 1)            # (16,128) int32
            hT = h16.T.astype(jnp.bfloat16)      # (128,16)
            rank_incl = jax.lax.dot_general(
                tri, hT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (128,16)
            rankT = (rank_incl - hT.astype(jnp.float32)).astype(jnp.int32)
            pay = pairs_ref[u]

            for j in range(4):
                w = ucnt_ref[u * 4 + j]
                for s in range(4):
                    c = 4 * j + s
                    k = (w >> (8 * s)) & 255
                    rec = base_ref[dn * 16 + c]

                    @pl.when((k > 0) & (rec >= 0))
                    def _(c=c, k=k, rec=rec):
                        is_mt = rec >= MT_TAG
                        base_tile = rec & (MT_TAG - 1)
                        wc = wcur_ref[dn * 16 + c]
                        tile0 = base_tile + wc // LANES
                        shift = wc % LANES
                        selT = hT[:, c:c + 1].astype(jnp.float32)
                        rT = rankT[:, c:c + 1]

                        @pl.when(is_mt)
                        def _():
                            route(mtp_ref, pay, selT, rT, k,
                                  jnp.minimum(tile0, mt_cap - 1), shift)

                        @pl.when(jnp.logical_not(is_mt))
                        def _():
                            route(pairsN_ref, pay, selT, rT, k,
                                  jnp.minimum(tile0, cap_next - 1), shift)

                        wcur_ref[dn * 16 + c] = wc + k

            return u + 1

        jax.lax.while_loop(lambda u: u < nu, body, jnp.int32(0))

    return kernel


@functools.lru_cache(maxsize=None)
def _build_emit(cap_t: int, cap_next: int, mt_cap: int, interpret: bool):
    return pl.pallas_call(
        _make_emit_kernel(cap_t, cap_next, mt_cap),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pairs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # masks
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_units
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dn_of_unit
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ucnt
            pl.BlockSpec(memory_space=pltpu.SMEM),   # base
            pl.BlockSpec(memory_space=pltpu.HBM),    # pairs_next (alias)
            pl.BlockSpec(memory_space=pltpu.HBM),    # mt_pairs (alias)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_next, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((mt_cap, 8, LANES), jnp.float32),
        ],
        input_output_aliases={6: 0, 7: 1},
        scratch_shapes=[pltpu.SMEM((cap_t * 16,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                8 * (cap_t + cap_next + mt_cap) * LANES * 4
                + cap_t * LANES * 4 + (16 << 20),
                100 << 20)),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# MT: per unit (one leaf block x one tile of rays), the classic MXU
# Moller-Trumbore block matmul; per-pair results (t, sid, u, v, occ).
# ---------------------------------------------------------------------------

def _make_mt_kernel(mt_cap: int, n_blocks: int, any_hit: bool,
                    mt_prec: str):
    """MT over one window of units. The tri blocks stay in HBM (16-row
    padded for DMA tiling) and each unit's block is DMA-staged — the
    VMEM-resident-operand designs all collided with the platform's
    erratic scoped-VMEM budget (XLA co-schedules the next call's operand
    prefetch, shrinking the per-call limit unpredictably); this shape
    needs only a few MB no matter the scene size, and is the same
    pattern the packet kernel's stream mode runs in production."""
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

    def kernel(mtu_ref, n_ref, mtp_ref, tris_ref, res_ref, ring, sems):
        nu = n_ref[0]
        slot_iota = jax.lax.broadcasted_iota(
            jnp.int32, (64, 1), 0).astype(jnp.float32)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def body(carry):
            u = carry
            bid = jnp.clip(mtu_ref[u], 0, n_blocks - 1)
            cp = pltpu.make_async_copy(tris_ref.at[bid], ring, sems.at[0])
            cp.start()
            pay = mtp_ref[jnp.minimum(u, mt_cap - 1)]
            ox, oy, oz = pay[0:1, :], pay[1:2, :], pay[2:3, :]
            dx, dy, dz = pay[3:4, :], pay[4:5, :], pay[5:6, :]
            tmin, tmax = pay[6:7, :], pay[7:8, :]
            feat = jnp.concatenate([
                dx, dy, dz,
                oy * dz - oz * dy,
                oz * dx - ox * dz,
                ox * dy - oy * dx,
                ox, oy, oz,
                jnp.ones((1, LANES), jnp.float32),
            ], axis=0)                               # (10, 128)
            cp.wait()
            blk = ring[0:10, :]                      # (10, 256)
            out = mt_dot(blk, feat)                  # (256, 128)
            det = out[0:64, :]
            udet = out[64:128, :]
            vdet = out[128:192, :]
            tdet = out[192:256, :]
            s = jnp.where(det >= 0.0, 1.0, -1.0)
            ad = det * s
            us, vs, ts = udet * s, vdet * s, tdet * s
            ok = ((ad > DET_EPS)
                  & (us >= 0.0) & (vs >= 0.0) & (us + vs <= ad)
                  & (ts > tmin * ad) & (ts < tmax * ad))
            if any_hit:
                anyh = jnp.max(ok.astype(jnp.float32), axis=0,
                               keepdims=True)
                occ = anyh > 0.0
                t_r = jnp.where(occ, 0.0, BIG)
                sid_r = jnp.where(occ, 0.0, BIG)
                u_r = jnp.zeros((1, LANES))
                v_r = jnp.zeros((1, LANES))
            else:
                t64 = jnp.where(ok, ts / jnp.maximum(ad, 1e-37), BIG)
                tb = jnp.min(t64, axis=0, keepdims=True)
                found = tb < BIG
                sel = (t64 == tb) & found
                slot = jnp.min(jnp.where(sel, slot_iota, BIG), axis=0,
                               keepdims=True)
                sel = sel & (slot_iota == slot)
                iad = 1.0 / jnp.maximum(
                    jnp.max(jnp.where(sel, ad, 0.0), axis=0,
                            keepdims=True), 1e-37)
                u_r = jnp.max(jnp.where(sel, us, -BIG), axis=0,
                              keepdims=True) * iad
                v_r = jnp.max(jnp.where(sel, vs, -BIG), axis=0,
                              keepdims=True) * iad
                u_r = jnp.where(found, u_r, 0.0)
                v_r = jnp.where(found, v_r, 0.0)
                t_r = tb
                sid_r = jnp.where(found,
                                  jnp.asarray(bid, jnp.float32) * 64.0
                                  + slot, BIG)
            res = jnp.where(
                row8 == 0, jnp.broadcast_to(t_r, (8, LANES)),
                jnp.where(row8 == 1,
                          jnp.broadcast_to(sid_r, (8, LANES)),
                          jnp.where(row8 == 2,
                                    jnp.broadcast_to(u_r, (8, LANES)),
                                    jnp.broadcast_to(v_r, (8, LANES)))))
            res_ref[jnp.minimum(u, mt_cap - 1)] = res
            return u + 1

        jax.lax.while_loop(lambda u: u < nu, body, jnp.int32(0))

        # dead-fill tiles beyond nu (pure stores, no pass-through needed)
        def fill(carry):
            u = carry
            res_ref[u] = jnp.where(row8 <= 1, BIG, 0.0)
            return u + 1

        jax.lax.while_loop(lambda u: u < mt_cap, fill, nu)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_mt(mt_cap: int, n_blocks: int, any_hit: bool, mt_prec: str,
              interpret: bool):
    return pl.pallas_call(
        _make_mt_kernel(mt_cap, n_blocks, any_hit, mt_prec),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mt unit blocks
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_mt
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mt pair window
            pl.BlockSpec(memory_space=pltpu.HBM),    # tri blocks (16-pad)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mt_cap, 8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, 256), jnp.float32),      # block staging
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 * mt_cap * LANES * 4 + (4 << 20)),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# BWD: route results back up through the transposed one-hots — exact
# per-pair min reduction, landing ray-major at level 0.
# ---------------------------------------------------------------------------

def _make_bwd_kernel(cap_t: int, cap_child: int, mt_cap: int):
    def kernel(masks_ref, n_ref, dn_ref, ucnt_ref, base_ref,
               resC_ref, mtres_ref, res_ref, wcur_ref):
        nu = n_ref[0]
        tri = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
               >= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
               ).astype(jnp.bfloat16)
        iota_col = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        shifts16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def gather_back(src_ref, selT, rT, k, tile0, shift):
            """(8,128) contribution routed back to source lanes."""
            dst = rT + shift
            p0 = ((dst == iota_col) & (selT > 0.5)).astype(jnp.float32)
            r0 = src_ref[tile0]
            contrib = jax.lax.dot_general(
                r0, p0, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

            def extra(_):
                p1 = ((dst - LANES == iota_col)
                      & (selT > 0.5)).astype(jnp.float32)
                t1 = jnp.minimum(tile0 + 1, src_ref.shape[0] - 1)
                r1 = src_ref[t1]
                return jax.lax.dot_general(
                    r1, p1, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

            contrib = contrib + jax.lax.cond(
                shift + k > LANES, extra,
                lambda _: jnp.zeros((8, LANES)), 0)
            return contrib

        def body(carry):
            u = carry
            dn = dn_ref[u]
            prev_dn = dn_ref[jnp.maximum(u - 1, 0)]
            first = (u == 0) | (prev_dn != dn)

            @pl.when(first)
            def _():
                for c in range(16):
                    wcur_ref[dn * 16 + c] = jnp.int32(0)

            mask = masks_ref[u, :].reshape(1, LANES)
            h16 = ((jax.lax.broadcast_in_dim(mask, (16, LANES), (0, 1))
                    >> shifts16) & 1)
            hT = h16.T.astype(jnp.bfloat16)
            rank_incl = jax.lax.dot_general(
                tri, hT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            rankT = (rank_incl - hT.astype(jnp.float32)).astype(jnp.int32)

            acc = jnp.where(row8 <= 1, BIG, 0.0)     # t=BIG, sid=BIG

            for j in range(4):
                w = ucnt_ref[u * 4 + j]
                for s in range(4):
                    c = 4 * j + s
                    k = (w >> (8 * s)) & 255
                    rec = base_ref[dn * 16 + c]
                    active = (k > 0) & (rec >= 0)
                    is_mt = rec >= MT_TAG
                    base_tile = rec & (MT_TAG - 1)
                    wc = jnp.where(active, wcur_ref[dn * 16 + c], 0)
                    tile0 = base_tile + wc // LANES
                    shift = wc % LANES
                    selT = hT[:, c:c + 1].astype(jnp.float32)
                    rT = rankT[:, c:c + 1]
                    sel_row = (h16[c:c + 1, :] == 1)

                    def from_mt(_):
                        return gather_back(
                            mtres_ref, selT, rT, k,
                            jnp.minimum(tile0, mt_cap - 1), shift)

                    def from_child(_):
                        return gather_back(
                            resC_ref, selT, rT, k,
                            jnp.minimum(tile0, cap_child - 1), shift)

                    def none(_):
                        return jnp.where(row8 <= 1, BIG, 0.0)

                    contrib = jax.lax.cond(
                        active,
                        lambda _: jax.lax.cond(is_mt, from_mt,
                                               from_child, 0),
                        none, 0)
                    # unselected source lanes carry 0 from the matmul:
                    # force them to miss
                    live = jnp.broadcast_to(sel_row, (8, LANES)) & active
                    contrib = jnp.where(
                        live, contrib, jnp.where(row8 <= 1, BIG, 0.0))
                    t_new, t_old = contrib[0:1, :], acc[0:1, :]
                    s_new, s_old = contrib[1:2, :], acc[1:2, :]
                    better = (t_new < t_old) | ((t_new == t_old)
                                                & (s_new < s_old))
                    acc = jnp.where(jnp.broadcast_to(better, (8, LANES)),
                                    contrib, acc)

                    @pl.when(active)
                    def _(c=c, k=k, wc=wc):
                        wcur_ref[dn * 16 + c] = wc + k

            res_ref[u] = acc
            return u + 1

        jax.lax.while_loop(lambda u: u < nu, body, jnp.int32(0))

    return kernel


@functools.lru_cache(maxsize=None)
def _build_bwd(cap_t: int, cap_child: int, mt_cap: int, interpret: bool):
    return pl.pallas_call(
        _make_bwd_kernel(cap_t, cap_child, mt_cap),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # masks
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n_units
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dn_of_unit
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ucnt
            pl.BlockSpec(memory_space=pltpu.SMEM),   # base
            pl.BlockSpec(memory_space=pltpu.VMEM),   # child results
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mt results
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cap_t, 8, LANES), jnp.float32),
        scratch_shapes=[pltpu.SMEM((cap_t * 16,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                8 * (2 * cap_t + cap_child + mt_cap) * LANES * 4
                + (16 << 20),
                100 << 20)),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Tracer
# ---------------------------------------------------------------------------

def make_bf_tracer(wnodes, wtris, wmeta, wslot=None,
                   interpret: bool | None = None,
                   sort: bool | None = None,
                   mt_precision: str = "highest",
                   seg_rays: int = SEG_RAYS,
                   depth: int | None = None):
    """(trace_closest, trace_any) with the packet tracer's signature.

    wnodes: (N, 128) f32 node rows; wtris: (B, 10, 256) f32 MT blocks;
    wmeta: (N*16,) i32 child metas; wslot: optional slot -> tri id map.
    v1 restrictions (same as the raystream reference spec): world-space
    baked geometry (no instancing), single-block leaves, VMEM-resident
    blocks.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if isinstance(wmeta, jax.core.Tracer):
        # built inside a jit trace (the integrator path): the structural
        # checks need concrete metadata, so the caller must supply the
        # host-computed depth (RenderSettings.bf_depth via the Renderer)
        if depth is None:
            raise ValueError(
                "make_bf_tracer under jit requires depth= (set "
                "settings.bf_depth; the Renderer does this when "
                "tracer='bf')")
    else:
        meta_np = np.asarray(wmeta)
        if depth is None:
            depth = _tree_depth(meta_np)
        if not _all_leaves_single_block(meta_np,
                                        int(np.asarray(wtris).shape[0])):
            raise ValueError(
                "bf tracer v1 requires single-block leaves and a plain "
                "(non-instanced) tree — flatten with instancing='off' "
                "(wide_leaf_cap <= 64 is the build default)")
    wnodes = jnp.asarray(wnodes, jnp.float32)
    wtris = jnp.asarray(wtris, jnp.float32)
    # HBM-resident MT blocks, padded to 16 rows (Mosaic DMA slices must
    # be multiples of the (8,128) sublane tiling; 10 is not)
    wtris16 = jnp.pad(wtris, ((0, 0), (0, 6), (0, 0)))
    wmeta = jnp.asarray(wmeta, jnp.int32)
    if wslot is not None:
        wslot = jnp.asarray(wslot, jnp.int32)
    n_nodes = wnodes.shape[0]
    n_blocks = wtris.shape[0]
    nodes16 = wnodes.reshape(n_nodes, 16, 8)
    if sort is None:
        sort = n_nodes > 64

    # scene bounds for the sort key (jnp only: may run under trace)
    root = wnodes[0].reshape(16, 8)
    rvalid = root[:, 6:7] != -1.0
    scene_lo = jnp.min(jnp.where(rvalid, root[:, 0:3], 1e30), axis=0)
    scene_hi = jnp.max(jnp.where(rvalid, root[:, 3:6], -1e30), axis=0)
    inv_extent = 1.0 / jnp.clip(scene_hi - scene_lo, 1e-12, 1e30)

    def _caps(rt):
        caps = [rt]
        for lvl in range(1, depth + 2):
            mult = PAIR_CAP_MULT[min(lvl, len(PAIR_CAP_MULT) - 1)]
            caps.append(int(np.ceil(mult * rt)) + CAP_SLACK_TILES)
        # MT tiles across ALL levels: measured on a 65k sorted colonnade
        # bounce segment = 6302 tiles (deep leaf children average ~15
        # pairs/tile — the per-child 128-lane round-up dominates, fill
        # ~12% at the deepest level; a known occupancy lever). 14 tiles
        # per ray-tile covers it with ~15% margin; overflow is counted
        # and surfaced, never silent.
        mt_cap = int(np.ceil(MT_CAP_MULT * rt)) + 512
        mt_cap = _cdiv(mt_cap, MT_WIN) * MT_WIN
        return caps, mt_cap

    def _segment(pairs0, rt, any_hit):
        """Trace one segment of rt tiles; returns (res rows (rt,8,128),
        overflow)."""
        caps, mt_cap = _caps(rt)
        units0 = jnp.zeros((rt,), jnp.int32)
        n0 = jnp.full((1,), rt, jnp.int32)
        mtcur = jnp.zeros((1,), jnp.int32)
        mt_pairs = jnp.zeros((mt_cap, 8, LANES), jnp.float32)
        mtu = jnp.zeros((mt_cap,), jnp.int32)
        ovf_total = jnp.int32(0)

        units, n_units, pairs = units0, n0, pairs0
        saved = []
        for lvl in range(depth + 1):
            cap_t = caps[lvl]
            cap_next = caps[lvl + 1]
            masks, ucnt = _build_expand(cap_t, n_nodes, interpret)(
                units, n_units, pairs, nodes16)
            pairs_next = jnp.zeros((cap_next, 8, LANES), jnp.float32)
            (dn, base, units_next, n_next, mtcur, ovf,
             pairs_next, mt_pairs, mtu) = _build_prefix(
                cap_t, cap_next, mt_cap, n_nodes * 16, interpret)(
                units, n_units, ucnt, wmeta, mtcur,
                pairs_next, mt_pairs, mtu)
            pairs_next, mt_pairs = _build_emit(
                cap_t, cap_next, mt_cap, interpret)(
                pairs, masks, n_units, dn, ucnt, base,
                pairs_next, mt_pairs)
            ovf_total = ovf_total + ovf[0]
            saved.append(dict(masks=masks, ucnt=ucnt, dn=dn, base=base,
                              n=n_units, cap=cap_t))
            units, n_units, pairs = units_next, n_next, pairs_next

        # MT in unit windows of MT_WIN tiles: tri blocks stay in HBM and
        # each unit's block is DMA-staged, so a call needs only a few MB
        # of VMEM regardless of scene size or mt_cap
        wins = []
        for w0 in range(0, mt_cap, MT_WIN):
            n_w = jnp.clip(mtcur[0] - w0, 0, MT_WIN).reshape(1)
            mtu_w = jax.lax.slice_in_dim(mtu, w0, w0 + MT_WIN, axis=0)
            mtp_w = jax.lax.slice_in_dim(mt_pairs, w0, w0 + MT_WIN, axis=0)
            wins.append(_build_mt(MT_WIN, n_blocks, any_hit,
                                  mt_precision, interpret)(
                mtu_w, n_w, mtp_w, wtris16))
        mt_res = jnp.concatenate(wins, axis=0)

        res = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, 8, LANES), 1) <= 1,
            BIG, 0.0)
        cap_child = 1
        for lvl in range(depth, -1, -1):
            sv = saved[lvl]
            res = _build_bwd(sv["cap"], cap_child, mt_cap, interpret)(
                sv["masks"], sv["n"], sv["dn"], sv["ucnt"], sv["base"],
                res, mt_res)
            cap_child = sv["cap"]
        return res, ovf_total

    def _run(o, d, tmin, tmax, active, any_hit):
        r = o.shape[0]
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)
        tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
        tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        # payload rides exact-split (bf16x3) matmuls: inf would produce a
        # NaN lo term (inf - bf16(inf)); 1e30 is beyond any scene extent
        tmax = jnp.minimum(tmax, 1e30)
        if active is not None:
            tmax = jnp.where(active, tmax, tmin - 1.0)

        perm = None
        if sort and r >= 4 * LANES:
            key = _ray_sort_key(o, d, scene_lo, inv_extent)
            if active is not None:
                key = jnp.where(active, key, jnp.int32(1 << 30))
            perm = jnp.argsort(key)
            o, d = o[perm], d[perm]
            tmin, tmax = tmin[perm], tmax[perm]

        seg = min(seg_rays, max(LANES, r))
        seg = _cdiv(seg, LANES) * LANES
        n_seg = _cdiv(r, seg)
        outs = []
        ovf = jnp.int32(0)
        for si in range(n_seg):
            lo_i = si * seg
            take = min(seg, r - lo_i)
            rt = _cdiv(take, LANES)
            pad = rt * LANES - take

            def col(x, fill=0.0):
                v = jax.lax.dynamic_slice_in_dim(x, lo_i, take, 0)
                if pad:
                    v = jnp.concatenate(
                        [v, jnp.full((pad,) + v.shape[1:], fill,
                                     v.dtype)])
                return v

            so, sd = col(o), col(d)
            stn = col(tmin)
            stx = col(tmax)
            if pad:
                # padding lanes: dead (tmin=+BIG > tmax)
                lane_i = jnp.arange(rt * LANES)
                stn = jnp.where(lane_i >= take, 1e30, stn)
                stx = jnp.where(lane_i >= take, -1e30, stx)
            pairs0 = jnp.stack([
                so[:, 0], so[:, 1], so[:, 2],
                sd[:, 0], sd[:, 1], sd[:, 2],
                stn, stx,
            ], axis=0).reshape(8, rt, LANES).transpose(1, 0, 2)
            res, so_ovf = _segment(pairs0, rt, any_hit)
            outs.append(res.transpose(1, 0, 2).reshape(8, rt * LANES)
                        [:, :take])
            ovf = ovf + so_ovf

        res = jnp.concatenate(outs, axis=1)   # (8, r)
        t = res[0]
        sid = res[1]
        u = res[2]
        v = res[3]
        hit = sid < BIG

        if perm is not None:
            packed = jnp.stack([t, sid, u, v,
                                hit.astype(jnp.float32)], axis=-1)
            unsorted = jnp.zeros_like(packed).at[perm].set(packed)
            t, sid, u, v = (unsorted[:, 0], unsorted[:, 1],
                            unsorted[:, 2], unsorted[:, 3])
            hit = unsorted[:, 4] > 0.5

        if any_hit:
            return hit, ovf

        slot_id = jnp.where(hit, sid, 0.0).astype(jnp.int32)
        tri = jnp.where(hit, slot_id, -1)
        if wslot is not None:
            tri = jnp.where(hit, wslot[jnp.maximum(tri, 0)], -1)
        rec = HitRecord(
            t=jnp.where(hit, t, INF),
            tri=tri,
            bary=jnp.stack([u, v], axis=-1),
            hit=hit,
            inst=None,
        )
        return rec, ovf

    def trace_closest(o, d, tmin, tmax, active=None) -> HitRecord:
        rec, _ = _run(o, d, tmin, tmax, active, any_hit=False)
        return rec

    def trace_any(o, d, tmin, tmax, active=None):
        occ, _ = _run(o, d, tmin, tmax, active, any_hit=True)
        return occ

    trace_closest.with_overflow = functools.partial(_run, any_hit=False)
    trace_any.with_overflow = functools.partial(_run, any_hit=True)
    return trace_closest, trace_any
