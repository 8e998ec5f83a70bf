"""Pallas TPU packet traversal of the 16-wide BVH (accel.wide).

This is the speed-of-light replacement for the pure-XLA lockstep walk in
ops/traverse.py (which is gather-bound at ~1 ns/element on this backend) and
for Metal's hardware `intersector` in the reference (kernel.metal:244-251,
renderer_pt.cpp:244-294). Design, driven by the measured hardware profile:

  * The whole BVH — inner nodes AND triangle rows — is VMEM-resident
    (~128 MB VMEM on v5e; a 300k-tri scene packs to ~20 MB). Traversal
    therefore never touches HBM: no gathers, no DMA latency.
  * Rays are processed in 128-lane packets (one packet per grid step). The
    packet shares one traversal stack (SMEM): a popped inner node tests all
    16 children against all 128 rays as a dense (16, 128) VPU slab test; a
    popped leaf row tests 8 triangles against all 128 rays as dense (8, 128)
    Möller-Trumbore. Divergence costs the *union* of the packet's node
    visits — primary rays are packetised along scanlines and bounce packets
    inherit pixel locality, so the union stays small.
  * Node/leaf records are lane-major (1, 128) rows in memory but compute
    wants sublane-major columns; the MXU does the retile: one
    (128, 128) 0/1 permutation matmul per record turns the row into a
    (128, 1) column from which (16, 1)/(8, 1) component slices are static.
    (Mosaic has no lane->sublane reshape; the MXU is the transpose engine.)
  * Vector -> scalar control flow (which children were hit) is one
    full-reduce per node: sum(anyhit * 2^k) -> 16-bit mask, consumed by a
    branch-free scalar ctz loop off the shared stack. metadata floats ride
    the same MXU transpose (plain-float encoding, exact to 2^24 — see
    accel/wide.py).

The brute tracer (ops/intersect.py) is the oracle; tests require matching
closest hits. Layout/encoding contract is accel/wide.py's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from platinum_tpu.ops.intersect import INF, HitRecord

DET_EPS = 1e-12
LANES = 128
MAX_STEPS = 1 << 22   # watchdog guard against malformed trees
STACK = 64            # >= collapse depth (16-ary over binary SAH: ~8-12)


# ---------------------------------------------------------------------------
# Permutation matrices (MXU retile): row-major record -> column-major comps
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _perm_node() -> np.ndarray:
    """(128,128): node row lane c*8+j -> column row j*16+c (j comp, c child)."""
    p = np.zeros((128, 128), np.float32)
    for j in range(8):
        for c in range(16):
            p[j * 16 + c, c * 8 + j] = 1.0
    return p


@functools.lru_cache(maxsize=None)
def _perm_tri() -> np.ndarray:
    """(128,128): leaf row lane t*16+j -> column row j*8+t (j comp, t tri)."""
    p = np.zeros((128, 128), np.float32)
    for j in range(16):
        for t in range(8):
            p[j * 8 + t, t * 16 + j] = 1.0
    return p


def _transpose_rec(perm_ref, rec):
    """(1,128) record -> (128,1) column via exact 0/1 MXU matmul."""
    return jax.lax.dot_general(
        perm_ref[:, :], rec,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _ctz16(x):
    """Count trailing zeros of a 16-bit power of two (scalar int32)."""
    c = jnp.where((x & 0xAAAA) != 0, 1, 0)
    c = c + jnp.where((x & 0xCCCC) != 0, 2, 0)
    c = c + jnp.where((x & 0xF0F0) != 0, 4, 0)
    return c + jnp.where((x & 0xFF00) != 0, 8, 0)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _make_kernel(any_hit: bool):
    # state scratch rows
    S_T, S_TRI, S_U, S_V = 0, 1, 2, 3

    def kernel(rays_ref, nodes_ref, tris_ref, pn_ref, pt_ref,
               t_ref, tri_ref, u_ref, v_ref,
               state, stash, mstack, mtmp):
        r = rays_ref[0, :, :]
        ox, oy, oz = r[0:1, :], r[1:2, :], r[2:3, :]
        dx, dy, dz = r[3:4, :], r[4:5, :], r[5:6, :]
        tmin, tmax = r[6:7, :], r[7:8, :]

        def inv(v):
            tiny = jnp.where(v < 0, -1e-20, 1e-20)
            return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

        ix, iy, iz = inv(dx), inv(dy), inv(dz)

        state[S_T:S_T + 1, :] = tmax
        state[S_TRI:S_TRI + 1, :] = jnp.full((1, LANES), -1.0)
        state[S_U:S_U + 1, :] = jnp.zeros((1, LANES))
        state[S_V:S_V + 1, :] = jnp.zeros((1, LANES))

        # Exact powers of two: jnp.exp2 is an approximation (exp2(15) =
        # 32767.998...) and the truncating float->int cast of the mask sum
        # then silently drops bit 0. Integer shifts are exact.
        pow2 = (jnp.int32(1) << jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0))

        def expand(node_idx, sp):
            """Slab-test node's 16 children; stash metas + push mask at sp.
            Writes 1 to mtmp[0] iff something was pushed."""
            rec = nodes_ref[pl.ds(node_idx, 1), :]
            col = _transpose_rec(pn_ref, rec)          # (128, 1)
            lox, loy, loz = col[0:16], col[16:32], col[32:48]
            hix, hiy, hiz = col[48:64], col[64:80], col[80:96]
            meta = col[96:112]                          # (16, 1)

            best = state[S_T:S_T + 1, :]
            if any_hit:
                alive = state[S_TRI:S_TRI + 1, :] < 0.0
                best = jnp.where(alive, best, tmin - 1.0)

            t0x = (lox - ox) * ix
            t1x = (hix - ox) * ix
            t0y = (loy - oy) * iy
            t1y = (hiy - oy) * iy
            t0z = (loz - oz) * iz
            t1z = (hiz - oz) * iz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            hit = (tnear <= tfar) & (tfar >= tmin) & (tnear <= best)
            # Empty slots (meta == -1) are NOT culled by their inverted
            # bounds: the slab min/max normalises the interval, so an
            # inverted box covers everything. Mask them out explicitly.
            hit = hit & ((meta >= 0.0) | (meta <= -1.5))
            anyc = jnp.max(hit.astype(jnp.int32), axis=1, keepdims=True)
            m = jnp.sum(anyc * pow2)

            @pl.when(m != 0)
            def _():
                stash[pl.ds(sp * 16, 16), :] = meta
                mstack[sp] = m
                mtmp[0] = 1

        def mt_row(row_idx):
            """Möller-Trumbore: one 8-tri leaf row against all 128 rays."""
            rec = tris_ref[pl.ds(row_idx, 1), :]
            col = _transpose_rec(pt_ref, rec)           # (128, 1)
            v0x, v0y, v0z = col[0:8], col[8:16], col[16:24]
            e1x, e1y, e1z = col[24:32], col[32:40], col[40:48]
            e2x, e2y, e2z = col[48:56], col[56:64], col[64:72]
            tid = col[72:80]                            # (8, 1)

            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(jnp.abs(det) > DET_EPS, 1.0 / det, 0.0)
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

            best = state[S_T:S_T + 1, :]
            if any_hit:
                alive = state[S_TRI:S_TRI + 1, :] < 0.0
                best = jnp.where(alive, best, tmin - 1.0)
            ok = (
                (jnp.abs(det) > DET_EPS)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > tmin) & (t < best)
                & (tid >= 0.0)
            )
            tp = jnp.where(ok, t, jnp.inf)
            t8 = jnp.min(tp, axis=0, keepdims=True)      # (1, 128)
            found = t8 < best
            sel = (tp == t8) & found                      # may tie: pick min tid
            big = jnp.float32(3e38)
            tid_s = jnp.min(jnp.where(sel, tid, big), axis=0, keepdims=True)
            sel = sel & (tid == tid_s)                    # unique winner
            u_s = jnp.max(jnp.where(sel, u, -big), axis=0, keepdims=True)
            v_s = jnp.max(jnp.where(sel, v, -big), axis=0, keepdims=True)

            state[S_T:S_T + 1, :] = jnp.where(found, t8, state[S_T:S_T + 1, :])
            state[S_TRI:S_TRI + 1, :] = jnp.where(
                found, tid_s, state[S_TRI:S_TRI + 1, :]
            )
            state[S_U:S_U + 1, :] = jnp.where(found, u_s, state[S_U:S_U + 1, :])
            state[S_V:S_V + 1, :] = jnp.where(found, v_s, state[S_V:S_V + 1, :])

        # Root (python-int indices: constant-index pl.ds loads miscompile on
        # this toolchain; static slices and genuinely-traced scalars are fine)
        mtmp[0] = 0
        expand(0, 0)
        sp0 = mtmp[0]

        def cond(carry):
            sp, it, alive = carry
            live = (sp > 0) & (it < MAX_STEPS)
            if any_hit:
                live = live & (alive > 0)
            return live

        def body(carry):
            sp, it, _ = carry
            mask = mstack[sp - 1]
            lsb = mask & (-mask)
            c = _ctz16(lsb)
            newmask = mask ^ lsb
            mstack[sp - 1] = newmask
            # Vector load + full reduce, NOT a scalar load: Mosaic does not
            # order scalar-unit loads against the vector-unit stores that
            # filled the stash (observed as nondeterministic stale reads).
            meta_c = jnp.sum(stash[pl.ds((sp - 1) * 16 + c, 1), :])
            sp = sp - jnp.where(newmask == 0, 1, 0)
            is_inner = meta_c >= 0.0

            mtmp[0] = 0

            @pl.when(is_inner)
            def _():
                expand(meta_c.astype(jnp.int32), sp)

            @pl.when(jnp.logical_not(is_inner))
            def _():
                val = (-meta_c - 2.0).astype(jnp.int32)
                row0 = val >> 5
                nrows = val & 31

                def leaf_body(k, _):
                    mt_row(row0 + k)
                    return 0

                jax.lax.fori_loop(0, nrows, leaf_body, 0)

            sp = sp + mtmp[0]
            if any_hit:
                alive = jnp.sum(
                    ((state[S_TRI:S_TRI + 1, :] < 0.0) & (tmax >= tmin))
                    .astype(jnp.float32)
                ).astype(jnp.int32)
            else:
                alive = jnp.int32(1)
            return sp, it + 1, alive

        jax.lax.while_loop(cond, body, (sp0, jnp.int32(0), jnp.int32(1)))

        t_ref[0, :, :] = state[S_T:S_T + 1, :]
        tri_ref[0, :, :] = state[S_TRI:S_TRI + 1, :].astype(jnp.int32)
        u_ref[0, :, :] = state[S_U:S_U + 1, :]
        v_ref[0, :, :] = state[S_V:S_V + 1, :]

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(g: int, n_nodes: int, n_rows: int, any_hit: bool,
                interpret: bool):
    kernel = _make_kernel(any_hit)
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # nodes (whole array)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri rows
            pl.BlockSpec(memory_space=pltpu.VMEM),   # node perm
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri perm
        ],
        out_specs=[
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, LANES), jnp.float32),          # hit state
            pltpu.VMEM((STACK * 16, 1), jnp.float32),     # meta stash
            pltpu.SMEM((STACK,), jnp.int32),              # child-mask stack
            pltpu.SMEM((1,), jnp.int32),                  # push flag
        ],
    )
    vmem_bytes = (n_nodes + n_rows) * LANES * 4 + (4 << 20)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g, 1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, LANES), jnp.int32),
            jax.ShapeDtypeStruct((g, 1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 128 << 20),
        ),
        interpret=interpret,
    )


def _pack_rays(o, d, tmin, tmax, active):
    """(R,3) rays -> (G, 8, 128) packets; dead/padding lanes get tmax<tmin."""
    r = o.shape[0]
    g = -(-r // LANES)
    pad = g * LANES - r
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    if active is not None:
        tmax = jnp.where(active, tmax, tmin - 1.0)

    def comp(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(g, LANES)

    parts = [comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
             comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2])]
    if pad:
        tmin = jnp.concatenate([tmin, jnp.zeros((pad,))])
        tmax = jnp.concatenate([tmax, jnp.full((pad,), -1.0)])
    parts += [tmin.reshape(g, LANES), tmax.reshape(g, LANES)]
    return jnp.stack(parts, axis=1), r, g


def make_packet_tracer(wnodes, wtris, interpret: bool | None = None):
    """(trace_closest, trace_any) over the packed wide BVH arrays.

    wnodes: (N, 128) f32 inner-node rows; wtris: (L, 128) f32 leaf rows
    (see accel.wide). `interpret` forces Pallas interpreter mode (set
    automatically when running on CPU, e.g. the virtual-mesh dry run).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    wnodes = jnp.asarray(wnodes, jnp.float32)
    wtris = jnp.asarray(wtris, jnp.float32)
    pn = jnp.asarray(_perm_node())
    pt = jnp.asarray(_perm_tri())
    n_nodes, n_rows = wnodes.shape[0], wtris.shape[0]

    def _run(o, d, tmin, tmax, active, any_hit):
        rays, r, g = _pack_rays(o, d, tmin, tmax, active)
        call = _build_call(g, n_nodes, n_rows, any_hit, interpret)
        t, tri, u, v = call(rays, wnodes, wtris, pn, pt)
        flat = lambda x: x.reshape(g * LANES)[:r]
        t, tri, u, v = flat(t), flat(tri), flat(u), flat(v)
        hit = tri >= 0
        return HitRecord(
            t=jnp.where(hit, t, INF),
            tri=tri,
            bary=jnp.stack([u, v], axis=-1),
            hit=hit,
        )

    def trace_closest(o, d, tmin, tmax, active=None) -> HitRecord:
        return _run(o, d, tmin, tmax, active, any_hit=False)

    def trace_any(o, d, tmin, tmax, active=None) -> jnp.ndarray:
        return _run(o, d, tmin, tmax, active, any_hit=True).hit

    return trace_closest, trace_any
