"""Geometry sharding: beyond-VMEM scenes distributed across the device mesh.

The single-chip beyond-VMEM path (accel.partition) traces resident
partitions SEQUENTIALLY with carried best-t. On a mesh this becomes a
model-parallel axis: each device keeps K = ceil(P / n_geom) partitions
VMEM-resident and traces the (replicated) ray wave against only those; the
per-device best hits are merged over ICI with an all_gather + in-order fold
that reproduces the sequential path's tie-breaking exactly. A v5e-pod slice
of n chips therefore holds n x ~350k triangles fully VMEM-resident — the
TPU-native equivalent of the reference delegating huge scenes to Metal's
device-memory accel structs (renderer_pt.cpp:653-749), scaled the way the
hardware wants: geometry over ICI, not DMA streaming.

Composes with the existing 'sample'/'tile' ray sharding (parallel.shard) on
a 2D+ mesh: rays shard over 'tile', geometry over 'geom'.

Partition tuples are the FlatScene.wbvh_parts layout (accel.partition /
render.flatten): (nodes, tris, meta, slot[, worder[, inst_feat,
inst_map]]); instanced 7-tuples are supported (partition-of-TLAS,
accel.tlas.partition_instanced). Octant-order tables are not used by the
sharded path (default-off everywhere, PERFORMANCE.md §12).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from platinum_tpu.ops.intersect import INF, HitRecord

F = jnp.float32


def _pad_to(a, n, fill):
    """Pad array `a` to length n on axis 0 with `fill`."""
    if a.shape[0] == n:
        return jnp.asarray(a)
    pad = jnp.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([jnp.asarray(a), pad], axis=0)


def stack_partitions(part_arrays, n_shards: int):
    """Pad every partition to common shapes and stack them into one pytree
    whose leading axis (padded to a multiple of n_shards) shards over the
    geometry mesh axis.

    Padding is traversal-invisible: extra node rows / triangle blocks are
    unreachable (child metas never point at them), padded slot-map entries
    are -1 (no triangle), and pad PARTITIONS are a single root whose 16
    child slots are all empty (the kernel pops the root, expands nothing,
    and retires the packet).
    """
    parts = [tuple(p) for p in part_arrays]
    instanced = any(len(p) > 6 for p in parts)
    k = math.ceil(len(parts) / n_shards)
    total = n_shards * k

    n_nodes = max(int(p[0].shape[0]) for p in parts)
    n_blocks = max(int(p[1].shape[0]) for p in parts)
    n_inst = max((int(p[5].shape[0]) for p in parts if len(p) > 6),
                 default=0)

    nodes, metas, tris, slots, feats, imaps = [], [], [], [], [], []
    empty_node = np.zeros((1, 128), np.float32)
    empty_node[0, 6::8] = -1.0            # component 6 of every child: empty
    empty_node[0, 0::8] = 1e30            # inverted placeholder bounds
    empty_node[0, 3::8] = -1e30
    for p in parts:
        nodes.append(_pad_to(jnp.asarray(p[0], F), n_nodes, 0.0))
        metas.append(_pad_to(jnp.asarray(p[2], jnp.int32), n_nodes * 16, -1))
        tris.append(_pad_to(jnp.asarray(p[1], F), n_blocks, 0.0))
        slots.append(_pad_to(jnp.asarray(p[3], jnp.int32), n_blocks * 64, -1))
        if instanced:
            feats.append(_pad_to(jnp.asarray(p[5], F), n_inst, 0.0))
            imaps.append(_pad_to(jnp.asarray(p[6], jnp.int32), n_inst, 0))
    # pad partitions: one empty root each
    for _ in range(total - len(parts)):
        nodes.append(_pad_to(jnp.asarray(empty_node), n_nodes, 0.0))
        metas.append(jnp.full((n_nodes * 16,), -1, jnp.int32))
        tris.append(jnp.zeros((n_blocks, 10, 256), F))
        slots.append(jnp.full((n_blocks * 64,), -1, jnp.int32))
        if instanced:
            feats.append(jnp.zeros((n_inst, 10, 128), F))
            imaps.append(jnp.zeros((n_inst,), jnp.int32))

    stacked = dict(
        nodes=jnp.stack(nodes), meta=jnp.stack(metas),
        tris=jnp.stack(tris), slot=jnp.stack(slots),
    )
    if instanced:
        stacked["inst_feat"] = jnp.stack(feats)
        stacked["inst_map"] = jnp.stack(imaps)
    return stacked, k


def make_local_geom_tracers(shard: dict, k: int, n: int, axis: str,
                            interpret: bool | None = None,
                            mt_precision: str = "highest"):
    """(trace_closest, trace_any) for use INSIDE a shard_map whose `axis`
    carries the partition shards: trace this device's k partitions with the
    carried-best-t fold, then merge over ICI with an all_gather + in-order
    device fold that reproduces the sequential tracer's tie-breaking
    bit-for-bit. Composable with other mesh axes (sample/tile) in the same
    shard_map body."""
    from platinum_tpu.ops.intersect import fold_partition_tracers
    from platinum_tpu.ops.pallas_trace import make_packet_tracer

    instanced = "inst_feat" in shard
    pairs = [make_packet_tracer(
        shard["nodes"][i], shard["tris"][i], shard["meta"][i],
        shard["slot"][i], interpret=interpret,
        inst_feat=(shard["inst_feat"][i] if instanced else None),
        mt_precision=mt_precision)
        for i in range(k)]

    def trace_closest(o, d, tmin, tmax, active=None) -> HitRecord:
        best = fold_partition_tracers(
            [tc for tc, _ in pairs],
            [shard["inst_map"][i] if instanced else None for i in range(k)],
            o, d, tmin, tmax, active=active, instanced=instanced)
        # ICI merge: gather every device's best and fold in device order —
        # identical to the sequential partition fold (strict < keeps the
        # earliest partition's hit on exact ties). Float payload (t, u, v)
        # and int payload (tri, hit, inst) gather separately: triangle /
        # instance ids must NOT round-trip through float32 (ids >= 2^24
        # would silently round)
        fcols = jnp.stack([best.t, best.bary[:, 0], best.bary[:, 1]],
                          axis=-1)
        icols = [best.tri, best.hit.astype(jnp.int32)]
        if instanced:
            icols.append(best.inst)
        icols = jnp.stack(icols, axis=-1)
        allf = jax.lax.all_gather(fcols, axis)            # (n, r, 3)
        alli = jax.lax.all_gather(icols, axis)            # (n, r, 2|3)
        mt, mf, mi = allf[0, :, 0], allf[0, :, 1:], alli[0]
        for dev in range(1, n):
            closer = (alli[dev, :, 1] > 0) & (allf[dev, :, 0] < mt)
            mt = jnp.where(closer, allf[dev, :, 0], mt)
            mf = jnp.where(closer[:, None], allf[dev, :, 1:], mf)
            mi = jnp.where(closer[:, None], alli[dev], mi)
        hit = mi[:, 1] > 0
        return HitRecord(
            t=jnp.where(hit, mt, INF), tri=mi[:, 0], bary=mf, hit=hit,
            inst=(mi[:, 2] if instanced else None))

    def trace_any(o, d, tmin, tmax, active=None):
        r = o.shape[0]
        occ = jnp.zeros((r,), bool)
        for _, ta in pairs:
            live = (active & ~occ) if active is not None else ~occ
            occ = occ | ta(o, d, tmin, tmax, active=live)
        return jax.lax.psum(occ.astype(jnp.int32), axis) > 0

    return trace_closest, trace_any


def make_geom_sharded_tracer(part_arrays, mesh: Mesh, axis: str = "geom",
                             interpret: bool | None = None,
                             mt_precision: str = "highest"):
    """Standalone (trace_closest, trace_any) over partitions sharded along
    `axis` — the make_partitioned_tracer signature with ray inputs and
    outputs replicated over the axis (every device computes the identical
    merged record). For use OUTSIDE a shard_map; inside one, use
    make_local_geom_tracers (e.g. composed with sample/tile ray sharding
    in make_geom_sharded_step)."""
    n = mesh.shape[axis]
    stacked, k = stack_partitions(part_arrays, n)
    instanced = "inst_feat" in stacked
    spec_shard = {k2: P(axis) for k2 in stacked}
    rep = (P(), P(), P(), P(), P())

    def closest_impl(shard, o, d, tmin, tmax, active):
        tc, _ = make_local_geom_tracers(shard, k, n, axis, interpret,
                                        mt_precision=mt_precision)
        rec = tc(o, d, tmin, tmax, active=active)
        return (rec.t, rec.tri, rec.bary, rec.hit,
                rec.inst if instanced else jnp.zeros_like(rec.tri))

    def any_impl(shard, o, d, tmin, tmax, active):
        _, ta = make_local_geom_tracers(shard, k, n, axis, interpret,
                                        mt_precision=mt_precision)
        return ta(o, d, tmin, tmax, active=active)

    closest_sm = shard_map(closest_impl, mesh=mesh,
                           in_specs=(spec_shard,) + rep,
                           out_specs=(P(), P(), P(), P(), P()),
                           check_rep=False)
    any_sm = shard_map(any_impl, mesh=mesh, in_specs=(spec_shard,) + rep,
                       out_specs=P(), check_rep=False)

    def _bcast(r, tmin, tmax, active):
        act = (jnp.ones((r,), bool) if active is None
               else jnp.asarray(active))
        return (jnp.broadcast_to(jnp.asarray(tmin, F), (r,)),
                jnp.broadcast_to(jnp.asarray(tmax, F), (r,)), act)

    def trace_closest(o, d, tmin, tmax, active=None) -> HitRecord:
        tminb, tmaxb, act = _bcast(o.shape[0], tmin, tmax, active)
        t, tri, bary, hit, inst = closest_sm(stacked, o, d, tminb, tmaxb,
                                             act)
        return HitRecord(t=t, tri=tri, bary=bary, hit=hit,
                         inst=(inst if instanced else None))

    def trace_any(o, d, tmin, tmax, active=None) -> jnp.ndarray:
        tminb, tmaxb, act = _bcast(o.shape[0], tmin, tmax, active)
        return any_sm(stacked, o, d, tminb, tmaxb, act)

    return trace_closest, trace_any


def make_geom_sharded_step(flat, settings, mesh: Mesh,
                           features: frozenset | None = None,
                           interpret: bool | None = None):
    """Full progressive render step with 3-axis sharding: rays over
    'sample' x 'tile' (parallel.shard semantics), geometry over 'geom'.

    Each device traces its tile's rays against only its resident
    partitions; hits merge over ICI inside the bounce loop; shading is
    replicated across the geom axis (trace is ~80% of e2e on partitioned
    scenes — PERFORMANCE.md — so the redundancy is cheap and keeps the
    whole step one shard_map). Returns step(accum, step_idx) -> accum with
    accum sharded over 'tile'; advances S = mesh.shape['sample'] samples.
    """
    from platinum_tpu.models import bsdf as _bsdf
    from platinum_tpu.render.integrator import render_sample

    assert flat.wbvh_parts is not None, "geometry sharding needs wbvh_parts"
    missing = {"geom", "sample", "tile"} - set(mesh.shape)
    if missing:
        # step_impl unconditionally uses axis_index/pmean on all three
        # axes — a size-1 axis is fine, an absent one fails inside jit
        raise ValueError(f"mesh must name axes geom/sample/tile "
                         f"(missing {sorted(missing)}); use size-1 axes "
                         f"for dimensions you don't shard")
    n_geom = mesh.shape["geom"]
    n_sample = mesh.shape["sample"]
    n_tile = mesh.shape["tile"]
    if settings.num_pixels % n_tile:
        raise ValueError(f"num_pixels {settings.num_pixels} not divisible "
                         f"by tile axis {n_tile}")
    shard_px = settings.num_pixels // n_tile
    feats = features if features is not None else _bsdf.ALL_FEATURES
    stacked, k = stack_partitions(flat.wbvh_parts, n_geom)
    import dataclasses

    flat_rep = dataclasses.replace(flat, wbvh_parts=None)

    def step_impl(flat_arg, shard, accum, step_idx):
        t = jax.lax.axis_index("tile").astype(jnp.uint32)
        s = jax.lax.axis_index("sample").astype(jnp.int32)
        pixel_ids = t * shard_px + jnp.arange(shard_px, dtype=jnp.uint32)
        sample_idx = step_idx * n_sample + s
        tracers = make_local_geom_tracers(shard, k, n_geom, "geom",
                                          interpret,
                                          mt_precision=settings.mt_precision)
        radiance = render_sample(flat_arg, settings, sample_idx,
                                 pixel_ids=pixel_ids, tracers=tracers,
                                 features=feats)
        radiance = jax.lax.pmean(radiance, "sample")
        kk = step_idx.astype(jnp.float32)
        return (accum * kk + radiance) / (kk + 1.0)

    spec_shard = {k2: P("geom") for k2 in stacked}
    sharded = shard_map(
        step_impl, mesh=mesh,
        in_specs=(P(), spec_shard, P("tile", None), P()),
        out_specs=P("tile", None),
        check_rep=False,
    )
    step = jax.jit(lambda accum, i: sharded(flat_rep, stacked, accum, i),
                   donate_argnums=(0,))
    return step


def render_geom_sharded(flat, settings, mesh: Mesh,
                        features: frozenset | None = None,
                        steps: int | None = None,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Render settings.spp samples with geometry + ray sharding; returns
    (H, W, 3). The progressive-loop twin of parallel.shard.render_sharded
    for partitioned scenes."""
    n_sample = mesh.shape.get("sample", 1)
    steps = steps if steps is not None else -(-settings.spp // n_sample)
    step = make_geom_sharded_step(flat, settings, mesh, features=features,
                                  interpret=interpret)
    accum = jnp.zeros((settings.num_pixels, 3))
    for i in range(steps):
        accum = step(accum, jnp.int32(i))
    return accum.reshape(settings.height, settings.width, 3)
