"""Hit-point shading data interpolation (pure JAX).

Parity with Resources::getIntersectionData (kernel.metal:118-188): barycentric
interpolation of normals/tangents/UVs, geometric normal from the edge cross
product, shading frame from normal+tangent(+handedness), and the outgoing
direction in that frame. Geometry is either world-space (instances baked at
flatten) or, on the two-level TLAS/BLAS path, an object-space mesh library —
then `instances` supplies per-lane world transforms (matching the
reference's per-instance objectToWorld use, kernel.metal:118-188) and the
per-(instance, slot) material resolution of renderer_pt.cpp:653-749.
Normal mapping is applied by the caller when a normal texture is bound.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from platinum_tpu.ops import frame as frame_ops
from platinum_tpu.ops.intersect import HitRecord
from platinum_tpu.render.types import Geometry


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HitData:
    pos: jnp.ndarray       # (R, 3) world hit position
    normal: jnp.ndarray    # (R, 3) shading normal (world)
    gnormal: jnp.ndarray   # (R, 3) geometric normal (world)
    uv: jnp.ndarray        # (R, 2)
    wo: jnp.ndarray        # (R, 3) outgoing dir, local frame
    frame_t: jnp.ndarray   # (R, 3)
    frame_b: jnp.ndarray   # (R, 3)
    mat_idx: jnp.ndarray   # (R,) i32

    @property
    def frame(self):
        return self.frame_t, self.frame_b, self.normal


def _norm(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def interpolate_hit(geometry: Geometry, rec: HitRecord, o: jnp.ndarray,
                    d: jnp.ndarray, instances=None) -> HitData:
    import jax.lax as lax

    tri = jnp.where(rec.hit, rec.tri, 0)  # safe gather index on misses
    u = rec.bary[..., 0:1]
    v = rec.bary[..., 1:2]
    w = 1.0 - u - v

    # Two gather-free wide-row lookups (per-lane gathers cost ~1ms/262k lanes
    # on this backend; ops.lookup picks select/one-hot-matmul/gather by table
    # height): tri_shade packs per-corner normals/tangent/uvs, tri_geo packs
    # v0/e1/e2 + the material index.
    from platinum_tpu.ops import lookup

    shade = lookup.rows(geometry.tri_shade, tri)   # (R, 24)
    geo = lookup.rows(geometry.tri_geo, tri)       # (R, 12)

    n0 = shade[..., 0:3]
    n1 = shade[..., 3:6]
    n2 = shade[..., 6:9]
    tangent4 = shade[..., 9:13]
    uv = shade[..., 13:15] * w + shade[..., 15:17] * u + shade[..., 17:19] * v

    normal = _norm(n0 * w + n1 * u + n2 * v)
    tangent = _norm(tangent4[..., :3])
    sign = tangent4[..., 3]
    e1 = geo[..., 3:6]
    e2 = geo[..., 6:9]
    gnormal = _norm(jnp.cross(e1, e2))
    mat_idx = geo[..., 9].astype(jnp.int32)  # value float, see flatten

    if instances is not None and rec.inst is not None:
        inst = jnp.where(rec.hit, rec.inst, 0)
        irow = lookup.rows(instances.rows, inst)       # (R, 24)
        A = irow[..., 0:9].reshape(-1, 3, 3)
        Nm = irow[..., 9:18].reshape(-1, 3, 3)

        def xf(m, v):
            return jnp.einsum("rij,rj->ri", m, v)

        normal = _norm(xf(Nm, normal))
        gnormal = _norm(xf(Nm, gnormal))
        tangent = _norm(xf(A, tangent))
        # library row holds the material SLOT; resolve via the per-
        # (instance, slot) assignment table
        n_slots = instances.slot_mat.shape[1]
        flat_ids = inst * n_slots + jnp.clip(mat_idx, 0, n_slots - 1)
        mat_idx = lookup.rows(
            instances.slot_mat.reshape(-1, 1), flat_ids
        )[..., 0].astype(jnp.int32)

    t = jnp.where(rec.hit, rec.t, 0.0)
    pos = o + d * t[..., None]
    fr = frame_ops.from_nt(normal, tangent, sign)
    wo = frame_ops.world_to_local(fr, -d)

    return HitData(
        pos=pos,
        normal=fr[2],
        gnormal=gnormal,
        uv=uv,
        wo=wo,
        frame_t=fr[0],
        frame_b=fr[1],
        mat_idx=mat_idx,
    )
