"""Device-side scene representation: frozen pytrees of SoA arrays.

This is the TPU equivalent of the reference's argument buffer + resource
tables (renderer_pt.cpp:448-651, 751-792): instead of GPU pointers, a flat
struct-of-arrays pytree with integer indices. Instances are baked (world-space
geometry) so traversal is single-level; the scene graph remains the editable
source of truth and re-flattening is the analogue of the reference's
per-render rebuild.

All arrays are jnp (device); all *static* quantities (image size, flags,
sampler kind, bounce count) live in RenderSettings, which is hashable and
passed as a static argument to jitted render functions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


# Material flag bits (parity with MaterialGPU flags, pt_shader_defs.hpp:85-90)
MAT_ANISOTROPIC = 1
MAT_EMISSIVE = 2
MAT_THIN = 4
MAT_USES_ALPHA = 8

# Renderer flag bits (pt_shader_defs.hpp:75-79)
FLAG_MULTISCATTER_GGX = 1
FLAG_GMON = 2


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Geometry:
    """World-space triangle soup (instances baked)."""

    positions: jnp.ndarray   # (V, 3) f32
    normals: jnp.ndarray     # (V, 3) f32
    tangents: jnp.ndarray    # (V, 4) f32 (xyz + handedness)
    uvs: jnp.ndarray         # (V, 2) f32
    indices: jnp.ndarray     # (T, 3) i32
    tri_material: jnp.ndarray  # (T,) i32 → index into material table
    # Packed per-triangle rows (gathers on this backend cost ~1ms/262k lanes
    # regardless of width, so one wide-row gather replaces a dozen narrow
    # ones):
    tri_geo: jnp.ndarray | None = None    # (T, 12): v0, e1, e2, pad
    tri_shade: jnp.ndarray | None = None  # (T, 24): n0,n1,n2, tan4, uv0,uv1,uv2, pad


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MaterialTable:
    """SoA material table, colors already in the working colorspace."""

    base_color: jnp.ndarray      # (M, 4)
    emission: jnp.ndarray        # (M, 3)  premultiplied by strength, working space
    roughness: jnp.ndarray       # (M,)
    metallic: jnp.ndarray        # (M,)
    transmission: jnp.ndarray    # (M,)
    ior: jnp.ndarray             # (M,)
    anisotropy: jnp.ndarray      # (M,)
    anisotropy_rotation: jnp.ndarray  # (M,)
    clearcoat: jnp.ndarray       # (M,)
    clearcoat_roughness: jnp.ndarray  # (M,)
    flags: jnp.ndarray           # (M,) i32
    # texture slot table: (M, 6) i32 atlas-entry index, -1 = none
    textures: jnp.ndarray
    # Per-material energy rows over cos-theta (K texels): [E, E_ms,
    # E_trans_in, E_trans_out, F_coat_avg, E_F_coat], and scalars
    # [E_avg, E_ms_avg, 0, 0]. Baked from the GGX LUTs at the material's
    # (roughness, ior) — the coat columns at its clearcoat_roughness;
    # valid only when roughness/metallic are untextured (feature
    # 'tex_rough' disables).
    energy: jnp.ndarray | None = None      # (M, K, 6)
    energy_avg: jnp.ndarray | None = None  # (M, 4)
    # One-gather packed scalar row: [base_color(4), emission(3), roughness,
    # metallic, transmission, ior, anisotropy, aniso_rotation, clearcoat,
    # clearcoat_roughness, flags_as_float]
    packed: jnp.ndarray | None = None      # (M, 16)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LightTable:
    """Emissive-triangle table with power CDF (parity with AreaLight,
    pt_shader_defs.hpp:63-68; power = luma_y(emission)·area·π)."""

    tri: jnp.ndarray         # (L,) i32 triangle index into Geometry
    emission: jnp.ndarray    # (L, 3) working space
    area: jnp.ndarray        # (L,) world-space area
    power: jnp.ndarray       # (L,)
    cum_power: jnp.ndarray   # (L,) inclusive prefix sum
    total_power: jnp.ndarray  # () f32
    count: jnp.ndarray       # () i32 — number of valid entries (arrays padded)
    # Alias table over light power (O(1) pick; replaces the reference's
    # binary search, kernel.metal:379-394)
    alias_p: jnp.ndarray | None = None      # (L,)
    alias_idx: jnp.ndarray | None = None    # (L,) i32
    # One-gather packed row: [v0(3), e1(3), e2(3), emission(3), area,
    # power/total, normal? no — derived] (world-space light triangles)
    packed: jnp.ndarray | None = None       # (L, 16)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EnvironmentLight:
    """Equirect env map + alias table (parity with EnvironmentLight +
    Environment alias table, environment.cpp:27-86)."""

    pixels: jnp.ndarray    # (H, W, 3) f32, working space, premultiplied strength
    pdf: jnp.ndarray       # (H*W,) pdf relative to uniform pixel choice
    p: jnp.ndarray         # (H*W,) acceptance prob
    alias: jnp.ndarray     # (H*W,) i32
    count: jnp.ndarray     # () i32 — 0 or 1 (is there an env light?)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CameraConstants:
    """Ray-generation constants (parity with CameraData,
    pt_shader_defs.hpp:52-61, built like renderer_pt.cpp:965-1021)."""

    position: jnp.ndarray        # (3,)
    top_left: jnp.ndarray        # (3,)
    pixel_delta_u: jnp.ndarray   # (3,)
    pixel_delta_v: jnp.ndarray   # (3,)
    aperture_radius: jnp.ndarray  # ()
    aperture_blades: jnp.ndarray  # () f32 (count; float for math)
    roundness: jnp.ndarray       # ()
    bokeh_power: jnp.ndarray     # ()


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class InstanceTable:
    """Per-instance data for the two-level TLAS/BLAS path (accel.tlas):
    geometry stays in object space, stored once per mesh; shading
    transforms interpolated vectors per lane with these rows."""

    # (I, 24) f32: rows pack [A row-major 9 | normal-matrix row-major 9 |
    # pad 6] where A is the object->world linear part
    rows: jnp.ndarray
    # (I, S) f32 material-table row per (instance, material slot)
    slot_mat: jnp.ndarray
    # (I, 10, 128) f32 per-instance MT feature transforms (kernel input)
    feat: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FlatScene:
    geometry: Geometry
    materials: MaterialTable
    lights: LightTable
    env: EnvironmentLight
    camera: CameraConstants
    idt: jnp.ndarray  # (3, 3) sRGB → working-space matrix
    # Acceleration structure arrays (None until accel.bvh attaches them)
    bvh_bounds_lo: jnp.ndarray | None = None  # (N, 3)
    bvh_bounds_hi: jnp.ndarray | None = None  # (N, 3)
    bvh_skip: jnp.ndarray | None = None       # (N,) i32 miss/skip link
    bvh_tri_start: jnp.ndarray | None = None  # (N,) i32 (-1 for inner nodes)
    bvh_tri_count: jnp.ndarray | None = None  # (N,) i32
    # One-gather packed node row: [lo(3), hi(3), skip(bitcast i32),
    # tri_start(bitcast), tri_count(bitcast)] — traversal reads one row/step
    bvh_nodes: jnp.ndarray | None = None      # (N, 12) f32 (ints bitcast)
    # 16-wide VMEM-resident BVH for the Pallas packet tracer (accel.wide):
    # (N, 128) inner-node rows + (B, 10, 256) 64-triangle MT blocks + (N*16,)
    # i32 child-meta table (SMEM-resident during traversal)
    wbvh_nodes: jnp.ndarray | None = None
    wbvh_tris: jnp.ndarray | None = None
    wbvh_meta: jnp.ndarray | None = None
    wbvh_slot: jnp.ndarray | None = None
    wbvh_order: jnp.ndarray | None = None  # (N*16,) per-(node, octant)
                                           # near-first child orders
                                           # (accel.wide.build_octant_orders)
    # Beyond-VMEM scenes (accel.partition): tuple of per-partition
    # (nodes, tris, meta, slot) wide-BVH array tuples, traced sequentially
    # with carried best-t; None when the scene fits one resident structure
    wbvh_parts: tuple | None = None
    # Stream mode (ops.pallas_trace stream=True): wbvh_tris stays in HBM
    # and the kernel DMA-stages each enqueued leaf block into a VMEM ring
    # — ONE structure for beyond-VMEM scenes (only nodes must be
    # resident), instead of the multi-pass partitioned trace
    wbvh_stream: bool = field(default=False, metadata=dict(static=True))
    # Texture atlas (None = no textures in scene). u8 storage encoding
    # when every source texture is 8-bit (4 B/texel; decoded per tap in
    # ops.texturing), f32 linear otherwise.
    atlas: jnp.ndarray | None = None          # (AH, AW, 4) u8 or f32
    atlas_table: jnp.ndarray | None = None    # (K, 5) i32: x, y, w, h, srgb
    # GGX energy-compensation LUTs (ops.luts.Luts pytree)
    luts: object | None = None
    # Two-level instancing (None = instances baked to world space). When
    # set, geometry/* arrays are the OBJECT-space mesh library,
    # geometry.tri_material holds material SLOT ids, and wbvh_* hold the
    # stitched TLAS + per-instance BLAS structure.
    instances: InstanceTable | None = None


@dataclass(frozen=True)
class RenderSettings:
    """Static (compile-time) render configuration — the knobs of the
    reference's Render Settings window (pt_viewport.hpp:79-101)."""

    width: int = 512
    height: int = 512
    spp: int = 128
    max_bounces: int = 50
    kernel: str = "mis"            # "simple" | "mis"
    sampler: str = "halton"        # "halton" | "pcg4d" | "z"
    flags: int = FLAG_MULTISCATTER_GGX
    gmon_buckets: int = 1          # 1 = GMoN off
    gmon_cap: int = 0
    working_space: str = "BT709"
    output_space: str = "sRGB"
    tracer: str = "auto"           # "auto" | "brute" | "bvh" | "packet"
                                   # | "bf" (breadth-first closest waves)
    bf_depth: int = 0              # tracer="bf" under jit: host-computed
                                   # wide-tree depth (Renderer sets it)
    instancing: str = "auto"       # "auto" | "on" | "off" — two-level
                                   # TLAS/BLAS with shared per-mesh geometry
                                   # ("auto": on when a mesh is instanced
                                   # more than once and the packet tracer
                                   # is in play)
    compact: bool = False          # wavefront population-control compaction
    compact_plan: tuple | str | None = None
                                   # compaction schedule override (needs
                                   # compact=True): None = the static
                                   # halve-every-2-bounces default;
                                   # ((cap, bounce_limit), ...) = explicit
                                   # segments; "auto" = probe the scene's
                                   # per-bounce live fractions on-device
                                   # and compile the schedule to them
                                   # (render/autoplan.py — resolved by the
                                   # host entry points, rejected by jitted
                                   # paths if left unresolved)
    spp_batch: int = 1             # samples per wavefront: B>1 rides B
                                   # samples of every pixel in ONE wave
                                   # (B-times wider, 1/B launches per spp;
                                   # identical estimator — see
                                   # integrator.render_sample). Honored by
                                   # render_sample/render_step_n (which
                                   # treat one call as B spp); the
                                   # 1-spp-per-step Renderer/sharded paths
                                   # ignore it
    mixture_pdf: bool = True       # BSDF sampling reports the full mixture
                                   # f/pdf at the sampled direction (exact
                                   # MIS partition of unity; white furnace
                                   # closes to LUT accuracy). False
                                   # reproduces the reference's partial-
                                   # lobe-pdf estimator, which loses ~1%
                                   # on rough dielectrics under MIS (see
                                   # models/bsdf.sample docstring)
    oct_order: bool = False        # near-first octant-ordered traversal for
                                   # closest waves (build-time SMEM orders).
                                   # Wins 3-5% on standalone waves, measured
                                   # NET-NEGATIVE (-8%) e2e on v5e — kept as
                                   # a tested option
    chunk_shade: int = 0           # 0 = dense shading; else shade live-hit
                                   # lanes in sorted fixed-size chunks of
                                   # this many lanes (exact population
                                   # control: shading cost tracks the live
                                   # wavefront). Requires num_pixels to be
                                   # a multiple; alpha scenes fall back to
                                   # dense.
    fuse_shadow: bool = False      # defer NEE occlusion to the next bounce's
                                   # closest wave (one sorted trace launch
                                   # per bounce instead of two); estimator-
                                   # neutral, resolved at loop end
    accel_max_leaf: int = 4        # BVH leaf size (static for traversal unroll)
    wide_leaf_cap: int = 64        # fat-leaf cap for the 16-wide packet BVH
    partition_tris: int = 350_000  # per-partition triangle budget (beyond-
                                   # VMEM scenes split into resident chunks)
    partition_bytes: int = 88 << 20  # per-partition VMEM budget for
                                   # INSTANCED scenes (accel.tlas.
                                   # partition_instanced splits the stitched
                                   # TLAS/BLAS structure when it outgrows
                                   # this; ~the byte equivalent of
                                   # partition_tris for baked soups)
    mt_precision: str = "highest"  # MT block-matmul MXU precision:
                                   # "highest" (6-pass fp32, oracle-exact
                                   # default) | "two_phase" (4-pass bf16x3
                                   # broad phase + exact fp32 re-
                                   # intersection of each lane's top-2
                                   # candidate blocks: exact winners for
                                   # fewer MXU passes) | "high" (3-pass
                                   # bf16x3, ~2^-22 borderline winner
                                   # drift) | "default"
                                   # (1-pass bf16 — image-breaking, RMSE
                                   # 1.7; testing only). See
                                   # perf/bench_precision.py, PERFORMANCE.md
    stream: str = "auto"           # leaf-block HBM streaming (pallas_trace
                                   # stream mode): "auto" (default) = scenes
                                   # over the partition budget trace as ONE
                                   # structure with DMA-staged blocks
                                   # (measured 14% faster than partitioned
                                   # re-walks on the 1M-tri Bistro config;
                                   # perf/bench_stream.py), scenes that fit
                                   # stay fully VMEM-resident; "off" =
                                   # beyond-VMEM scenes partition instead
                                   # (required for geometry sharding, which
                                   # distributes partitions over the device
                                   # mesh); "on" = always stream (testing)
    tile_rays: int = 1 << 18       # rays per trace tile (memory bound)

    @property
    def num_pixels(self) -> int:
        return self.width * self.height
