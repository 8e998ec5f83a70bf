"""Scene → FlatScene compiler ("the flattener").

TPU-native equivalent of the reference's per-render scene upload:
rebuildResourceBuffers + rebuildLightData + updateConstants
(renderer_pt.cpp:448-651, 838-963, 965-1021). Walks the scene graph once,
bakes instance transforms into a world-space triangle soup, builds the SoA
material table (colors converted to the working space), scans for emissive
triangles to build the power-CDF light table, prepares the environment light
(constant colors become 1×1 textures so one sampling path serves both), packs
textures into an atlas, and derives camera ray-gen constants.

Everything here is host-side numpy; the result is device_put as one pytree.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from platinum_tpu.core import colorspace as cs
from platinum_tpu.core.material import NUM_TEXTURE_SLOTS, Material, TextureSlot
from platinum_tpu.core.scene import Scene
from platinum_tpu.core.texture import Texture
from platinum_tpu.core.environment import build_alias_table
from platinum_tpu.render.types import (
    MAT_ANISOTROPIC,
    MAT_EMISSIVE,
    MAT_THIN,
    MAT_USES_ALPHA,
    CameraConstants,
    EnvironmentLight,
    FlatScene,
    Geometry,
    LightTable,
    MaterialTable,
    RenderSettings,
)

F = np.float32


def _camera_constants(scene: Scene, camera_node_id: int, settings: RenderSettings):
    node = scene.node(camera_node_id)
    camera = node.camera
    if camera is None:
        raise ValueError(f"node {camera_node_id} has no camera")
    m = scene.world_transform(camera_node_id)

    # Drop scale from the camera transform (normalize basis columns)
    cols = m[:3, :3]
    norms = np.linalg.norm(cols, axis=0)
    cols = cols / np.maximum(norms, 1e-12)
    u, v, w = cols[:, 0], cols[:, 1], cols[:, 2]
    pos = m[:3, 3]

    aspect = settings.width / settings.height
    vh = camera.focus_distance * camera.cropped_sensor_height(aspect) / camera.focal_length
    vw = vh * aspect

    vu = u * vw
    vv = -v * vh
    top_left = pos - camera.focus_distance * w - (vu + vv) * 0.5

    return CameraConstants(
        position=jnp.asarray(pos, jnp.float32),
        top_left=jnp.asarray(top_left, jnp.float32),
        pixel_delta_u=jnp.asarray(vu / settings.width, jnp.float32),
        pixel_delta_v=jnp.asarray(vv / settings.height, jnp.float32),
        aperture_radius=jnp.float32(camera.aperture_radius_world),
        aperture_blades=jnp.float32(camera.aperture_blades),
        roundness=jnp.float32(camera.roundness),
        bokeh_power=jnp.float32(camera.bokeh_power),
    )


def _pack_atlas(textures: list) -> tuple:
    """Shelf-pack texture images into one atlas. Returns (atlas, table)
    where table[k] = (x, y, w, h, srgb_flag). When every source is 8-bit
    the atlas is stored as uint8 (4 B/texel, 4x smaller than f32 — a
    Sponza-class 4K set fits in a few hundred MB of HBM) and decoded after
    each bilinear tap in ops.texturing; float/HDR sources fall back to the
    f32 atlas (already linear, flag 0)."""
    if not textures:
        return None, None
    u8 = [t.as_u8_rgba() for t in textures]
    use_u8 = all(x is not None for x in u8)
    if use_u8:
        imgs = [x[0] for x in u8]
        flags = [1 if x[1] else 0 for x in u8]
    else:
        imgs = [t.as_float_rgba() for t in textures]
        flags = [0] * len(imgs)
    # Sort by height (shelf packing), keep original order mapping
    order = sorted(range(len(imgs)), key=lambda i: -imgs[i].shape[0])
    max_w = max(i.shape[1] for i in imgs)
    atlas_w = 1 << int(np.ceil(np.log2(max(max_w, 1))))
    atlas_w = max(atlas_w, 128)

    table = [None] * len(imgs)
    shelves = []  # (y, height, x_cursor)
    y_cursor = 0
    for idx in order:
        h, w = imgs[idx].shape[:2]
        placed = False
        for s in shelves:
            if s[1] >= h and s[2] + w <= atlas_w:
                table[idx] = (s[2], s[0], w, h)
                s[2] += w
                placed = True
                break
        if not placed:
            shelves.append([y_cursor, h, w])
            table[idx] = (0, y_cursor, w, h)
            y_cursor += h
    atlas_h = max(y_cursor, 1)
    atlas = np.zeros((atlas_h, atlas_w, 4),
                     dtype=np.uint8 if use_u8 else F)
    for idx, (x, y, w, h) in enumerate(table):
        atlas[y : y + h, x : x + w] = imgs[idx]
    table5 = np.asarray(
        [(x, y, w, h, flags[i]) for i, (x, y, w, h) in enumerate(table)],
        dtype=np.int32,
    )
    return atlas, table5


def _material_arrays(scene, mat_ids, idt, texture_entry):
    """Material SoA + energy rows (shared by the baked and instanced
    flatten paths). Runs after the geometry walk so every used material
    row is registered."""
    n_mat = len(mat_ids)
    base_color = np.zeros((n_mat, 4), F)
    emission = np.zeros((n_mat, 3), F)
    rough = np.zeros(n_mat, F)
    metal = np.zeros(n_mat, F)
    transm = np.zeros(n_mat, F)
    ior = np.zeros(n_mat, F)
    aniso = np.zeros(n_mat, F)
    aniso_rot = np.zeros(n_mat, F)
    coat = np.zeros(n_mat, F)
    coat_rough = np.zeros(n_mat, F)
    flags = np.zeros(n_mat, np.int32)
    tex_table = np.full((n_mat, NUM_TEXTURE_SLOTS), -1, np.int32)

    for row, mid in enumerate(mat_ids):
        mat: Material = scene.resolve_material(mid)
        bc = np.asarray(mat.base_color, F)
        base_color[row, :3] = idt @ bc[:3]
        base_color[row, 3] = bc[3] if len(bc) > 3 else 1.0
        emission[row] = (idt @ np.asarray(mat.emission, F)) * F(mat.emission_strength)
        rough[row] = mat.roughness
        metal[row] = mat.metallic
        transm[row] = mat.transmission
        ior[row] = mat.ior
        aniso[row] = mat.anisotropy
        aniso_rot[row] = mat.anisotropy_rotation
        coat[row] = mat.clearcoat
        coat_rough[row] = mat.clearcoat_roughness

        fl = 0
        if mat.is_emissive():
            fl |= MAT_EMISSIVE
        if mat.anisotropy != 0.0:
            fl |= MAT_ANISOTROPIC
        if mat.thin_transmission:
            fl |= MAT_THIN
        uses_alpha = base_color[row, 3] < 1.0
        for slot, tid in mat.textures.items():
            entry = texture_entry(tid)
            tex_table[row, int(slot)] = entry
            if int(slot) == int(TextureSlot.BASE_COLOR) and entry >= 0:
                tex = scene.asset(tid)
                uses_alpha = uses_alpha or tex.has_alpha
        if uses_alpha:
            fl |= MAT_USES_ALPHA
        flags[row] = fl

    # Per-material energy rows (cheap 1D lookups replacing 2D/3D LUT
    # gathers when roughness/metallic are untextured)
    from platinum_tpu.ops import luts as _lm

    _l = _lm.get_host_luts()  # numpy view — never read device arrays back
    K = 64
    cos_grid = (np.arange(K, dtype=np.float64) + 0.5) / K
    energy = np.zeros((n_mat, K, 6), F)
    energy_avg = np.zeros((n_mat, 4), F)
    for row in range(n_mat):
        rg, io = float(rough[row]), float(ior[row])
        iorp = (io - 1.0) / max(io, 1e-6)
        an = abs(float(aniso[row])) if (flags[row] & MAT_ANISOTROPIC) else 0.0
        if an > 0.0:
            # anisotropy-corrected single-scatter albedo (models/bsdf
            # _sample_E rationale); per-material aniso is a constant, so
            # the gather-free rows bake the correction in for free
            energy[row, :, 0] = _lm.sample3d_np(_l.E_aniso, cos_grid, rg, an)
        else:
            energy[row, :, 0] = _lm.sample2d_np(_l.E, cos_grid, rg)
        if an > 0.0:
            # aniso-corrected dielectric multiscatter albedo (4-D table;
            # models/bsdf._diffuse_factor rationale)
            energy[row, :, 1] = _lm.sample4d_np(
                _l.E_ms_aniso, cos_grid, rg, iorp, an)
        else:
            energy[row, :, 1] = _lm.sample3d_np(_l.E_ms, cos_grid, rg, iorp)
        energy[row, :, 2] = _lm.sample3d_np(_l.E_trans_in, cos_grid, rg, iorp)
        energy[row, :, 3] = _lm.sample3d_np(
            _l.E_trans_out, cos_grid, rg, 1.0 - (1.0 / max(io, 1e-6))
        )
        # clearcoat layering tables at the material's (untexturable) coat
        # roughness — keeps coat scenes on the gather-free rows path
        cr = float(coat_rough[row])
        energy[row, :, 4] = _lm.sample2d_np(_l.F_coat_avg, cos_grid, cr)
        energy[row, :, 5] = _lm.sample2d_np(_l.E_F_coat, cos_grid, cr)
        energy_avg[row, 0] = (_lm.sample2d_np(_l.E_avg_aniso, an, rg)
                              if an > 0.0 else _lm.sample1d_np(_l.E_avg, rg))
        energy_avg[row, 1] = (
            _lm.sample3d_np(_l.E_ms_avg_aniso, iorp, rg, an)
            if an > 0.0 else _lm.sample2d_np(_l.E_ms_avg, iorp, rg))

    mat_packed = np.zeros((n_mat, 16), F)
    mat_packed[:, 0:4] = base_color
    mat_packed[:, 4:7] = emission
    mat_packed[:, 7] = rough
    mat_packed[:, 8] = metal
    mat_packed[:, 9] = transm
    mat_packed[:, 10] = ior
    mat_packed[:, 11] = aniso
    mat_packed[:, 12] = aniso_rot
    mat_packed[:, 13] = coat
    mat_packed[:, 14] = coat_rough
    mat_packed[:, 15] = flags.astype(F)  # value float (|x| < 2^24)

    return MaterialTable(
        base_color=jnp.asarray(base_color),
        emission=jnp.asarray(emission),
        roughness=jnp.asarray(rough),
        metallic=jnp.asarray(metal),
        transmission=jnp.asarray(transm),
        ior=jnp.asarray(ior),
        anisotropy=jnp.asarray(aniso),
        anisotropy_rotation=jnp.asarray(aniso_rot),
        clearcoat=jnp.asarray(coat),
        clearcoat_roughness=jnp.asarray(coat_rough),
        flags=jnp.asarray(flags),
        textures=jnp.asarray(tex_table),
        energy=jnp.asarray(energy),
        energy_avg=jnp.asarray(energy_avg),
        packed=jnp.asarray(mat_packed),
    ), flags, emission


def _light_table(lv0, le1, le2, l_emission) -> LightTable:
    """Emissive-triangle table with power CDF + alias pick, from
    world-space light triangles (v0, e1, e2) and their emission rows
    (parity with rebuildLightData, renderer_pt.cpp:856-915)."""
    if len(lv0):
        area = 0.5 * np.linalg.norm(np.cross(le1, le2), axis=-1)
        le = l_emission
        power = le[:, 1] * area * np.pi
        cum = np.cumsum(power, dtype=np.float64).astype(F)
        _, lp, lalias = build_alias_table(power)
        n_l = len(lv0)
        lpacked = np.zeros((n_l, 16), F)
        lpacked[:, 0:3] = lv0
        lpacked[:, 3:6] = le1
        lpacked[:, 6:9] = le2
        lpacked[:, 9:12] = le
        lpacked[:, 12] = area
        lpacked[:, 13] = power / max(float(cum[-1]), 1e-20)
        lpacked[:, 14] = lp
        # alias index as a VALUE float (not bitcast): packed rows feed the
        # one-hot-matmul lookup path, which only copies normal floats exactly
        lpacked[:, 15] = lalias.astype(F)
        return LightTable(
            tri=jnp.zeros(n_l, jnp.int32),
            emission=jnp.asarray(le),
            area=jnp.asarray(area.astype(F)),
            power=jnp.asarray(power.astype(F)),
            cum_power=jnp.asarray(cum),
            total_power=jnp.float32(cum[-1]),
            count=jnp.int32(n_l),
            alias_p=jnp.asarray(lp),
            alias_idx=jnp.asarray(lalias.astype(np.int32)),
            packed=jnp.asarray(lpacked),
        )
    z = np.zeros(1, F)
    return LightTable(
        tri=jnp.zeros(1, jnp.int32),
        emission=jnp.zeros((1, 3), jnp.float32),
        area=jnp.asarray(z),
        power=jnp.asarray(z),
        cum_power=jnp.asarray(z),
        total_power=jnp.float32(0),
        count=jnp.int32(0),
        alias_p=jnp.ones(1, jnp.float32),
        alias_idx=jnp.zeros(1, jnp.int32),
        packed=jnp.zeros((1, 16), jnp.float32),
    )


def _environment_light(scene, idt) -> EnvironmentLight:
    env = scene.environment
    if env.has_texture and scene.asset(env.texture_id) is not None:
        tex: Texture = scene.asset(env.texture_id)
        px = tex.as_float_rgba()[..., :3]
    else:
        px = np.asarray(env.constant_color, F).reshape(1, 1, 3)
    px = (px @ idt.T * F(env.strength)).astype(F)
    has_env = bool(px.max() > 0.0)
    luma = np.maximum(px @ cs.luminance_weights(cs.BT709), 0.0).reshape(-1)
    pdf, p, alias = build_alias_table(luma)
    return EnvironmentLight(
        pixels=jnp.asarray(px),
        pdf=jnp.asarray(pdf),
        p=jnp.asarray(p),
        alias=jnp.asarray(alias.astype(np.int32)),
        count=jnp.int32(1 if has_env else 0),
    )


def flatten_scene(
    scene: Scene,
    camera_node_id: int | None = None,
    settings: RenderSettings | None = None,
    build_accel: bool = True,
    accel_min_tris: int = 32,
    accel_max_leaf: int | None = None,
    host_accel_out: dict | None = None,
) -> FlatScene:
    """Compile `scene` to a device FlatScene. `host_accel_out`, when a
    dict, receives the host-side instanced accel ({"ibvh", "mesh_wides",
    "instances"}) so callers (Renderer) can refit transforms without a
    rebuild."""
    settings = settings or RenderSettings()
    if accel_max_leaf is None:
        accel_max_leaf = settings.accel_max_leaf
    working = cs.get_colorspace(settings.working_space)
    idt = cs.transform(cs.BT709, working)  # material colors are authored in sRGB

    if camera_node_id is None:
        cams = scene.get_cameras()
        if not cams:
            raise ValueError("scene has no camera")
        camera_node_id = cams[0][0]

    instances = scene.get_instances()

    # ------------------------------------------------------------------
    # Material table: dedupe (material asset id) + per-texture atlas slots
    # ------------------------------------------------------------------
    mat_ids: list = []      # asset id or None (default), in table order
    mat_index: dict = {}    # asset id/None → table row

    def material_row(mid) -> int:
        key = mid if mid is not None else None
        if key not in mat_index:
            mat_index[key] = len(mat_ids)
            mat_ids.append(key)
        return mat_index[key]

    # Texture table: asset id → atlas entry index
    tex_assets: list = []
    tex_index: dict = {}

    def texture_entry(tid) -> int:
        if tid is None or scene.asset(tid) is None:
            return -1
        if tid not in tex_index:
            tex_index[tid] = len(tex_assets)
            tex_assets.append(scene.asset(tid))
        return tex_index[tid]

    # ------------------------------------------------------------------
    # Two-level instancing decision (renderer_pt.cpp:653-749 builds one
    # BLAS per mesh + a TLAS over instances; the baked path below is the
    # out-of-core-friendly fallback and the oracle for tests)
    # ------------------------------------------------------------------
    n_unique = len({id(i.mesh) for i in instances}) if instances else 0
    use_instancing = build_accel and settings.tracer in ("packet", "auto") and (
        settings.instancing == "on"
        or (settings.instancing == "auto" and len(instances) > n_unique)
    )
    if use_instancing:
        total_tris = sum(i.mesh.num_triangles for i in instances)
        use_instancing = total_tris >= accel_min_tris
    if use_instancing:
        # Degenerate (non-invertible) instance transforms — e.g. a zero
        # scale axis used to flatten an object — cannot ride the
        # instanced path (BLAS entry needs A^-1 for the ray feature
        # transform); the baked-soup path below handles them exactly
        # like the reference's world-space build (renderer_pt.cpp:653)
        dets = [abs(np.linalg.det(np.asarray(i.transform,
                                             np.float64)[:3, :3]))
                for i in instances]
        use_instancing = min(dets) > 1e-12
    if use_instancing:
        return _flatten_instanced(
            scene, camera_node_id, settings, instances, material_row,
            texture_entry, mat_ids, tex_assets, idt, accel_max_leaf,
            host_accel_out)

    # ------------------------------------------------------------------
    # Geometry: bake instances into world space
    # ------------------------------------------------------------------
    positions, normals, tangents, uvs, indices, tri_mats = [], [], [], [], [], []
    tri_nodes = []
    v_off = 0
    for inst in instances:
        mesh = inst.mesh
        m, nm = inst.transform, inst.normal_transform
        wp = mesh.positions @ m[:3, :3].T + m[:3, 3]
        wn = mesh.normals @ nm.T
        wn /= np.maximum(np.linalg.norm(wn, axis=-1, keepdims=True), 1e-12)
        wt3 = mesh.tangents[:, :3] @ m[:3, :3].T
        wt3 /= np.maximum(np.linalg.norm(wt3, axis=-1, keepdims=True), 1e-12)

        positions.append(wp.astype(F))
        normals.append(wn.astype(F))
        tangents.append(np.concatenate([wt3, mesh.tangents[:, 3:4]], -1).astype(F))
        uvs.append(mesh.uvs.astype(F))
        indices.append(mesh.indices.astype(np.int64) + v_off)

        # Map per-triangle slots through this instance's material assignment
        slot_rows = np.array(
            [
                material_row(
                    inst.material_ids[s] if s < len(inst.material_ids) else None
                )
                for s in range(mesh.num_material_slots)
            ],
            dtype=np.int32,
        )
        tri_mats.append(slot_rows[mesh.material_slots])
        tri_nodes.append(np.full(mesh.num_triangles, inst.node_id, np.int32))
        v_off += mesh.num_vertices

    if not positions:
        raise ValueError("scene has no visible mesh instances")

    positions = np.concatenate(positions)
    normals = np.concatenate(normals)
    tangents = np.concatenate(tangents)
    uvs = np.concatenate(uvs)
    indices = np.concatenate(indices).astype(np.int32)
    tri_mats = np.concatenate(tri_mats).astype(np.int32)
    tri_nodes = np.concatenate(tri_nodes).astype(np.int32)

    # ------------------------------------------------------------------
    # Acceleration structure: build the BVH and reorder triangles into
    # leaf-contiguous order (the TPU traversal gathers leaf ranges)
    # ------------------------------------------------------------------
    bvh_arrays = {}
    bvh_host = None
    if build_accel and len(indices) >= accel_min_tris:
        from platinum_tpu.accel import get_builder

        bvh = bvh_host = get_builder()(
            positions[indices[:, 0]],
            positions[indices[:, 1]],
            positions[indices[:, 2]],
            max_leaf=accel_max_leaf,
        )
        indices = indices[bvh.tri_order]
        tri_mats = tri_mats[bvh.tri_order]
        tri_nodes = tri_nodes[bvh.tri_order]
        bvh_arrays = dict(
            bvh_bounds_lo=jnp.asarray(bvh.bounds_lo),
            bvh_bounds_hi=jnp.asarray(bvh.bounds_hi),
            bvh_skip=jnp.asarray(bvh.skip),
            bvh_tri_start=jnp.asarray(bvh.tri_start),
            bvh_tri_count=jnp.asarray(bvh.tri_count),
        )

    materials, flags, emission = _material_arrays(
        scene, mat_ids, idt, texture_entry)

    # ------------------------------------------------------------------
    # Lights + environment (shared helpers)
    # ------------------------------------------------------------------
    emissive_rows = np.nonzero(flags & MAT_EMISSIVE)[0]
    light_tris = np.nonzero(np.isin(tri_mats, emissive_rows))[0].astype(np.int32)
    tri_l = indices[light_tris]
    lv0 = positions[tri_l[:, 0]]
    lights = _light_table(lv0, positions[tri_l[:, 1]] - lv0,
                          positions[tri_l[:, 2]] - lv0,
                          emission[tri_mats[light_tris]])
    env_light = _environment_light(scene, idt)

    atlas, atlas_table = _pack_atlas(tex_assets)

    # ------------------------------------------------------------------
    # Packed wide rows (one gather each at trace time)
    # ------------------------------------------------------------------
    tri = indices
    v0w = positions[tri[:, 0]]
    e1w = positions[tri[:, 1]] - v0w
    e2w = positions[tri[:, 2]] - v0w
    t_cnt = len(tri)
    tri_geo = np.zeros((t_cnt, 12), F)
    tri_geo[:, 0:3] = v0w
    tri_geo[:, 3:6] = e1w
    tri_geo[:, 6:9] = e2w
    # mat/node ids as VALUE floats (|x| < 2^24): survive the one-hot-matmul
    # lookup path exactly, unlike bitcast bit patterns
    tri_geo[:, 9] = tri_mats.astype(F)
    tri_geo[:, 10] = tri_nodes.astype(F)  # node id (studio picking AOV)
    tri_shade = np.zeros((t_cnt, 24), F)
    tri_shade[:, 0:3] = normals[tri[:, 0]]
    tri_shade[:, 3:6] = normals[tri[:, 1]]
    tri_shade[:, 6:9] = normals[tri[:, 2]]
    tri_shade[:, 9:13] = tangents[tri[:, 0]]
    tri_shade[:, 13:15] = uvs[tri[:, 0]]
    tri_shade[:, 15:17] = uvs[tri[:, 1]]
    tri_shade[:, 17:19] = uvs[tri[:, 2]]

    if bvh_host is not None:
        bn = np.zeros((bvh_host.num_nodes, 12), F)
        bn[:, 0:3] = bvh_host.bounds_lo
        bn[:, 3:6] = bvh_host.bounds_hi
        bn[:, 6] = bvh_host.skip.astype(np.int32).view(np.float32)
        bn[:, 7] = bvh_host.tri_start.astype(np.int32).view(np.float32)
        bn[:, 8] = bvh_host.tri_count.astype(np.int32).view(np.float32)
        bvh_arrays["bvh_nodes"] = jnp.asarray(bn)
        # 16-wide packed BVH for the Pallas packet tracer (accel.wide);
        # beyond-VMEM scenes split into resident partitions (accel.partition)
        from platinum_tpu.accel.wide import build_octant_orders, build_wide_bvh

        stream = settings.stream == "on" or (
            settings.stream == "auto"
            and len(tri_geo) > settings.partition_tris)
        if stream:
            # beyond-VMEM via HBM leaf-block streaming: ONE structure,
            # blocks DMA-staged at trace time (ops.pallas_trace stream)
            bvh_arrays["wbvh_stream"] = True
        if not stream and len(tri_geo) > settings.partition_tris:
            from platinum_tpu.accel.partition import partition_bvh

            parts = []
            for part in partition_bvh(bvh_host, settings.partition_tris):
                w = build_wide_bvh(
                    part.bvh,
                    tri_geo[part.tri_base:part.tri_base + part.tri_count],
                    leaf_cap=settings.wide_leaf_cap)
                slot_g = np.where(w.tri_of_slot >= 0,
                                  w.tri_of_slot + part.tri_base, -1)
                parts.append((jnp.asarray(w.nodes),
                              jnp.asarray(w.tri_blocks),
                              jnp.asarray(w.meta),
                              jnp.asarray(slot_g.astype(np.int32)),
                              jnp.asarray(build_octant_orders(w.nodes))))
            bvh_arrays["wbvh_parts"] = tuple(parts)
        else:
            wide = build_wide_bvh(bvh_host, tri_geo,
                                  leaf_cap=settings.wide_leaf_cap)
            bvh_arrays["wbvh_nodes"] = jnp.asarray(wide.nodes)
            bvh_arrays["wbvh_tris"] = jnp.asarray(wide.tri_blocks)
            bvh_arrays["wbvh_meta"] = jnp.asarray(wide.meta)
            bvh_arrays["wbvh_slot"] = jnp.asarray(
                wide.tri_of_slot.astype(np.int32))
            bvh_arrays["wbvh_order"] = jnp.asarray(
                build_octant_orders(wide.nodes))

    flat = FlatScene(
        geometry=Geometry(
            positions=jnp.asarray(positions),
            normals=jnp.asarray(normals),
            tangents=jnp.asarray(tangents),
            uvs=jnp.asarray(uvs),
            indices=jnp.asarray(indices),
            tri_material=jnp.asarray(tri_mats),
            tri_geo=jnp.asarray(tri_geo),
            tri_shade=jnp.asarray(tri_shade),
        ),
        materials=materials,
        lights=lights,
        env=env_light,
        camera=_camera_constants(scene, camera_node_id, settings),
        idt=jnp.asarray(idt),
        atlas=jnp.asarray(atlas) if atlas is not None else None,
        atlas_table=jnp.asarray(atlas_table) if atlas_table is not None else None,
        luts=_get_luts(),
        **bvh_arrays,
    )
    return flat


def _flatten_instanced(scene, camera_node_id, settings, instances,
                       material_row, texture_entry, mat_ids, tex_assets,
                       idt, accel_max_leaf, host_accel_out=None):
    """Two-level TLAS/BLAS flatten (renderer_pt.cpp:653-749 equivalence):
    geometry stays an OBJECT-space per-mesh library (stored once), each
    instance contributes world-space BLAS node rows + a feature-transform
    matrix (accel.tlas), and shading resolves per-(instance, slot)
    materials and world transforms per lane (ops.hitdata)."""
    from platinum_tpu.accel import get_builder
    from platinum_tpu.accel.tlas import build_instanced_bvh
    from platinum_tpu.accel.wide import build_octant_orders, build_wide_bvh
    from platinum_tpu.render.types import InstanceTable

    # ---- mesh library (unique meshes, object space, BVH-ordered) --------
    mesh_index: dict = {}
    mesh_list: list = []
    for inst in instances:
        if id(inst.mesh) not in mesh_index:
            mesh_index[id(inst.mesh)] = len(mesh_list)
            mesh_list.append(inst.mesh)

    positions, normals, tangents, uvs, indices = [], [], [], [], []
    tri_slots, mesh_tri_base, mesh_wides = [], [], []
    v_off = t_off = 0
    builder = get_builder()
    for mesh in mesh_list:
        p = mesh.positions
        idx = mesh.indices.astype(np.int64)
        bvh = builder(p[idx[:, 0]], p[idx[:, 1]], p[idx[:, 2]],
                      max_leaf=accel_max_leaf)
        idxm = idx[bvh.tri_order]
        positions.append(p.astype(F))
        normals.append(mesh.normals.astype(F))
        tangents.append(mesh.tangents.astype(F))
        uvs.append(mesh.uvs.astype(F))
        indices.append(idxm + v_off)
        tri_slots.append(mesh.material_slots[bvh.tri_order].astype(np.int32))
        mesh_tri_base.append(t_off)
        v0 = p[idxm[:, 0]]
        tg = np.concatenate([v0, p[idxm[:, 1]] - v0, p[idxm[:, 2]] - v0,
                             np.zeros((len(idxm), 3), F)], -1).astype(F)
        mesh_wides.append(build_wide_bvh(bvh, tg,
                                         leaf_cap=settings.wide_leaf_cap))
        v_off += mesh.num_vertices
        t_off += len(idxm)

    positions = np.concatenate(positions)
    normals = np.concatenate(normals)
    tangents = np.concatenate(tangents)
    uvs = np.concatenate(uvs)
    indices = np.concatenate(indices).astype(np.int32)
    tri_slots_l = np.concatenate(tri_slots)

    # ---- per-instance tables --------------------------------------------
    n_inst = len(instances)
    max_slots = max(m.num_material_slots for m in mesh_list)
    inst_rows = np.zeros((n_inst, 24), F)
    slot_mat = np.zeros((n_inst, max_slots), F)
    inst_mesh_mat = []
    for i, inst in enumerate(instances):
        mi = mesh_index[id(inst.mesh)]
        m, nm = np.asarray(inst.transform, np.float64), inst.normal_transform
        inst_mesh_mat.append((mi, m))
        inst_rows[i, 0:9] = m[:3, :3].reshape(-1)
        inst_rows[i, 9:18] = np.asarray(nm, np.float64).reshape(-1)
        inst_rows[i, 18] = float(inst.node_id)   # studio picking AOV
        for s in range(inst.mesh.num_material_slots):
            mid = (inst.material_ids[s]
                   if s < len(inst.material_ids) else None)
            slot_mat[i, s] = material_row(mid)

    # Beyond-VMEM instanced scenes: split into spatial instance groups, one
    # resident TLAS/BLAS structure each, traced sequentially with carried
    # best-t (accel.tlas.partition_instanced + accel.partition tracer).
    # Projected single-structure footprint decides — cheap to compute and
    # avoids assembling a structure we would only throw away.
    mesh_blk = {m: w.tri_blocks.nbytes for m, w in enumerate(mesh_wides)}
    projected = (sum(mesh_blk.values())
                 + sum(mesh_wides[mi].nodes.nbytes + 10 * 128 * 4
                       for mi, _ in inst_mesh_mat))
    ibvh = None
    ibvh_parts = None
    inst_stream = settings.stream == "on" or (
        settings.stream == "auto" and projected > settings.partition_bytes)
    if projected > settings.partition_bytes and not inst_stream:
        from platinum_tpu.accel.tlas import partition_instanced

        ibvh_parts = partition_instanced(mesh_wides, mesh_tri_base,
                                         inst_mesh_mat,
                                         settings.partition_bytes)
    else:
        # one structure; with inst_stream the mesh-library MT blocks stay
        # in HBM and only the node rows must be VMEM-resident
        ibvh = build_instanced_bvh(mesh_wides, mesh_tri_base, inst_mesh_mat)
    if host_accel_out is not None:
        host_accel_out.update(ibvh=ibvh, ibvh_parts=ibvh_parts,
                              mesh_wides=mesh_wides,
                              mesh_tri_base=list(mesh_tri_base),
                              instances=list(instances))

    materials, flags, emission = _material_arrays(
        scene, mat_ids, idt, texture_entry)

    # ---- lights: world-space emissive triangles per instance ------------
    lv0, le1, le2, lem = [], [], [], []
    for i, inst in enumerate(instances):
        mi = mesh_index[id(inst.mesh)]
        base = mesh_tri_base[mi]
        n_tri = mesh_list[mi].num_triangles
        slots = tri_slots_l[base:base + n_tri]
        rows = slot_mat[i, np.clip(slots, 0, max_slots - 1)].astype(np.int64)
        em = (flags[rows] & MAT_EMISSIVE) != 0
        if not em.any():
            continue
        tr = indices[base:base + n_tri][em]
        a = np.asarray(inst.transform, np.float64)
        wp = positions[tr.reshape(-1)] @ a[:3, :3].T + a[:3, 3]
        wp = wp.reshape(-1, 3, 3).astype(F)
        lv0.append(wp[:, 0])
        le1.append(wp[:, 1] - wp[:, 0])
        le2.append(wp[:, 2] - wp[:, 0])
        lem.append(emission[rows[em]])
    if lv0:
        lights = _light_table(np.concatenate(lv0), np.concatenate(le1),
                              np.concatenate(le2), np.concatenate(lem))
    else:
        lights = _light_table(np.zeros((0, 3), F), np.zeros((0, 3), F),
                              np.zeros((0, 3), F), np.zeros((0, 3), F))

    env_light = _environment_light(scene, idt)
    atlas, atlas_table = _pack_atlas(tex_assets)

    # ---- packed per-triangle library rows -------------------------------
    tri = indices
    v0o = positions[tri[:, 0]]
    t_cnt = len(tri)
    tri_geo = np.zeros((t_cnt, 12), F)
    tri_geo[:, 0:3] = v0o
    tri_geo[:, 3:6] = positions[tri[:, 1]] - v0o
    tri_geo[:, 6:9] = positions[tri[:, 2]] - v0o
    tri_geo[:, 9] = tri_slots_l.astype(F)   # SLOT id (resolved per instance)
    tri_shade = np.zeros((t_cnt, 24), F)
    tri_shade[:, 0:3] = normals[tri[:, 0]]
    tri_shade[:, 3:6] = normals[tri[:, 1]]
    tri_shade[:, 6:9] = normals[tri[:, 2]]
    tri_shade[:, 9:13] = tangents[tri[:, 0]]
    tri_shade[:, 13:15] = uvs[tri[:, 0]]
    tri_shade[:, 15:17] = uvs[tri[:, 1]]
    tri_shade[:, 17:19] = uvs[tri[:, 2]]

    return FlatScene(
        geometry=Geometry(
            positions=jnp.asarray(positions),
            normals=jnp.asarray(normals),
            tangents=jnp.asarray(tangents),
            uvs=jnp.asarray(uvs),
            indices=jnp.asarray(indices),
            tri_material=jnp.asarray(tri_slots_l),
            tri_geo=jnp.asarray(tri_geo),
            tri_shade=jnp.asarray(tri_shade),
        ),
        materials=materials,
        lights=lights,
        env=env_light,
        camera=_camera_constants(scene, camera_node_id, settings),
        idt=jnp.asarray(idt),
        atlas=jnp.asarray(atlas) if atlas is not None else None,
        atlas_table=(jnp.asarray(atlas_table)
                     if atlas_table is not None else None),
        luts=_get_luts(),
        **(dict(_instanced_accel_arrays(ibvh, build_octant_orders),
                wbvh_stream=inst_stream)
           if ibvh is not None
           else dict(wbvh_parts=tuple(
               _instanced_part_arrays(part, gids, build_octant_orders)
               for part, gids, _ in ibvh_parts))),
        instances=InstanceTable(
            rows=jnp.asarray(inst_rows),
            slot_mat=jnp.asarray(slot_mat),
            feat=jnp.asarray(_global_inst_feat(ibvh, ibvh_parts, n_inst)),
        ),
    )


def _instanced_accel_arrays(ibvh, build_octant_orders):
    """FlatScene accel kwargs for a single resident TLAS/BLAS structure."""
    return dict(
        wbvh_nodes=jnp.asarray(ibvh.nodes),
        wbvh_tris=jnp.asarray(ibvh.tri_blocks),
        wbvh_meta=jnp.asarray(ibvh.meta),
        wbvh_slot=jnp.asarray(ibvh.tri_of_slot.astype(np.int32)),
        wbvh_order=jnp.asarray(build_octant_orders(np.asarray(ibvh.nodes))),
    )


def _instanced_part_arrays(ibvh, global_ids, build_octant_orders):
    """One partition's 7-tuple for accel.partition.make_partitioned_tracer:
    (nodes, tris, meta, slot, worder, inst_feat, local->global map)."""
    return (jnp.asarray(ibvh.nodes),
            jnp.asarray(ibvh.tri_blocks),
            jnp.asarray(ibvh.meta),
            jnp.asarray(ibvh.tri_of_slot.astype(np.int32)),
            jnp.asarray(build_octant_orders(np.asarray(ibvh.nodes))),
            jnp.asarray(ibvh.inst_feat),
            jnp.asarray(global_ids.astype(np.int32)))


def _global_inst_feat(ibvh, ibvh_parts, n_inst):
    """Globally-indexed (I, 10, 128) feature transforms — direct from the
    single structure, or scattered from each partition's local rows."""
    if ibvh is not None:
        return ibvh.inst_feat
    feat = np.zeros((n_inst, 10, 128), F)
    for part, gids, _ in ibvh_parts:
        feat[gids] = part.inst_feat
    return feat


def _get_luts():
    from platinum_tpu.ops.luts import get_luts

    return get_luts()


def analyze_features(flat: FlatScene) -> frozenset:
    """Static BSDF lobe/feature set for this scene (host-side analysis of
    the material table), used to prune unused lobes at trace time."""
    from platinum_tpu.models.bsdf import scene_features

    class _HostMats:
        pass

    host = _HostMats()
    for name in ("metallic", "transmission", "clearcoat", "clearcoat_roughness",
                 "anisotropy", "roughness", "flags", "textures"):
        setattr(host, name, np.asarray(getattr(flat.materials, name)))
    feats = set(scene_features(host))
    # Light-source presence is also static per scene: skip whole sampling
    # paths when a source type doesn't exist
    if int(np.asarray(flat.env.count)) > 0:
        feats.add("env")
    if int(np.asarray(flat.lights.count)) > 0:
        feats.add("area_lights")
    # Alpha-tested (cutout) materials: enables the any-hit alpha loops for
    # pass-through and shadow rays (kernel.metal:621-639)
    if (np.asarray(flat.materials.flags) & MAT_USES_ALPHA).any():
        feats.add("alpha")
    # Which texture slots are bound ANYWHERE: unbound slots are statically
    # pruned from the shade path (4 bilinear taps per lane per slot)
    tex = np.asarray(flat.materials.textures)
    for k in range(tex.shape[1]):
        if (tex[:, k] >= 0).any():
            feats.add(f"texslot{k}")
    return frozenset(feats)
