"""Production integrator vs the independent float64 oracle (oracle_pt.py).

The scene restricts materials to configurations where the principled BSDF
reduces exactly to the oracle's models (see oracle_pt.py docstring):
Lambert walls (ior=1 kills the dielectric specular lobe: Fresnel is
identically zero, so the energy-compensated diffuse factor is 1) and a
smooth mirror cube (metallic, roughness 0 → delta conductor with Schlick
F0 = base color). Both sides estimate the SAME truncated-depth transport
with different estimators (oracle: BSDF sampling only; production: NEE +
MIS mixture), so the converged means must agree to Monte-Carlo noise.
"""

import numpy as np
import pytest

from oracle_pt import render_oracle

W = H = 16
SPP_PROD = 4096
SPP_ORACLE = 2048
# Depth must make TRUNCATION mismatch negligible, not just small: at the
# last bounce the production MIS estimator still collects the
# NEE-weighted share of order-(DEPTH+1) light, which a BSDF-sampling-only
# oracle cannot see until depth DEPTH+1. At 16 bounces the un-collected
# residual is ~0.65^16 of the bounced component (< 0.1% of the mean),
# far below the comparison tolerances.
DEPTH = 16


def _build_scene():
    from platinum_tpu.core import primitives
    from platinum_tpu.core.camera import Camera
    from platinum_tpu.core.material import Material
    from platinum_tpu.core.scene import Scene
    from platinum_tpu.core.transform import Transform

    scene = Scene()
    plane = scene.add_asset(primitives.plane(1.0), retained=True)
    cube = scene.add_asset(primitives.cube(1.0), retained=True)

    def lam(name, rgb):
        return scene.add_asset(Material(
            name=name, base_color=(*rgb, 1.0), roughness=1.0, metallic=0.0,
            ior=1.0))

    white = lam("white", (0.70, 0.70, 0.70))
    red = lam("red", (0.63, 0.065, 0.05))
    green = lam("green", (0.14, 0.45, 0.09))
    mirror = scene.add_asset(Material(
        name="mirror", base_color=(0.9, 0.9, 0.9, 1.0), metallic=1.0,
        roughness=0.0))
    light = scene.add_asset(Material(
        name="light", base_color=(0, 0, 0, 1), emission=(1.0, 0.9, 0.8),
        emission_strength=15.0))

    def inst(name, mesh, mat, t, s=(1, 1, 1), r=(0, 0, 0)):
        node = scene.create_node(name)
        scene.set_mesh(node.id, mesh)
        scene.set_material(node.id, 0, mat)
        node.transform = Transform(translation=t, rotation=r, scale=s)

    # closed 4x4x4 box centred at (0, 2, 0); plane() faces +Y
    inst("floor", plane, white, (0, 0, 0), (4, 1, 4))
    inst("ceil", plane, white, (0, 4, 0), (4, 1, 4), (np.pi, 0, 0))
    inst("left", plane, red, (-2, 2, 0), (4, 1, 4), (0, 0, -np.pi / 2))
    inst("right", plane, green, (2, 2, 0), (4, 1, 4), (0, 0, np.pi / 2))
    inst("back", plane, white, (0, 2, -2), (4, 1, 4), (np.pi / 2, 0, 0))
    inst("front", plane, white, (0, 2, 2), (4, 1, 4), (-np.pi / 2, 0, 0))
    inst("panel", cube, light, (0, 3.95, 0), (1.4, 0.05, 1.4))
    inst("mirror", cube, mirror, (-0.6, 0.65, -0.4), (1.3, 1.3, 1.3),
         (0, 0.4, 0))

    cam_node = scene.create_node("cam")
    cam_node.camera = Camera.with_focal_length(28.0)
    cam_node.camera.focus_distance = 3.6
    cam_node.transform = Transform(translation=[0, 2.0, 1.9],
                                   target=[0, 1.8, -2.0], track=True)
    return scene, cam_node.id


def _world_geometry(scene):
    """(tris, mat_id, albedo, emission, is_mirror) in plain numpy."""
    tris, mat_of_tri = [], []
    mats, mat_index = [], {}
    for inst in scene.get_instances():
        node = scene.node(inst.node_id)
        mesh = scene.asset(node.mesh_id)
        m = np.asarray(inst.transform, np.float64)
        p = mesh.positions.astype(np.float64) @ m[:3, :3].T + m[:3, 3]
        tri = p[mesh.indices.astype(np.int64)]
        tris.append(tri)
        slots = np.asarray(mesh.material_slots, np.int64)
        ids = []
        for mid in inst.material_ids:
            mat = scene.resolve_material(mid)
            if id(mat) not in mat_index:
                mat_index[id(mat)] = len(mats)
                mats.append(mat)
            ids.append(mat_index[id(mat)])
        mat_of_tri.append(np.asarray(ids)[slots])
    albedo = np.array([m.base_color[:3] for m in mats])
    emission = np.array([[e * m.emission_strength for e in m.emission]
                         for m in mats])
    is_mirror = np.array([m.metallic >= 1.0 and m.roughness == 0.0
                          for m in mats])
    return (np.concatenate(tris), np.concatenate(mat_of_tri),
            albedo, emission, is_mirror)


def _camera_params(scene, cam_id):
    node = scene.node(cam_id)
    m = np.asarray(scene.world_transform(cam_id), np.float64)
    cols = m[:3, :3] / np.linalg.norm(m[:3, :3], axis=0)
    return dict(pos=m[:3, 3], u=cols[:, 0], v=cols[:, 1], w=cols[:, 2],
                focal_mm=node.camera.focal_length,
                sensor_mm=node.camera.sensor_size,
                focus_dist=node.camera.focus_distance)


def test_production_matches_independent_oracle():
    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render
    from platinum_tpu.render.types import RenderSettings

    scene, cam_id = _build_scene()

    settings = RenderSettings(width=W, height=H, spp=SPP_PROD,
                              max_bounces=DEPTH, kernel="mis",
                              sampler="pcg4d")
    flat = flatten_scene(scene, cam_id, settings, accel_min_tris=64)
    prod = np.asarray(render(flat, settings,
                             features=analyze_features(flat)), np.float64)

    tris, mat_id, albedo, emission, is_mirror = _world_geometry(scene)
    cam = _camera_params(scene, cam_id)
    oracle = render_oracle(tris, mat_id, albedo, emission, is_mirror, cam,
                           W, H, SPP_ORACLE, DEPTH, chunk=1 << 15)

    # global energy: means over ~1M samples each, sigma ~0.1% of signal
    pm, om = prod.mean(), oracle.mean()
    assert abs(pm - om) / om < 0.01, (pm, om)

    # spatial agreement on 4x4 blocks (~33k samples each, sigma ~0.7%)
    pb = prod.reshape(4, 4, 4, 4, 3).mean((1, 3))
    ob = oracle.reshape(4, 4, 4, 4, 3).mean((1, 3))
    rel = np.abs(pb - ob) / np.maximum(ob, 0.05)
    assert rel.max() < 0.04, (rel.max(), pb.ravel()[:4], ob.ravel()[:4])


# ---------------------------------------------------------------------------
# Round-5 extension (VERDICT r4 #3): rough GGX conductor, smooth dielectric
# and alias-table HDR-env importance sampling vs the float64 oracle.
# ---------------------------------------------------------------------------

def _faceted(mesh):
    """Rebuild a mesh as an unshared-vertex soup with face normals, so the
    production's interpolated shading normals equal the oracle's geometric
    face normals (the comparison tests lobes, not smooth shading)."""
    from platinum_tpu.core.mesh import Mesh

    tri = mesh.positions[mesh.indices.reshape(-1).astype(np.int64)]
    t = len(tri) // 3
    v = tri.reshape(t, 3, 3)
    fn = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-20)
    return Mesh(positions=tri,
                indices=np.arange(t * 3, dtype=np.uint32).reshape(t, 3),
                normals=np.repeat(fn, 3, axis=0))


def _hdr_env(seed=3):
    """Low-res equirect HDR with smooth structure + a bright hot spot, so
    the production's alias-table importance sampling carries real weight."""
    rng = np.random.default_rng(seed)
    h, w = 8, 16
    yy = np.linspace(0, 1, h)[:, None, None]
    base = 0.15 + 0.5 * yy * np.array([0.4, 0.6, 1.0]) \
        + 0.25 * rng.random((h, w, 3))
    base[2, 11] = [60.0, 50.0, 35.0]      # hot spot ~100x the base level
    return base.astype(np.float32)


def _build_lobe_scene():
    from platinum_tpu.core import primitives
    from platinum_tpu.core.camera import Camera
    from platinum_tpu.core.material import Material
    from platinum_tpu.core.scene import Scene
    from platinum_tpu.core.texture import Texture, TextureFormat
    from platinum_tpu.core.transform import Transform

    scene = Scene()
    plane = scene.add_asset(_faceted(primitives.plane(1.0)), retained=True)
    ball = scene.add_asset(_faceted(primitives.sphere(1.0, lat=10, lng=14)),
                           retained=True)

    floor = scene.add_asset(Material(
        name="floor", base_color=(0.5, 0.5, 0.5, 1), roughness=1.0,
        metallic=0.0, ior=1.0))
    ggx2 = scene.add_asset(Material(
        name="ggx2", base_color=(0.95, 0.7, 0.3, 1), metallic=1.0,
        roughness=0.2))
    ggx6 = scene.add_asset(Material(
        name="ggx6", base_color=(0.6, 0.7, 0.95, 1), metallic=1.0,
        roughness=0.6))
    glass = scene.add_asset(Material(
        name="glass", base_color=(1.0, 1.0, 1.0, 1), metallic=0.0,
        roughness=0.0, transmission=1.0, ior=1.5))

    def inst(name, mesh, mat, t, s=(1, 1, 1)):
        node = scene.create_node(name)
        scene.set_mesh(node.id, mesh)
        scene.set_material(node.id, 0, mat)
        node.transform = Transform(translation=t, scale=s)

    inst("floor", plane, floor, (0, 0, 0), (8, 1, 8))
    inst("s_ggx2", ball, ggx2, (-1.5, 0.8, 0), (0.8, 0.8, 0.8))
    inst("s_ggx6", ball, ggx6, (1.5, 0.8, 0), (0.8, 0.8, 0.8))
    inst("s_glass", ball, glass, (0, 0.8, 1.2), (0.8, 0.8, 0.8))

    env_px = _hdr_env()
    tid = scene.add_asset(Texture(data=env_px, format=TextureFormat.HDR,
                                  name="sky"), retained=True)
    scene.environment.set_texture(tid, env_px[..., :3])

    cam_node = scene.create_node("cam")
    cam_node.camera = Camera.with_focal_length(32.0)
    cam_node.camera.focus_distance = 5.2
    cam_node.transform = Transform(translation=[0.4, 2.2, 4.6],
                                   target=[0, 0.7, 0], track=True)
    return scene, cam_node.id, env_px


def _lobe_world_geometry(scene):
    """Like _world_geometry but emitting KIND codes + roughness/ior."""
    from oracle_pt import (
        KIND_DIELECTRIC, KIND_GGX, KIND_LAMBERT,
    )

    tris, mat_of_tri = [], []
    mats, mat_index = [], {}
    for inst in scene.get_instances():
        node = scene.node(inst.node_id)
        mesh = scene.asset(node.mesh_id)
        m = np.asarray(inst.transform, np.float64)
        p = mesh.positions.astype(np.float64) @ m[:3, :3].T + m[:3, 3]
        tris.append(p[mesh.indices.astype(np.int64)])
        slots = np.asarray(mesh.material_slots, np.int64)
        ids = []
        for mid in inst.material_ids:
            mat = scene.resolve_material(mid)
            if id(mat) not in mat_index:
                mat_index[id(mat)] = len(mats)
                mats.append(mat)
            ids.append(mat_index[id(mat)])
        mat_of_tri.append(np.asarray(ids)[slots])

    def kind_of(m):
        if m.transmission >= 1.0 and m.metallic == 0.0:
            return KIND_DIELECTRIC
        if m.metallic >= 1.0:
            return KIND_GGX       # roughness 0 still works (alpha=0 delta
            # never happens here; mirrors use KIND_MIRROR in the old test)
        return KIND_LAMBERT

    return dict(
        tris=np.concatenate(tris),
        mat_id=np.concatenate(mat_of_tri),
        albedo=np.array([m.base_color[:3] for m in mats]),
        emission=np.array([[e * m.emission_strength for e in m.emission]
                           for m in mats]),
        is_mirror=np.zeros(len(mats), bool),
        kind=np.array([kind_of(m) for m in mats]),
        roughness=np.array([m.roughness for m in mats]),
        ior=np.array([m.ior for m in mats]),
    )


def test_glossy_transmissive_env_lobes_match_oracle():
    """Rough GGX conductor (r=0.2/0.6), smooth dielectric and an HDR env:
    the production MIS integrator (multiscatter OFF to match single-scatter
    transport) must converge to the independent BSDF-sampling oracle."""
    from oracle_pt import render_oracle
    from platinum_tpu.render.flatten import analyze_features, flatten_scene
    from platinum_tpu.render.integrator import render
    from platinum_tpu.render.types import RenderSettings

    scene, cam_id, _env = _build_lobe_scene()
    w = h = 16
    depth = 12

    settings = RenderSettings(width=w, height=h, spp=4096,
                              max_bounces=depth, kernel="mis",
                              sampler="pcg4d", flags=0)  # multiscatter OFF
    flat = flatten_scene(scene, cam_id, settings, accel_min_tris=64)
    prod = np.asarray(render(flat, settings,
                             features=analyze_features(flat)), np.float64)

    geo = _lobe_world_geometry(scene)
    cam = _camera_params(scene, cam_id)
    oracle = render_oracle(
        geo["tris"], geo["mat_id"], geo["albedo"], geo["emission"],
        geo["is_mirror"], cam, w, h, 1024, depth,
        env=np.asarray(_env, np.float64), chunk=1 << 14,
        kind=geo["kind"], roughness=geo["roughness"], ior=geo["ior"])

    pm, om = prod.mean(), oracle.mean()
    assert abs(pm - om) / om < 0.02, (pm, om)

    pb = prod.reshape(4, 4, 4, 4, 3).mean((1, 3))
    ob = oracle.reshape(4, 4, 4, 4, 3).mean((1, 3))
    rel = np.abs(pb - ob) / np.maximum(ob, 0.08)
    # 4x4-block means at 1024 oracle spp carry ~2% MC sigma on the glossy
    # highlights; 8% is ~4 sigma (a first run measured a max block of
    # 6.07% with global means agreeing to 4 decimals)
    assert rel.max() < 0.08, (rel.max(), pb.ravel()[:4], ob.ravel()[:4])
