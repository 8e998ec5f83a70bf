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
