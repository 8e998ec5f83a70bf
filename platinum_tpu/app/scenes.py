"""Built-in demo/benchmark scenes.

The Cornell setup mirrors the reference's Add→Cornell Box action
(scene_explorer.cpp:50-73): slot 0 white, slot 1 left wall red, slot 2 right
wall green, slot 3 emissive white (strength 50), plus a camera placed to view
the open front of the box.
"""

from __future__ import annotations

import numpy as np

from platinum_tpu.core import primitives
from platinum_tpu.core.camera import Camera
from platinum_tpu.core.material import Material
from platinum_tpu.core.scene import Scene
from platinum_tpu.core.transform import Transform


def make_cornell_scene(
    camera_distance: float = 18.0, aperture: float = 0.0
) -> tuple:
    """Returns (scene, camera_node_id)."""
    scene = Scene()
    box_id = scene.add_asset(primitives.cornell_box())
    node = scene.create_node("cornell_box")
    scene.set_mesh(node.id, box_id)

    mats = [
        Material(name="cornell_base", base_color=(1, 1, 1, 1)),
        Material(name="cornell_wall_l", base_color=(0.704, 0.016, 0.020, 1)),
        Material(name="cornell_wall_r", base_color=(0.009, 0.591, 0.006, 1)),
        Material(
            name="cornell_light",
            base_color=(0, 0, 0, 1),
            emission=(1, 1, 1),
            emission_strength=50.0,
        ),
    ]
    for slot, mat in enumerate(mats):
        scene.set_material(node.id, slot, scene.add_asset(mat))

    cam_node = scene.create_node("camera")
    cam_node.camera = Camera.with_focal_length(50.0, aperture=aperture)
    cam_node.camera.focus_distance = camera_distance
    cam_node.transform = Transform(
        translation=[0.0, 5.0, camera_distance], target=[0.0, 5.0, 0.0], track=True
    )
    return scene, cam_node.id


def make_furnace_scene(albedo: float = 1.0, roughness: float = 1.0,
                       metallic: float = 0.0, env_value: float = 0.5,
                       transmission: float = 0.0, ior: float = 1.5,
                       clearcoat: float = 0.0, thin: bool = False) -> tuple:
    """White-furnace test scene: a sphere in a constant environment. With
    albedo 1 and energy-preserving BSDFs, every pixel must equal env_value."""
    scene = Scene()
    sph_id = scene.add_asset(primitives.sphere(1.0, lat=32, lng=48))
    node = scene.create_node("sphere")
    scene.set_mesh(node.id, sph_id)
    mat = Material(
        name="furnace",
        base_color=(albedo, albedo, albedo, 1.0),
        roughness=roughness,
        metallic=metallic,
        transmission=transmission,
        ior=ior,
        clearcoat=clearcoat,
        thin_transmission=thin,
    )
    scene.set_material(node.id, 0, scene.add_asset(mat))
    scene.environment.constant_color = (env_value, env_value, env_value)

    cam_node = scene.create_node("camera")
    cam_node.camera = Camera.with_focal_length(50.0)
    cam_node.camera.focus_distance = 5.0
    cam_node.transform = Transform(
        translation=[0.0, 0.0, 5.0], target=[0.0, 0.0, 0.0], track=True
    )
    return scene, cam_node.id
