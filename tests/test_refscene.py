"""Reference-app scene format importer (io/refscene.py) vs a fixture
written directly from the documented spec (scene.cpp:536-627) — the writer
here is independent of the loader: it lays out JSON + sidecar bytes by
hand, with Metal's simd strides (float3 = 16 B, VertexData = 48 B)."""

import json
import os
import struct

import numpy as np
import pytest

from platinum_tpu.core.scene import Scene
from platinum_tpu.io.refscene import (
    is_reference_scene, load_reference_scene,
)


def _write_fixture(dirpath):
    """Emit ref.json + ref_data.bin exactly as scene.cpp:536-627 would."""
    blob = bytearray()

    def put(b):
        off = len(blob)
        blob.extend(b)
        return [off, len(b)]

    # --- texture asset id=0: 2x2 RGBA8Unorm_sRGB checker ---------------
    tex_px = np.array(
        [[[255, 0, 0, 255], [0, 255, 0, 255]],
         [[0, 0, 255, 255], [255, 255, 255, 128]]], np.uint8)
    tex_rec = put(tex_px.tobytes())

    # --- HDR env texture asset id=3: 4x2 RGBA32Float -------------------
    rng = np.random.default_rng(0)
    env_px = np.concatenate(
        [rng.random((2, 4, 3), np.float32) + 0.1,
         np.ones((2, 4, 1), np.float32)], axis=2)
    env_rec = put(env_px.tobytes())

    # --- mesh asset id=1: one triangle, simd-strided buffers -----------
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.array([[0, 0, 1]] * 3, np.float32)
    tan = np.array([[1, 0, 0, 1]] * 3, np.float32)
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    pos_bytes = b"".join(
        struct.pack("<4f", *p, 0.0) for p in pos)          # float3 = 16 B
    vd_bytes = b"".join(
        struct.pack("<3f f 4f 2f 2f", *nrm[i], 0.0, *tan[i], *uv[i],
                    0.0, 0.0)                              # 48 B stride
        for i in range(3))
    pos_rec = put(pos_bytes)
    vd_rec = put(vd_bytes)
    idx_rec = put(np.array([0, 1, 2], np.uint32).tobytes())
    slot_rec = put(np.array([0], np.uint32).tobytes())

    assets = [
        {"id": 0, "retain": True, "rc": 1, "type": "texture", "data": {
            "name": "checker", "alpha": True, "size": [2, 2],
            "format": 71, "data": tex_rec}},
        {"id": 3, "retain": True, "rc": 1, "type": "texture", "data": {
            "name": "sky", "alpha": False, "size": [4, 2],
            "format": 125, "data": env_rec}},
        {"id": 1, "retain": False, "rc": 1, "type": "mesh", "data": {
            "indexCount": 3, "vertexCount": 3,
            "positions": pos_rec, "vertexData": vd_rec,
            "indices": idx_rec, "materials": slot_rec}},
        {"id": 2, "retain": False, "rc": 1, "type": "material", "data": {
            "name": "gold", "baseColor": [1.0, 0.8, 0.2, 1.0],
            "roughness": 0.3, "metallic": 1.0, "transmission": 0.0,
            "ior": 1.45, "aniso": 0.5, "anisoRotation": 0.25,
            "clearcoat": 0.6, "clearcoatRoughness": 0.1,
            "emission": [0.0, 0.0, 0.0], "emissionStrength": 1.0,
            "thinTransmission": False,
            "textures": [[0, 0]]}},          # BASE_COLOR <- texture id 0
    ]

    root = {
        "id": 7, "name": "Scene", "visible": True,
        "transform": {"t": [0, 0, 0], "r": [0, 0, 0], "s": [1, 1, 1],
                      "tgt": [0, 0, 0], "track": False},
        "children": [
            {"id": 8, "name": "tri", "visible": True,
             "transform": {"t": [1, 2, 3], "r": [0.1, 0.2, 0.3],
                           "s": [2, 2, 2], "tgt": [0, 0, 0],
                           "track": False},
             "mesh": {"id": 1, "materials": [2]},
             "children": []},
            {"id": 9, "name": "cam", "visible": True,
             "transform": {"t": [0, 1, 5], "r": [0, 0, 0], "s": [1, 1, 1],
                           "tgt": [0, 0, 0], "track": True},
             "camera": {"f": 85.0, "aperture": 2.8, "sensor": [36.0, 24.0]},
             "children": [
                 {"id": 10, "name": "hidden", "visible": False,
                  "transform": {"t": [0, 0, 0], "r": [0, 0, 0],
                                "s": [1, 1, 1], "tgt": [0, 0, 0],
                                "track": False},
                  "mesh": {"id": 1, "materials": ["default"]},
                  "children": []}]},
        ],
    }
    # alias-table sidecar bytes (loader rebuilds its own; record must parse)
    at_rec = put(b"\x00" * (4 * 2 * 12))
    doc = {"root": root,
           "assets": {"nextId": 4, "assets": assets},
           "envmap": {"texture": 3, "aliasTable": at_rec}}

    path = os.path.join(dirpath, "ref.json")
    with open(path, "w") as f:
        json.dump(doc, f)
    with open(os.path.join(dirpath, "ref_data.bin"), "wb") as f:
        f.write(blob)
    return path, dict(tex=tex_px, env=env_px, pos=pos, nrm=nrm, tan=tan,
                      uv=uv)


def test_reference_scene_roundtrip_vs_spec(tmp_path):
    path, truth = _write_fixture(str(tmp_path))
    assert is_reference_scene(path)

    scene = Scene()
    load_reference_scene(scene, path)

    # hierarchy: root -> [tri, cam -> [hidden]]
    root = scene.node(Scene.ROOT)
    assert root.name == "Scene"
    kids = [scene.node(c) for c in root.children]
    names = [k.name for k in kids]
    assert names == ["tri", "cam"]
    tri, cam = kids
    assert [scene.node(c).name for c in cam.children] == ["hidden"]
    assert not scene.node(cam.children[0]).visible

    # transforms
    np.testing.assert_allclose(tri.transform.translation, [1, 2, 3])
    np.testing.assert_allclose(tri.transform.rotation, [0.1, 0.2, 0.3],
                               rtol=1e-6)
    np.testing.assert_allclose(tri.transform.scale, [2, 2, 2])
    assert cam.transform.track

    # camera (withFocalLength semantics: f mm, sensor mm, f-number)
    assert cam.camera is not None
    assert cam.camera.focal_length == 85.0
    assert cam.camera.aperture == 2.8
    assert tuple(cam.camera.sensor_size) == (36.0, 24.0)

    # mesh buffers decode through the simd strides exactly
    mesh = scene.asset(tri.mesh_id)
    np.testing.assert_array_equal(mesh.positions, truth["pos"])
    np.testing.assert_array_equal(mesh.normals, truth["nrm"])
    np.testing.assert_array_equal(mesh.tangents, truth["tan"])
    np.testing.assert_array_equal(mesh.uvs, truth["uv"])
    np.testing.assert_array_equal(mesh.indices, [[0, 1, 2]])
    np.testing.assert_array_equal(mesh.material_slots, [0])

    # material with remapped texture slot
    mat = scene.asset(tri.material_ids[0])
    assert mat.name == "gold"
    assert mat.metallic == 1.0 and mat.anisotropy == 0.5
    assert mat.clearcoat == 0.6 and mat.ior == pytest.approx(1.45)
    from platinum_tpu.core.material import TextureSlot

    tex_id = mat.textures[TextureSlot.BASE_COLOR]
    tex = scene.asset(tex_id)
    assert tex.name == "checker" and tex.has_alpha
    np.testing.assert_array_equal(tex.data, truth["tex"])

    # "default" material slot stays None
    hidden = scene.node(cam.children[0])
    assert hidden.material_ids[0] is None

    # environment: HDR texture attached, alias table rebuilt and normalized
    env = scene.environment
    assert env.has_texture
    envtex = scene.asset(env.texture_id)
    np.testing.assert_array_equal(envtex.data, truth["env"])
    assert env.pdf is not None and len(env.pdf) == 8
    assert np.isclose(env.pdf.mean(), 1.0, rtol=1e-5)


def test_reference_scene_renders(tmp_path):
    """The imported scene flattens and renders (smoke, tiny)."""
    path, _ = _write_fixture(str(tmp_path))
    scene = Scene()
    load_reference_scene(scene, path)
    cam_node = scene.get_cameras()[0][0]

    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    s = RenderSettings(width=8, height=8, spp=1, max_bounces=2,
                       sampler="pcg4d")
    flat = flatten_scene(scene, cam_node, s)
    from platinum_tpu.render import integrator
    import jax.numpy as jnp

    img = integrator.render_step(flat, s, jnp.zeros((64, 3)), jnp.int32(0))
    assert np.isfinite(np.asarray(img)).all()
