import base64
import io as _io
import json
import struct

import numpy as np
import pytest

from platinum_tpu.core.material import Material, TextureSlot
from platinum_tpu.core.scene import Scene
from platinum_tpu.io.gltf import load_gltf


def _png_bytes(arr):
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(arr, "RGBA").save(buf, "png")
    return buf.getvalue()


def _make_gltf(tmp_path, glb=False):
    """Two-triangle quad with a full-extension material, embedded texture,
    a camera, and a matrix-transformed child node."""
    positions = np.array(
        [[-1, 0, -1], [1, 0, -1], [-1, 0, 1], [1, 0, 1]], np.float32
    )
    normals = np.tile([0, 1, 0], (4, 1)).astype(np.float32)
    uvs = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    indices = np.array([0, 2, 1, 1, 2, 3], np.uint16)

    bin_data = positions.tobytes() + normals.tobytes() + uvs.tobytes() + indices.tobytes()
    tex_png = _png_bytes(
        (np.mgrid[0:8, 0:8, 0:4][1] * 32).astype(np.uint8).transpose(0, 1, 2)
        if False else np.full((8, 8, 4), 200, np.uint8)
    )

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 2, 3]}],
        "nodes": [
            {"name": "quad", "mesh": 0, "translation": [1, 2, 3],
             "rotation": [0, 0, 0, 1], "scale": [2, 2, 2]},
            {"name": "child", "mesh": 0,
             "matrix": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 5, 0, 0, 1]},
            {"name": "cam", "camera": 0, "translation": [0, 1, 5]},
            {"name": "parent", "children": [1]},
        ],
        "cameras": [{"type": "perspective", "perspective": {"yfov": 0.7, "znear": 0.01}}],
        "meshes": [{
            "name": "quadmesh",
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
                "material": 0,
            }],
        }],
        "materials": [{
            "name": "testmat",
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.6, 0.4, 1.0],
                "metallicFactor": 0.3,
                "roughnessFactor": 0.7,
                "baseColorTexture": {"index": 0},
            },
            "emissiveFactor": [1, 0.5, 0.25],
            "extensions": {
                "KHR_materials_emissive_strength": {"emissiveStrength": 10.0},
                "KHR_materials_transmission": {"transmissionFactor": 0.5},
                "KHR_materials_ior": {"ior": 1.33},
                "KHR_materials_anisotropy": {"anisotropyStrength": 0.4,
                                             "anisotropyRotation": 0.3},
                "KHR_materials_clearcoat": {"clearcoatFactor": 0.6,
                                            "clearcoatRoughnessFactor": 0.2},
            },
        }],
        "textures": [{"source": 0}],
        "images": [{"uri": "data:image/png;base64," + base64.b64encode(tex_png).decode()}],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
    }

    if glb:
        doc["buffers"][0].pop("uri", None)
        json_chunk = json.dumps(doc).encode()
        json_chunk += b" " * ((-len(json_chunk)) % 4)
        bin_chunk = bin_data + b"\0" * ((-len(bin_data)) % 4)
        total = 12 + 8 + len(json_chunk) + 8 + len(bin_chunk)
        blob = struct.pack("<III", 0x46546C67, 2, total)
        blob += struct.pack("<II", len(json_chunk), 0x4E4F534A) + json_chunk
        blob += struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk
        path = tmp_path / "test.glb"
        path.write_bytes(blob)
    else:
        doc["buffers"][0]["uri"] = (
            "data:application/octet-stream;base64,"
            + base64.b64encode(bin_data).decode()
        )
        path = tmp_path / "test.gltf"
        path.write_text(json.dumps(doc))
    return str(path)


@pytest.mark.parametrize("glb", [False, True])
def test_gltf_import(tmp_path, glb):
    path = _make_gltf(tmp_path, glb=glb)
    scene = Scene()
    roots = load_gltf(scene, path)
    assert len(roots) == 3

    instances = scene.get_instances()
    assert len(instances) == 2  # quad + child (parent has no mesh)

    mesh = instances[0].mesh
    assert mesh.num_triangles == 2
    assert mesh.num_vertices == 4
    assert np.allclose(mesh.normals, [[0, 1, 0]] * 4)
    # tangents were generated
    assert np.allclose(np.linalg.norm(mesh.tangents[:, :3], axis=-1), 1, atol=1e-5)

    # TRS node transform applied
    quad = [i for i in instances if scene.node(i.node_id).name == "quad"][0]
    assert np.allclose(quad.transform[:3, 3], [1, 2, 3])
    assert np.allclose(np.diag(quad.transform)[:3], [2, 2, 2])

    # matrix node decomposed (translation 5,0,0 under parent)
    child = [i for i in instances if scene.node(i.node_id).name == "child"][0]
    assert np.allclose(child.transform[:3, 3], [5, 0, 0], atol=1e-5)

    # material with all extensions
    mat: Material = scene.resolve_material(quad.material_ids[0])
    assert mat.name == "testmat"
    assert np.allclose(mat.base_color, [0.8, 0.6, 0.4, 1.0])
    assert mat.metallic == 0.3 and mat.roughness == 0.7
    assert mat.emission_strength == 10.0
    assert mat.transmission == 0.5
    assert mat.ior == 1.33
    assert mat.anisotropy == 0.4 and mat.anisotropy_rotation == 0.3
    assert mat.clearcoat == 0.6 and mat.clearcoat_roughness == 0.2
    assert mat.thin_transmission  # no volume extension
    assert mat.is_emissive()

    # texture decoded
    tex = scene.asset(mat.textures[TextureSlot.BASE_COLOR])
    assert tex.width == 8 and tex.height == 8

    # camera
    cams = scene.get_cameras()
    assert len(cams) == 1
    assert abs(cams[0][1].y_fov - 0.7) < 1e-5


def test_gltf_renders(tmp_path):
    """End-to-end: imported glTF flattens and renders without NaNs."""
    from platinum_tpu.render import integrator
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    path = _make_gltf(tmp_path)
    scene = Scene()
    load_gltf(scene, path)
    scene.environment.constant_color = (0.5, 0.5, 0.5)
    cam = scene.get_cameras()[0][0]
    settings = RenderSettings(width=16, height=16, spp=2, max_bounces=3,
                              sampler="pcg4d")
    flat = flatten_scene(scene, cam, settings)
    assert flat.atlas is not None  # texture made it into the atlas
    img = np.asarray(integrator.render(flat, settings))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


def test_glb_export_import_roundtrip(tmp_path):
    """tools/gltf_export writes standard .glb our loader reads back:
    geometry, materials (incl. KHR extensions), textures, cameras."""
    import numpy as np

    from platinum_tpu.app.scenes import make_spheres_scene
    from platinum_tpu.core.material import TextureSlot
    from platinum_tpu.core.scene import Scene
    from platinum_tpu.io.gltf import load_gltf
    from platinum_tpu.tools.gltf_export import export_glb

    scene, _ = make_spheres_scene(grid=3)
    path = str(tmp_path / "rt.glb")
    export_glb(scene, path)
    s2 = Scene()
    load_gltf(s2, path)

    i1, i2 = scene.get_instances(), s2.get_instances()
    assert len(i1) == len(i2)
    assert (sum(i.mesh.num_triangles for i in i1)
            == sum(i.mesh.num_triangles for i in i2))

    def bounds(insts):
        lo, hi = np.full(3, 1e30), np.full(3, -1e30)
        for i in insts:
            m = np.asarray(i.transform)
            wp = i.mesh.positions @ m[:3, :3].T + m[:3, 3]
            lo, hi = np.minimum(lo, wp.min(0)), np.maximum(hi, wp.max(0))
        return lo, hi

    (lo1, hi1), (lo2, hi2) = bounds(i1), bounds(i2)
    np.testing.assert_allclose(lo1, lo2, atol=1e-4)
    np.testing.assert_allclose(hi1, hi2, atol=1e-4)

    # the ground's normal map survives (as a linear texture)
    found = False
    for inst in i2:
        for mid in inst.material_ids:
            m = s2.resolve_material(mid)
            if m and TextureSlot.NORMAL in m.textures:
                tex = s2.asset(m.textures[TextureSlot.NORMAL])
                assert tex.data.shape == (128, 128, 4)
                found = True
    assert found
    assert len(s2.get_cameras()) == 1

    # roughness/metallic sweep preserved
    r1 = sorted(round(float(scene.resolve_material(m).roughness), 3)
                for i in i1 for m in i.material_ids if m is not None)
    r2 = sorted(round(float(s2.resolve_material(m).roughness), 3)
                for i in i2 for m in i.material_ids if m is not None)
    assert r1 == r2


def test_committed_glb_fixture_loads():
    """The checked-in benchmark fixture parses through the loader."""
    import os

    from platinum_tpu.core.scene import Scene
    from platinum_tpu.io.gltf import load_gltf

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "spheres_grid3.glb")
    s = Scene()
    load_gltf(s, path)
    assert sum(i.mesh.num_triangles for i in s.get_instances()) > 10000
