"""app.store.Store — the reference pt::Store's deferred-action semantics
(store.hpp/store.cpp): selection and node actions latch and apply at
update(), never mid-frame; file ops route through the io layer."""

import numpy as np
import pytest

from platinum_tpu.app.store import NodeAction, Store
from platinum_tpu.core import primitives
from platinum_tpu.core.scene import RemoveMode, Scene


def _store_with_nodes(n=3):
    store = Store()
    mesh = store.scene.add_asset(primitives.cube(1.0))
    ids = []
    for k in range(n):
        node = store.scene.create_node(f"n{k}")
        store.scene.set_mesh(node.id, mesh)
        ids.append(node.id)
    return store, ids


def test_selection_is_deferred_until_update():
    store, ids = _store_with_nodes()
    store.select_node(ids[1])
    assert store.selected_node is None      # not applied mid-frame
    store.update()
    assert store.selected_node == ids[1]
    store.select_node(None)
    assert store.selected_node == ids[1]
    store.update()
    assert store.selected_node is None


def test_remove_is_deferred_and_clears_selection():
    store, ids = _store_with_nodes()
    store.select_node(ids[0])
    store.update()
    store.remove_node(ids[0])
    assert ids[0] in store.scene             # still present mid-frame
    assert store.get_node_action() == (NodeAction.REMOVE, ids[0])
    action, nid = store.update()
    assert action == NodeAction.REMOVE and nid == ids[0]
    assert ids[0] not in store.scene
    assert store.selected_node is None       # store.cpp:60-62
    assert store.get_node_action() == (NodeAction.NONE, store.scene.ROOT)


def test_remove_modes_reparent():
    store, ids = _store_with_nodes(1)
    child = store.scene.create_node("child", parent=ids[0])
    store.remove_node(ids[0], RemoveMode.MOVE_TO_PARENT)
    store.update()
    assert ids[0] not in store.scene
    assert store.scene.node(child.id).parent == store.scene.ROOT


def test_create_primitive_under_selection():
    store, ids = _store_with_nodes(1)
    store.select_node(ids[0])
    store.update()
    nid = store.create_primitive("ball", primitives.sphere(0.5, 8, 6))
    assert store.scene.node(nid).parent == ids[0]
    assert store.scene.node(nid).mesh_id is not None


def test_open_save_roundtrip(tmp_path):
    store, ids = _store_with_nodes(2)
    store.select_node(ids[1])
    store.update()
    path = str(tmp_path / "s.ptscene")
    store.save_as(path)
    store.open(path)
    assert store.selected_node is None        # fresh scene, selection reset
    assert len(store.scene.get_instances()) == 2


def test_import_gltf_fixture():
    import os

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "spheres_grid3.glb")
    store = Store()
    roots = store.import_gltf(fixture)
    assert roots and len(store.scene.get_instances()) > 0


def test_import_texture_png(tmp_path):
    from PIL import Image

    p = str(tmp_path / "t.png")
    arr = np.zeros((8, 8, 4), np.uint8)
    arr[..., 0] = 200
    arr[..., 3] = 255
    Image.fromarray(arr).save(p)
    store = Store()
    tid = store.import_texture(p)
    tex = store.scene.asset(tid)
    assert tex.width == 8 and tex.data.dtype == np.uint8
    assert not tex.has_alpha


def test_import_texture_exr_is_hdr(tmp_path):
    from platinum_tpu.io.exr import write_exr

    p = str(tmp_path / "e.exr")
    img = np.random.default_rng(0).uniform(0, 4, (6, 7, 3)).astype(np.float32)
    write_exr(p, img)
    store = Store()
    tid = store.import_texture(p)
    tex = store.scene.asset(tid)
    from platinum_tpu.core.texture import TextureFormat

    assert tex.format == TextureFormat.HDR
    np.testing.assert_allclose(tex.data[..., :3], img, atol=1e-3)


def test_hdr_roundtrip_and_rle(tmp_path):
    """io.hdr: flat write/read round-trip plus a hand-built new-style
    RLE scanline decode."""
    from platinum_tpu.io.hdr import read_hdr, write_hdr, _float_to_rgbe

    p = str(tmp_path / "r.hdr")
    img = np.random.default_rng(1).uniform(0, 100, (5, 9, 3)).astype(np.float32)
    write_hdr(p, img)
    back = read_hdr(p)
    assert back.shape == img.shape
    # RGBE quantization is relative to the PIXEL MAX (shared exponent,
    # 8-bit mantissa): bound abs error by max-channel/128 per pixel
    bound = img.max(axis=-1, keepdims=True) / 128.0 + 1e-4
    assert (np.abs(back - img) <= bound).all()

    # hand-encode one RLE scanline: 8 pixels, every channel a single run
    w = 8
    rgbe = _float_to_rgbe(np.tile(np.float32([1.0, 0.5, 0.25]), (w, 1)))
    payload = bytearray([2, 2, 0, w])
    for c in range(4):
        payload += bytes([128 + w, int(rgbe[0, c])])
    p2 = str(tmp_path / "rle.hdr")
    with open(p2, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y 1 +X {w}\n".encode())
        f.write(bytes(payload))
    dec = read_hdr(p2)
    np.testing.assert_allclose(dec[0], np.tile([1.0, 0.5, 0.25], (w, 1)),
                               rtol=0.01)


def test_cli_info_assets_listing(capsys):
    """`info --assets` surfaces the AssetManager browser capability
    (asset_manager.cpp): every asset with type/name/refcount/retained."""
    import json
    from types import SimpleNamespace

    from platinum_tpu.app.cli import cmd_info

    cmd_info(SimpleNamespace(scene="cornell", assets=True))
    out = json.loads(capsys.readouterr().out)
    assets = out["assets"]
    types = {a["type"] for a in assets}
    assert "Mesh" in types and "Material" in types
    mesh_rows = [a for a in assets if a["type"] == "Mesh"]
    assert mesh_rows[0]["triangles"] == 12
    assert all({"id", "name", "refs", "retained"} <= set(a) for a in assets)
