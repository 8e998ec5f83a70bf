"""Generator for tests/fixtures/foreign_quirks.gltf — a hand-built glTF
exercising loader paths NO exporter in this repo produces (io/gltf.py must
survive arbitrary foreign files, reference gltf.cpp:27-110):

- buffer as a base64 data URI (not a GLB BIN chunk)
- a SPARSE accessor overriding two POSITION vertices
- TEXCOORD_0 as NORMALIZED uint16
- uint8 index component type
- a `matrix` node transform (non-TRS)
- a mode=1 (lines) primitive that loaders must SKIP
- a multi-primitive mesh where the second primitive is non-indexed

Run `python tests/fixtures/make_foreign_quirks.py` to regenerate; the
output is committed so the suite never depends on this script.
"""

import base64
import json
import os

import numpy as np


def build() -> dict:
    # primitive 0: a unit quad in XZ (two triangles), u8-indexed, with a
    # sparse POSITION override raising vertices 2 and 3 to y=1
    pos0 = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                    np.float32)
    uv0 = (np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
           * 65535).astype(np.uint16)  # normalized u16
    idx0 = np.array([0, 1, 2, 0, 2, 3], np.uint8)
    sparse_idx = np.array([2, 3], np.uint16)
    sparse_val = np.array([[1, 1, 1], [-1, 1, 1]], np.float32)

    # primitive 1: one triangle, NON-indexed
    pos1 = np.array([[0, 2, 0], [1, 2, 0], [0, 2, 1]], np.float32)

    # lines primitive (mode=1): must be skipped by the loader
    pos_lines = np.array([[0, 0, 0], [5, 5, 5]], np.float32)

    blob = bytearray()
    views = []

    def view(arr, stride=None):
        while len(blob) % 4:
            blob.append(0)
        raw = np.ascontiguousarray(arr).tobytes()
        v = {"buffer": 0, "byteOffset": len(blob), "byteLength": len(raw)}
        if stride:
            v["byteStride"] = stride
        blob.extend(raw)
        views.append(v)
        return len(views) - 1

    v_pos0 = view(pos0)
    v_uv0 = view(uv0)
    v_idx0 = view(idx0)
    v_sidx = view(sparse_idx)
    v_sval = view(sparse_val)
    v_pos1 = view(pos1)
    v_lines = view(pos_lines)

    accessors = [
        {   # 0: POSITION with sparse override
            "bufferView": v_pos0, "componentType": 5126, "count": 4,
            "type": "VEC3", "min": [-1, 0, -1], "max": [1, 1, 1],
            "sparse": {
                "count": 2,
                "indices": {"bufferView": v_sidx, "componentType": 5123},
                "values": {"bufferView": v_sval},
            },
        },
        {   # 1: normalized u16 UVs
            "bufferView": v_uv0, "componentType": 5123, "count": 4,
            "type": "VEC2", "normalized": True,
        },
        {   # 2: u8 indices
            "bufferView": v_idx0, "componentType": 5121, "count": 6,
            "type": "SCALAR",
        },
        {   # 3: non-indexed tri positions
            "bufferView": v_pos1, "componentType": 5126, "count": 3,
            "type": "VEC3", "min": [0, 2, 0], "max": [1, 2, 1],
        },
        {   # 4: line positions (skipped prim)
            "bufferView": v_lines, "componentType": 5126, "count": 2,
            "type": "VEC3", "min": [0, 0, 0], "max": [5, 5, 5],
        },
    ]

    doc = {
        "asset": {"version": "2.0", "generator": "hand-built quirks"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{
            "name": "quirky",
            # matrix transform: translate (0, 0.5, 0) + uniform scale 2
            "matrix": [2, 0, 0, 0,
                       0, 2, 0, 0,
                       0, 0, 2, 0,
                       0, 0.5, 0, 1],
            "mesh": 0,
        }],
        "meshes": [{
            "name": "quirks",
            "primitives": [
                {"attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                 "indices": 2, "material": 0},
                {"attributes": {"POSITION": 3}, "material": 1},
                {"attributes": {"POSITION": 4}, "mode": 1},
            ],
        }],
        "materials": [
            {"name": "quirk_a",
             "pbrMetallicRoughness": {
                 "baseColorFactor": [0.8, 0.2, 0.2, 1.0],
                 "roughnessFactor": 0.5, "metallicFactor": 0.0}},
            {"name": "quirk_b",
             "pbrMetallicRoughness": {
                 "baseColorFactor": [0.2, 0.8, 0.2, 1.0],
                 "roughnessFactor": 1.0, "metallicFactor": 1.0}},
        ],
        "accessors": accessors,
        "bufferViews": views,
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(bytes(blob)).decode(),
        }],
    }
    return doc


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "foreign_quirks.gltf")
    with open(out, "w") as f:
        json.dump(build(), f, indent=1)
    print("wrote", out)
