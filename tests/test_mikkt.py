"""MikkTSpace parity tests.

The port (platinum_tpu/core/mikkt.py) is verified against the actual
mikktspace algorithm: the reference's vendored C implementation
(/root/reference/deps/mikkt/mikktspace.c) is compiled as an external test
oracle and driven through ctypes with the same indexed-vertex callbacks the
reference uses (src/core/mesh.cpp:135-157). Skipped when the reference tree
or a C compiler is unavailable — the port itself has no C dependency.
"""

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from platinum_tpu.core.mikkt import generate_tangents_mikkt

MIKKT_C = "/root/reference/deps/mikkt/mikktspace.c"
MIKKT_H_DIR = "/root/reference/deps/mikkt"


@pytest.fixture(scope="module")
def oracle():
    if not os.path.exists(MIKKT_C):
        pytest.skip("reference mikktspace.c not available")
    lib_path = os.path.join(tempfile.gettempdir(), "mikkt_oracle.so")
    if not os.path.exists(lib_path):
        r = subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-I", MIKKT_H_DIR,
             MIKKT_C, "-o", lib_path, "-lm"],
            capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot compile oracle: {r.stderr[:200]}")
    return ctypes.CDLL(lib_path)


GETI = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)
GETIF = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p, ctypes.c_int)
GETV = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                        ctypes.c_int, ctypes.c_int)
SETB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                        ctypes.c_float, ctypes.c_int, ctypes.c_int)
SETF = ctypes.c_void_p


class Interface(ctypes.Structure):
    _fields_ = [
        ("get_num_faces", GETI),
        ("get_num_vertices_of_face", GETIF),
        ("get_position", GETV),
        ("get_normal", GETV),
        ("get_tex_coord", GETV),
        ("set_tspace_basic", SETB),
        ("set_tspace", ctypes.c_void_p),
    ]


class Context(ctypes.Structure):
    _fields_ = [("interface", ctypes.POINTER(Interface)),
                ("user", ctypes.c_void_p)]


def run_oracle(lib, positions, normals, uvs, indices):
    """Reference mikktspace over indexed vertices, last write wins."""
    P = np.ascontiguousarray(positions, np.float32)
    N = np.ascontiguousarray(normals, np.float32)
    UV = np.ascontiguousarray(uvs, np.float32)
    I = np.ascontiguousarray(indices, np.int64).reshape(-1, 3)
    out = np.zeros((len(P), 4), np.float32)

    def g_faces(ctx):
        return len(I)

    def g_fverts(ctx, f):
        return 3

    def g_pos(ctx, dst, f, v):
        p = P[I[f, v]]
        dst[0], dst[1], dst[2] = float(p[0]), float(p[1]), float(p[2])

    def g_nrm(ctx, dst, f, v):
        p = N[I[f, v]]
        dst[0], dst[1], dst[2] = float(p[0]), float(p[1]), float(p[2])

    def g_uv(ctx, dst, f, v):
        p = UV[I[f, v]]
        dst[0], dst[1] = float(p[0]), float(p[1])

    def s_basic(ctx, tang, sign, f, v):
        out[I[f, v]] = (tang[0], tang[1], tang[2], sign)

    iface = Interface(GETI(g_faces), GETIF(g_fverts), GETV(g_pos),
                      GETV(g_nrm), GETV(g_uv), SETB(s_basic), None)
    ctx = Context(ctypes.pointer(iface), None)
    lib.genTangSpaceDefault.restype = ctypes.c_int
    assert lib.genTangSpaceDefault(ctypes.byref(ctx)) == 1
    return out


def _uv_sphere(nu=12, nv=8):
    """UV sphere with seam duplication — shared verts, healthy UVs."""
    us = np.linspace(0, 1, nu + 1)
    vs = np.linspace(0, 1, nv + 1)
    uu, vv = np.meshgrid(us, vs, indexing="ij")
    theta = vv * np.pi
    phi = uu * 2 * np.pi
    x = np.sin(theta) * np.cos(phi)
    y = np.cos(theta)
    z = np.sin(theta) * np.sin(phi)
    pos = np.stack([x, y, z], -1).reshape(-1, 3)
    uv = np.stack([uu, vv], -1).reshape(-1, 2)
    nrm = pos / np.maximum(np.linalg.norm(pos, axis=-1, keepdims=True), 1e-9)
    idx = []
    for i in range(nu):
        for j in range(nv):
            a = i * (nv + 1) + j
            b = (i + 1) * (nv + 1) + j
            idx += [[a, b, a + 1], [b, b + 1, a + 1]]
    return pos.astype(np.float32), nrm.astype(np.float32), \
        uv.astype(np.float32), np.asarray(idx, np.uint32)


def _cube_per_face_uv():
    """Cube with per-face UV islands (weld splits at every edge)."""
    from platinum_tpu.core.primitives import cube
    m = cube(2.0)
    return m.positions, m.normals, m.uvs, m.indices


def _mirrored_strip():
    """Two quads sharing an edge with mirrored U — orientation flip groups."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0],
                    [0, 1, 0], [1, 1, 0], [2, 1, 0]], np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (6, 1))
    uv = np.array([[0, 0], [1, 0], [0, 0],
                   [0, 1], [1, 1], [0, 1]], np.float32)  # mirrored right half
    idx = np.array([[0, 1, 4], [0, 4, 3], [1, 2, 5], [1, 5, 4]], np.uint32)
    return pos, nrm, uv, idx


def _with_degenerate():
    pos, nrm, uv, idx = _mirrored_strip()
    idx = np.concatenate([idx, [[0, 0, 1], [2, 2, 2]]]).astype(np.uint32)
    return pos, nrm, uv, idx


FIXTURES = {
    "sphere": _uv_sphere,
    "cube": _cube_per_face_uv,
    "mirrored": _mirrored_strip,
    "degenerate": _with_degenerate,
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_mikkt_matches_reference(oracle, name):
    pos, nrm, uv, idx = FIXTURES[name]()
    want = run_oracle(oracle, pos, nrm, uv, idx)
    got = generate_tangents_mikkt(pos, nrm, uv, idx)
    assert got.shape == want.shape
    # handedness must match exactly; vectors to float tolerance (the port
    # accumulates in float64, the oracle in float32)
    assert np.array_equal(np.sign(got[:, 3]), np.sign(want[:, 3]))
    err = np.abs(got[:, :3] - want[:, :3]).max()
    assert err < 2e-4, err


def test_mikkt_tangents_are_unit_and_orthogonal():
    pos, nrm, uv, idx = _uv_sphere()
    t = generate_tangents_mikkt(pos, nrm, uv, idx)
    used = np.zeros(len(pos), bool)
    used[np.asarray(idx).reshape(-1)] = True
    lens = np.linalg.norm(t[used, :3], axis=-1)
    assert np.abs(lens - 1.0).max() < 1e-5
    dots = np.abs(np.sum(t[used, :3] * nrm[used], axis=-1))
    assert dots.max() < 1e-5
