import numpy as np
import pytest

from platinum_tpu.core import primitives
from platinum_tpu.core.environment import build_alias_table
from platinum_tpu.core.material import Material
from platinum_tpu.core.mesh import Mesh
from platinum_tpu.core.scene import RemoveMode, Scene
from platinum_tpu.core.transform import Transform


def test_primitive_shapes():
    p = primitives.plane(2.0)
    assert p.num_vertices == 4 and p.num_triangles == 2
    c = primitives.cube(1.0)
    assert c.num_vertices == 24 and c.num_triangles == 12
    s = primitives.sphere(1.0, lat=8, lng=12)
    assert s.num_triangles == 8 * 12 * 2
    assert np.allclose(np.linalg.norm(s.positions, axis=-1), 1.0, atol=1e-5)
    cb = primitives.cornell_box()
    assert cb.num_triangles == 12
    assert cb.num_material_slots == 4


def test_cornell_normals_point_inward():
    cb = primitives.cornell_box()
    center = np.array([0.0, 5.0, 0.0])
    # For each wall triangle, normal should point toward the box center
    for t in range(10):  # walls only (last 2 are the light)
        tri = cb.indices[t]
        centroid = cb.positions[tri].mean(axis=0)
        n = cb.normals[tri[0]]
        assert np.dot(center - centroid, n) > 0


def test_mesh_auto_normals_and_tangents():
    m = primitives.plane(1.0)
    auto = Mesh(m.positions, m.indices, uvs=m.uvs)
    assert np.allclose(auto.normals, [[0, 1, 0]] * 4, atol=1e-6)
    # Tangents orthogonal to normals, unit length, valid handedness
    t = auto.tangents
    assert np.allclose(np.linalg.norm(t[:, :3], axis=-1), 1.0, atol=1e-5)
    assert np.allclose((t[:, :3] * auto.normals).sum(-1), 0.0, atol=1e-5)
    assert set(np.unique(t[:, 3])) <= {-1.0, 1.0}


def test_scene_hierarchy_and_world_transform():
    s = Scene()
    a = s.create_node("a")
    b = s.create_node("b", parent=a.id)
    a.transform = Transform(translation=[1, 0, 0])
    b.transform = Transform(translation=[0, 2, 0])
    wt = s.world_transform(b.id)
    assert np.allclose(wt[:3, 3], [1, 2, 0])


def test_instances_and_visibility():
    s = Scene()
    mesh_id = s.add_asset(primitives.cube())
    n1 = s.create_node("c1")
    s.set_mesh(n1.id, mesh_id)
    n2 = s.create_node("c2")
    s.set_mesh(n2.id, mesh_id)
    n2.visible = False
    inst = s.get_instances()
    assert len(inst) == 1 and inst[0].node_id == n1.id
    assert len(s.get_instances(include_hidden=True)) == 2


def test_asset_refcounting():
    s = Scene()
    mesh_id = s.add_asset(primitives.cube())
    mat_id = s.add_asset(Material(name="m"))
    n = s.create_node("n")
    s.set_mesh(n.id, mesh_id)
    s.set_material(n.id, 0, mat_id)
    assert s.asset(mesh_id) is not None
    s.remove_node(n.id)
    # refcount dropped to 0 → assets removed
    assert s.asset(mesh_id) is None
    assert s.asset(mat_id) is None


def test_retained_asset_survives():
    s = Scene()
    mesh_id = s.add_asset(primitives.cube(), retained=True)
    n = s.create_node("n")
    s.set_mesh(n.id, mesh_id)
    s.remove_node(n.id)
    assert s.asset(mesh_id) is not None
    s.set_retained(mesh_id, False)
    assert s.asset(mesh_id) is None


def test_remove_modes():
    s = Scene()
    a = s.create_node("a")
    b = s.create_node("b", parent=a.id)
    c = s.create_node("c", parent=b.id)

    s.remove_node(b.id, RemoveMode.MOVE_TO_PARENT)
    assert s.node(c.id).parent == a.id

    s.remove_node(a.id, RemoveMode.RECURSIVE)
    assert c.id not in s
    assert a.id not in s


def test_move_node_rejects_cycles():
    s = Scene()
    a = s.create_node("a")
    b = s.create_node("b", parent=a.id)
    with pytest.raises(ValueError):
        s.move_node(a.id, b.id)


def test_clone_subtree_shares_assets():
    s = Scene()
    mesh_id = s.add_asset(primitives.cube())
    a = s.create_node("a")
    s.set_mesh(a.id, mesh_id)
    b = s.create_node("b", parent=a.id)
    clone = s.clone_node(a.id)
    assert clone.mesh_id == mesh_id
    assert len(clone.children) == 1
    # Removing the original keeps the asset alive via the clone's refcount
    s.remove_node(a.id)
    assert s.asset(mesh_id) is not None


def test_alias_table_invariants():
    rng = np.random.default_rng(0)
    w = rng.uniform(0.0, 4.0, size=1024).astype(np.float32)
    pdf, p, alias = build_alias_table(w)
    # pdf mean == 1 (normalized against uniform)
    assert np.isclose(pdf.mean(), 1.0, atol=1e-4)
    assert (p >= 0).all() and (p <= 1.0 + 1e-6).all()
    assert (alias < len(w)).all()

    # Sampling frequencies proportional to weights
    n_draws = 200_000
    slots = rng.integers(0, len(w), n_draws)
    accept = rng.uniform(size=n_draws) < p[slots]
    picks = np.where(accept, slots, alias[slots])
    counts = np.bincount(picks, minlength=len(w)) / n_draws
    expected = w / w.sum()
    # Chi-square-ish check: correlation and max deviation
    assert np.corrcoef(counts, expected)[0, 1] > 0.99
    assert np.abs(counts - expected).max() < 5e-4
