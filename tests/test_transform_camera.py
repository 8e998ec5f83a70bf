import numpy as np

from platinum_tpu.core.camera import Camera
from platinum_tpu.core.transform import Transform, TransformType
from platinum_tpu.utils import matrices as mat


def test_trs_composition_order():
    # T * Ry * Rx * Rz * S applied to a point
    t = Transform(translation=[1, 2, 3], rotation=[0.1, 0.2, 0.3], scale=[2, 2, 2])
    m = t.matrix()
    expected = (
        mat.translation([1, 2, 3])
        @ mat.rotation_y(0.2)
        @ mat.rotation_x(0.1)
        @ mat.rotation_z(0.3)
        @ mat.scaling([2, 2, 2])
    )
    assert np.allclose(m, expected, atol=1e-6)


def test_point_vs_vector_transform():
    t = Transform(translation=[5, 0, 0])
    p = t.apply([1, 0, 0], TransformType.POINT)
    v = t.apply([1, 0, 0], TransformType.VECTOR)
    assert np.allclose(p, [6, 0, 0], atol=1e-6)
    assert np.allclose(v, [1, 0, 0], atol=1e-6)


def test_normal_matrix_preserves_perpendicularity():
    rng = np.random.default_rng(0)
    t = Transform(rotation=rng.uniform(-1, 1, 3), scale=[1.0, 3.0, 0.5])
    # A tangent on the surface and its normal must remain perpendicular
    tangent = np.array([1.0, 0.0, 0.0])
    normal = np.array([0.0, 0.0, 1.0])
    wt = t.apply(tangent, TransformType.VECTOR)
    wn = t.apply(normal, TransformType.NORMAL)
    assert abs(np.dot(wt, wn)) < 1e-5


def test_track_constraint_looks_at_target():
    t = Transform(translation=[0, 0, 5], target=[0, 0, 0], track=True)
    m = t.matrix()
    # Camera-to-world: -Z column should point from camera toward target
    fwd = -m[:3, 2]
    assert np.allclose(fwd / np.linalg.norm(fwd), [0, 0, -1], atol=1e-6)


def test_camera_fov_focal_roundtrip():
    cam = Camera.with_fov(np.deg2rad(60.0))
    assert np.isclose(np.rad2deg(cam.y_fov), 60.0, atol=1e-4)
    cam2 = Camera.with_focal_length(50.0)
    assert np.isclose(cam2.focal_length, 50.0)


def test_cropped_sensor_height():
    cam = Camera()  # 36x24
    # 16:9 is wider than 3:2 → crop height
    h = cam.cropped_sensor_height(16 / 9)
    assert np.isclose(h, 36.0 / (16 / 9), atol=1e-5)
    # 1:1 is taller → full height
    assert np.isclose(cam.cropped_sensor_height(1.0), 24.0, atol=1e-5)


def test_aperture_radius():
    cam = Camera(focal_length=50.0, aperture=2.0)
    assert np.isclose(cam.aperture_radius_world, (50.0 / 2000.0) / 2.0)
    assert Camera(aperture=0.0).aperture_radius_world == 0.0
