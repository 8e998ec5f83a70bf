import numpy as np

from platinum_tpu.core import colorspace as cs


def test_bt709_matrix_matches_known_values():
    # Canonical sRGB/BT.709 D65 RGB→XYZ matrix (Lindbloom / ITU values).
    expected = np.array(
        [
            [0.4124, 0.3576, 0.1805],
            [0.2126, 0.7152, 0.0722],
            [0.0193, 0.1192, 0.9505],
        ]
    )
    assert np.allclose(cs.BT709.to_xyz, expected, atol=2e-4)


def test_bt2020_luminance_row():
    # BT.2020 luma weights ~ (0.2627, 0.6780, 0.0593)
    w = cs.luminance_weights(cs.BT2020)
    assert np.allclose(w, [0.2627, 0.6780, 0.0593], atol=2e-4)


def test_round_trip_and_white_mapping():
    for space in (cs.BT709, cs.DISPLAY_P3, cs.BT2020):
        assert np.allclose(space.from_xyz @ space.to_xyz, np.eye(3), atol=1e-5)
        # RGB (1,1,1) must map to the D65 whitepoint with Y=1
        wp = space.to_xyz @ np.ones(3)
        assert np.isclose(wp[1], 1.0, atol=1e-5)
        x = wp[0] / wp.sum()
        y = wp[1] / wp.sum()
        assert np.allclose([x, y], cs.WHITEPOINT_D65, atol=1e-5)


def test_transform_identity_and_p3_roundtrip():
    m = cs.transform(cs.BT709, cs.BT709)
    assert np.allclose(m, np.eye(3), atol=1e-6)
    fwd = cs.transform(cs.BT709, cs.DISPLAY_P3)
    bwd = cs.transform(cs.DISPLAY_P3, cs.BT709)
    assert np.allclose(bwd @ fwd, np.eye(3), atol=1e-5)


def test_agx_inset_preserves_whitepoint():
    inset = cs.make_agx_inset(cs.BT709)
    wp = inset.to_xyz @ np.ones(3)
    assert np.isclose(wp[1], 1.0, atol=1e-5)
    # Inset primaries are further from white than the base's
    base_r = np.asarray(cs.BT709.red)
    in_r = np.asarray(inset.red)
    w = np.asarray(cs.WHITEPOINT_D65)
    assert np.linalg.norm(in_r - w) > np.linalg.norm(base_r - w)
