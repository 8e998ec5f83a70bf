import io as _io

import numpy as np
import pytest

from platinum_tpu.io.exr import read_exr, write_exr
from platinum_tpu.io.icc import profile_for
from platinum_tpu.io.png import read_png, write_png


@pytest.mark.parametrize("comp", ["zip", "zips", "none"])
def test_exr_roundtrip(tmp_path, comp):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 16, (37, 53, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, compression=comp)
    assert np.array_equal(read_exr(p), img)


def test_exr_half_and_mono(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 2, (16, 16, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=True)
    assert np.allclose(read_exr(p), img, rtol=1e-3)
    y = rng.uniform(size=(8, 8)).astype(np.float32)
    write_exr(p, y)
    assert np.array_equal(read_exr(p)[:, :, 0], y)


def test_exr_reads_reference_luts():
    lut = read_exr("/root/reference/resource/lut/ggx_E.exr")
    assert lut.shape == (128, 128, 1)
    assert 0.0 < lut.min() < lut.max() <= 1.01


def test_icc_profiles_parse():
    ImageCms = pytest.importorskip("PIL.ImageCms")
    for space in ("sRGB", "DisplayP3", "BT2020"):
        blob = profile_for(space)
        prof = ImageCms.ImageCmsProfile(_io.BytesIO(blob))
        assert space in ImageCms.getProfileDescription(prof)


def test_png_roundtrip_with_icc(tmp_path):
    img = (np.random.default_rng(2).uniform(size=(8, 8, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img, output_space="DisplayP3")
    back = read_png(p)
    assert np.array_equal(back[:, :, :3], img)
    from PIL import Image

    assert Image.open(p).info.get("icc_profile")
