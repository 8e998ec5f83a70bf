import numpy as np
import pytest

from platinum_tpu.app.scenes import make_cornell_scene
from platinum_tpu.render.renderer import Renderer, RenderStatus
from platinum_tpu.render.types import FLAG_GMON, FLAG_MULTISCATTER_GGX, RenderSettings

SETTINGS = RenderSettings(width=16, height=16, spp=4, max_bounces=3,
                          sampler="pcg4d")


def test_renderer_lifecycle(tmp_path):
    scene, cam = make_cornell_scene()
    r = Renderer(scene)
    assert r.status == RenderStatus.READY

    r.start_render(cam, SETTINGS)
    assert r.status & RenderStatus.BUSY
    assert r.render_progress == 0.0

    r.render()
    assert r.render_progress == 0.25
    r.render_all()
    assert r.status & RenderStatus.DONE
    assert r.render_progress == 1.0
    assert r.render_time > 0

    img = r.readback()
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all() and img.mean() > 0.05

    out = r.output_image()
    assert out.shape == (16, 16, 3)
    assert (out >= 0).all() and (out <= 1).all()

    png = str(tmp_path / "out.png")
    exr = str(tmp_path / "out.exr")
    r.export_png(png)
    r.export_exr(exr)
    from platinum_tpu.io.exr import read_exr

    assert np.allclose(read_exr(exr), img, atol=1e-6)


def test_renderer_checkpoint_resume(tmp_path):
    scene, cam = make_cornell_scene()
    r = Renderer(scene)
    r.start_render(cam, SETTINGS)
    r.render()
    r.render()
    ckpt = str(tmp_path / "ckpt.npz")
    r.save_checkpoint(ckpt)
    partial = r.readback()

    r2 = Renderer(scene)
    r2.start_render(cam, SETTINGS)
    r2.load_checkpoint(ckpt)
    assert np.allclose(r2.readback(), partial)
    r2.render_all()
    # Resumed render must equal an uninterrupted one (deterministic samplers)
    r.render_all()
    assert np.allclose(r.readback(), r2.readback(), atol=1e-6)


def test_renderer_gmon():
    scene, cam = make_cornell_scene()
    settings = RenderSettings(width=16, height=16, spp=8, max_bounces=3,
                              sampler="pcg4d",
                              flags=FLAG_MULTISCATTER_GGX | FLAG_GMON,
                              gmon_buckets=4)
    r = Renderer(scene)
    r.start_render(cam, settings)
    r.render_all()
    img = r.readback()
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


def test_preview_ladder_cadence_and_final_equality():
    """Preview cadence ladder (VERDICT r3 #10): the first steps render at
    1/4 res and readback upscales them; full-res accumulation starts at
    sample 0 afterwards, so the FINAL image is bit-identical with the
    ladder on or off."""
    from platinum_tpu.app.scenes import make_cornell_scene
    from platinum_tpu.render.renderer import Renderer, RenderStatus
    from platinum_tpu.render.types import RenderSettings

    scene, cam = make_cornell_scene()
    settings = RenderSettings(width=64, height=64, spp=4, max_bounces=3,
                              sampler="pcg4d")

    ladder = Renderer(scene)
    ladder.start_render(cam, settings, preview_scale=4, preview_spp=3)
    # preview frames: readback is full-size but sourced from the 16x16 pass
    ladder.render()
    img = ladder.readback()
    assert img.shape == (64, 64, 3)
    assert ladder.completed_spp == 0          # full-res untouched
    # upscaled 4x4 blocks are constant
    assert np.array_equal(img[0:4, 0:4], np.broadcast_to(img[0:1, 0:1],
                                                         (4, 4, 3)))
    ladder.render()
    ladder.render()
    assert ladder._pv["done"] == 3
    ladder.render_all()
    assert ladder.status & RenderStatus.DONE

    plain = Renderer(scene)
    plain.start_render(cam, settings)
    plain.render_all()

    assert np.array_equal(ladder.readback(), plain.readback())
