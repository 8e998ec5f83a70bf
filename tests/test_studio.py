import numpy as np

from platinum_tpu.app.scenes import make_cornell_scene
from platinum_tpu.render.studio import StudioCamera, StudioRenderer


def test_studio_render_and_pick():
    scene, cam = make_cornell_scene()
    studio = StudioRenderer(scene, width=96, height=64)
    studio.camera_to([0, 5, 30], [0, 5, 0])
    img = studio.render()
    assert img.shape == (64, 96, 3)
    assert np.isfinite(img).all()
    # The box fills the center of the view: picking there returns its node id
    box_node = scene.get_instances()[0].node_id
    picked = studio.readback_object_id_at(48, 32)
    assert picked == box_node
    # Corner pixels look past the open box front onto background/grid
    assert studio.readback_object_id_at(2, 2) in (-1, box_node)

    # Selection changes the image (outline highlight)
    img_sel = studio.render(selected_node=box_node)
    assert not np.allclose(img, img_sel)


def test_studio_camera_controls():
    cam = StudioCamera()
    cam.move_to([0, 0, 10], [0, 0, 0])
    assert np.isclose(cam.distance, 10.0)
    p0 = cam.position.copy()
    cam.orbit(50.0, 0.0)
    assert not np.allclose(cam.position, p0)
    cam.zoom(1.0)
    assert cam.distance < 10.0
    # pole clamp
    for _ in range(100):
        cam.orbit(0, 1000.0)
    assert cam.elevation < np.pi / 2
    d = cam.position - cam.target
    assert np.isfinite(d).all()

    cam.pan(10, 0)
    assert not np.allclose(cam.target, [0, 0, 0])


def test_interactive_preview_session(tmp_path):
    """VERDICT r2 #9: the stdin-driven interactive session — orbit edits
    between frames, picking, and a progressive PT re-render from the
    edited view (capability of frontend.cpp:183-285)."""
    import os
    import subprocess
    import sys

    import numpy as np

    from platinum_tpu.io.exr import write_exr

    out = str(tmp_path / "view.png")
    save = str(tmp_path / "kept.png")
    scn = str(tmp_path / "session.ptscene")
    sky = str(tmp_path / "sky.exr")
    grad = np.linspace(0.2, 2.0, 8, dtype=np.float32)
    write_exr(sky, np.broadcast_to(grad[None, :, None], (4, 8, 3)))
    script = "\n".join([
        "pick 16 16",
        "orbit 0.4 0.1",
        "zoom -2.0",
        "select 1",
        # Properties-panel capability: edit a material + move a node
        # between frames (scene_explorer.cpp / properties panel)
        "mat 1 roughness=0.25 metallic=1.0 base_color=0.9,0.6,0.2",
        "move 1 0.1 0.0 0.1",
        "mat 1 bogus_attr=1",     # must error, not crash the session
        # SceneExplorer Add-menu capability: new primitive under the
        # selection, visible to the next frame
        "add cube crate",
        # Properties root-node + camera-editor capabilities: swap the
        # environment map (alias table rebuilt) and edit camera physics
        f"env {sky} 1.5",
        "env color 0.2,0.3",      # wrong component count must error
        "env color 0.2,0.3,0.4 2.0",
        "cam focal_length=80 aperture=2.8 focus_distance=12",
        "cam bogus=1",            # unknown camera attr must error
        "cam sensor_size=36",     # tuple-typed field must error, not crash
        f"savescene {scn}",
        "render 2",
        f"save {save}",
        "quit",
    ]) + "\n"
    proc = subprocess.run(
        [sys.executable, "-m", "platinum_tpu.app.cli", "preview", "cornell",
         "--interactive", "--size", "64x64", "-o", out],
        input=script, capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ready" in proc.stdout
    assert "picked" in proc.stdout
    assert "mat " in proc.stdout and "moved 1" in proc.stdout
    assert "error:" in proc.stdout          # bogus_attr rejected in-session
    assert "added cube" in proc.stdout
    assert "env color" in proc.stdout and f"env {sky}" in proc.stdout
    assert "cam aperture focal_length focus_distance" in proc.stdout
    # bogus_attr, short env color, cam bogus, cam sensor_size all rejected
    assert proc.stdout.count("error:") >= 4
    # replaced env textures are released, not left in the saved scene
    from platinum_tpu.core.texture import Texture
    from platinum_tpu.io.sceneio import load_scene

    saved = load_scene(scn)
    assert not any(isinstance(data, Texture)
                   for _, data, *_ in saved.all_assets())
    assert "rendered 2 spp" in proc.stdout
    assert proc.stdout.count("frame ") >= 8   # one per edit + progressive
    assert "bye" in proc.stdout
    assert "scene saved" in proc.stdout
    assert os.path.exists(out) and os.path.exists(save)
    assert os.path.exists(scn)   # store.save_as through the session
