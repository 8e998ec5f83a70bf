import numpy as np

from platinum_tpu.app.scenes import make_cornell_scene
from platinum_tpu.core.material import Material, TextureSlot
from platinum_tpu.core.scene import Scene
from platinum_tpu.core.texture import Texture, TextureFormat
from platinum_tpu.io.sceneio import load_scene, save_scene


def test_scene_roundtrip(tmp_path):
    scene, cam_id = make_cornell_scene(aperture=2.8)
    # add a texture + env to exercise everything
    tex = Texture(
        data=(np.random.default_rng(0).uniform(0, 255, (8, 8, 4))).astype(np.uint8),
        format=TextureFormat.SRGB_RGBA, name="checker", has_alpha=True,
    )
    tex_id = scene.add_asset(tex, retained=True)
    mats = scene.assets_of_type(Material)
    mats[0][1].textures[TextureSlot.BASE_COLOR] = tex_id
    scene.retain_asset(tex_id)
    env_px = np.random.default_rng(1).uniform(0, 2, (4, 8, 3)).astype(np.float32)
    env_tex_id = scene.add_asset(
        Texture(data=env_px, format=TextureFormat.HDR, name="env"), retained=True
    )
    scene.environment.set_texture(env_tex_id, env_px)
    scene.environment.strength = 1.5

    path = str(tmp_path / "scene.ptscene")
    save_scene(scene, path)
    loaded = load_scene(path)

    assert loaded.node_count == scene.node_count
    # instances and geometry intact
    i0 = scene.get_instances()
    i1 = loaded.get_instances()
    assert len(i0) == len(i1)
    assert np.allclose(i0[0].mesh.positions, i1[0].mesh.positions)
    assert np.array_equal(i0[0].mesh.indices, i1[0].mesh.indices)
    assert np.array_equal(i0[0].mesh.material_slots, i1[0].mesh.material_slots)

    # materials round-trip including textures
    m0 = scene.resolve_material(i0[0].material_ids[3])
    m1 = loaded.resolve_material(i1[0].material_ids[3])
    assert m0.name == m1.name and m0.emission_strength == m1.emission_strength

    mtex0 = scene.resolve_material(i0[0].material_ids[0])
    mtex1 = loaded.resolve_material(i1[0].material_ids[0])
    assert TextureSlot.BASE_COLOR in mtex1.textures
    t1 = loaded.asset(mtex1.textures[TextureSlot.BASE_COLOR])
    t0 = scene.asset(mtex0.textures[TextureSlot.BASE_COLOR])
    assert np.array_equal(t0.data, t1.data)
    assert t1.has_alpha

    # cameras
    cams0 = scene.get_cameras()
    cams1 = loaded.get_cameras()
    assert len(cams1) == 1
    assert cams1[0][1].aperture == 2.8
    assert np.allclose(cams0[0][2], cams1[0][2])  # same world transform

    # environment with rebuilt alias table
    assert loaded.environment.strength == 1.5
    assert loaded.environment.has_texture
    assert loaded.environment.pdf is not None
    assert np.isclose(loaded.environment.pdf.mean(), 1.0, atol=1e-4)


def test_roundtrip_renders_identically(tmp_path):
    from platinum_tpu.render import integrator
    from platinum_tpu.render.flatten import flatten_scene
    from platinum_tpu.render.types import RenderSettings

    scene, cam_id = make_cornell_scene()
    path = str(tmp_path / "scene.ptscene")
    save_scene(scene, path)
    loaded = load_scene(path)

    settings = RenderSettings(width=16, height=16, spp=2, max_bounces=3,
                              sampler="pcg4d")
    cam1 = loaded.get_cameras()[0][0]
    img0 = np.asarray(integrator.render(flatten_scene(scene, cam_id, settings), settings))
    img1 = np.asarray(integrator.render(flatten_scene(loaded, cam1, settings), settings))
    assert np.allclose(img0, img1, atol=1e-6)
