import math

import numpy as np

from flexlight_tpu import Camera
from flexlight_tpu.interaction import UI, WebIo
from tests.scenes import cornell_scene


def test_webio_moves_camera():
    camera = Camera()
    io = WebIo(camera=camera)
    io.key_down("KeyW", now_ms=0.0)
    io.update(now_ms=1000.0)
    # forward at fx=0 is +z (io.js:55-57)
    assert camera.z > 9.0
    assert camera.x == 0.0
    io.key_up("KeyW", now_ms=1000.0)
    io.update(now_ms=2000.0)
    z = camera.z
    io.update(now_ms=3000.0)
    assert camera.z == z  # stopped


def test_webio_mouse_look_clamps_pitch():
    camera = Camera()
    io = WebIo(camera=camera)
    io.mouse_move(100, 0)
    assert camera.fx != 0.0
    for _ in range(100):
        io.mouse_move(0, 500)
    assert 2 * abs(camera.fy) < math.pi


def test_ui_picks_center_object():
    scene, camera = cornell_scene()
    # Offset off the symmetry axis (the exact center ray grazes triangle
    # edges, which rayTriangle rejects — same as the reference's picker)
    camera.x, camera.y = 1.3, 0.7
    ui = UI(scene, camera)
    selected = ui.pick_center()
    assert selected is not None
    v = selected.vertices.reshape(-1, 3)
    assert v[:, 2].min() >= -2.0  # in front of the camera


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from flexlight_tpu import Config, FlexLight
    from flexlight_tpu.utils.checkpoint import load_render_state, save_render_state
    from tests.scenes import cornell_config

    engine = FlexLight((16, 16))
    scene, camera = cornell_scene()
    engine.scene = scene
    engine.camera = camera
    engine.config = cornell_config(temporal=True, temporal_samples=2,
                                   max_reflections=2)
    engine.renderer = "pathtracer"
    engine.renderer.render_frame()
    engine.renderer.render_frame()
    path = str(tmp_path / "state.npz")
    save_render_state(path, engine.renderer)

    engine2 = FlexLight((16, 16))
    scene2, camera2 = cornell_scene()
    engine2.scene = scene2
    engine2.camera = camera2
    engine2.config = engine.config
    engine2.renderer = "pathtracer"
    engine2.renderer.render()
    load_render_state(path, engine2.renderer)
    assert engine2.renderer._frame_count == 2
    a = engine.renderer.render_frame()
    b = engine2.renderer.render_frame()
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_scene_cache_roundtrip(tmp_path):
    from flexlight_tpu.utils.checkpoint import load_scene_cache, save_scene_cache

    scene, _ = cornell_scene()
    path = str(tmp_path / "scene.npz")
    save_scene_cache(path, scene)
    buffers = load_scene_cache(path)
    built = scene.generate_arrays()
    np.testing.assert_array_equal(np.asarray(buffers.geometry), built.geometry)
    np.testing.assert_array_equal(np.asarray(buffers.id_buffer), built.id_buffer)
