"""API-surface conformance against SURVEY.md §2.4.

Every symbol the reference examples exercise (the 1:1 port contract) must
exist and behave: engine switches, scene constructors and setters, light
source attributes, texture helpers, camera fields, per-cuboid face access,
transform animation, static baking, freeze/fpsLimit.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from flexlight_tpu import (Bounding, Camera, Config, Cuboid, FlexLight,
                           Object3D, Plane, Primitive, Scene, Transform,
                           Triangle)


def test_engine_switches():
    engine = FlexLight((16, 16))
    # api switch ('webgl2' full, 'webgpu' partial — flexlight.js:75-86)
    engine.api = "webgl2"
    assert engine.api == "webgl2"
    engine.io = "web"                       # engine.io='web' (examples)
    # renderer switch by string key (flexlight.js:106-129)
    engine.renderer = "pathtracer"
    assert engine.renderer.type == "pathtracer"
    engine.renderer = "rasterizer"
    assert engine.renderer.type == "rasterizer"
    # 'rasterizerwebgpu' maps to the pathtracer backend (flexlight.js:121-123)
    engine.api = "webgpu"
    engine.renderer = "rasterizer"
    assert engine.renderer.type == "pathtracer"


def test_scene_constructors_and_queue():
    scene = Scene()
    plane = scene.Plane([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    tri = scene.Triangle([0, 0, 0], [1, 0, 0], [0, 1, 0])
    cube = scene.Cuboid(-1, 1, -1, 1, -1, 1)
    bound = scene.Bounding([plane, tri])
    scene.queue.push([cube], bound)         # arbitrary nesting (eth.js:29-101)
    assert isinstance(plane, Plane) and isinstance(tri, Triangle)
    assert isinstance(cube, Cuboid) and isinstance(bound, Bounding)
    # per-cuboid face access (example1.js:92-93)
    for face in ("top", "bottom", "left", "right", "front", "back"):
        assert isinstance(getattr(cube, face), Plane)


def test_material_setters_broadcast():
    scene = Scene()
    cube = scene.Cuboid(-1, 1, -1, 1, -1, 1)
    cube.color = [255, 0, 0]
    cube.roughness = 0.3
    cube.metallicity = 0.4
    cube.emissiveness = 0.5
    cube.translucency = 0.6
    cube.ior = 1.4
    cube.textureNums = [-1, -1, -1]
    # setters broadcast through the Plane faces (Primitives with readable
    # material fields; Object3D setters are write-only, scene.js:779-809)
    face = cube.top
    assert face._rme[0] == pytest.approx(0.3)
    assert face._rme[1] == pytest.approx(0.4)
    assert face._tpo[0] == pytest.approx(0.6)
    assert face._tpo[2] == pytest.approx(1.4)
    np.testing.assert_allclose(np.asarray(face._albedo) * 255, [255, 0, 0])


def test_lights_sparse_and_attributes():
    scene = Scene()
    # sparse arrays allowed (example2.js:45-60)
    scene.primaryLightSources = [[0, 2, 0]]
    scene.primary_light_sources[0].intensity = 100
    scene.primary_light_sources[0].variation = 0.5
    arr = scene.build_light_array()
    assert arr.shape[0] >= 1
    assert arr[0, 1, 0] == pytest.approx(100)
    assert arr[0, 1, 1] == pytest.approx(0.5)
    scene.ambientLight = [0.1, 0.1, 0.1]


def test_texture_helpers_and_sizes():
    scene = Scene()
    scene.standardTextureSizes = [4, 4]     # example1.js:49
    # textureFromRGB takes RGBA bytes (ImageData contract, scene.js:22-38);
    # RME/TPO take 3-channel floats in [0,1] (scene.js:43-49)
    rgb = scene.textureFromRGB([255] * 64, 4, 4)
    rme = scene.textureFromRME([0.5] * 48, 4, 4)
    tpo = scene.textureFromTPO([0.2] * 48, 4, 4)
    scene.textures.push(rgb)
    scene.pbr_textures.push(rme)
    scene.translucency_textures.push(tpo)
    assert len(scene.textures) == 1


def test_transform_registry_and_animation():
    t = Transform()
    t.move(1.0, 2.0, 3.0)
    t.rotateAxis([0, 1, 0], 0.5)            # wave.js:64-73 animation calls
    t.rotateSpherical(0.1, 0.2)
    t.scale(2.0)
    assert t.matrix.shape == (3, 3)
    scene = Scene()
    tri = scene.Triangle([0, 0, 0], [1, 0, 0], [0, 1, 0])
    tri.transform = t
    rot, shift = __import__(
        "flexlight_tpu.scene.transform", fromlist=["global_registry"]
    ).global_registry().build_arrays()
    assert rot.shape[1:] == (2, 3, 3)       # forward + Moore-Penrose inverse
    np.testing.assert_allclose(shift[t.number, 0], [1, 2, 3])


def test_object3d_move_scale_and_static_baking():
    scene = Scene()
    cube = scene.Cuboid(-1, 1, -1, 1, -1, 1)
    obj = Object3D(1)               # constructor takes length (scene.js:759)
    obj[0] = cube
    obj.move(1, 0, 0)
    obj.scale(2)
    obj.static = True                       # scene.js:841-864 snapshot
    assert obj.static
    obj.static = False
    obj.staticPermanent = True              # drops the subtree (scene.js:870-882)


def test_camera_fields_and_fov():
    cam = Camera()
    for f in ("x", "y", "z", "fx", "fy", "fov"):
        assert hasattr(cam, f)
    assert cam.fov == pytest.approx(1 / np.pi)


def test_config_knob_names():
    cfg = Config()
    assert cfg.samples_per_ray == 1
    assert cfg.max_reflections == 5
    assert cfg.min_importancy == pytest.approx(0.3)
    assert cfg.first_passes == 3 and cfg.second_passes == 3
    assert cfg.temporal is True and cfg.filter is False
    assert cfg.hdr is True and cfg.antialiasing == "fxaa"
    assert cfg.render_quality == 1


def _engine_with_renderer(renderer: str, api: str = "webgl2"):
    engine = FlexLight((8, 8))
    scene = engine.scene
    tri = scene.Triangle([0, 0, 2], [1, 0, 2], [0, 1, 2])
    scene.queue.push(tri)
    scene.primaryLightSources = [[0, 2, 0]]
    engine.config = Config(temporal=False, filter=False, antialiasing=None,
                           max_reflections=1)
    engine.api = api
    engine.renderer = renderer
    return engine


# all three renderer backends share the reference duck type
# (SURVEY §2.4: render/halt/updateScene/updatePrimaryLightSources/
#  fps/fpsLimit/freeze)
_RENDERERS = [("pathtracer", "webgl2"), ("rasterizer", "webgl2"),
              ("pathtracer", "webgpu")]


@pytest.mark.parametrize("renderer,api", _RENDERERS)
def test_renderer_duck_type_surface(renderer, api):
    engine = _engine_with_renderer(renderer, api)
    r = engine.renderer
    for attr in ("render", "halt", "updateScene", "updatePrimaryLightSources",
                 "fps", "fpsLimit", "freeze", "config", "type"):
        assert hasattr(r, attr), attr
    r.updateScene()
    r.updatePrimaryLightSources()
    img = r.render_frame()
    assert img.shape == (8, 8, 3)
    # freeze returns the previous frame without re-rendering (obj.js:72)
    r.freeze = True
    engine.camera.x += 5.0  # would change the image if not frozen
    img2 = r.render_frame()
    np.testing.assert_array_equal(img, img2)
    engine.camera.x -= 5.0
    r.freeze = False
    r.halt()


@pytest.mark.parametrize("renderer,api", _RENDERERS)
def test_renderer_fps_limit_throttles(renderer, api):
    import time

    engine = _engine_with_renderer(renderer, api)
    r = engine.renderer
    r.render_frame()  # compile + warm
    r.fpsLimit = 20.0
    assert r.fpsLimit == 20.0
    t0 = time.perf_counter()
    r.render_frame()
    r.render_frame()
    elapsed = time.perf_counter() - t0
    # two throttled frames after a warm one: >= ~2 * 1/20 s
    assert elapsed >= 0.08, elapsed


def test_ui_picker_center_object():
    engine = FlexLight((8, 8))
    scene = engine.scene
    tri = scene.Triangle([-5, -5, 3], [5, -5, 3], [0, 5, 3])
    scene.queue.push(tri)
    dist, found = engine.ui.get_object_in_center(
        scene.queue, engine.camera.position, [0, 0, 1])
    assert found is tri and dist == pytest.approx(3.0)
