"""Simple (WGPU-parity) renderer vs a scalar transcription of
`shaders/pathtracer.wgsl` fsMain (wgsl:221-238): flat first-vertex
normal, albedo, lights[0] shadow test, 0.1*albedo in shadow else
albedo * NdotL. Traversal/shadow primitives reused from the pathtracer
oracle (same moellerTrumboreCull/rayCuboid walk, wgsl:120-180)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import tests.reference_oracle as oracle  # noqa: E402
from tests.scenes import cornell_scene  # noqa: E402

SIZE = 12


def shade_pixel(b, cam, direction):
    suv, _m, tri = oracle.ray_tracer(b, cam, direction, edge=-oracle.BIAS)
    if tri == -1:
        return np.zeros(3, np.float32), -1
    attr = b.attributes[tri]
    normal = attr[0:3]
    albedo = attr[18:21]
    world_pos = (cam + suv[0] * direction).astype(np.float32)
    light = b.lights[0, 0]
    d = (light - world_pos).astype(np.float32)
    dist = np.float32(np.sqrt(np.sum(d * d, dtype=np.float32)))
    unit = oracle._normalize(d)
    if oracle.shadow_test(b, world_pos, unit, dist):
        color = np.float32(0.1) * albedo
    else:
        color = albedo * np.sum(normal * unit, dtype=np.float32)
    return np.clip(color, 0.0, 1.0), tri


def test_simple_matches_oracle():
    from flexlight_tpu import Config, FlexLight
    from flexlight_tpu.ops.buffers import build_scene_buffers
    from flexlight_tpu.ops.pathtrace import camera_rays

    scene, camera = cornell_scene()
    engine = FlexLight((SIZE, SIZE))
    engine.scene = scene
    for f in ("x", "y", "z", "fx", "fy", "fov"):
        setattr(engine.camera, f, getattr(camera, f))
    engine.config = Config(temporal=False, filter=False, antialiasing=None)
    engine.api = "webgpu"
    engine.renderer = "pathtracer"
    got = engine.renderer.render_frame()

    buffers = build_scene_buffers(scene)
    b = oracle._Buffers(buffers)
    cam = np.array([camera.x, camera.y, camera.z], np.float32)
    view = camera.view_matrix(SIZE, SIZE)
    _, d3, _ = camera_rays(SIZE, SIZE, cam, view)
    d3 = np.asarray(d3)

    n_bad = 0
    for y in range(SIZE):
        for x in range(SIZE):
            rgb, tri = shade_pixel(b, cam, d3[y * SIZE + x].astype(np.float32))
            if np.abs(got[y, x] - rgb).max() > 2e-4:
                n_bad += 1
                assert tri != -1, (y, x, got[y, x], rgb)
    # disagreeing primaries = shared-edge distance ties only
    assert n_bad <= SIZE * SIZE * 0.15, n_bad
