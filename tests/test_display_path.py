"""Display fetch paths: device-side u8 quantization and the pipelined
(one-frame-latency, swapchain-style) fetch mode."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tests.scenes import cornell_config, cornell_scene  # noqa: E402


def _renderer():
    from flexlight_tpu import FlexLight

    scene, _ = cornell_scene()
    engine = FlexLight((16, 16))
    engine.scene = scene
    engine.config = cornell_config(max_reflections=1)
    engine.renderer = "pathtracer"
    return engine


def test_render_frame_u8_matches_host_quantization():
    r = _renderer().renderer
    f32 = r.render_frame()
    u8 = _renderer().renderer.render_frame_u8()
    assert u8.dtype == np.uint8 and u8.shape == f32.shape
    expect = np.round(np.clip(f32, 0.0, 1.0) * 255.0).astype(np.uint8)
    assert np.array_equal(u8, expect)


def test_pipelined_returns_previous_frame():
    ref = _renderer()
    f0 = ref.renderer.render_frame().copy()
    ref.camera.x += 2.0
    f1 = ref.renderer.render_frame().copy()
    assert not np.array_equal(f0, f1)

    eng = _renderer()
    r = eng.renderer
    r.pipelined = True
    out0 = r.render_frame().copy()          # first call: no previous yet
    eng.camera.x += 2.0
    out1 = r.render_frame().copy()          # returns frame 0, dispatches 1
    out2 = r.render_frame().copy()          # returns frame 1
    assert np.array_equal(out0, f0)
    assert np.array_equal(out1, f0)
    assert np.array_equal(out2, f1)
