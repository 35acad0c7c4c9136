"""Every example scene (1:1 ports of the reference's examples/*.js) must
build, flatten and — for the light ones — render a tiny frame."""

import importlib
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

ALL = ["cornell", "example1", "example2", "emissive", "wave", "obj",
       "eth", "bike", "dragon", "theater"]
LIGHT = {"cornell", "example1", "example2", "emissive", "wave"}


def _build(name):
    engine = importlib.import_module(name).build_scene()
    return engine[0] if isinstance(engine, tuple) else engine


@pytest.mark.parametrize("name", [n for n in ALL if n in LIGHT])
def test_example_builds_and_renders(name):
    from flexlight_tpu import Config

    engine = _build(name)
    engine.canvas = (8, 8)
    engine.config = Config(temporal=False, filter=False, antialiasing=None,
                           max_reflections=1)
    engine.renderer = "pathtracer"
    frame = engine.renderer.render_frame()
    assert frame.shape == (8, 8, 3)
    assert np.isfinite(frame).all()


@pytest.mark.slow
@pytest.mark.parametrize("name", [n for n in ALL if n not in LIGHT])
def test_example_builds_heavy(name):
    from flexlight_tpu.ops.buffers import build_scene_buffers

    engine = _build(name)
    buffers = build_scene_buffers(engine.scene)
    assert buffers.id_buffer.shape[0] > 0
