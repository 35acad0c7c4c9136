"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import jax.numpy as jnp

from flexlight_tpu import Config
from flexlight_tpu.ops.buffers import build_scene_buffers
from flexlight_tpu.ops.pathtrace import render_mrt
from flexlight_tpu.parallel.tile_sharding import (
    frame_pipeline_sharded, make_mesh, render_mrt_sharded)
from flexlight_tpu.post.taa import TAAState
from flexlight_tpu.post.temporal import TemporalState
from tests.scenes import cornell_config, cornell_scene

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_mrt_matches_single_chip():
    scene, camera = cornell_scene()
    buffers = build_scene_buffers(scene)
    cfg = cornell_config(max_reflections=2)
    size = 32
    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)
    single = render_mrt(buffers, size, size, pos, view, cfg, 0.0)
    mesh = make_mesh(4, 1)
    sharded = render_mrt_sharded(buffers, size, size, pos, view, cfg, 0.0, mesh)
    np.testing.assert_allclose(np.asarray(single.color), np.asarray(sharded.color),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(single.alpha), np.asarray(sharded.alpha))
    np.testing.assert_allclose(np.asarray(single.render_id),
                               np.asarray(sharded.render_id), atol=1e-5)


def test_sharded_full_pipeline_2d_mesh():
    scene, camera = cornell_scene()
    buffers = build_scene_buffers(scene)
    cfg = Config(temporal=True, temporal_samples=2, filter=False,
                 antialiasing="fxaa", samples_per_ray=2, max_reflections=2)
    size = 32
    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)
    mesh = make_mesh(4, 2)
    temporal = TemporalState.create(2, size, size)
    taa = TAAState.create(size, size)
    display, temporal, taa = frame_pipeline_sharded(
        buffers, pos, view, jnp.float32(0.0), temporal, taa,
        width=size, height=size, config=cfg, mesh=mesh)
    out = np.asarray(display)
    assert out.shape == (size, size, 3)
    assert np.isfinite(out).all()
    assert out.max() > 0.0
