"""Pallas fused-traversal equivalence vs the scan oracle (interpret mode)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flexlight_tpu.ops import buffers as bufmod
from flexlight_tpu.ops.geometry import world_geometry
from flexlight_tpu.ops.traverse import shadow_scan, traverse_scan
from flexlight_tpu.ops.traverse_pallas import shadow_pallas, traverse_pallas
from tests.scenes import cornell_scene


@pytest.fixture(scope="module")
def cornell():
    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    wg = world_geometry(buffers)
    return buffers, wg, camera


def _rays(camera, n, seed=0):
    rng = np.random.default_rng(seed)
    origin = np.tile(camera.position, (n, 1)).astype(np.float32)
    origin += rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(origin), jnp.asarray(d)


def test_pallas_traverse_matches_scan(cornell):
    buffers, wg, camera = cornell
    o, d = _rays(camera, 1500)  # exercises tile padding (1500 % 1024 != 0)
    ref = traverse_scan(wg, o, d)
    got = traverse_pallas(wg, buffers.id_buffer, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.triangle), np.asarray(ref.triangle))
    hit = np.asarray(ref.triangle) != -1
    np.testing.assert_allclose(np.asarray(got.suv)[hit], np.asarray(ref.suv)[hit],
                               rtol=1e-4, atol=1e-4)


def test_pallas_shadow_matches_scan(cornell):
    buffers, wg, camera = cornell
    o, d = _rays(camera, 1024, seed=1)
    ml = jnp.full((1024,), 8.0, dtype=jnp.float32)
    ref = shadow_scan(wg, o, d, ml)
    got = shadow_pallas(wg, buffers.id_buffer, o, d, ml, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
