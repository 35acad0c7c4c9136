"""Weighted-reservoir NEE distribution check (glsl:400-461).

With K unoccluded lights, the reservoir must select light j with
probability proportional to |forwardTrace contribution|. The selected
index is recovered from the id channel's w encoding
((num % 128) * 2 / 255 + shadow bit).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flexlight_tpu.ops.brdf import forward_trace, normalize
from flexlight_tpu.ops.buffers import SceneBuffers
from flexlight_tpu.ops.pathtrace import reservoir_sample
from flexlight_tpu.ops.rng import noise
from flexlight_tpu.ops.vec3 import stack3, unstack3


def _buffers_with_lights(lights):
    l = np.zeros((len(lights), 2, 3), dtype=np.float32)
    for i, (pos, intensity) in enumerate(lights):
        l[i, 0] = pos
        l[i, 1, 0] = intensity
    z = jnp.zeros((256, 12))
    return SceneBuffers(
        geometry=z, attributes=jnp.zeros((256, 28)),
        id_buffer=jnp.zeros(1, dtype=jnp.int32),
        rotations=jnp.eye(3)[None, None].repeat(2, 1),
        shifts=jnp.zeros((1, 2, 3)), lights=jnp.asarray(l),
        ambient=jnp.zeros(3),
        albedo_atlas=jnp.zeros((1, 1, 3)), pbr_atlas=jnp.zeros((1, 1, 3)),
        tpo_atlas=jnp.zeros((1, 1, 3)), texture_width=jnp.float32(1.0),
    )


def test_reservoir_distribution_proportional_to_weight():
    lights = [([0.0, 5.0, 0.0], 100.0), ([3.0, 5.0, 0.0], 300.0),
              ([-3.0, 5.0, 0.0], 50.0)]
    buffers = _buffers_with_lights(lights)
    n = 8192
    rng = np.random.default_rng(0)
    origin = jnp.zeros((n, 3))
    normal = jnp.tile(jnp.array([0.0, 1.0, 0.0]), (n, 1))
    unit_dir = normalize(jnp.asarray(
        rng.normal(size=(n, 3)).astype(np.float32) * [0.2, 0.2, 0.2] + [0, -1, 0]))
    albedo = jnp.ones((n, 3))
    rme = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (n, 1))
    tpo = jnp.zeros((n, 3))
    random_vec = noise(jnp.asarray(rng.uniform(-1, 1, (n, 2)).astype(np.float32)),
                       0.0, 0.0)

    color3, id_w = reservoir_sample(
        buffers, unstack3(albedo), rme[:, 0], rme[:, 1], rme[:, 2],
        unstack3(origin), unstack3(unit_dir), tuple(random_vec.T),
        unstack3(normal), unstack3(normal), jnp.zeros(n), 0.0,
        lambda o, d, l, alive=None: jnp.zeros(o[0].shape, dtype=bool))  # no occluders
    color = stack3(color3)

    idw = np.round(np.asarray(id_w) * 255.0).astype(int)
    assert (idw % 2 == 0).all()  # nothing shadowed
    chosen = (idw // 2) % 128
    counts = np.bincount(chosen, minlength=3)[:3]

    # Expected selection mass ~ |forwardTrace| per light at the mean ray
    weights = []
    for pos, intensity in lights:
        c = forward_trace(albedo[:1], rme[:1],
                          jnp.asarray(pos, dtype=jnp.float32)[None] - origin[:1],
                          intensity, normal[:1], -unit_dir[:1])
        weights.append(float(jnp.linalg.norm(c)))
    expected = np.array(weights) / sum(weights)
    observed = counts / counts.sum()
    np.testing.assert_allclose(observed, expected, atol=0.08)
    # Color is the SUM over lights (reservoir only picks the shadow ray)
    assert float(color.min()) > 0.0
