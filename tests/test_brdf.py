import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flexlight_tpu.ops.brdf import forward_trace, fresnel, normalize, smith, trowbridge_reitz
from flexlight_tpu.ops.rng import noise


def test_fresnel_limits():
    f0 = jnp.array([0.04, 0.04, 0.04])
    # Normal incidence -> F0; grazing -> 1
    np.testing.assert_allclose(np.asarray(fresnel(f0, 1.0)), 0.04, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fresnel(f0, 0.0)), 1.0, atol=1e-6)


def test_trowbridge_reitz_peak_at_normal():
    d0 = float(trowbridge_reitz(jnp.float32(0.25), jnp.float32(1.0)))
    d1 = float(trowbridge_reitz(jnp.float32(0.25), jnp.float32(0.5)))
    assert d0 > d1 > 0.0


def test_forward_trace_inverse_square_and_cosine():
    albedo = jnp.array([[1.0, 1.0, 1.0]])
    rme = jnp.array([[1.0, 0.0, 0.0]])  # pure diffuse-ish
    n = jnp.array([[0.0, 1.0, 0.0]])
    v = normalize(jnp.array([[0.0, 1.0, 1.0]]))
    near = forward_trace(albedo, rme, jnp.array([[0.0, 1.0, 0.0]]), 100.0, n, v)
    far = forward_trace(albedo, rme, jnp.array([[0.0, 3.0, 0.0]]), 100.0, n, v)
    assert float(near.sum()) > float(far.sum())  # inverse square law
    # Light behind the surface contributes nothing (NdotL clamp)
    behind = forward_trace(albedo, rme, jnp.array([[0.0, -2.0, 0.0]]), 100.0, n, v)
    np.testing.assert_allclose(np.asarray(behind), 0.0, atol=1e-7)


def test_diffuse_white_furnace_bound():
    """Energy sanity: diffuse lobe with albedo 1 never exceeds the
    brightness/pi bound times NdotL for a single light."""
    albedo = jnp.ones((1, 3))
    rme = jnp.array([[1.0, 0.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    v = normalize(jnp.array([[0.3, 1.0, 0.2]]))
    light_dir = jnp.array([[0.0, 2.0, 0.0]])
    out = forward_trace(albedo, rme, light_dir, 9.0, n, v)
    brightness = 9.0 / (1.0 + 2.0) ** 2
    # Kd*lambert*NdotL <= brightness/pi + specular; bound loosely at 2x
    assert float(out.max()) <= 2.0 * brightness


def test_noise_matches_glsl_semantics():
    """fract(sin(dot(n,(12.9898,78.233)) + k*(seed+rs*PHI))*2-1 — the
    expected value is computed with the same jnp ops (the hash amplifies
    any cross-library sin() ULP difference by 43758, so a NumPy reference
    would be chaotically fragile)."""
    n = jnp.array([[0.25, -0.5]])
    out = np.asarray(noise(n, 2.0, 3.0))
    phi = jnp.float32(1.61803398874989484820459)
    d = n[0, 0] * 12.9898 + n[0, 1] * 78.233
    for i, k in enumerate([53.0, 59.0, 61.0, 67.0]):
        arg = d + jnp.float32(k) * (jnp.float32(2.0) + jnp.float32(3.0) * phi)
        val = jnp.sin(arg) * jnp.float32(43758.5453)
        expected = float((val - jnp.floor(val)) * 2.0 - 1.0)
        np.testing.assert_allclose(out[0, i], expected, atol=1e-5)
    assert (out >= -1.0).all() and (out < 1.0).all()


def test_noise_decorrelates_with_seed():
    n = jnp.array([[0.1, 0.2]])
    a = np.asarray(noise(n, 0.0, 0.0))
    b = np.asarray(noise(n, 1.0, 0.0))
    assert not np.allclose(a, b)
