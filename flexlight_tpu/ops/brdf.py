"""Cook-Torrance BRDF (pathtracer_fragment.glsl:282-334).

Vectorized over [..., 3] arrays; arithmetic mirrors the reference exactly,
including its non-standard choices (F0 = albedo * mix(1, NdotV, metallic),
inverse-square on 1+|lightDir|).
"""

from __future__ import annotations

import jax.numpy as jnp

from .intersect import BIAS

PI = 3.141592653589793
INV_PI = 0.3183098861837907
SQRT3 = 1.7320508075688772


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v, eps=0.0):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)


def trowbridge_reitz(alpha, n_dot_h):
    num = alpha * alpha
    denom = n_dot_h * n_dot_h * (num - 1.0) + 1.0
    return num / jnp.maximum(PI * denom * denom, BIAS)


def schlick_beckmann(alpha, n_dot_x):
    k = alpha * 0.5
    denom = jnp.maximum(n_dot_x * (1.0 - k) + k, BIAS)
    return n_dot_x / denom


def smith(alpha, n_dot_v, n_dot_l):
    return schlick_beckmann(alpha, n_dot_v) * schlick_beckmann(alpha, n_dot_l)


def fresnel(f0, theta):
    """Schlick approximation (glsl:299-302)."""
    return f0 + (1.0 - f0) * (1.0 - theta) ** 5


def forward_trace(albedo, rme, light_dir, strength, n, v):
    """Direct light contribution for one light (glsl:304-334).

    light_dir: unnormalized vector to the light; n: shading normal;
    v: unit vector toward the viewer. Returns [..., 3] radiance.
    """
    len_p1 = 1.0 + jnp.linalg.norm(light_dir, axis=-1)
    brightness = strength / (len_p1 * len_p1)

    l = normalize(light_dir)
    h = normalize(v + l)

    v_dot_h = jnp.maximum(_dot(v, h), 0.0)
    n_dot_l = jnp.maximum(_dot(n, l), 0.0)
    n_dot_h = jnp.maximum(_dot(n, h), 0.0)
    n_dot_v = jnp.maximum(_dot(n, v), 0.0)

    roughness = rme[..., 0]
    metallic = rme[..., 1]
    alpha = roughness * roughness
    brdf = 1.0 + (n_dot_v - 1.0) * metallic          # mix(1, NdotV, metallic)
    f0 = albedo * brdf[..., None]

    ks = fresnel(f0, v_dot_h[..., None])
    kd = (1.0 - ks) * (1.0 - metallic[..., None])
    lambert = albedo * INV_PI

    ct_num = ks * (trowbridge_reitz(alpha, n_dot_h) * smith(alpha, n_dot_v, n_dot_l))[..., None]
    ct_denom = jnp.maximum(4.0 * n_dot_v * n_dot_l, BIAS)
    cook_torrance = ct_num / ct_denom[..., None]
    radiance = kd * lambert + cook_torrance
    return radiance * (n_dot_l * brightness)[..., None]


def forward_trace_soa(albedo, rough, metal, emis, light_dir, strength, n, v):
    """SoA `forward_trace`: albedo/light_dir/n/v are (x,y,z) tuples of [N]
    arrays, rough/metal [N]. Returns radiance as a 3-tuple. Arithmetic
    matches the AoS form (glsl:304-334)."""
    from .vec3 import add3, dot3, norm3, normalize3, scale3

    len_p1 = 1.0 + norm3(light_dir)
    brightness = strength / (len_p1 * len_p1)

    l = normalize3(light_dir)
    h = normalize3(add3(v, l))

    v_dot_h = jnp.maximum(dot3(v, h), 0.0)
    n_dot_l = jnp.maximum(dot3(n, l), 0.0)
    n_dot_h = jnp.maximum(dot3(n, h), 0.0)
    n_dot_v = jnp.maximum(dot3(n, v), 0.0)

    alpha = rough * rough
    brdf = 1.0 + (n_dot_v - 1.0) * metal
    one_m_theta5 = (1.0 - v_dot_h) ** 5
    ct = (trowbridge_reitz(alpha, n_dot_h) * smith(alpha, n_dot_v, n_dot_l)
          / jnp.maximum(4.0 * n_dot_v * n_dot_l, BIAS))
    gain = n_dot_l * brightness
    out = []
    for c in albedo:
        f0 = c * brdf
        ks = f0 + (1.0 - f0) * one_m_theta5
        kd = (1.0 - ks) * (1.0 - metal)
        out.append((kd * c * INV_PI + ks * ct) * gain)
    return tuple(out)
