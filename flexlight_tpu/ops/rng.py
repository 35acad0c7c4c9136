"""Hash RNG reproducing the reference's GLSL `noise()` semantics
(pathtracer_fragment.glsl:119-121):

    fract(sin(dot(n, (12.9898, 78.233)) + (53,59,61,67)*(seed + rs*PHI))
          * 43758.5453) * 2 - 1

Kept bit-for-bit-style in float32 for golden-image parity. A counter-based
`jax.random` path can be swapped in for quality (threefry), but the hash is
the compat default.
"""

from __future__ import annotations

import jax.numpy as jnp

PHI = 1.61803398874989484820459
_OFFSETS = jnp.array([53.0, 59.0, 61.0, 67.0], dtype=jnp.float32)
_DOT = jnp.array([12.9898, 78.233], dtype=jnp.float32)


def fract(x):
    return x - jnp.floor(x)


def noise(n: jnp.ndarray, seed, random_seed) -> jnp.ndarray:
    """n: [..., 2] -> [..., 4] in [-1, 1)."""
    n = n.astype(jnp.float32)
    d = n[..., 0] * _DOT[0] + n[..., 1] * _DOT[1]
    arg = d[..., None] + _OFFSETS * (jnp.float32(seed) + jnp.float32(random_seed) * jnp.float32(PHI))
    return fract(jnp.sin(arg) * jnp.float32(43758.5453)) * 2.0 - 1.0


def noise4(n0: jnp.ndarray, n1: jnp.ndarray, seed, random_seed):
    """SoA form of `noise`: two [N] coordinate components -> four [N]
    channels (full-lane layout; see ops.vec3). Uses python-float
    constants (not the module jnp arrays) so it can trace inside Pallas
    kernels without captured-constant inputs (ops.fused)."""
    d = (n0.astype(jnp.float32) * jnp.float32(12.9898)
         + n1.astype(jnp.float32) * jnp.float32(78.233))
    t = jnp.float32(seed) + jnp.float32(random_seed) * jnp.float32(PHI)
    mul = jnp.float32(43758.5453)
    return tuple(fract(jnp.sin(d + jnp.float32(o) * t) * mul) * 2.0 - 1.0
                 for o in (53.0, 59.0, 61.0, 67.0))
