"""Shared post-processing helpers.

The reference stores every intermediate pass in RGBA8 textures; gating in
the temporal/denoise passes compares those quantized values for exact
equality (e.g. pathtracerWGL2.js:571-662, pathtracer_first_filter.glsl:112).
`quantize_rgba8` reproduces store-quantization so the gates behave
identically; `gather` reproduces texelFetch's zero result out of bounds.
"""

from __future__ import annotations

import jax.numpy as jnp

INV_255 = 1.0 / 255.0
INV_256 = 1.0 / 256.0


def quantize_rgba8(v: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [0,1] and snap to 8-bit levels (RGBA8 texture store)."""
    return jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0) * INV_255


def split_hdr(color: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fract/floor HDR split for RGBA8 storage (glsl:621-623)."""
    frac = color - jnp.floor(color)
    high = jnp.floor(color) * INV_256
    return quantize_rgba8(frac), quantize_rgba8(high)


def gather(img: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """texelFetch at (pixel + offset) with zero out-of-bounds.

    img: [H, W, C]; dy/dx: [H, W, K] int32 offsets -> [H, W, K, C].
    """
    h, w = img.shape[0], img.shape[1]
    yy = jnp.arange(h, dtype=jnp.int32)[:, None, None] + dy
    xx = jnp.arange(w, dtype=jnp.int32)[None, :, None] + dx
    inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    vals = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
    return jnp.where(inb[..., None], vals, 0.0)


def reinhard_gamma(color: jnp.ndarray) -> jnp.ndarray:
    """Reinhard tone map + the reference's gamma curve
    (pathtracer_final_filter.glsl:61-67)."""
    c = color / (color + 1.0)
    return jnp.power(jnp.maximum(4.0 * c, 0.0), 1.0 / 0.8) / 4.0 * 1.3
