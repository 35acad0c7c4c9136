"""Bounded-halo exchange for sharded post-processing.

The denoise stencils (37-tap discs with per-pixel radius,
pathtracer_first_filter.glsl:96-117) and FXAA read neighborhoods across
image-strip boundaries. Instead of all_gathering whole frames, each shard
exchanges `halo` boundary rows with its mesh neighbors via
`jax.lax.ppermute` (ICI point-to-point); shards at the image border
receive zeros — exactly texelFetch's out-of-bounds result, so the math
matches the single-chip pipeline wherever the per-pixel stencil radius
stays within the halo (a `halo`-row deviation bound otherwise; radii are
clamped server-side by the gather anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exchange_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """x: per-shard strip [rows, W, C] -> [rows + 2*halo, W, C].

    Devices with no neighbor on a side get zero rows there (ppermute's
    semantics for uncovered targets = texelFetch OOB).
    """
    n = jax.lax.axis_size(axis_name)
    down = [(i, i + 1) for i in range(n - 1)]   # my bottom rows -> next shard's top halo
    up = [(i, i - 1) for i in range(1, n)]      # my top rows -> previous shard's bottom halo
    from_above = jax.lax.ppermute(x[-halo:], axis_name, down)
    from_below = jax.lax.ppermute(x[:halo], axis_name, up)
    return jnp.concatenate([from_above, x, from_below], axis=0)


def with_halo(fn, halo: int, axis_name: str):
    """Lift an image-local op (img [H,W,C..] pytree -> pytree) to sharded
    strips: exchange halos on every input leaf, apply, crop the halo."""

    def wrapped(*strips):
        padded = jax.tree.map(lambda x: exchange_halo(x, halo, axis_name), strips)
        out = fn(*padded)
        return jax.tree.map(lambda x: x[halo:-halo], out)

    return wrapped
