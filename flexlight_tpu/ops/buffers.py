"""Device scene buffers.

The flattened scene as a pytree of jnp arrays — the single input contract
between the host scene layer and every kernel. Mirrors the reference's
GPU-texture data contracts (SURVEY §2.3):

- geometry [S, 12]  — geometryTex, 3 RGBA32F texels/slot (scene.js:294-298)
- attributes [S, 28] — sceneTex, 7 texels/slot (scene.js:636-641)
- rotations [M, 2, 3, 3] / shifts [M, 2, 3] — transform UBO, even=forward,
  odd=pseudo-inverse (scene.js:500-521)
- lights [L, 2, 3] — lightTex, 2 texels/light (pathtracerWGL2.js:154-165)
- 3 texture atlases, 2048px-wide tile rows (pathtracerWGL2.js:85-104)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

ATLAS_WIDTH_PX = 2048  # pathtracerWGL2.js:93


class SceneBuffers(NamedTuple):
    geometry: jnp.ndarray       # [S, 12] f32
    attributes: jnp.ndarray     # [S, 28] f32
    id_buffer: jnp.ndarray      # [T] int32 — triangle slot per drawable tri
    rotations: jnp.ndarray      # [M, 2, 3, 3] f32
    shifts: jnp.ndarray         # [M, 2, 3] f32
    lights: jnp.ndarray         # [L, 2, 3] f32
    ambient: jnp.ndarray        # [3] f32
    albedo_atlas: jnp.ndarray   # [Ha, Wa, 3] f32
    pbr_atlas: jnp.ndarray      # [Hp, Wp, 3] f32
    tpo_atlas: jnp.ndarray      # [Ht, Wt, 3] f32
    texture_width: jnp.ndarray  # [] f32 — tiles per atlas row


def build_atlas(textures, standard_size) -> np.ndarray:
    """Pack textures into 2048px-wide rows of standard-size tiles
    (pathtracerWGL2.js:85-104). Returns [H, W, 3] float32."""
    if not textures:
        return np.zeros((1, 1, 3), dtype=np.float32)
    width, height = int(standard_size[0]), int(standard_size[1])
    tiles_per_row = max(ATLAS_WIDTH_PX // width, 1)
    n = len(textures)
    atlas = np.zeros((height * n, width * tiles_per_row, 3), dtype=np.float32)
    for i, tex in enumerate(textures):
        row, col = i // tiles_per_row, i % tiles_per_row
        data = tex.data
        # Resample to the standard tile size with nearest sampling if needed
        if data.shape[0] != height or data.shape[1] != width:
            ys = (np.arange(height) * data.shape[0] // height).clip(0, data.shape[0] - 1)
            xs = (np.arange(width) * data.shape[1] // width).clip(0, data.shape[1] - 1)
            data = data[ys][:, xs]
        atlas[row * height:(row + 1) * height, col * width:(col + 1) * width] = data
    return atlas


def build_scene_buffers(scene, registry=None) -> SceneBuffers:
    """Flatten a host Scene into device arrays (the updateScene equivalent,
    pathtracerWGL2.js:167-189)."""
    from ..scene.transform import global_registry

    built = scene.generate_arrays()
    registry = registry or global_registry()
    rotations, shifts = registry.build_arrays()
    lights = scene.build_light_array()
    width = int(scene.standard_texture_sizes[0])
    tiles_per_row = max(ATLAS_WIDTH_PX // width, 1)
    return SceneBuffers(
        geometry=jnp.asarray(built.geometry),
        attributes=jnp.asarray(built.attributes),
        id_buffer=jnp.asarray(built.id_buffer, dtype=jnp.int32),
        rotations=jnp.asarray(rotations),
        shifts=jnp.asarray(shifts),
        lights=jnp.asarray(lights),
        ambient=jnp.asarray(np.asarray(scene.ambient_light, dtype=np.float32)),
        albedo_atlas=jnp.asarray(build_atlas(scene.textures, scene.standard_texture_sizes)),
        pbr_atlas=jnp.asarray(build_atlas(scene.pbr_textures, scene.standard_texture_sizes)),
        tpo_atlas=jnp.asarray(build_atlas(scene.translucency_textures, scene.standard_texture_sizes)),
        texture_width=jnp.float32(tiles_per_row),
    )


def fetch_tex_val(atlas: jnp.ndarray, uv: jnp.ndarray, tex_num: jnp.ndarray,
                  default: jnp.ndarray, texture_width: jnp.ndarray) -> jnp.ndarray:
    """Atlas lookup (pathtracer_fragment.glsl:108-117): NEAREST sampling with
    REPEAT wrap on the normalized coordinates the reference computes.

    uv: [..., 2], tex_num: [...], default: [..., 3] -> [..., 3]
    """
    h, w = atlas.shape[0], atlas.shape[1]
    height_factor = jnp.float32(w) / jnp.float32(h)
    cx = (uv[..., 0] + jnp.mod(tex_num, texture_width)) / texture_width
    cy = (uv[..., 1] + jnp.floor(tex_num / texture_width)) * height_factor / texture_width
    px = jnp.floor(jnp.mod(cx, 1.0) * w).astype(jnp.int32).clip(0, w - 1)
    py = jnp.floor(jnp.mod(cy, 1.0) * h).astype(jnp.int32).clip(0, h - 1)
    # flat row gather: a two-axis atlas[py, px] gather leaves the TPU
    # vectorized gather path
    sampled = atlas.reshape(h * w, atlas.shape[-1])[py * w + px]
    return jnp.where((tex_num == -1.0)[..., None], default, sampled)


def fetch_tex_val_soa(atlas: jnp.ndarray, u, v, tex_num, default3,
                      texture_width):
    """SoA `fetch_tex_val`: uv as two [N] arrays, default as a 3-tuple.
    Skips the gather entirely for the 1x1 placeholder atlas (scene has no
    textures of this kind)."""
    h, w = atlas.shape[0], atlas.shape[1]
    miss = tex_num == -1.0
    if h * w == 1:
        return tuple(jnp.where(miss, d, atlas[0, 0, c])
                     for c, d in enumerate(default3))
    height_factor = jnp.float32(w) / jnp.float32(h)
    cx = (u + jnp.mod(tex_num, texture_width)) / texture_width
    cy = (v + jnp.floor(tex_num / texture_width)) * height_factor / texture_width
    px = jnp.floor(jnp.mod(cx, 1.0) * w).astype(jnp.int32).clip(0, w - 1)
    py = jnp.floor(jnp.mod(cy, 1.0) * h).astype(jnp.int32).clip(0, h - 1)
    sampled = jnp.moveaxis(
        atlas.reshape(h * w, atlas.shape[-1])[py * w + px], -1, 0)
    return tuple(jnp.where(miss, d, sampled[c]) for c, d in enumerate(default3))
