"""AtlasTable (compact texel table) vs padded-atlas fetch equivalence.

The compact table must reproduce `fetch_tex_val_soa` over `build_atlas`
bit-exactly for every texture-size mix: native smaller than the standard
tile (stored native), bigger (stored as the standard resample), 1x1
constants, padding slots reached by REPEAT wrap, and the no-texture
placeholder. Covers the u8 storage decision (image-derived values round-trip
exactly; arbitrary floats must stay f32).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flexlight_tpu.ops.buffers import (
    build_atlas, build_atlas_table, fetch_tex_val_soa, fetch_tex_val_table,
    ATLAS_WIDTH_PX)


class _Tex:
    def __init__(self, data):
        self.data = np.asarray(data, dtype=np.float32)


def _rand_tex(rng, h, w, u8=False):
    if u8:
        return _Tex(rng.integers(0, 256, size=(h, w, 3)).astype(np.float32)
                    * np.float32(1.0 / 255.0) * 0 +
                    (np.round(rng.random((h, w, 3)) * 255).astype(np.float32)
                     * np.float32(1.0 / 255.0)))
    return _Tex(rng.random((h, w, 3)).astype(np.float32))


def _compare(textures, std, n_pts=4096, seed=0):
    rng = np.random.default_rng(seed)
    atlas = jnp.asarray(build_atlas(textures, std))
    table = build_atlas_table(textures, std)
    tpr = max(ATLAS_WIDTH_PX // int(std[0]), 1)
    tw = jnp.float32(tpr)
    # uv beyond [0,1) exercises REPEAT wrap into other tiles / padding
    u = jnp.asarray(rng.uniform(-1.5, 2.5, n_pts).astype(np.float32))
    v = jnp.asarray(rng.uniform(-1.5, 2.5, n_pts).astype(np.float32))
    n_tex = max(len(textures), 1)
    tex_num = jnp.asarray(
        rng.integers(-1, n_tex, n_pts).astype(np.float32))
    default3 = tuple(jnp.asarray(rng.random(n_pts).astype(np.float32))
                     for _ in range(3))
    ref = fetch_tex_val_soa(atlas, u, v, tex_num, default3, tw)
    got = fetch_tex_val_table(table, u, v, tex_num, default3)
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(ref[c]), np.asarray(got[c]))
    return table


def test_placeholder_no_textures():
    t = _compare([], [16, 16])
    assert t.texels.shape[0] == 1


def test_small_native_tiles_one_hot():
    rng = np.random.default_rng(1)
    texs = [_rand_tex(rng, 1, 1), _rand_tex(rng, 3, 11), _rand_tex(rng, 1, 1)]
    t = _compare(texs, [512, 512], seed=1)
    # stored native: 1 + 33 + 1 + zero pad slot texel
    assert t.texels.shape[0] == 36
    assert t.texels.dtype == jnp.float32  # arbitrary floats: no u8


def test_big_source_resampled_to_standard():
    rng = np.random.default_rng(2)
    texs = [_rand_tex(rng, 40, 56)]
    t = _compare(texs, [16, 16], seed=2)
    assert t.texels.shape[0] == 16 * 16 + 1


def test_mixed_sizes_multi_row():
    rng = np.random.default_rng(3)
    # std 1024 -> 2 tiles/row; 3 textures spread over 2 tile rows
    texs = [_rand_tex(rng, 2, 2), _rand_tex(rng, 1, 1), _rand_tex(rng, 5, 3)]
    _compare(texs, [1024, 1024], seed=3)


def test_u8_exact_storage():
    rng = np.random.default_rng(4)
    # image-derived data: n/255 values round-trip bit-exactly
    d = (np.round(rng.random((8, 8, 3)) * 255).astype(np.float32)
         * np.float32(1.0 / 255.0))
    t = _compare([_Tex(d), _Tex(np.zeros((65, 80, 3)))], [16, 16], seed=4)
    assert t.texels.dtype == jnp.uint8


def test_scene_buffers_carry_tables():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import importlib
    from flexlight_tpu.ops.buffers import build_scene_buffers
    mod = importlib.import_module("cornell")
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    b = build_scene_buffers(engine.scene)
    assert b.pbr_tab is not None
    # compact table must be far smaller than the padded 2048-wide atlas
    fat = b.pbr_atlas.shape[0] * b.pbr_atlas.shape[1]
    assert b.pbr_tab.texels.shape[0] < fat / 8
