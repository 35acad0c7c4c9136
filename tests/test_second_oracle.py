"""Second, independently-written oracle for the highest-risk arithmetic
(VERDICT r2 item 8).

`tests/reference_oracle.py` transcribes the GLSL float-op-by-float-op; a
shared misreading would pass both it and the pipeline. No browser/JS
runtime exists in this image (no chromium/firefox/node; zero egress), so
the real WebGL2 renderer cannot be captured — instead, this module
derives the two quirkiest contracts FROM FIRST PRINCIPLES with a
different decomposition and checks the pipeline against that:

- id packing (pathtracer_fragment.glsl:91-105): derived as pure integer
  nibble arithmetic on Python ints (the GLSL uint casts truncate; the
  masks select high nibbles), not float uint-op mimicry.
- atlas indexing (pathtracer_fragment.glsl:108-117): derived from GL
  `texture()` NEAREST+REPEAT semantics symbolically — the normalized
  atlasCoords simplify to integer tile row/col plus an in-tile texel,
  computed here directly as exact integer math per sample in float64,
  never through the f32 mod/floor chain the pipeline and first oracle
  share.

Boundary ties (inputs within one f32 ulp of a nibble/texel edge, where
f32 vs f64 rounding legitimately disagrees) are excluded but budgeted.
"""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402


# ---------------------------------------------------------------------------
# id packing (glsl:91-105)
# ---------------------------------------------------------------------------

def _pack_nibbles_int(a: float, b: float) -> float:
    """glsl:91-95 as pure integer arithmetic: uint(x*255) truncates, the
    240-mask keeps the high nibble, b's nibble shifts into the low 4 bits.
    Equivalent closed form: byte = (int(a*255)//16)*16 + int(b*255)//16."""
    an = int(a * 255.0) // 16          # high nibble of a
    bn = int(b * 255.0) // 16          # high nibble of b
    byte = an * 16 + bn                # aui | bui with disjoint bit ranges
    return np.float32(byte) * np.float32(1.0 / 255.0)


def _spherical_nibbles_int(nx: float, ny: float, nz: float) -> float:
    """glsl:97-101 via C-libm doubles: phi/theta in [0,1] then nibble-pack."""
    inv_pi = 1.0 / math.pi
    phi = math.atan2(nz, nx) * inv_pi * 0.5 + 0.5
    theta = math.atan2(nx, ny) * inv_pi * 0.5 + 0.5
    return _pack_nibbles_int(phi, theta)


def _near_nibble_edge(x: float, tol: float = 2e-6) -> bool:
    """True when x*255 sits within tol*255 of a multiple of 16 (where f32
    truncation may disagree with f64)."""
    v = x * 255.0
    return abs(v / 16.0 - round(v / 16.0)) * 16.0 < tol * 255.0 * 16.0


def test_pack_nibbles_exhaustive_bytes():
    """All 256x256 exact byte pairs: a=i/255, b=j/255 are exact f32 inputs;
    the pipeline's float path must reproduce the integer model exactly."""
    from flexlight_tpu.ops.pathtrace import to_4bit_representation

    i = np.arange(256, dtype=np.float32)
    a, b = np.meshgrid(i / np.float32(255.0), i / np.float32(255.0))
    got = np.asarray(to_4bit_representation(jnp.asarray(a), jnp.asarray(b)))
    want = np.empty_like(got)
    for y in range(256):
        for x in range(256):
            want[y, x] = _pack_nibbles_int(float(a[y, x]), float(b[y, x]))
    np.testing.assert_array_equal(got, want)


def test_pack_nibbles_random_floats():
    """Random non-grid floats in [0,1): same nibble unless within an ulp
    of a nibble edge (budgeted)."""
    from flexlight_tpu.ops.pathtrace import to_4bit_representation

    rng = np.random.default_rng(7)
    a = rng.random(4096).astype(np.float32)
    b = rng.random(4096).astype(np.float32)
    got = np.asarray(to_4bit_representation(jnp.asarray(a), jnp.asarray(b)))
    ties = mism = 0
    for k in range(a.shape[0]):
        want = _pack_nibbles_int(float(a[k]), float(b[k]))
        if got[k] == want:
            continue
        if _near_nibble_edge(float(a[k])) or _near_nibble_edge(float(b[k])):
            ties += 1
            continue
        mism += 1
    assert mism == 0, f"{mism} non-tie nibble mismatches"
    assert ties <= 8, f"implausibly many edge ties: {ties}"


def test_combine_normal_rme_against_integer_oracle():
    """Full combineNormalRME (glsl:103-105) on random unit normals vs the
    double-precision integer-nibble model."""
    from flexlight_tpu.ops.pathtrace import combine_normal_rme

    rng = np.random.default_rng(11)
    n = rng.normal(size=(2048, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    rme = rng.random((2048, 3)).astype(np.float32)
    got = np.asarray(combine_normal_rme(jnp.asarray(n), jnp.asarray(rme)))
    assert got.shape == (2048, 3)
    np.testing.assert_array_equal(got[:, 1], rme[:, 0])  # passthrough
    ties = mism = 0
    inv_pi = 1.0 / math.pi
    for k in range(n.shape[0]):
        want0 = _spherical_nibbles_int(*(float(c) for c in n[k]))
        want2 = _pack_nibbles_int(float(rme[k, 1]), float(rme[k, 2]))
        phi = math.atan2(n[k, 2], n[k, 0]) * inv_pi * 0.5 + 0.5
        theta = math.atan2(n[k, 0], n[k, 1]) * inv_pi * 0.5 + 0.5
        ok0 = got[k, 0] == np.float32(want0)
        ok2 = got[k, 2] == np.float32(want2)
        if ok0 and ok2:
            continue
        if ((not ok0 and (_near_nibble_edge(phi) or _near_nibble_edge(theta)))
                or (not ok2 and (_near_nibble_edge(float(rme[k, 1]))
                                 or _near_nibble_edge(float(rme[k, 2]))))):
            ties += 1
            continue
        mism += 1
    assert mism == 0, f"{mism} non-tie combine mismatches"
    assert ties <= 20, f"implausibly many edge ties: {ties}"


# ---------------------------------------------------------------------------
# atlas indexing (glsl:108-117)
# ---------------------------------------------------------------------------

def _atlas_texel_int(u, v, tex_num, atlas_w, atlas_h, texture_width):
    """GL texture() NEAREST+REPEAT on glsl:110-115, derived symbolically.

    atlasCoords.x = (u + (texNum mod TW)) / TW with TW = textureWidth;
    sampling multiplies by atlas_w, so the texel x is
    floor(fract(cx) * atlas_w). Computed here in f64 integer form:
    col = texNum mod TW; px = floor((u + col) * atlas_w / TW) taken mod
    atlas_w. Same for y with the heightFactor fold:
    (v + row) * (atlas_w/atlas_h) / TW * atlas_h == (v + row) * atlas_w/TW
    -> the y STRIDE is atlas_w/TW (the standard tile WIDTH), the
    reference's square-tile assumption, preserved deliberately."""
    col = math.fmod(tex_num, texture_width)
    row = math.floor(tex_num / texture_width)
    stride = atlas_w / texture_width   # std tile width in pixels
    fx = (u + col) * stride            # pixel coordinate on the atlas
    fy = (v + row) * stride
    px = int(math.floor(math.fmod(fx / atlas_w, 1.0) * atlas_w))
    py = int(math.floor(math.fmod(fy / atlas_h, 1.0) * atlas_h))
    return min(px, atlas_w - 1), min(py, atlas_h - 1)


def _near_texel_edge(x: float, scale: float, tol: float = 1e-5) -> bool:
    v = x * scale
    return abs(v - round(v)) < tol * max(scale, 1.0)


class _Tex:
    def __init__(self, data):
        self.data = data


def _multi_tile_atlas():
    """A 3-texture atlas with non-uniform source sizes (64, 128, 32) on a
    64-standard grid: exercises tile resampling + row/col arithmetic."""
    rng = np.random.default_rng(3)
    texs = []
    for size in (64, 128, 32):
        img = (rng.integers(0, 256, size=(size, size, 3))
               .astype(np.float32) / np.float32(255.0))
        texs.append(_Tex(img))
    return texs


def test_atlas_fetch_against_integer_oracle():
    from flexlight_tpu.ops.buffers import build_atlas, fetch_tex_val_soa

    texs = _multi_tile_atlas()
    atlas = build_atlas(texs, (64, 64))
    tw = atlas.shape[1] // 64  # tiles per 2048px row
    atlas = jnp.asarray(atlas)
    ah, aw = atlas.shape[0], atlas.shape[1]
    rng = np.random.default_rng(5)
    m = 4096
    u = rng.random(m).astype(np.float32)
    v = rng.random(m).astype(np.float32)
    tex_num = rng.integers(-1, 3, size=m).astype(np.float32)
    got = fetch_tex_val_soa(atlas, jnp.asarray(u), jnp.asarray(v),
                            jnp.asarray(tex_num),
                            (jnp.float32(0.25), jnp.float32(0.5),
                             jnp.float32(0.75)), float(tw))
    got = np.stack([np.asarray(c) for c in got], axis=-1)
    anp = np.asarray(atlas)
    ties = mism = 0
    for k in range(m):
        if tex_num[k] == -1.0:
            np.testing.assert_allclose(got[k], [0.25, 0.5, 0.75])
            continue
        px, py = _atlas_texel_int(float(u[k]), float(v[k]),
                                  float(tex_num[k]), aw, ah, float(tw))
        want = anp[py, px, 0:3]
        if np.array_equal(got[k], want):
            continue
        stride = aw / float(tw)
        if (_near_texel_edge(float(u[k]), stride)
                or _near_texel_edge(float(v[k]), stride)):
            ties += 1
            continue
        mism += 1
    assert mism == 0, f"{mism} non-tie atlas fetch mismatches"
    assert ties <= 16, f"implausibly many texel-edge ties: {ties}"


def test_atlas_table_matches_soa_fetch():
    """fetch_tex_val_table (the compact gather/one-hot path the renderers
    actually use) must equal fetch_tex_val_soa on the same samples."""
    from flexlight_tpu.ops.buffers import (build_atlas, build_atlas_table,
                                           fetch_tex_val_soa,
                                           fetch_tex_val_table)

    texs = _multi_tile_atlas()
    atlas = build_atlas(texs, (64, 64))
    tw = atlas.shape[1] // 64
    table = build_atlas_table(texs, (64, 64))
    atlas = jnp.asarray(atlas)
    rng = np.random.default_rng(9)
    m = 4096
    u = jnp.asarray(rng.random(m).astype(np.float32))
    v = jnp.asarray(rng.random(m).astype(np.float32))
    tex_num = jnp.asarray(rng.integers(-1, 3, size=m).astype(np.float32))
    default = (jnp.float32(0.1), jnp.float32(0.2), jnp.float32(0.3))
    a = fetch_tex_val_soa(atlas, u, v, tex_num, default, float(tw))
    b = fetch_tex_val_table(table, u, v, tex_num, default)
    for ca, cb in zip(a, b):
        np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                                   atol=1e-6)
