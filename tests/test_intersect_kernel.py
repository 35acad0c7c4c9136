"""Dense Pallas grid kernel (ops/intersect_kernel.py — the default TPU
scheme below the sparse threshold) vs the scan oracle, in interpret mode
on CPU: accept window (both runtime edge values), flag-prepass skipping,
alive-mask dead tiles, octant sorting, and the any-hit shadow variant."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402

from flexlight_tpu.ops import buffers as bufmod  # noqa: E402
from flexlight_tpu.ops.geometry import world_geometry  # noqa: E402
from flexlight_tpu.ops.intersect import BIAS  # noqa: E402
from tests.scenes import cornell_scene  # noqa: E402


def _setup():
    from flexlight_tpu.ops.intersect_kernel import build_w4, pick_tri_tile

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    tri_tile = pick_tri_tile(buffers.id_buffer.shape[0])
    w4, amin, amax, ids = build_w4(geometry, buffers.id_buffer, tri_tile)
    rng = np.random.default_rng(21)
    n = 2048
    origin = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    return buffers, geometry, (w4, amin, amax, ids, tri_tile), origin, direction, rng


@pytest.mark.parametrize("sort_rays", [False, True])
@pytest.mark.parametrize("edge", [float(BIAS), float(-BIAS)])
def test_kernel_traversal_matches_scan(sort_rays, edge):
    from flexlight_tpu.ops.intersect_kernel import traverse_kernel
    from flexlight_tpu.ops.traverse import traverse_scan

    buffers, geometry, (w4, amin, amax, ids, tri_tile), origin, direction, rng = _setup()
    alive = jnp.asarray(rng.uniform(size=origin.shape[0]) < 0.8)

    ref = traverse_scan(jnp.asarray(geometry), jnp.asarray(origin),
                        jnp.asarray(direction), edge=edge)
    got = traverse_kernel(w4, amin, amax, ids, jnp.asarray(origin),
                          jnp.asarray(direction), interpret=True,
                          tri_tile=tri_tile, sort_rays=sort_rays,
                          alive=alive, edge=edge)
    al = np.asarray(alive)
    got_tri = np.asarray(got.triangle)
    ref_tri = np.where(al, np.asarray(ref.triangle), -1)
    got_s = np.asarray(got.suv)[:, 0]
    ref_s = np.asarray(ref.suv)[:, 0]
    # dead rays report no hit
    assert (got_tri[~al] == -1).all()
    agree = got_tri == ref_tri
    tied = ((got_tri >= 0) & (ref_tri >= 0)
            & (np.abs(got_s - ref_s) <= 1e-3 + 1e-3 * np.abs(ref_s)))
    assert np.all(agree | tied), np.flatnonzero(~(agree | tied))[:10]
    assert (~agree).mean() <= 0.005
    hit = agree & (ref_tri >= 0) & al
    np.testing.assert_allclose(got_s[hit], ref_s[hit], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("sort_rays", [False, True])
def test_kernel_shadow_matches_scan(sort_rays):
    from flexlight_tpu.ops.intersect_kernel import shadow_kernel
    from flexlight_tpu.ops.traverse import shadow_scan

    buffers, geometry, (w4, amin, amax, ids, tri_tile), origin, direction, rng = _setup()
    target = rng.uniform(-4, 4, origin.shape).astype(np.float32)
    d = target - origin
    max_len = np.linalg.norm(d, axis=-1)
    unit = (d / max_len[:, None]).astype(np.float32)

    ref = shadow_scan(jnp.asarray(geometry), jnp.asarray(origin),
                      jnp.asarray(unit), jnp.asarray(max_len))
    got = shadow_kernel(w4, amin, amax, ids, jnp.asarray(origin),
                        jnp.asarray(unit), jnp.asarray(max_len),
                        interpret=True, tri_tile=tri_tile,
                        sort_rays=sort_rays)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pick_tri_tile_small_scene_single_tile():
    """Scenes that fit one 32-row tile take it (chip A/B 2026-08-19:
    theater direct 195->187 ms); 33+ tris keep the legacy >=64 rule so
    the tile count per program stays low."""
    from flexlight_tpu.ops.intersect_kernel import pick_tri_tile

    assert pick_tri_tile(20) == 32     # theater
    assert pick_tri_tile(32) == 32
    assert pick_tri_tile(33) == 64
    assert pick_tri_tile(36) == 64     # cornell / emissive
    assert pick_tri_tile(352) == 256   # obj/monke
    assert pick_tri_tile(5000) == 512


def test_kernel_traversal_tri_tile_32_matches_64():
    """The 32-row tile path (new small-scene default) is equivalent to
    the legacy 64-row tile on a <=32-tri subset of cornell — pure
    tiling, same hits bit-for-bit (both interpret-mode f32)."""
    from flexlight_tpu.ops.intersect_kernel import build_w4, traverse_kernel

    buffers, geometry, _, origin, direction, _ = _setup()
    # restrict to the first 24 drawable triangles -> single 32-row tile
    ids24 = buffers.id_buffer[:24]
    o, d = jnp.asarray(origin), jnp.asarray(direction)
    hits = {}
    for tt in (32, 64):
        w4, amin, amax, ids = build_w4(geometry, ids24, tt)
        hits[tt] = traverse_kernel(w4, amin, amax, ids, o, d,
                                   interpret=True, tri_tile=tt)
    np.testing.assert_array_equal(np.asarray(hits[32].triangle),
                                  np.asarray(hits[64].triangle))
    np.testing.assert_array_equal(np.asarray(hits[32].suv),
                                  np.asarray(hits[64].suv))
    assert int((np.asarray(hits[32].triangle) >= 0).sum()) > 0


@pytest.mark.parametrize("subtile", [
    pytest.param(2, marks=pytest.mark.slow), 4])
def test_kernel_subtile_matches_ungrouped(subtile):
    """Grouping ray tiles per Mosaic program (subtile) is pure perf: the
    grouped grid must return bit-identical hits and shadow bits,
    including when the tile count does not divide the group (padding)."""
    from flexlight_tpu.ops.intersect_kernel import (shadow_kernel_soa,
                                                    traverse_kernel_soa)

    buffers, geometry, (w4, amin, amax, ids, tri_tile), origin, direction, rng = _setup()
    n = origin.shape[0]  # 2048 rays / ray_tile 512 -> 4 tiles; odd with pad
    alive = jnp.asarray(rng.uniform(size=n) < 0.8)
    o3 = tuple(jnp.asarray(origin[:, c]) for c in range(3))
    d3 = tuple(jnp.asarray(direction[:, c]) for c in range(3))

    for rt in (512, 1024):  # 4 tiles (pads at subtile 4 w/ rt=1024? no: 2)
        base = traverse_kernel_soa(w4, amin, amax, ids, o3, d3,
                                   interpret=True, tri_tile=tri_tile,
                                   ray_tile=rt, alive=alive)
        got = traverse_kernel_soa(w4, amin, amax, ids, o3, d3,
                                  interpret=True, tri_tile=tri_tile,
                                  ray_tile=rt, alive=alive, subtile=subtile)
        for b, g in zip(base, got):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(g))

        max_len = jnp.asarray(rng.uniform(0.5, 8.0, n).astype(np.float32))
        s_base = shadow_kernel_soa(w4, amin, amax, ids, o3, d3, max_len,
                                   interpret=True, tri_tile=tri_tile,
                                   ray_tile=rt, alive=alive)
        s_got = shadow_kernel_soa(w4, amin, amax, ids, o3, d3, max_len,
                                  interpret=True, tri_tile=tri_tile,
                                  ray_tile=rt, alive=alive, subtile=subtile)
        np.testing.assert_array_equal(np.asarray(s_base), np.asarray(s_got))

def test_kernel_subtile_vmem_clamp():
    """Over-budget groupings silently clamp to the scoped-VMEM envelope
    (subtile*ray_tile <= 8192; chip OOM ladder 2026-08-20) and still
    return bit-identical results — no (env, size) combination may OOM
    the bench."""
    from flexlight_tpu.ops.intersect_kernel import traverse_kernel_soa

    buffers, geometry, (w4, amin, amax, ids, tri_tile), origin, direction, rng = _setup()
    alive = jnp.asarray(rng.uniform(size=origin.shape[0]) < 0.8)
    o3 = tuple(jnp.asarray(origin[:, c]) for c in range(3))
    d3 = tuple(jnp.asarray(direction[:, c]) for c in range(3))

    base = traverse_kernel_soa(w4, amin, amax, ids, o3, d3, interpret=True,
                               tri_tile=tri_tile, ray_tile=1024, alive=alive)
    # 8 x 1024 = 8192 sits exactly on the cap; 32 x 1024 clamps to 8
    for subtile in (8, 32):
        got = traverse_kernel_soa(w4, amin, amax, ids, o3, d3,
                                  interpret=True, tri_tile=tri_tile,
                                  ray_tile=1024, alive=alive,
                                  subtile=subtile)
        for b, g in zip(base, got):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(g))
