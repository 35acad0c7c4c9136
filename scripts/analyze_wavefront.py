#!/usr/bin/env python
"""Wavefront sort-key analysis for the sparse traversal (CPU, eager).

Captures real bounce wavefronts from a scene (ops.pathtrace.DEBUG_CAPTURE)
and reports, per candidate sort key, the mean/max candidate-tile count per
1024-ray tile — the quantity the sparse kernel's runtime tracks. Run on
CPU; no device needed.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
           python scripts/analyze_wavefront.py [scene] [W H] [bounces]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib

import numpy as np

RAY_TILE = 1024
TRI_TILE = 128


def spread(x):
    x = x.astype(np.int64)
    x = (x | (x << 16)) & 0x030000FF00FF00FF
    x = (x | (x << 8)) & 0x0300F00F00F00F0F
    x = (x | (x << 4)) & 0x030C30C30C30C30C
    x = (x | (x << 2)) & 0x0924924924924924
    return x


def morton(q):
    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def tiles_per_raytile(order, tmins_finite):
    """order: ray permutation; tmins_finite: [N, WT] bool candidate mask.
    Returns per-1024-ray-tile candidate-tile union counts."""
    m = tmins_finite[order]
    n = m.shape[0] // RAY_TILE * RAY_TILE
    m = m[:n].reshape(-1, RAY_TILE, m.shape[1])
    return m.any(axis=1).sum(axis=1)


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 270
    bounces = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    import jax.numpy as jnp

    from flexlight_tpu import Config
    import flexlight_tpu.ops.pathtrace as pt
    from flexlight_tpu.ops.geometry import world_geometry

    mod = importlib.import_module(scene_name)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    config = Config(samples_per_ray=1, max_reflections=bounces,
                    temporal=False, filter=False, antialiasing=None)
    engine.canvas = (w, h)
    engine.config = config
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    buffers = renderer._buffers
    view = jnp.asarray(engine.camera.view_matrix(w, h))
    pos = jnp.asarray(engine.camera.position)

    pt.DEBUG_CAPTURE = {}
    try:
        pt.render_mrt(buffers, w, h, pos, view, config, jnp.float32(0.0),
                      scheme="clustered")
    finally:
        cap = pt.DEBUG_CAPTURE
        pt.DEBUG_CAPTURE = None

    from flexlight_tpu.ops.intersect_sparse import build_w4_tiled

    geom = world_geometry(buffers)
    _, amin, amax, _ = build_w4_tiled(geom, buffers.id_buffer)
    tile_lo = np.asarray(amin)                              # [WT, 3]
    tile_hi = np.asarray(amax)
    wt = tile_lo.shape[0]
    finite = np.isfinite(tile_lo).all(axis=1) & (tile_hi >= tile_lo).all(axis=1)
    lo = tile_lo[finite].min(axis=0)
    hi = tile_hi[finite].max(axis=0)
    print(f"{scene_name} {w}x{h}: {buffers.id_buffer.shape[0]} tris, "
          f"{wt} tiles, scene bounds {np.round(lo, 1)}..{np.round(hi, 1)}",
          flush=True)

    for bi, (o3, d3, alive, prev_tri) in enumerate(cap.get("bounces", [])):
        o = np.stack([np.asarray(c).reshape(-1) for c in o3], axis=-1)
        d = np.stack([np.asarray(c).reshape(-1) for c in d3], axis=-1)
        alive = np.asarray(alive).reshape(-1)
        prev_tri = np.asarray(prev_tri).reshape(-1)

        # candidate mask: slab test of each ray against each tile AABB
        # (chunked — the full [N, WT, 3] temporaries are GBs)
        inv = 1.0 / np.where(np.abs(d) > 1e-30, d, 1e-30)
        cand = np.zeros((len(o), wt), dtype=bool)
        for s in range(0, len(o), 16384):
            sl = slice(s, s + 16384)
            t_a = (tile_lo[None] - o[sl, None]) * inv[sl, None]
            t_b = (tile_hi[None] - o[sl, None]) * inv[sl, None]
            tmin = np.minimum(t_a, t_b).max(axis=2)
            tmax = np.maximum(t_a, t_b).min(axis=2)
            cand[sl] = tmax >= np.maximum(tmin, 0.0)
        cand &= alive[:, None]
        cand &= finite[None, :]

        oct_key = ((d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2 + (d[:, 2] > 0))
        span = np.maximum(hi - lo, 1e-30)

        def mkey(bits):
            q = np.clip((o - lo) / span * (2 ** bits - 1), 0,
                        2 ** bits - 1).astype(np.int64)
            return morton(q)

        dead = ~alive
        keys = {
            "unsorted": np.zeros(len(o), np.int64),
            "octant only": oct_key.astype(np.int64),
            "oct<<15|morton5 (current)": (oct_key.astype(np.int64) << 15)
                                         | mkey(5),
            "oct<<30|morton10": (oct_key.astype(np.int64) << 30) | mkey(10),
            "morton10<<3|oct": (mkey(10) << 3) | oct_key,
            "prevtile<<3|oct": ((prev_tri.astype(np.int64) // TRI_TILE) << 3)
                               | oct_key,
            "oct<<12|prevtile": (oct_key.astype(np.int64) << 12)
                                | (prev_tri.astype(np.int64) // TRI_TILE),
            "prevtile<<33|morton10": ((prev_tri.astype(np.int64) // TRI_TILE)
                                      << 33) | mkey(10),
            "prevtile<<18|morton6 (i32)": ((prev_tri.astype(np.int64)
                                            // TRI_TILE) << 18) | mkey(6),
            "prevtile<<21|morton7 (u32)": (((prev_tri.astype(np.int64)
                                             // TRI_TILE) % 1024) << 21)
                                          | mkey(7),
            "prevtile<<24|morton8": (((prev_tri.astype(np.int64)
                                       // TRI_TILE)) << 24) | mkey(8),
            "prevtri<<3|oct": (prev_tri.astype(np.int64) << 3) | oct_key,
            "morton5(hitpos)<<3|oct": (mkey(5) << 3) | oct_key,
        }
        print(f"-- bounce {bi + 1}: {int(alive.sum())}/{len(o)} alive, "
              f"per-ray candidates mean "
              f"{cand.sum(axis=1)[alive].mean() if alive.any() else 0:.1f}",
              flush=True)
        for name, key in keys.items():
            key = np.where(dead, np.int64(1) << 62, key)
            order = np.argsort(key, kind="stable")
            tiles = tiles_per_raytile(order, cand)
            print(f"   {name:28s} tiles/raytile mean {tiles.mean():6.1f}  "
                  f"p90 {np.percentile(tiles, 90):6.1f}  max {tiles.max()}",
                  flush=True)

        best = np.where(dead, np.int64(1) << 62,
                        keys["prevtile<<33|morton10"])
        order = np.argsort(best, kind="stable")
        for rt in (512, 256):
            global RAY_TILE
            saved, RAY_TILE = RAY_TILE, rt
            tiles = tiles_per_raytile(order, cand)
            RAY_TILE = saved
            print(f"   best key @ ray_tile={rt:4d}     tiles/raytile mean "
                  f"{tiles.mean():6.1f}  p90 {np.percentile(tiles, 90):6.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
