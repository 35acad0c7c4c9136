#!/usr/bin/env python
"""Drawable-order analysis for the sparse traversal (CPU, eager).

The sparse kernel's matmul work is proportional to the per-ray-tile
worklist UNION: every ray in a 1024-ray tile evaluates every candidate
128-triangle tile any of them hits. Tiles are consecutive 128-drawable
chunks of id_buffer order (= BVH DFS order), so their AABBs — and hence
per-ray candidate counts — depend on how spatially tight that order is.

This script captures real bounce wavefronts (like analyze_wavefront) and
re-evaluates candidate masks under alternative DRAWABLE orders:

  dfs (current)   id_buffer order as flattened from the BVH
  morton10        triangle-centroid Morton order
  kdsplit         recursive largest-axis median split (leaf <= tri_tile)

reporting, per order: per-ray mean candidates (the packing-independent
floor) and the per-ray-tile union mean/p90 under the shipped wavefront
sort key (prev-hit tile major, morton10 minor) — the quantity the kernel
runtime tracks. Also sweeps tri_tile in {64, 128, 256} for the winning
order to expose the tile-granularity tradeoff.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
           python scripts/analyze_tileorder.py [scene] [W H] [bounces]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import importlib

import numpy as np

from analyze_wavefront import morton, tiles_per_raytile

RAY_TILE = 1024


def centroids(geom_tris):
    """[T, 9] vertex rows -> [T, 3] centroids."""
    return geom_tris.reshape(-1, 3, 3).mean(axis=1)


def order_morton(cent, lo, hi):
    span = np.maximum(hi - lo, 1e-30)
    q = np.clip((cent - lo) / span * 1023, 0, 1023).astype(np.int64)
    return np.argsort(morton(q), kind="stable")


def order_kdsplit(cent, leaf: int):
    """Recursive largest-extent-axis median split; emits leaves in order."""
    out = []

    def rec(idx):
        if len(idx) <= leaf:
            out.append(idx)
            return
        c = cent[idx]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        half = len(idx) // 2
        part = np.argpartition(c[:, ax], half)
        rec(idx[part[:half]])
        rec(idx[part[half:]])

    rec(np.arange(len(cent)))
    return np.concatenate(out)


def tile_aabbs(verts, order, tri_tile: int):
    """verts [T, 3, 3]; -> per-tile AABBs [WT, 3] x2 under `order`."""
    v = verts[order]
    t = len(v)
    tp = -(-t // tri_tile) * tri_tile
    vmin = np.full((tp, 3), np.inf, np.float32)
    vmax = np.full((tp, 3), -np.inf, np.float32)
    vmin[:t] = v.min(axis=1)
    vmax[:t] = v.max(axis=1)
    wt = tp // tri_tile
    return (vmin.reshape(wt, tri_tile, 3).min(axis=1),
            vmax.reshape(wt, tri_tile, 3).max(axis=1))


def candidate_mask(o, d, alive, tlo, thi):
    finite = np.isfinite(tlo).all(axis=1) & (thi >= tlo).all(axis=1)
    inv = 1.0 / np.where(np.abs(d) > 1e-30, d, 1e-30)
    cand = np.zeros((len(o), tlo.shape[0]), dtype=bool)
    for s in range(0, len(o), 16384):
        sl = slice(s, s + 16384)
        t_a = (tlo[None] - o[sl, None]) * inv[sl, None]
        t_b = (thi[None] - o[sl, None]) * inv[sl, None]
        tmin = np.minimum(t_a, t_b).max(axis=2)
        tmax = np.maximum(t_a, t_b).min(axis=2)
        cand[sl] = tmax >= np.maximum(tmin, 0.0)
    return cand & alive[:, None] & finite[None, :]


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

    geom = np.asarray(world_geometry(buffers))
    idb = np.asarray(buffers.id_buffer)
    verts = geom[idb][:, 0:9].reshape(-1, 3, 3).astype(np.float32)
    cent = verts.mean(axis=1)
    lo = verts.reshape(-1, 3).min(axis=0)
    hi = verts.reshape(-1, 3).max(axis=0)
    t = len(verts)

    orders = {
        "dfs (current)": np.arange(t),
        "morton10": order_morton(cent, lo, hi),
        "kdsplit128": order_kdsplit(cent, 128),
    }
    print(f"{scene_name} {w}x{h}: {t} tris", flush=True)

    span = np.maximum(hi - lo, 1e-30)

    for bi, (o3, d3, alive, prev_tri) in enumerate(cap.get("bounces", [])):
        o = np.stack([np.asarray(c).reshape(-1) for c in o3], axis=-1)
        d = np.stack([np.asarray(c).reshape(-1) for c in d3], axis=-1)
        alive = np.asarray(alive).reshape(-1)
        prev_tri = np.asarray(prev_tri).reshape(-1)
        dead = ~alive
        q = np.clip((o - lo) / span * 1023, 0, 1023).astype(np.int64)
        mor = morton(q)
        print(f"-- bounce {bi + 1}: {int(alive.sum())}/{len(o)} alive",
              flush=True)

        for name, order in orders.items():
            inv_order = np.argsort(order)         # old drawable -> new pos
            tlo, thi = tile_aabbs(verts, order, 128)
            cand = candidate_mask(o, d, alive, tlo, thi)
            per_ray = cand.sum(axis=1)[alive]
            # shipped sort key under this order: prev-hit tile (in the NEW
            # order) major, morton10 of origin minor
            ptile = inv_order[np.clip(prev_tri, 0, t - 1)] // 128
            key = (ptile.astype(np.int64) << 33) | mor
            key = np.where(dead, np.int64(1) << 62, key)
            rorder = np.argsort(key, kind="stable")
            tiles = tiles_per_raytile(rorder, cand)
            print(f"   {name:16s} per-ray mean {per_ray.mean():6.1f}  "
                  f"union/raytile mean {tiles.mean():6.1f}  "
                  f"p90 {np.percentile(tiles, 90):6.1f}  "
                  f"(x{t // 128 + 1} tiles)", flush=True)

        # tri_tile sweep under the best spatial order (matmul work per
        # ray tile ~ union * tri_tile — smaller tiles do less wasted work
        # per candidate but halve MXU M-occupancy below 128)
        best = orders["kdsplit128"]
        inv_best = np.argsort(best)
        for tt in (64, 128, 256):
            tlo, thi = tile_aabbs(verts, best, tt)
            cand = candidate_mask(o, d, alive, tlo, thi)
            ptile = inv_best[np.clip(prev_tri, 0, t - 1)] // tt
            key = (ptile.astype(np.int64) << 33) | mor
            key = np.where(dead, np.int64(1) << 62, key)
            rorder = np.argsort(key, kind="stable")
            tiles = tiles_per_raytile(rorder, cand)
            print(f"   kdsplit tri_tile={tt:3d}: union mean {tiles.mean():6.1f} "
                  f" work-proxy (union*tt) {tiles.mean() * tt:8.0f}",
                  flush=True)


if __name__ == "__main__":
    main()
