#!/usr/bin/env python
"""Ray-grouping (wavefront sort key) analysis for the sparse traversal.

analyze_tileorder.py showed the per-ray candidate floor at dragon scale
is ~3-6 tiles while the shipped sort key packs 1024-ray tiles with
39-59-tile unions — the matmul waste is ray GROUPING, not tile tightness
(BVH DFS order is already near-optimal; Morton reorder is 7x worse).

This script evaluates candidate-aware sort keys: group rays by the tile
they will hit FIRST (argmin slab-entry distance over candidate tiles),
optionally refined by the 2nd-nearest tile or origin Morton. Such keys
need a per-ray prepass on device (one extra flags-shaped kernel), so the
union win must be large to pay for it.

Caches the captured wavefronts + scene arrays in /tmp so key iteration
doesn't re-render.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
           python scripts/analyze_raygroup.py [scene] [W H] [bounces]
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
TRI_TILE = 128


def capture(scene_name, w, h, bounces):
    cache = f"/tmp/wavecap_{scene_name}_{w}x{h}_{bounces}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        nb = int(z["n_bounces"])
        caps = [(z[f"o{i}"], z[f"d{i}"], z[f"alive{i}"], z[f"prev{i}"])
                for i in range(nb)]
        return caps, z["verts"]

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
    caps = []
    out = {"verts": verts}
    for i, (o3, d3, alive, prev_tri) in enumerate(cap.get("bounces", [])):
        o = np.stack([np.asarray(c).reshape(-1) for c in o3], axis=-1)
        d = np.stack([np.asarray(c).reshape(-1) for c in d3], axis=-1)
        alive = np.asarray(alive).reshape(-1)
        prev = np.asarray(prev_tri).reshape(-1)
        caps.append((o, d, alive, prev))
        out.update({f"o{i}": o, f"d{i}": d, f"alive{i}": alive,
                    f"prev{i}": prev})
    np.savez_compressed(cache, n_bounces=len(caps), **out)
    return caps, verts


def tile_aabbs(verts, tri_tile):
    t = len(verts)
    tp = -(-t // tri_tile) * tri_tile
    vmin = np.full((tp, 3), np.inf, np.float32)
    vmax = np.full((tp, 3), -np.inf, np.float32)
    vmin[:t] = verts.min(axis=1)
    vmax[:t] = verts.max(axis=1)
    wt = tp // tri_tile
    return (vmin.reshape(wt, tri_tile, 3).min(axis=1),
            vmax.reshape(wt, tri_tile, 3).max(axis=1))


def entry_distances(o, d, alive, tlo, thi):
    """[N, WT] f32 slab entry distance (inf = no hit / dead)."""
    finite = np.isfinite(tlo).all(axis=1) & (thi >= tlo).all(axis=1)
    inv = 1.0 / np.where(np.abs(d) > 1e-30, d, 1e-30)
    ent = np.full((len(o), tlo.shape[0]), np.inf, np.float32)
    for s in range(0, len(o), 16384):
        sl = slice(s, s + 16384)
        t_a = (tlo[None] - o[sl, None]) * inv[sl, None]
        t_b = (thi[None] - o[sl, None]) * inv[sl, None]
        tmin = np.minimum(t_a, t_b).max(axis=2)
        tmax = np.maximum(t_a, t_b).min(axis=2)
        e = np.maximum(tmin, 0.0)
        hit = tmax >= e
        ent[sl] = np.where(hit & finite[None, :], e, np.inf)
    ent[~alive] = np.inf
    return ent


def report(name, key, dead, cand):
    key = np.where(dead, np.int64(1) << 62, key)
    order = np.argsort(key, kind="stable")
    tiles = tiles_per_raytile(order, cand)
    print(f"   {name:34s} union mean {tiles.mean():6.1f}  "
          f"p90 {np.percentile(tiles, 90):6.1f}  max {tiles.max()}",
          flush=True)
    return tiles.mean()


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 270
    bounces = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    caps, verts = capture(scene_name, w, h, bounces)
    tlo, thi = tile_aabbs(verts, TRI_TILE)
    lo = verts.reshape(-1, 3).min(axis=0)
    hi = verts.reshape(-1, 3).max(axis=0)
    span = np.maximum(hi - lo, 1e-30)
    t = len(verts)
    wt = tlo.shape[0]
    print(f"{scene_name} {w}x{h}: {t} tris, {wt} tiles", flush=True)

    for bi, (o, d, alive, prev) in enumerate(caps):
        dead = ~alive
        ent = entry_distances(o, d, alive, tlo, thi)
        cand = np.isfinite(ent)
        per_ray = cand.sum(axis=1)[alive]
        # nearest / 2nd-nearest candidate tile per ray (wt = none)
        order2 = np.argsort(ent, axis=1)[:, :2].astype(np.int64)
        has1 = np.take_along_axis(ent, order2[:, :1], 1)[:, 0] < np.inf
        has2 = np.take_along_axis(ent, order2[:, 1:2], 1)[:, 0] < np.inf
        t1 = np.where(has1, order2[:, 0], wt)
        t2 = np.where(has2, order2[:, 1], wt)
        q = np.clip((o - lo) / span * 1023, 0, 1023).astype(np.int64)
        mor = morton(q)
        oct_key = ((d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2
                   + (d[:, 2] > 0)).astype(np.int64)
        ptile = np.clip(prev, 0, t - 1).astype(np.int64) // TRI_TILE

        # cheap no-prepass alternatives: cluster rays by where they're
        # GOING — Morton of a point advanced along the ray (classic
        # two-point ray reordering), direction needs no extra kernel
        diag = float(np.linalg.norm(hi - lo))
        dn = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-30)

        def mkey_at(f, bits=10):
            p = o + f * diag * dn
            qq = np.clip((p - lo) / span * (2 ** bits - 1), 0,
                         2 ** bits - 1).astype(np.int64)
            return morton(qq)

        # coarse nearest-tile: argmin over 4-/16-tile supertiles (prepass
        # cost scales with box count, so coarser = proportionally cheaper)
        def super_ent(g):
            wts = -(-wt // g) * g
            e = np.pad(ent, ((0, 0), (0, wts - wt)),
                       constant_values=np.inf)
            return e.reshape(len(o), wts // g, g).min(axis=2)

        def nearest_super(g):
            es = super_ent(g)
            a = np.argmin(es, axis=1).astype(np.int64)
            return np.where(np.isfinite(es).any(axis=1), a, es.shape[1])

        def nearest2_super(g):
            """(t1, t2) at supertile granularity g."""
            es = super_ent(g)
            o2 = np.argsort(es, axis=1)[:, :2].astype(np.int64)
            nb = es.shape[1]
            s1 = np.where(np.isfinite(np.take_along_axis(
                es, o2[:, :1], 1)[:, 0]), o2[:, 0], nb)
            s2 = np.where(np.isfinite(np.take_along_axis(
                es, o2[:, 1:2], 1)[:, 0]), o2[:, 1], nb)
            return s1, s2

        print(f"-- bounce {bi + 1}: {int(alive.sum())}/{len(o)} alive, "
              f"per-ray mean {per_ray.mean():.1f} "
              f"p90 {np.percentile(per_ray, 90):.0f}", flush=True)
        report("prevtile<<33|morton10 (shipped)", (ptile << 33) | mor,
               dead, cand)
        report("nearest", t1 << 40, dead, cand)
        report("nearest<<mor10", (t1 << 40) | (mor >> 20), dead, cand)
        report("nearest<<oct", (t1 << 3) | oct_key, dead, cand)
        report("nearest,2nd", (t1 << 40) | (t2 << 30), dead, cand)
        report("nearest,2nd,oct", (t1 << 43) | (t2 << 33) | (oct_key << 30),
               dead, cand)
        report("nearest,prevtile", (t1 << 40) | (ptile << 30), dead, cand)
        report("super4,2nd", (nearest_super(4) << 40) | (t2 << 30),
               dead, cand)
        s41, s42 = nearest2_super(4)
        report("super4 t1,t2,oct", (s41 << 43) | (s42 << 33) | (oct_key << 30),
               dead, cand)
        s81, s82 = nearest2_super(8)
        report("super8 t1,t2,oct", (s81 << 43) | (s82 << 33) | (oct_key << 30),
               dead, cand)
        s31, s32 = nearest2_super(2)
        report("super2 t1,t2,oct", (s31 << 43) | (s32 << 33) | (oct_key << 30),
               dead, cand)
        o3rd = np.argsort(ent, axis=1)[:, :3].astype(np.int64)
        t3 = np.where(np.take_along_axis(ent, o3rd[:, 2:3], 1)[:, 0] < np.inf,
                      o3rd[:, 2], wt)
        report("nearest,2nd,3rd", (t1 << 40) | (t2 << 30) | (t3 << 20),
               dead, cand)
        report("super4,mor10", (nearest_super(4) << 40) | mor, dead, cand)
        report("super16,mor10", (nearest_super(16) << 40) | mor, dead, cand)
        report("endpoint mor10 f=.25", mkey_at(0.25), dead, cand)
        report("endpoint mor10 f=.5", mkey_at(0.5), dead, cand)
        report("oPt5,endPt5 lex", (mor >> 15 << 15) | (mkey_at(0.5, 5)),
               dead, cand)
        report("prevtile,endpoint10", (ptile << 33) | mkey_at(0.5),
               dead, cand)
        # nearest2 at smaller ray tiles (BOUNCE_RT knob). Total matmul
        # work per traversal = sum over tiles of union*rt*tri_tile =
        # mean_live_union * n_live_rays * tri_tile — the live-tile union
        # mean IS the work measure, independent of rt. Smaller rt pays
        # ~4x grid steps + repeated candidate DMAs instead.
        import analyze_wavefront as aw
        n2key = np.where(dead, np.int64(1) << 62,
                         (t1 << 43) | (t2 << 33) | (oct_key << 30))
        n2order = np.argsort(n2key, kind="stable")
        for rt in (1024, 512, 256):
            saved, aw.RAY_TILE = aw.RAY_TILE, rt
            tiles = tiles_per_raytile(n2order, cand)
            aw.RAY_TILE = saved
            live = tiles[tiles > 0]
            print(f"   nearest2 @ ray_tile={rt:4d}: matmul-work measure "
                  f"(live-tile union mean) {live.mean():6.1f}  "
                  f"dma-proxy (union*ntiles) {live.sum():8.0f}",
                  flush=True)

        # upper bound for any per-ray key: greedy exact-set grouping
        # (sort by the full candidate-set hash)
        h64 = np.zeros(len(o), np.int64)
        for c in range(0, wt, 63):
            chunkbits = cand[:, c:c + 63]
            val = (chunkbits * (1 << np.arange(chunkbits.shape[1],
                                               dtype=np.int64))).sum(axis=1)
            h64 = h64 * np.int64(1000003) + val
        report("candidate-set hash (bound-ish)", (t1 << 40) ^ (h64 >> 24),
               dead, cand)




def exclusion_bound_cost(order, ent, cand, chunk=4):
    """Simulated sparse-kernel chunks per ray tile when rays with no
    remaining candidates stop blocking the early exit (hit-based exits
    ignored -> a conservative upper bound on the new cost), vs the full
    worklist length (today's cost when any ray in the tile never hits).

    Per ray tile: worklist bounds b = sorted over candidate tiles of
    (min over rays of entry); ray r is done once the next bound exceeds
    e_last_r = max over r's candidate tiles of r's own entry."""
    eo = ent[order]
    n = eo.shape[0] // RAY_TILE * RAY_TILE
    eo = eo[:n].reshape(-1, RAY_TILE, eo.shape[1])
    full = []
    excl = []
    for tile in eo:
        bounds = tile.min(axis=0)                    # [WT] min over rays
        hitmask = np.isfinite(bounds)
        u = int(hitmask.sum())
        if u == 0:
            continue
        b_sorted = np.sort(bounds[hitmask])
        e_last = np.where(np.isfinite(tile), tile, -np.inf).max(axis=1)
        # tiles processed for ray r: count of bounds <= e_last_r
        k = np.searchsorted(b_sorted, e_last[np.isfinite(e_last)],
                            side="right")
        cost = int(k.max()) if len(k) else 0
        full.append(-(-u // chunk))
        excl.append(-(-max(cost, 1) // chunk))
    return np.array(full), np.array(excl)


def main_exclusion():
    scene_name = sys.argv[2] if len(sys.argv) > 2 else "dragon"
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 480
    h = int(sys.argv[4]) if len(sys.argv) > 4 else 270
    bounces = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    caps, verts = capture(scene_name, w, h, bounces)
    tlo, thi = tile_aabbs(verts, TRI_TILE)
    lo = verts.reshape(-1, 3).min(axis=0)
    hi = verts.reshape(-1, 3).max(axis=0)
    span = np.maximum(hi - lo, 1e-30)
    t = len(verts)
    wt = tlo.shape[0]
    print(f"{scene_name} {w}x{h}: exclusion-bound chunk simulation "
          f"(chunks of 4 tiles per kernel loop step)", flush=True)
    for bi, (o, d, alive, prev) in enumerate(caps):
        dead = ~alive
        ent = entry_distances(o, d, alive, tlo, thi)
        cand = np.isfinite(ent)
        q = np.clip((o - lo) / span * 1023, 0, 1023).astype(np.int64)
        mor = morton(q)
        ptile = np.clip(prev, 0, t - 1).astype(np.int64) // TRI_TILE
        oct_key = ((d[:, 0] >= 0) * 4 + (d[:, 1] >= 0) * 2
                   + (d[:, 2] >= 0)).astype(np.int64)
        o2 = np.argsort(ent, axis=1)[:, :2].astype(np.int64)
        e1f = np.isfinite(np.take_along_axis(ent, o2[:, :1], 1)[:, 0])
        e2f = np.isfinite(np.take_along_axis(ent, o2[:, 1:2], 1)[:, 0])
        t1 = np.where(e1f, o2[:, 0], wt)
        t2 = np.where(e2f, o2[:, 1], wt)
        keys = {
            "prevtile<<33|morton10 (shipped)": (ptile << 33) | mor,
            "nearest2 (t1,t2,oct)": (t1 << 43) | (t2 << 33) | (oct_key << 30),
        }
        print(f"-- bounce {bi + 1}: {int(alive.sum())}/{len(o)} alive",
              flush=True)
        for name, key in keys.items():
            key = np.where(dead, np.int64(1) << 62, key)
            order = np.argsort(key, kind="stable")
            full, excl = exclusion_bound_cost(order, ent, cand)
            print(f"   {name:32s} chunks/tile full {full.mean():6.1f}  "
                  f"with-exclusion <= {excl.mean():6.1f}  "
                  f"(p90 {np.percentile(excl, 90):5.1f})", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "excl":
        main_exclusion()
    else:
        main()
