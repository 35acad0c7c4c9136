"""Pallas fused MXU intersection kernel.

The endgame of the MT-as-matmul formulation (ops.traverse_mxu): in XLA the
[N, 4T] product matrix must round-trip HBM before its accept/argmin
epilogue (tens of GB per traversal at dragon scale). This kernel fuses the
contraction and the reduction: each grid step multiplies a 1024-ray
feature tile against a 512-triangle constant tile on the MXU, runs the
accept window + running-min epilogue in VMEM registers, and only the
per-ray best (s, u, v, column) ever leaves the chip.

Sparsity: an XLA prepass slab-tests cluster AABBs and ORs them into a
[ray_tiles, tri_tiles] flag matrix; flagged-off grid steps skip all
compute (@pl.when), so cost tracks the candidate density the cluster
culling exposes (tri tiles are 512 consecutive triangles in BVH DFS
order = 8 clusters of 64).

Grid: (ray_tiles, tri_tiles), tri dim innermost so the per-ray best
accumulators stay resident in VMEM across the whole triangle sweep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import BIAS, POW32
from .traverse import Hit
from .traverse_mxu import _ray_features, tri_rows

RAY_TILE = 1024          # 8 x 128 lanes
TRI_TILE = 512           # columns per W tile (per MT output)
CLUSTER = 64             # cluster size for the flag prepass


def _kernel(flag_ref, edge_ref, f_ref, w_ref, ml_ref, idsf_ref, s_ref, u_ref,
            v_ref, tri_ref, *, cull: bool, precision, tri_tile: int,
            ray_tile: int, subtile: int = 1, any_hit: bool = False):
    i = pl.program_id(0)
    j = pl.program_id(1)

    # Transposed layout: products are [TRI_TILE, RAY_TILE] so the per-ray
    # reductions run along sublanes and land in native (1, RAY_TILE) rows
    # (no lane-crossing reshapes, full lane utilization).
    shp = (subtile, 1, ray_tile)

    @pl.when(j == 0)
    def _():
        s_ref[:] = jnp.full(shp, POW32, dtype=jnp.float32)
        u_ref[:] = jnp.zeros(shp, dtype=jnp.float32)
        v_ref[:] = jnp.zeros(shp, dtype=jnp.float32)
        tri_ref[:] = jnp.full(shp, -1, dtype=jnp.int32)

    # `subtile` ray tiles share one Mosaic program (static unroll; each
    # slice's temps die before the next, so VMEM stays at the single-tile
    # level) — the per-program fixed cost (~23 us) divides by the group,
    # the dominant cost for small-scene casts (theater: wt == 1).
    for k in range(subtile):
        @pl.when(flag_ref[i * subtile + k, j] != 0)
        def _(k=k):
            ft = f_ref[:, k * ray_tile:(k + 1) * ray_tile]  # [16, 1024]
            dot = lambda wk: jnp.dot(wk, ft, preferred_element_type=jnp.float32,
                                     precision=precision)
            det = dot(w_ref[0])                   # [tri_tile, 1024]
            udet = dot(w_ref[1])
            vdet = dot(w_ref[2])
            sdet = dot(w_ref[3])
            inv = 1.0 / det
            u = udet * inv
            v = vdet * inv
            s = sdet * inv
            ml = ml_ref[k]                        # [1, 1024]
            # edge=-BIAS on primary casts closes the shared-edge rejection
            # band (see ops.traverse._mt_chunk). It rides in as a runtime SMEM
            # scalar so primary and bounce traversals share ONE Mosaic program
            # (a per-edge compile-time constant doubles kernel variants and
            # proved to destabilize the surrounding XLA schedule).
            edge = edge_ref[0]
            valid = (det >= BIAS) if cull else (jnp.abs(det) >= BIAS)
            valid &= (u >= edge) & (u <= 1.0)
            valid &= (v >= edge) & (u + v <= 1.0)
            valid &= (s > BIAS) & (s <= ml)

            if any_hit:
                # Shadow casts only consume `tri >= 0` (any valid hit
                # within max_len), so the argmin/one-hot/take machinery —
                # over half the [tri_tile, ray_tile] epilogue ops — is
                # dead weight. Any-valid == closest-exists, bit-exactly.
                hit_col = jnp.max(jnp.where(valid, 1.0, 0.0),
                                  axis=0, keepdims=True)      # [1, 1024]
                tri_ref[k] = jnp.where(hit_col > 0.0, 0, tri_ref[k])
                return

            s_masked = jnp.where(valid, s, POW32)

            tile_best_s = jnp.min(s_masked, axis=0, keepdims=True)  # [1, 1024]
            rows = jax.lax.broadcasted_iota(jnp.int32, (tri_tile, ray_tile), 0)
            is_best = s_masked <= tile_best_s
            # lowest row among ties (the argmin)
            best_row = jnp.min(jnp.where(is_best, rows, tri_tile), axis=0, keepdims=True)
            onehot = (rows == best_row) & valid
            take = lambda x: jnp.sum(jnp.where(onehot, x, 0.0), axis=0, keepdims=True)
            tile_u = take(u)
            tile_v = take(v)
            # resolve the drawable-triangle id in-register: an XLA-side
            # ids[col] s32 gather runs on the scalar core (~0.5 ms per call)
            ids_bc = jnp.broadcast_to(idsf_ref[:], (tri_tile, ray_tile))
            tile_tri = take(ids_bc)

            prev_s = s_ref[k]                     # [1, 1024]
            better = tile_best_s < prev_s
            s_ref[k] = jnp.where(better, tile_best_s, prev_s)
            u_ref[k] = jnp.where(better, tile_u, u_ref[k])
            v_ref[k] = jnp.where(better, tile_v, v_ref[k])
            tri_ref[k] = jnp.where(better & (tile_best_s < POW32),
                                   tile_tri, tri_ref[k].astype(jnp.float32)
                                   ).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cull", "interpret", "precision", "tri_tile",
                                   "ray_tile", "subtile", "any_hit"))
def _intersect(w4, flags, f, max_len, idsf, cull: bool, interpret: bool = False,
               precision=jax.lax.Precision.HIGHEST, tri_tile: int = TRI_TILE,
               ray_tile: int = RAY_TILE, edge=BIAS, subtile: int = 1,
               any_hit: bool = False):
    """w4 [4, Tp, 16], flags [RT, WT] int32, f [Rp, 16], max_len [Rp],
    idsf [Tp, 1] f32 (drawable-triangle ids; exact in f32).

    Under `any_hit=True` only sign(tri) is meaningful in the result
    (tri >= 0 occluded, -1 clear): s/u/v stay frozen at their init
    sentinels (POW32/0/0) and tri is a 0/-1 flag, not a drawable id."""
    if w4.dtype == jnp.bfloat16:
        from .intersect_sparse import pack_rhs_x6

        ft = pack_rhs_x6(f.T)
    else:
        ft = f.T
    return _intersect_ft(w4, flags, ft, max_len, idsf, cull=cull,
                         interpret=interpret, precision=precision,
                         tri_tile=tri_tile, ray_tile=ray_tile, edge=edge,
                         subtile=subtile, any_hit=any_hit)


@partial(jax.jit, static_argnames=("cull", "interpret", "precision", "tri_tile",
                                   "ray_tile", "subtile", "any_hit"))
def _intersect_ft(w4, flags, ft, max_len, idsf, cull: bool,
                  interpret: bool = False,
                  precision=jax.lax.Precision.HIGHEST, tri_tile: int = TRI_TILE,
                  ray_tile: int = RAY_TILE, edge=BIAS, subtile: int = 1,
                  any_hit: bool = False):
    """_intersect taking features already transposed [K, Rp] (and x6-
    packed when w4 is bf16) — the SoA entry points build that layout
    directly without a lane-padded [Rp, 16] intermediate.

    `subtile`: ray tiles per Mosaic program (grouped grid; pure perf —
    results identical). Padded tiles flag off and stay at the init
    sentinel (tri -1).

    Under `any_hit=True` only sign(tri) is meaningful (s/u/v undefined —
    see _intersect)."""
    rp = ft.shape[1]
    tp = w4.shape[1]
    kdim = w4.shape[2]
    if w4.dtype == jnp.bfloat16:
        precision = jax.lax.Precision.DEFAULT  # single bf16 K=96 pass
    # Scoped-VMEM guard (chip OOM ladder 2026-08-20): the double-buffered
    # [K, subtile*ray_tile] feature block costs K*itemsize*2 per grouped
    # ray (384 B at K=96 bf16) on top of a ~14.6 MB floor at
    # ray_tile=8192 — subtile 2 at 8192 already blows the 16 MB scoped
    # limit (17.85 M measured), and emissive's tri_tile=64 at subtile 4
    # hit 22.2 M. Epilogue temps scale with ray_tile alone, so capping
    # grouped rays per program at one known-good 8192-ray tile keeps
    # every (subtile, ray_tile) combination strictly inside the measured
    # envelope: subtile*ray_tile <= 8192.
    subtile = max(1, min(subtile, 8192 // ray_tile))
    rt, wt = rp // ray_tile, tp // tri_tile
    if rt % subtile:
        pad_t = (-rt) % subtile
        ft = jnp.pad(ft, ((0, 0), (0, pad_t * ray_tile)))
        max_len = jnp.pad(max_len, (0, pad_t * ray_tile))
        flags = jnp.pad(flags, ((0, pad_t), (0, 0)))
        rt += pad_t
    grid = (rt // subtile, wt)
    out_shape = [
        jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.float32),
        jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.float32),
        jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.float32),
        jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.int32),
    ]
    out_spec = pl.BlockSpec((subtile, 1, ray_tile), lambda i, j, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    # flags + the accept-window edge ride in as scalar-prefetch arrays
    # (SMEM), flags indexed by program id
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            # features transposed: [K, Rp], tile [K, subtile*RAY_TILE]
            pl.BlockSpec((kdim, subtile * ray_tile), lambda i, j, *_: (0, i),
                         memory_space=pltpu.VMEM),
            # W planes transposed: [4, Tp, K], tile [4, tri_tile, K]
            pl.BlockSpec((4, tri_tile, kdim), lambda i, j, *_: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((subtile, 1, ray_tile), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tri_tile, 1), lambda i, j, *_: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
    )
    edge_arr = jnp.asarray(edge, jnp.float32).reshape(1)
    s, u, v, tri = pl.pallas_call(
        partial(_kernel, cull=cull, precision=precision, tri_tile=tri_tile,
                ray_tile=ray_tile, subtile=subtile, any_hit=any_hit),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(flags, edge_arr, ft, w4, max_len.reshape(rt, 1, ray_tile), idsf)
    return tuple(x.reshape(-1)[:rp] for x in (s, u, v, tri))


def pick_tri_tile(num_tris: int) -> int:
    """Smallest tile that avoids padding/epilogue waste on small scenes
    while keeping per-step work meaty on large ones (the VPU epilogue
    cost per grid step is proportional to tri_tile).

    Scenes that fit ONE 32-row tile take it: chip A/B 2026-08-19
    (theater 1080p direct, two independent pairs) 195.1/196.4 ms at
    tri_tile 64 -> 187.2/189.3 at 32 with ray_tile held at 8192 — the
    [tri_tile, ray_tile] epilogue halves. 16 gives it back (194.3 ms,
    MXU/sublane underutilization), and multi-tile 32 (wt=2) doubles the
    per-program fixed cost, so 33+ tris keep the legacy rule."""
    for cand in (32,):
        if num_tris <= cand:
            return cand
    for cand in (64, 128, 256):
        if num_tris <= cand * 2:
            return cand
    return TRI_TILE


def build_w4(world_geometry, id_buffer, tri_tile: int = TRI_TILE,
             x6: bool = True):
    """W as [4, Tp, 16] (det/udet/vdet/sdet split into separate planes),
    padded to a tri_tile multiple; plus per-cluster AABBs for the flag
    prepass and the padded id map."""
    t = id_buffer.shape[0]
    tp = -(-t // tri_tile) * tri_tile
    rows = tri_rows(world_geometry, id_buffer)             # 4 x [T, 16]
    w4 = jnp.stack([jnp.pad(r, ((0, tp - t), (0, 0))) for r in rows])  # [4, Tp, 16]
    if x6:
        from .intersect_sparse import pack_lhs_x6

        w4 = pack_lhs_x6(w4, axis=-1)                      # [4, Tp, 96] bf16

    tris = world_geometry[id_buffer]
    verts = tris[:, 0:9].reshape(t, 3, 3)
    vmin = jnp.pad(verts.min(axis=1), ((0, tp - t), (0, 0)), constant_values=jnp.inf)
    vmax = jnp.pad(verts.max(axis=1), ((0, tp - t), (0, 0)), constant_values=-jnp.inf)
    cluster = min(CLUSTER, tri_tile)
    k = tp // cluster
    aabb_min = vmin.reshape(k, cluster, 3).min(axis=1)
    aabb_max = vmax.reshape(k, cluster, 3).max(axis=1)
    ids = jnp.pad(id_buffer, (0, tp - t), constant_values=-1)
    return w4, aabb_min, aabb_max, ids


FLAG_CHUNK = 8  # ray tiles slab-tested per lax.map step


def _flags(aabb_min, aabb_max, origin, direction, max_len, rt, wt,
           ray_tile: int = RAY_TILE):
    """[RT, WT] int32: ray tile i may hit triangle tile j.

    Computed in chunks of ray tiles under lax.map: the unchunked form
    materializes [Rp, K, 3] slab temps — 16+ GB at 1080p x dragon scale
    (measured RESOURCE_EXHAUSTED); per-chunk the working set stays tens
    of MB while the reduction result is only [RT, K]."""
    k = aabb_min.shape[0]
    clusters_per_tile = k // wt

    def chunk_flags(args):
        o, d, ml = args                       # [C*RAY_TILE, 3] x2, [C*RAY_TILE]
        inv_d = 1.0 / d
        t0 = (aabb_min[None] - o[:, None]) * inv_d[:, None]
        t1 = (aabb_max[None] - o[:, None]) * inv_d[:, None]
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (tmax >= jnp.maximum(tmin, BIAS)) & (tmin < ml[:, None])
        return hit.reshape(-1, ray_tile, k).any(axis=1)     # [C, K]

    if rt <= FLAG_CHUNK:
        per_tile = chunk_flags((origin, direction, max_len))
    else:
        pad_t = (-rt) % FLAG_CHUNK
        pad_n = pad_t * ray_tile
        # padded rays: unit +z dir, ml=0 -> no hits contributed
        o = jnp.pad(origin, ((0, pad_n), (0, 0)))
        d = jnp.pad(direction, ((0, pad_n), (0, 0)),
                    constant_values=1.0)
        ml = jnp.pad(max_len, (0, pad_n))
        n_chunks = (rt + pad_t) // FLAG_CHUNK
        per_tile = jax.lax.map(
            chunk_flags,
            (o.reshape(n_chunks, FLAG_CHUNK * ray_tile, 3),
             d.reshape(n_chunks, FLAG_CHUNK * ray_tile, 3),
             ml.reshape(n_chunks, FLAG_CHUNK * ray_tile)),
        ).reshape(-1, k)[:rt]                                # [RT, K]
    return per_tile.reshape(rt, wt, clusters_per_tile).any(axis=-1).astype(jnp.int32)


def sort_by_octant(direction):
    """Stable sort permutation by direction octant: groups like directions
    while preserving (already spatially coherent) pixel order within each
    octant — incoherent bounce wavefronts then produce much sparser
    [ray_tile, tri_tile] flag matrices. Returns (perm, inv_perm)."""
    key = ((direction[:, 0] > 0) * 4 + (direction[:, 1] > 0) * 2
           + (direction[:, 2] > 0)).astype(jnp.int32)
    perm = jnp.argsort(key, stable=True)
    return perm, jnp.argsort(perm)


def _prep(origin, direction, max_len, ray_tile: int = RAY_TILE):
    n = origin.shape[0]
    pad = (-n) % ray_tile
    safe_dir = jnp.where(jnp.linalg.norm(direction, axis=-1, keepdims=True) > 0,
                         direction, jnp.array([0.0, 0.0, 1.0]))
    o = jnp.pad(origin, ((0, pad), (0, 0)))
    d = jnp.pad(safe_dir, ((0, pad), (0, 0)), constant_values=1.0)
    ml = jnp.pad(max_len, (0, pad))
    return o, d, ml, n, (n + pad) // ray_tile


@partial(jax.jit, static_argnames=("interpret", "precision", "tri_tile",
                                   "sort_rays", "ray_tile", "subtile"))
def traverse_kernel(w4, aabb_min, aabb_max, ids, origin, direction,
                    interpret: bool = False,
                    precision=jax.lax.Precision.HIGHEST,
                    tri_tile: int = TRI_TILE, sort_rays: bool = False,
                    ray_tile: int = RAY_TILE, alive=None,
                    edge=BIAS, subtile: int = 1) -> Hit:
    """Closest hit of N rays against all triangles, fused on-chip.

    `alive` (optional bool [N]): dead rays get max_len 0, so whole dead
    tiles flag off in the cluster prepass and skip all compute — the
    wavefront thins as the bounce loop kills rays (octant sorting groups
    the dead rays' sentinel direction into one contiguous run)."""
    max_len = jnp.full(origin.shape[:1], POW32, dtype=jnp.float32)
    if alive is not None:
        max_len = jnp.where(alive, max_len, 0.0)
    if sort_rays:
        perm, inv_perm = sort_by_octant(direction)
        origin, direction, max_len = origin[perm], direction[perm], max_len[perm]
    o, d, ml, n, rt = _prep(origin, direction, max_len, ray_tile)
    wt = w4.shape[1] // tri_tile
    flags = _flags(aabb_min, aabb_max, o, d, ml, rt, wt, ray_tile)
    f = _ray_features(o, d)
    idsf = ids.astype(jnp.float32).reshape(-1, 1)
    s, u, v, tri = _intersect(w4, flags, f, ml, idsf, cull=False,
                              interpret=interpret, precision=precision,
                              tri_tile=tri_tile, ray_tile=ray_tile, edge=edge,
                              subtile=subtile)
    s, u, v, tri = s[:n], u[:n], v[:n], tri[:n]
    if sort_rays:
        s, u, v, tri = s[inv_perm], u[inv_perm], v[inv_perm], tri[inv_perm]
    hit = tri >= 0
    suv = jnp.where(hit[:, None], jnp.stack([s, u, v], axis=-1), 0.0)
    return Hit(suv=suv, triangle=jnp.where(hit, tri, -1).astype(jnp.int32))


@partial(jax.jit, static_argnames=("interpret", "precision", "tri_tile",
                                   "sort_rays", "ray_tile", "subtile"))
def shadow_kernel(w4, aabb_min, aabb_max, ids, origin, direction, max_len,
                  interpret: bool = False,
                  precision=jax.lax.Precision.HIGHEST,
                  tri_tile: int = TRI_TILE, sort_rays: bool = False,
                  ray_tile: int = RAY_TILE, alive=None,
                  subtile: int = 1) -> jnp.ndarray:
    """Front-face-culled any-hit within max_len, fused on-chip."""
    if alive is not None:
        max_len = jnp.where(alive, max_len, 0.0)
    if sort_rays:
        perm, inv_perm = sort_by_octant(direction)
        origin, direction, max_len = origin[perm], direction[perm], max_len[perm]
    o, d, ml, n, rt = _prep(origin, direction, max_len, ray_tile)
    wt = w4.shape[1] // tri_tile
    flags = _flags(aabb_min, aabb_max, o, d, ml, rt, wt, ray_tile)
    f = _ray_features(o, d)
    idsf = ids.astype(jnp.float32).reshape(-1, 1)
    s, u, v, tri = _intersect(w4, flags, f, ml, idsf, cull=True,
                              interpret=interpret, precision=precision,
                              tri_tile=tri_tile, ray_tile=ray_tile,
                              subtile=subtile, any_hit=True)
    tri = tri[:n]
    if sort_rays:
        tri = tri[inv_perm]
    return tri >= 0


def _ray_features_t(o3, d3):
    """_ray_features built channel-major: [16, N] with N minor.

    The [N, 16]-then-transpose path materializes minor-dim-16 arrays
    whose rows pad to full 128-lane tiles (~8x physical amplification at
    2M rays); building the transposed layout directly from SoA channels
    keeps every intermediate lane-packed. Same values bit-exactly."""
    one = jnp.ones_like(o3[0])
    rows = [one, o3[0], o3[1], o3[2], d3[0], d3[1], d3[2]]
    for c in range(3):
        for k in range(3):
            rows.append(d3[c] * o3[k])
    return jnp.stack(rows, axis=0)


def _prep_soa(o3, d3, max_len, ray_tile: int = RAY_TILE):
    n = o3[0].shape[0]
    pad = (-n) % ray_tile
    norm2 = d3[0] * d3[0] + d3[1] * d3[1] + d3[2] * d3[2]
    dead = norm2 <= 0.0
    d3 = (jnp.where(dead, 0.0, d3[0]), jnp.where(dead, 0.0, d3[1]),
          jnp.where(dead, 1.0, d3[2]))
    if pad:
        o3 = tuple(jnp.pad(c, (0, pad)) for c in o3)
        d3 = tuple(jnp.pad(c, (0, pad), constant_values=1.0) for c in d3)
        max_len = jnp.pad(max_len, (0, pad))
    return o3, d3, max_len, n, (n + pad) // ray_tile


def _flags_soa(aabb_min, aabb_max, o3, d3, max_len, rt, wt,
               ray_tile: int = RAY_TILE):
    """_flags from SoA channels: per-axis slab tests on [C, K] arrays
    (no minor-dim-3 temps)."""
    k = aabb_min.shape[0]
    clusters_per_tile = k // wt
    bmin = tuple(aabb_min[:, a] for a in range(3))
    bmax = tuple(aabb_max[:, a] for a in range(3))

    def chunk_flags(args):
        o0, o1, o2, d0, d1, d2, ml = args
        o = (o0, o1, o2)
        d = (d0, d1, d2)
        tmin = None
        tmax = None
        for a in range(3):
            inv = 1.0 / d[a]
            t0 = (bmin[a][None] - o[a][:, None]) * inv[:, None]
            t1 = (bmax[a][None] - o[a][:, None]) * inv[:, None]
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            tmin = lo if tmin is None else jnp.maximum(tmin, lo)
            tmax = hi if tmax is None else jnp.minimum(tmax, hi)
        hit = (tmax >= jnp.maximum(tmin, BIAS)) & (tmin < ml[:, None])
        return hit.reshape(-1, ray_tile, k).any(axis=1)

    args = (*o3, *d3, max_len)
    if rt <= FLAG_CHUNK:
        per_tile = chunk_flags(args)
    else:
        pad_t = (-rt) % FLAG_CHUNK
        pad_n = pad_t * ray_tile
        o3p = tuple(jnp.pad(c, (0, pad_n)) for c in o3)
        d3p = tuple(jnp.pad(c, (0, pad_n), constant_values=1.0) for c in d3)
        mlp = jnp.pad(max_len, (0, pad_n))
        n_chunks = (rt + pad_t) // FLAG_CHUNK
        cw = FLAG_CHUNK * ray_tile
        per_tile = jax.lax.map(
            chunk_flags,
            tuple(c.reshape(n_chunks, cw) for c in (*o3p, *d3p, mlp)),
        ).reshape(-1, k)[:rt]
    return per_tile.reshape(rt, wt, clusters_per_tile).any(axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret", "precision", "tri_tile",
                                   "ray_tile", "subtile"))
def traverse_kernel_soa(w4, aabb_min, aabb_max, ids, o3, d3,
                        interpret: bool = False,
                        precision=jax.lax.Precision.HIGHEST,
                        tri_tile: int = TRI_TILE,
                        ray_tile: int = RAY_TILE, alive=None, edge=BIAS,
                        subtile: int = 1):
    """traverse_kernel with SoA ray channels in and (s, u, v, tri) SoA
    out — bit-identical results, no lane-padded [N, 3]/[N, 16] temps.
    No octant sort (every kernel-scheme scene is below the sort
    threshold; sorted casts use the [N, 3] entry point)."""
    max_len = jnp.full(o3[0].shape, POW32, dtype=jnp.float32)
    if alive is not None:
        max_len = jnp.where(alive, max_len, 0.0)
    o3, d3, ml, n, rt = _prep_soa(o3, d3, max_len, ray_tile)
    wt = w4.shape[1] // tri_tile
    flags = _flags_soa(aabb_min, aabb_max, o3, d3, ml, rt, wt, ray_tile)
    ft = _ray_features_t(o3, d3)
    if w4.dtype == jnp.bfloat16:
        from .intersect_sparse import pack_rhs_x6

        ft = pack_rhs_x6(ft)
    idsf = ids.astype(jnp.float32).reshape(-1, 1)
    s, u, v, tri = _intersect_ft(w4, flags, ft, ml, idsf, cull=False,
                                 interpret=interpret, precision=precision,
                                 tri_tile=tri_tile, ray_tile=ray_tile,
                                 edge=edge, subtile=subtile)
    s, u, v, tri = s[:n], u[:n], v[:n], tri[:n]
    hit = tri >= 0
    zero = jnp.zeros_like(s)
    return (jnp.where(hit, s, zero), jnp.where(hit, u, zero),
            jnp.where(hit, v, zero),
            jnp.where(hit, tri, -1).astype(jnp.int32))


@partial(jax.jit, static_argnames=("interpret", "precision", "tri_tile",
                                   "ray_tile", "subtile"))
def shadow_kernel_soa(w4, aabb_min, aabb_max, ids, o3, d3, max_len,
                      interpret: bool = False,
                      precision=jax.lax.Precision.HIGHEST,
                      tri_tile: int = TRI_TILE,
                      ray_tile: int = RAY_TILE, alive=None,
                      subtile: int = 1) -> jnp.ndarray:
    """shadow_kernel with SoA ray channels (see traverse_kernel_soa)."""
    if alive is not None:
        max_len = jnp.where(alive, max_len, 0.0)
    o3, d3, ml, n, rt = _prep_soa(o3, d3, max_len, ray_tile)
    wt = w4.shape[1] // tri_tile
    flags = _flags_soa(aabb_min, aabb_max, o3, d3, ml, rt, wt, ray_tile)
    ft = _ray_features_t(o3, d3)
    if w4.dtype == jnp.bfloat16:
        from .intersect_sparse import pack_rhs_x6

        ft = pack_rhs_x6(ft)
    idsf = ids.astype(jnp.float32).reshape(-1, 1)
    _, _, _, tri = _intersect_ft(w4, flags, ft, ml, idsf, cull=True,
                                 interpret=interpret, precision=precision,
                                 tri_tile=tri_tile, ray_tile=ray_tile,
                                 subtile=subtile, any_hit=True)
    return tri[:n] >= 0
