"""Sparse wavefront intersection kernel.

The dense fused kernel (ops.intersect_kernel) walks a (ray_tiles x
tri_tiles) grid and skips flagged-off steps with @pl.when — but a skipped
Mosaic grid step still costs ~1.7 us, and at dragon scale (2025 x 88
steps, ~9% flag density) that fixed cost alone is ~310 ms per traversal
(measured). This kernel inverts the iteration: ONE grid step per ray
tile, which walks a compacted worklist of just its flagged triangle
tiles with a dynamic-trip-count loop, double-buffering the tile DMAs from
HBM behind the MXU/VPU work. Cost per ray tile is proportional to its
actual candidate count — zero skipped-step overhead — and the finer
128-triangle tiles sharpen the cluster culling (2 clusters per tile vs 8).

Worklist compaction pads with tile 0: re-evaluating any tile is idempotent
for a closest-hit/any-hit reduction, so partial chunks need no masking.
Worklists are sorted by the tile's minimum slab-entry distance (computed
for free in the flags prepass): the closest-hit loop exits once every
live ray's best hit is nearer than the next tile's entry bound, so
near-geometry tiles resolve a ray tile after a few chunks. Ties in s are
broken on the LOWEST drawable index — exactly the reference's first-in-
DFS-order-wins semantics (pathtracer_fragment.glsl:172-227 iterates
triangles in id_buffer order with a strict '<') — which makes the
evaluation order semantically irrelevant.

Triangle identity: the kernel returns the PADDED DRAWABLE index (position
in the flattened id_buffer order), computed from (worklist tile, row) —
padded rows have all-zero MT constants (det = 0) and self-reject, so no
id table rides through the kernel at all. Callers either gather
id_buffer[drawable] once per traversal or (cheaper) pre-gather their
per-triangle tables into drawable order once per frame.

Reference parity: same Möller-Trumbore accept window as
pathtracer_fragment.glsl:123-158 via the MT-as-matmul formulation
(ops.traverse_mxu).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import BIAS, POW32
from .traverse import Hit
from .traverse_mxu import _ray_features, tri_rows

RAY_TILE = 1024
TRI_TILE = 128           # triangles per worklist tile (2 cull clusters)
CHUNK = 4                # tri tiles DMA'd + evaluated per inner-loop step
CLUSTER = 64

# Round-5 structural knobs, read at import/trace time (A/B bisection —
# scripts/bench_r5c.sh): prefetch-ahead in the worklist loops and the
# all-dead-tile fast path in the flags/key kernels.
import os as _os

_PREFETCH_AHEAD = _os.environ.get("FLEXLIGHT_SPARSE_PREFETCH", "1") != "0"
_DEAD_TILE_SKIP = _os.environ.get("FLEXLIGHT_SPARSE_DEADSKIP", "1") != "0"


"""bf16x6 packing: fp32 matmul at HIGHEST precision lowers to 6 MXU
passes over bf16 limb pairs (A1B1, A1B2, A2B1, A2B2, A1B3, A3B1 with
A = A1+A2+A3 split into 8-bit-mantissa limbs). The MT feature dim is only
16, so all 6 limb pairs fit ONE K=96 pass: stack the lhs limbs as
[A1,A1,A2,A2,A1,A3] and the rhs as [B1,B2,B1,B2,B3,B1] — identical terms,
one pass instead of six, no accuracy loss."""
_LHS_ORDER = (0, 0, 1, 1, 0, 2)
_RHS_ORDER = (0, 1, 0, 1, 2, 0)


def _limbs(x, n: int = 3):
    out = []
    r = x
    for _ in range(n):
        # barrier: --xla_allow_excess_precision (set in this env) lets XLA
        # cancel the f32->bf16->f32 round-trip, zeroing limbs 2..n
        l = jax.lax.optimization_barrier(r.astype(jnp.bfloat16))
        out.append(l)
        r = r - l.astype(jnp.float32)
    return out


def pack_lhs_x6(w, axis: int = -2):
    """[..., 16, ...] f32 -> [..., 96, ...] bf16 limb stack."""
    limbs = _limbs(w)
    return jnp.concatenate([limbs[i] for i in _LHS_ORDER], axis=axis)


def pack_rhs_x6(f, axis: int = 0):
    limbs = _limbs(f)
    return jnp.concatenate([limbs[i] for i in _RHS_ORDER], axis=axis)


def build_w4_tiled(world_geometry, id_buffer, tri_tile: int = TRI_TILE,
                   x6: bool = True):
    """MT constants in DMA-friendly tile-major layout.

    Returns (w4t [WT, 4, K, tri_tile], aabb_min/max [K, 3], w4f
    [Tp, 64] f32) with K = 96 bf16 limb rows (x6 packing, default) or
    16 f32 rows. One worklist tile = one contiguous HBM block whose
    minor dim is the native 128-lane axis (a 16-lane minor would make
    the VMEM scratch lane-padded and its DMA slices illegal). w4f is
    the same constants row-flattened in drawable order for the
    post-kernel exact (s, u, v) recovery of each ray's winner."""
    t = id_buffer.shape[0]
    tp = -(-t // tri_tile) * tri_tile
    wt = tp // tri_tile
    rows = tri_rows(world_geometry, id_buffer)              # 4 x [T, 16]
    w4 = jnp.stack([jnp.pad(r, ((0, tp - t), (0, 0))) for r in rows])
    w4f = w4.transpose(1, 0, 2).reshape(tp, 64)             # [Tp, 64] f32
    if x6:
        w4 = pack_lhs_x6(w4, axis=-1)                       # [4, Tp, 96] bf16
    kdim = w4.shape[-1]
    # [4, Tp, K] -> [WT, 4, K, tri_tile]
    w4t = w4.reshape(4, wt, tri_tile, kdim).transpose(1, 0, 3, 2)

    tris = world_geometry[id_buffer]
    verts = tris[:, 0:9].reshape(t, 3, 3)
    vmin = jnp.pad(verts.min(axis=1), ((0, tp - t), (0, 0)),
                   constant_values=jnp.inf)
    vmax = jnp.pad(verts.max(axis=1), ((0, tp - t), (0, 0)),
                   constant_values=-jnp.inf)
    cluster = min(CLUSTER, tri_tile)
    k = tp // cluster
    aabb_min = vmin.reshape(k, cluster, 3).min(axis=1)
    aabb_max = vmax.reshape(k, cluster, 3).max(axis=1)
    return w4t, aabb_min, aabb_max, w4f


def _compact(tmins, chunk: int):
    """tmins [RT, WT] f32 (POW32 = tile not hit) -> (tlist [RT, WTp] int32
    active tiles first in ascending entry-distance order (pad 0),
    tms [RT, WTp] f32 sorted entry bounds (pad POW32), counts [RT])."""
    rt, wt = tmins.shape
    order = jnp.argsort(tmins, axis=1, stable=True).astype(jnp.int32)
    tms = jnp.take_along_axis(tmins, order, axis=1)
    counts = (tmins < POW32).sum(axis=1).astype(jnp.int32)
    # rows padded to a lane multiple: the per-tile worklist row is DMA'd
    # HBM -> SMEM, and DMA slices must be 128-aligned
    pad = (-wt) % max(chunk, 128)
    if pad:
        order = jnp.pad(order, ((0, 0), (0, pad)))
        tms = jnp.pad(tms, ((0, 0), (0, pad)), constant_values=POW32)
    return order, tms, counts


def _flags_kernel(rays_ref, amin_ref, amax_ref, out_ref, *, kp: int,
                  k_chunk: int, cpt: int, ray_tile: int):
    """Per-(ray tile x cluster) slab test, fused in VMEM.

    The XLA formulation materializes [rays, clusters] HBM intermediates
    (~50 ms per traversal at dragon 1080p, bandwidth-bound); here each
    grid step keeps one ray tile's [k_chunk, ray_tile] interval temps in
    VMEM. The output is the tile's minimum entry distance over (rays x
    clusters) — POW32 when no ray can hit the tile — which doubles as
    the hit flag AND the worklist's near-to-far sort key / early-exit
    bound (any hit in the tile has s >= this entry distance).

    All-dead ray tiles (every max_len <= 0 — sorted wavefronts park dead
    rays in trailing tiles) skip the slab loop outright: the computed
    result there is POW32 everywhere (hit needs tmin < ml = 0 while
    entry >= BIAS), so the fast path is value-exact."""
    ml = rays_ref[0, 6:7, :]
    if not _DEAD_TILE_SKIP:
        _flags_body(rays_ref, amin_ref, amax_ref, out_ref, ml, kp=kp,
                    k_chunk=k_chunk, cpt=cpt, ray_tile=ray_tile)
        return
    any_live = jnp.max(ml) > 0.0

    @pl.when(jnp.logical_not(any_live))
    def _():
        out_ref[:] = jnp.full(out_ref.shape, POW32, dtype=jnp.float32)

    @pl.when(any_live)
    def _():
        _flags_body(rays_ref, amin_ref, amax_ref, out_ref, ml, kp=kp,
                    k_chunk=k_chunk, cpt=cpt, ray_tile=ray_tile)


def _flags_body(rays_ref, amin_ref, amax_ref, out_ref, ml, *, kp: int,
                k_chunk: int, cpt: int, ray_tile: int):
    o = [rays_ref[0, c:c + 1, :] for c in range(3)]        # [1, R]
    inv = [rays_ref[0, 3 + c:4 + c, :] for c in range(3)]
    for kc in range(kp // k_chunk):
        sl = slice(kc * k_chunk, (kc + 1) * k_chunk)
        tmin = jnp.full((k_chunk, ray_tile), -jnp.inf, dtype=jnp.float32)
        tmax = jnp.full((k_chunk, ray_tile), jnp.inf, dtype=jnp.float32)
        for c in range(3):
            a = amin_ref[c, sl]                            # [k_chunk, 1]
            b = amax_ref[c, sl]
            t0 = (a - o[c]) * inv[c]                       # [k_chunk, R]
            t1 = (b - o[c]) * inv[c]
            tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
            tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
        entry = jnp.maximum(tmin, BIAS)
        # ml > 0: dead rays flag nothing (they can never accept a hit,
        # so their candidate tiles were pure worklist inflation)
        hit = (tmax >= entry) & (tmin < ml) & (ml > 0.0)
        e = jnp.where(hit, entry, POW32)
        emin = jnp.min(e, axis=1, keepdims=True)           # [k_chunk, 1]
        tile = jnp.min(emin.reshape(k_chunk // cpt, cpt, 1), axis=1)
        out_ref[0, kc * (k_chunk // cpt):(kc + 1) * (k_chunk // cpt)] = tile


def _rays8_soa(o3, d3, max_len, ray_tile: int):
    """[rt, 8, R] ray-channel stack (o, 1/d, max_len, 0) straight from SoA
    channels — the AoS builders read strided columns of a lane-padded
    [N, 3] array to make the same stack. Bit-identical values."""
    n = o3[0].shape[0]
    rt = n // ray_tile
    inv = tuple(1.0 / jnp.where(c == 0.0, 1e-30, c) for c in d3)
    rays = jnp.stack([o3[0], o3[1], o3[2], inv[0], inv[1], inv[2],
                      max_len, jnp.zeros_like(max_len)], axis=0)
    return rays.reshape(8, rt, ray_tile).transpose(1, 0, 2)


@partial(jax.jit, static_argnames=("tri_tile", "ray_tile", "interpret"))
def flags_sparse(aabb_min, aabb_max, origin, direction, max_len,
                 tri_tile: int = TRI_TILE, ray_tile: int = RAY_TILE,
                 interpret: bool = False):
    """[RT, WT] f32 per-tri-tile min entry distance (POW32 = no ray hits
    the tile) via the fused Pallas slab kernel.
    origin/direction/max_len must already be padded to ray_tile."""
    o3 = tuple(origin[:, c] for c in range(3))
    d3 = tuple(direction[:, c] for c in range(3))
    rays = _rays8_soa(o3, d3, max_len, ray_tile)
    return _flags_call(rays, aabb_min, aabb_max, tri_tile, ray_tile,
                       interpret)


def _flags_call(rays, aabb_min, aabb_max, tri_tile: int, ray_tile: int,
                interpret: bool):
    """flags_sparse core on a prebuilt [rt, 8, R] ray stack."""
    rt = rays.shape[0]
    k = aabb_min.shape[0]
    cpt = tri_tile // min(CLUSTER, tri_tile)
    wt = k // cpt
    k_chunk = min(256, k) if k % 256 == 0 or k < 256 else 128
    # pad clusters to a k_chunk multiple with never-hit boxes
    kp = -(-k // k_chunk) * k_chunk
    if kp > k:
        aabb_min = jnp.pad(aabb_min, ((0, kp - k), (0, 0)),
                           constant_values=jnp.inf)
        aabb_max = jnp.pad(aabb_max, ((0, kp - k), (0, 0)),
                           constant_values=-jnp.inf)
    wtp = kp // cpt
    out = pl.pallas_call(
        partial(_flags_kernel, kp=kp, k_chunk=k_chunk, cpt=cpt,
                ray_tile=ray_tile),
        grid=(rt,),
        in_specs=[
            pl.BlockSpec((1, 8, ray_tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wtp, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rt, wtp, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(rays, aabb_min.T.reshape(3, kp, 1), aabb_max.T.reshape(3, kp, 1))
    return out[:, :wt, 0]


def _tmins_xla(aabb_min, aabb_max, origin, direction, max_len, rt, wt,
               ray_tile: int):
    """XLA fallback of flags_sparse for interpret mode (CPU): [RT, WT]
    f32 min entry distances, chunked like intersect_kernel._flags."""
    from .intersect_kernel import FLAG_CHUNK

    k = aabb_min.shape[0]
    cpt = k // wt

    def chunk_tmins(args):
        o, d, ml = args
        inv_d = 1.0 / jnp.where(d == 0.0, 1e-30, d)
        t0 = (aabb_min[None] - o[:, None]) * inv_d[:, None]
        t1 = (aabb_max[None] - o[:, None]) * inv_d[:, None]
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        entry = jnp.maximum(tmin, BIAS)
        hit = ((tmax >= entry) & (tmin < ml[:, None])
               & (ml[:, None] > 0.0))
        e = jnp.where(hit, entry, POW32)
        return e.reshape(-1, ray_tile, k).min(axis=1)       # [C, K]

    if rt <= FLAG_CHUNK:
        per = chunk_tmins((origin, direction, max_len))
    else:
        pad_t = (-rt) % FLAG_CHUNK
        pad_n = pad_t * ray_tile
        o = jnp.pad(origin, ((0, pad_n), (0, 0)))
        d = jnp.pad(direction, ((0, pad_n), (0, 0)), constant_values=1.0)
        ml = jnp.pad(max_len, (0, pad_n))
        n_chunks = (rt + pad_t) // FLAG_CHUNK
        per = jax.lax.map(
            chunk_tmins,
            (o.reshape(n_chunks, FLAG_CHUNK * ray_tile, 3),
             d.reshape(n_chunks, FLAG_CHUNK * ray_tile, 3),
             ml.reshape(n_chunks, FLAG_CHUNK * ray_tile)),
        ).reshape(-1, k)[:rt]
    return per.reshape(rt, wt, cpt).min(axis=-1)


def _spread3(x):  # 10-bit Morton spread to every 3rd bit
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton_soa(o3, lo, hi, bits: int):
    """bits-per-axis Morton code of SoA origin within [lo, hi] (<= 10 bits)."""
    span = jnp.maximum(hi - lo, 1e-30)
    top = float(2 ** bits - 1)
    q = [jnp.clip((o3[c] - lo[c]) / span[c] * top, 0.0, top).astype(jnp.int32)
         for c in range(3)]
    return _spread3(q[0]) | (_spread3(q[1]) << 1) | (_spread3(q[2]) << 2)


def _morton(origin, lo, hi, bits: int):
    """bits-per-axis Morton code of origin within [lo, hi] (<= 10 bits)."""
    return _morton_soa(tuple(origin[:, c] for c in range(3)), lo, hi, bits)


def sort_spatial(origin, direction, lo, hi, max_len, prev_tri=None,
                 tri_tile: int = TRI_TILE, n_tiles: int | None = None):
    """Wavefront compaction key. Dead rays (max_len <= 0) sort to the back
    so whole tiles drop out. Returns (perm, inv_perm).

    Without `prev_tri`: direction octant (high bits) + 5-bit/axis Morton
    code of the ray origin — octant-only sorting groups directions but
    leaves bounce-ray ORIGINS scattered across the whole scene, so a
    1024-ray tile still spans huge cluster unions (measured: mean 119/351
    tiles at dragon scale); clustering origins within each octant bounds
    both ends of the ray.

    With `prev_tri` (the drawable index each ray just bounced off):
    (prev worklist tile, Morton of origin) — rays leaving the same
    128-triangle surface tile share origin AND surface orientation, so
    their candidate unions collapse vs the octant key. When the tile
    index fits 9 bits (`n_tiles` < 512 — every current example scene),
    the key packs as (tile << 21) | morton7 in ONE int32 stable argsort;
    the 7-bit Morton measures equal-or-better unions than the 10-bit
    2-pass original (dragon captured wavefronts: bounce-1 59->65,
    bounce-2 190->144 live-union mean) at half the sort cost. Huge
    scenes fall back to the two-pass 40-bit composite."""
    dead = max_len <= 0.0
    if prev_tri is not None:
        tile = prev_tri.astype(jnp.int32) // tri_tile
        if n_tiles is not None and n_tiles <= 512:
            key = (tile << 21) | _morton(origin, lo, hi, 7)
            key = jnp.where(dead, jnp.int32(1) << 30, key)
            perm = jnp.argsort(key, stable=True)
            return perm, jnp.argsort(perm)
        minor = jnp.where(dead, jnp.int32(1) << 30,
                          _morton(origin, lo, hi, 10))
        perm1 = jnp.argsort(minor, stable=True)
        major = jnp.where(dead, jnp.int32(1) << 30, tile)[perm1]
        perm = perm1[jnp.argsort(major, stable=True)]
        return perm, jnp.argsort(perm)
    oct_key = ((direction[:, 0] > 0) * 4 + (direction[:, 1] > 0) * 2
               + (direction[:, 2] > 0)).astype(jnp.int32)
    key = (oct_key << 15) | _morton(origin, lo, hi, 5)
    key = jnp.where(dead, jnp.int32(1) << 20, key)
    perm = jnp.argsort(key, stable=True)
    return perm, jnp.argsort(perm)


"""Candidate-aware wavefront sort (FLEXLIGHT_SPARSE_SORT=nearest2).

The surface-tile key groups bounce rays by where they COME FROM; their
candidate unions still run 10-20x above the per-ray floor because rays
leaving one surface head for different geometry. Grouping by where they
are GOING — the first two supertile boxes (SUPER_TILES worklist tiles
each) the ray can enter, by slab-entry distance — cuts dragon bounce
unions 27-37% further (scripts/analyze_raygroup.py: bounce-1 59->43,
bounce-2 39->25 per 1024-ray tile; supertile granularity measures within
noise of full tile granularity at ~1/8 the prepass cost). The key needs
one extra flags-shaped Pallas pass per sorted traversal (~2 ms per 2M
rays at dragon scale vs ~13 ms for the 702-cluster flag pass). Sort keys
never change traversal RESULTS (grouping only), so the mode is a pure
perf knob."""
SUPER_TILES = 4


def _key_kernel(rays_ref, bmin_ref, bmax_ref, out_ref, *, nbp: int,
                k_chunk: int, ray_tile: int, nb: int):
    """Per-ray (nearest, 2nd-nearest) supertile box + direction octant,
    packed into one int32 sort key. POW32-entry boxes (missed) map to
    index `nb` so no-candidate rays group together at the back of the
    live region. All-dead tiles short-circuit to the dead key (1 << 30 —
    exactly what the final where would produce for every lane)."""
    ml = rays_ref[0, 6:7, :]
    if not _DEAD_TILE_SKIP:
        _key_body(rays_ref, bmin_ref, bmax_ref, out_ref, ml, nbp=nbp,
                  k_chunk=k_chunk, ray_tile=ray_tile, nb=nb)
        return
    any_live = jnp.max(ml) > 0.0

    @pl.when(jnp.logical_not(any_live))
    def _():
        out_ref[:] = jnp.full((1, 1, ray_tile), jnp.int32(1) << 30,
                              dtype=jnp.int32)

    @pl.when(any_live)
    def _():
        _key_body(rays_ref, bmin_ref, bmax_ref, out_ref, ml, nbp=nbp,
                  k_chunk=k_chunk, ray_tile=ray_tile, nb=nb)


def _key_body(rays_ref, bmin_ref, bmax_ref, out_ref, ml, *, nbp: int,
              k_chunk: int, ray_tile: int, nb: int):
    o = [rays_ref[0, c:c + 1, :] for c in range(3)]
    inv = [rays_ref[0, 3 + c:4 + c, :] for c in range(3)]
    shp = (1, ray_tile)
    e1 = jnp.full(shp, POW32, dtype=jnp.float32)
    i1 = jnp.full(shp, nb, dtype=jnp.int32)
    e2 = jnp.full(shp, POW32, dtype=jnp.float32)
    i2 = jnp.full(shp, nb, dtype=jnp.int32)
    big = jnp.int32(nbp + 1)
    for kc in range(nbp // k_chunk):
        sl = slice(kc * k_chunk, (kc + 1) * k_chunk)
        tmin = jnp.full((k_chunk, ray_tile), -jnp.inf, dtype=jnp.float32)
        tmax = jnp.full((k_chunk, ray_tile), jnp.inf, dtype=jnp.float32)
        for c in range(3):
            a = bmin_ref[c, sl]                            # [k_chunk, 1]
            b = bmax_ref[c, sl]
            t0 = (a - o[c]) * inv[c]                       # [k_chunk, R]
            t1 = (b - o[c]) * inv[c]
            tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
            tmax = jnp.minimum(tmax, jnp.maximum(t0, t1))
        entry = jnp.maximum(tmin, BIAS)
        hit = (tmax >= entry) & (tmin < ml)
        e = jnp.where(hit, entry, POW32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (k_chunk, ray_tile), 0)
        iota = iota + kc * k_chunk
        # padded boxes (inf min / -inf max) pass the slab test as
        # inverted intervals — mask them by index instead
        e = jnp.where(iota < nb, e, POW32)
        # chunk-local best two (lowest index wins ties via min-of-iota)
        f1 = jnp.min(e, axis=0, keepdims=True)
        j1 = jnp.min(jnp.where(e <= f1, iota, big), axis=0, keepdims=True)
        emask = jnp.where(iota == j1, POW32, e)
        f2 = jnp.min(emask, axis=0, keepdims=True)
        j2 = jnp.min(jnp.where(emask <= f2, iota, big), axis=0,
                     keepdims=True)
        j1 = jnp.where(f1 >= POW32, nb, j1)
        j2 = jnp.where(f2 >= POW32, nb, j2)
        # merge two sorted pairs, keep best two. Ties pick the LOWEST
        # index (matches the xla one-pass min-of-iota): running-vs-chunk
        # ties resolve to the running pair (earlier chunk = lower index),
        # but the demoted loser needs an explicit (entry, index)
        # lexicographic test — e.g. origins inside several boxes tie at
        # entry=BIAS, and the loser (chunk's j1) must beat the chunk's
        # own j2 for second place.
        loser_e = jnp.where(f1 < e1, e1, f1)
        loser_i = jnp.where(f1 < e1, i1, j1)
        i1 = jnp.where(f1 < e1, j1, i1)
        e1 = jnp.minimum(e1, f1)
        i2 = jnp.where(f2 < e2, j2, i2)
        e2 = jnp.minimum(e2, f2)
        take = (loser_e < e2) | ((loser_e == e2) & (loser_i < i2))
        i2 = jnp.where(take, loser_i, i2)
        e2 = jnp.minimum(e2, loser_e)
    octant = ((inv[0] > 0.0).astype(jnp.int32) * 4
              + (inv[1] > 0.0).astype(jnp.int32) * 2
              + (inv[2] > 0.0).astype(jnp.int32))
    key = (i1 * (nb + 1) + i2) * 8 + octant
    out_ref[:] = jnp.where(ml <= 0.0, jnp.int32(1) << 30, key)[None]


def _super_boxes(aabb_min, aabb_max, group: int):
    """Group `group` consecutive cull clusters into one supertile AABB."""
    k = aabb_min.shape[0]
    kp = -(-k // group) * group
    bmin = jnp.pad(aabb_min, ((0, kp - k), (0, 0)),
                   constant_values=jnp.inf).reshape(-1, group, 3).min(1)
    bmax = jnp.pad(aabb_max, ((0, kp - k), (0, 0)),
                   constant_values=-jnp.inf).reshape(-1, group, 3).max(1)
    return bmin, bmax


@partial(jax.jit, static_argnames=("group",))
def _nearest2_key_xla(aabb_min, aabb_max, origin, direction, max_len,
                      group: int = 8):
    """jnp formulation of nearest2_key (CPU fallback / kernel oracle)."""
    bmin, bmax = _super_boxes(aabb_min, aabb_max, group)
    nb = bmin.shape[0]
    n = origin.shape[0]

    def chunk_key(args):
        o, d, ml = args
        inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
        t0 = (bmin[None] - o[:, None]) * inv[:, None]
        t1 = (bmax[None] - o[:, None]) * inv[:, None]
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        entry = jnp.maximum(tmin, BIAS)
        hit = (tmax >= entry) & (tmin < ml[:, None])
        e = jnp.where(hit, entry, POW32)
        iota = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
        e1 = jnp.min(e, axis=1, keepdims=True)
        j1 = jnp.min(jnp.where(e <= e1, iota, nb + 1), axis=1)
        emask = jnp.where(iota == j1[:, None], POW32, e)
        e2 = jnp.min(emask, axis=1, keepdims=True)
        j2 = jnp.min(jnp.where(emask <= e2, iota, nb + 1), axis=1)
        j1 = jnp.where(e1[:, 0] >= POW32, nb, j1)
        j2 = jnp.where(e2[:, 0] >= POW32, nb, j2)
        # d >= 0 matches the kernel's inv > 0 (d == 0 maps to +1e-30)
        octant = ((d[:, 0] >= 0.0).astype(jnp.int32) * 4
                  + (d[:, 1] >= 0.0).astype(jnp.int32) * 2
                  + (d[:, 2] >= 0.0).astype(jnp.int32))
        key = (j1 * (nb + 1) + j2) * 8 + octant
        return jnp.where(ml <= 0.0, jnp.int32(1) << 30, key)

    chunk = 65536
    if n <= chunk:
        return chunk_key((origin, direction, max_len))
    pad = (-n) % chunk
    o = jnp.pad(origin, ((0, pad), (0, 0)))
    d = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
    ml = jnp.pad(max_len, (0, pad))
    nc = (n + pad) // chunk
    return jax.lax.map(
        chunk_key, (o.reshape(nc, chunk, 3), d.reshape(nc, chunk, 3),
                    ml.reshape(nc, chunk))).reshape(-1)[:n]


@partial(jax.jit, static_argnames=("ray_tile", "interpret", "group",
                                   "k_chunk"))
def nearest2_key(aabb_min, aabb_max, origin, direction, max_len,
                 ray_tile: int = RAY_TILE, interpret: bool = False,
                 group: int = 8, k_chunk: int | None = None):
    """int32 [N] wavefront sort key: (nearest supertile, 2nd-nearest,
    octant); dead rays (max_len <= 0) get 1<<30. `group` = cull clusters
    per supertile (8 clusters x 64 tris = 4 worklist tiles). Pallas; see
    _nearest2_key_xla for the jnp formulation (callers pick it on CPU).
    `k_chunk` overrides the per-loop box-chunk size (tests exercise the
    cross-chunk two-min merge that production sizes only hit above 512
    supertiles ~ 262k triangles)."""
    o3 = tuple(origin[:, c] for c in range(3))
    d3 = tuple(direction[:, c] for c in range(3))
    return nearest2_key_soa(aabb_min, aabb_max, o3, d3, max_len,
                            ray_tile=ray_tile, interpret=interpret,
                            group=group, k_chunk=k_chunk)


def nearest2_key_soa(aabb_min, aabb_max, o3, d3, max_len,
                     ray_tile: int = RAY_TILE, interpret: bool = False,
                     group: int = 8, k_chunk: int | None = None):
    """nearest2_key from SoA ray channels (bit-identical values)."""
    bmin, bmax = _super_boxes(aabb_min, aabb_max, group)
    nb = bmin.shape[0]
    n = o3[0].shape[0]
    pad = (-n) % ray_tile
    if pad:
        o3 = tuple(jnp.pad(c, (0, pad)) for c in o3)
        d3 = tuple(jnp.pad(c, (0, pad), constant_values=1.0) for c in d3)
        max_len = jnp.pad(max_len, (0, pad))
    rt = (n + pad) // ray_tile
    if k_chunk is None:
        k_chunk = min(512, -(-nb // 8) * 8)
    nbp = -(-nb // k_chunk) * k_chunk
    if nbp > nb:
        bmin = jnp.pad(bmin, ((0, nbp - nb), (0, 0)),
                       constant_values=jnp.inf)
        bmax = jnp.pad(bmax, ((0, nbp - nb), (0, 0)),
                       constant_values=-jnp.inf)
    rays = _rays8_soa(o3, d3, max_len, ray_tile)
    key = pl.pallas_call(
        partial(_key_kernel, nbp=nbp, k_chunk=k_chunk, ray_tile=ray_tile,
                nb=nb),
        grid=(rt,),
        in_specs=[
            pl.BlockSpec((1, 8, ray_tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(rays, bmin.T.reshape(3, nbp, 1), bmax.T.reshape(3, nbp, 1))
    return key.reshape(-1)[:n]


"""Early-exit slack: a tile is skippable when every live ray's best hit
is strictly nearer than the tile's slab-entry bound. The bound and the
MT s come from different float paths (slab f32 vs bf16x6 matmul), so the
comparison carries a small relative + absolute guard band."""
_EXIT_REL = np.float32(1.0 + 1e-4)
_EXIT_ABS = np.float32(1e-5)


def _kernel(cnt_ref, edge_ref, f_ref, ml_ref, tlist_hbm, tm_hbm, w_hbm,
            s_ref, tri_ref, w_s, tl_s, tm_s, sem_w, sem_tl,
            sem_tm, *, cull: bool, precision, tri_tile: int, ray_tile: int,
            chunk: int, approx_rcp: bool, subtile: int = 1):
    """One grid step = `subtile` consecutive ray tiles walked
    sequentially (each with its own worklist): smaller ray tiles cut
    wasted matmul lanes ~45% at dragon scale (analyze_raygroup rt sweep)
    without multiplying Mosaic program launches."""
    i = pl.program_id(0)
    m = chunk * tri_tile

    shp = (1, subtile, ray_tile)
    s_ref[:] = jnp.full(shp, POW32, dtype=jnp.float32)
    tri_ref[:] = jnp.full(shp, -1, dtype=jnp.int32)

    # This program's worklist rows: HBM -> SMEM (the full [RT, WTp] list
    # is megabytes — beyond the 1 MB SMEM scalar-prefetch budget).
    # Unconditional: ~KBs even when every subtile is dead.
    tl_dma = pltpu.make_async_copy(tlist_hbm.at[i], tl_s, sem_tl)
    tm_dma = pltpu.make_async_copy(tm_hbm.at[i], tm_s, sem_tm)
    tl_dma.start()
    tm_dma.start()
    tl_dma.wait()
    tm_dma.wait()

    for g in range(subtile):
        _kernel_subtile(cnt_ref, edge_ref, f_ref, ml_ref, w_hbm, s_ref,
                        tri_ref, w_s, tl_s, tm_s, sem_w, i, g, m,
                        cull=cull, precision=precision, tri_tile=tri_tile,
                        ray_tile=ray_tile, chunk=chunk,
                        approx_rcp=approx_rcp, subtile=subtile)


def _kernel_subtile(cnt_ref, edge_ref, f_ref, ml_ref, w_hbm, s_ref,
                    tri_ref, w_s, tl_s, tm_s, sem_w, i, g, m, *,
                    cull: bool, precision, tri_tile: int, ray_tile: int,
                    chunk: int, approx_rcp: bool, subtile: int):
    cnt = cnt_ref[i * subtile + g]
    nch = pl.cdiv(cnt, chunk)
    rsl = slice(g * ray_tile, (g + 1) * ray_tile)

    def w_dma(slot, c, k):
        return pltpu.make_async_copy(
            w_hbm.at[tl_s[g, c * chunk + k]],
            w_s.at[slot, k], sem_w.at[slot, k])

    def start_chunk(slot, c):
        for k in range(chunk):
            w_dma(slot, c, k).start()

    def wait_chunk(slot, c):
        for k in range(chunk):
            w_dma(slot, c, k).wait()

    @pl.when(cnt > 0)
    def _():
        start_chunk(0, 0)
        live = ml_ref[0, g:g + 1, :] > 0.0      # [1, ray_tile]

        def body(carry):
            c, _ = carry
            slot = jax.lax.rem(c, 2)
            wait_chunk(slot, c)
            # Prefetch the next chunk NOW, before the epilogue decides
            # whether to continue: the old exit-conditional start at the
            # bottom of the loop exposed the full DMA latency on every
            # step (~11 us/step measured on coherent primaries, round 5).
            # Clamped to the last chunk so worklist-row reads stay in
            # bounds; the one possibly-wasted chunk DMA per subtile is
            # ~200 KB. The single outstanding prefetch is drained after
            # the loop (semaphores must balance across grid steps).
            if _PREFETCH_AHEAD:
                cp = jnp.minimum(c + 1, nch - 1)
                start_chunk(jax.lax.rem(c + 1, 2), cp)
            ft = f_ref[:, rsl]                  # [16, ray_tile]
            dn = (((0,), (0,)), ((), ()))       # contract both dim 0

            def plane(p):
                # per-k transposed-lhs matmuls, concat along sublanes
                parts = [jax.lax.dot_general(
                    w_s[slot, k, p], ft, dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=precision)
                    for k in range(chunk)]      # each [tri_tile, ray_tile]
                return jnp.concatenate(parts, axis=0) if chunk > 1 else parts[0]

            det = plane(0)                      # [m, ray_tile]
            udet = plane(1)
            vdet = plane(2)
            sdet = plane(3)
            ml = ml_ref[0, g:g + 1, :]          # [1, ray_tile]
            if cull:
                da, ud, vd, sd = det, udet, vdet, sdet
            else:
                sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                da = det * sgn
                ud = udet * sgn
                vd = vdet * sgn
                sd = sdet * sgn
            # Det-domain accept window (glsl:123-158 semantics): u >= BIAS
            # <=> udet >= BIAS*det for det > 0, etc. — the f32 division
            # (22 ms/traversal at dragon 1080p) drops out of the hot loop.
            # Padded triangles have all-zero W rows -> det == 0 -> invalid.
            # edge=-BIAS on primary casts closes the shared-edge rejection
            # band (see ops.traverse._mt_chunk); da > 0 here, so the
            # scaled comparison keeps its direction for negative edge. It
            # is a runtime SMEM scalar so primary and bounce traversals
            # share one Mosaic program (see ops.intersect_kernel._kernel).
            edge = edge_ref[0]
            valid = da >= BIAS
            valid &= (ud >= edge * da) & (ud <= da)
            valid &= (vd >= edge * da) & (ud + vd <= da)
            valid &= (sd > BIAS * da) & (sd <= ml * da)
            # Distance key: approx reciprocal + one Newton step (~1 ulp) —
            # exact (s, u, v) are recovered post-kernel from the winning
            # triangle's f32 constants (_run), so only argmin order and
            # the early-exit bound (guard-banded) see this key.
            if approx_rcp:
                r = pl.reciprocal(da, approx=True)
                r = r * (2.0 - da * r)
            else:
                r = 1.0 / da
            s_masked = jnp.where(valid, sd * r, POW32)

            tile_best_s = jnp.min(s_masked, axis=0, keepdims=True)
            # global drawable index = tile * tri_tile + row-within-tile,
            # built as a tiny [m, 1] vector from the prefetched worklist
            rows_m1 = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
            gidx = rows_m1
            for k in range(chunk):
                t_k = tl_s[g, c * chunk + k]
                in_k = (rows_m1 >= k * tri_tile) & (rows_m1 < (k + 1) * tri_tile)
                gidx = gidx + jnp.where(in_k, (t_k - k) * tri_tile, 0)
            # reference tie-break: among equal-s rows pick the LOWEST
            # drawable index (glsl iterates id_buffer order, strict '<');
            # padded repeats of a tile in the final partial chunk share
            # one drawable index, so no further uniquifying is needed
            is_best = s_masked <= tile_best_s
            big = np.float32(1 << 26)
            tile_tri = jnp.min(jnp.where(is_best, gidx.astype(jnp.float32),
                                         big), axis=0, keepdims=True)

            prev_s = s_ref[0, g:g + 1, :]
            prev_tri = tri_ref[0, g:g + 1, :].astype(jnp.float32)
            hit_tile = tile_best_s < POW32
            better = (tile_best_s < prev_s) | (
                hit_tile & (tile_best_s == prev_s) & (tile_tri < prev_tri))
            s_ref[0, g:g + 1, :] = jnp.where(better, tile_best_s, prev_s)
            tri_ref[0, g:g + 1, :] = jnp.where(
                better & hit_tile, tile_tri, prev_tri).astype(jnp.int32)

            # exit once no remaining tile can beat any live ray's best:
            # worklist is entry-distance sorted, so the next chunk's first
            # entry bounds everything after it (index clamped: the read
            # happens even on the final chunk — & does not short-circuit)
            worst = jnp.max(jnp.where(live, s_ref[0, g:g + 1, :], 0.0))
            nxt = tm_s[g, jnp.minimum((c + 1) * chunk,
                                      tm_s.shape[1] - 1)]
            cont = jnp.logical_and(c + 1 < nch,
                                   worst * _EXIT_REL + _EXIT_ABS >= nxt)
            if not _PREFETCH_AHEAD:
                @pl.when(cont)
                def _():
                    start_chunk(jax.lax.rem(c + 1, 2), c + 1)
            return (c + 1, cont)

        c_end, _ = jax.lax.while_loop(lambda cr: cr[1], body, (0, True))
        if _PREFETCH_AHEAD:
            wait_chunk(jax.lax.rem(c_end, 2), jnp.minimum(c_end, nch - 1))


def _shadow_kernel(cnt_ref, f_ref, ml_ref, tlist_hbm, w_hbm,
                   hit_ref, w_s, tl_s, sem_w, sem_tl,
                   *, precision, tri_tile: int, ray_tile: int, chunk: int,
                   subtile: int = 1):
    """Any-hit specialization: no closest-hit bookkeeping (one reduction
    instead of five + onehot), and the worklist loop exits as soon as
    every live ray in the tile is occluded — shadow rays in penumbra-free
    regions stop after their first chunk. `subtile` as in _kernel."""
    i = pl.program_id(0)

    hit_ref[:] = jnp.zeros((1, subtile, ray_tile), dtype=jnp.int32)
    tl_dma = pltpu.make_async_copy(tlist_hbm.at[i], tl_s, sem_tl)
    tl_dma.start()
    tl_dma.wait()

    for g in range(subtile):
        _shadow_subtile(cnt_ref, f_ref, ml_ref, w_hbm, hit_ref, w_s, tl_s,
                        sem_w, i, g, precision=precision,
                        tri_tile=tri_tile, ray_tile=ray_tile, chunk=chunk,
                        subtile=subtile)


def _shadow_subtile(cnt_ref, f_ref, ml_ref, w_hbm, hit_ref, w_s, tl_s,
                    sem_w, i, g, *, precision, tri_tile: int,
                    ray_tile: int, chunk: int, subtile: int):
    cnt = cnt_ref[i * subtile + g]
    nch = pl.cdiv(cnt, chunk)
    rsl = slice(g * ray_tile, (g + 1) * ray_tile)
    ml = ml_ref[0, g:g + 1, :]                  # [1, ray_tile]
    dead = ml <= 0.0

    def w_dma(slot, c, k):
        return pltpu.make_async_copy(
            w_hbm.at[tl_s[g, c * chunk + k]],
            w_s.at[slot, k], sem_w.at[slot, k])

    def start_chunk(slot, c):
        for k in range(chunk):
            w_dma(slot, c, k).start()

    def wait_chunk(slot, c):
        for k in range(chunk):
            w_dma(slot, c, k).wait()

    @pl.when(cnt > 0)
    def _():
        start_chunk(0, 0)

        def body(carry):
            c, _ = carry
            slot = jax.lax.rem(c, 2)
            wait_chunk(slot, c)
            if _PREFETCH_AHEAD:
                # prefetch-ahead; see _kernel_subtile
                cp = jnp.minimum(c + 1, nch - 1)
                start_chunk(jax.lax.rem(c + 1, 2), cp)
            ft = f_ref[:, rsl]
            dn = (((0,), (0,)), ((), ()))

            def plane(p):
                parts = [jax.lax.dot_general(
                    w_s[slot, k, p], ft, dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=precision)
                    for k in range(chunk)]
                return jnp.concatenate(parts, axis=0) if chunk > 1 else parts[0]

            det = plane(0)
            udet = plane(1)
            vdet = plane(2)
            sdet = plane(3)
            # det-domain accept window — any-hit needs no distances at
            # all, so the division disappears outright
            valid = (det >= BIAS)               # front-face cull (glsl:143)
            valid &= (udet >= BIAS * det) & (udet <= det)
            valid &= (vdet >= BIAS * det) & (udet + vdet <= det)
            valid &= (sdet > BIAS * det) & (sdet <= ml * det)
            newhit = jnp.any(valid, axis=0, keepdims=True)
            hit_ref[0, g:g + 1, :] = jnp.where(newhit, 1,
                                               hit_ref[0, g:g + 1, :])
            done = jnp.all((hit_ref[0, g:g + 1, :] > 0) | dead)
            cont = jnp.logical_and(jnp.logical_not(done), c + 1 < nch)
            if not _PREFETCH_AHEAD:
                @pl.when(cont)
                def _():
                    start_chunk(jax.lax.rem(c + 1, 2), c + 1)
            return (c + 1, cont)

        c_end, _ = jax.lax.while_loop(lambda cr: cr[1], body, (0, True))
        if _PREFETCH_AHEAD:
            wait_chunk(jax.lax.rem(c_end, 2), jnp.minimum(c_end, nch - 1))


@partial(jax.jit, static_argnames=("interpret", "precision", "tri_tile",
                                   "ray_tile", "chunk", "subtile"))
def _any_hit_sparse(w4t, tlist, counts, ft, max_len,
                    interpret: bool = False,
                    precision=jax.lax.Precision.HIGHEST,
                    tri_tile: int = TRI_TILE, ray_tile: int = RAY_TILE,
                    chunk: int = CHUNK, subtile: int = 1):
    rp = ft.shape[1]
    rt = rp // ray_tile
    ng = rt // subtile
    kdim = w4t.shape[2]
    if w4t.dtype == jnp.bfloat16:
        ft = pack_rhs_x6(ft)
        precision = jax.lax.Precision.DEFAULT
    wtp = tlist.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((kdim, subtile * ray_tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, subtile, ray_tile), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, subtile, ray_tile),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 4, kdim, tri_tile), w4t.dtype),
            pltpu.SMEM((subtile, wtp), jnp.int32),
            pltpu.SemaphoreType.DMA((2, chunk)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    hit = pl.pallas_call(
        partial(_shadow_kernel, precision=precision, tri_tile=tri_tile,
                ray_tile=ray_tile, chunk=chunk, subtile=subtile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ng, subtile, ray_tile), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(counts, ft, max_len.reshape(ng, subtile, ray_tile),
      tlist.reshape(ng, subtile, -1), w4t)
    return hit.reshape(-1)


@partial(jax.jit, static_argnames=("cull", "interpret", "precision",
                                   "tri_tile", "ray_tile", "chunk",
                                   "subtile"))
def _intersect_sparse(w4t, tlist, tms, counts, ft, max_len, cull: bool,
                      interpret: bool = False,
                      precision=jax.lax.Precision.HIGHEST,
                      tri_tile: int = TRI_TILE, ray_tile: int = RAY_TILE,
                      chunk: int = CHUNK, edge=BIAS, subtile: int = 1):
    rp = ft.shape[1]
    rt = rp // ray_tile
    ng = rt // subtile
    kdim = w4t.shape[2]
    if w4t.dtype == jnp.bfloat16:
        ft = pack_rhs_x6(ft)                    # [96, Rp] bf16
        precision = jax.lax.Precision.DEFAULT   # single bf16 pass
    out_shape = [
        jax.ShapeDtypeStruct((ng, subtile, ray_tile), jnp.float32),
        jax.ShapeDtypeStruct((ng, subtile, ray_tile), jnp.int32),
    ]
    out_spec = pl.BlockSpec((1, subtile, ray_tile), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    wtp = tlist.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                  # counts, accept-window edge
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((kdim, subtile * ray_tile), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, subtile, ray_tile), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # tlist rows in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # sorted tmins in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # w4t stays in HBM
        ],
        out_specs=[out_spec] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 4, kdim, tri_tile), w4t.dtype),
            pltpu.SMEM((subtile, wtp), jnp.int32),
            pltpu.SMEM((subtile, wtp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, chunk)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    edge_arr = jnp.asarray(edge, jnp.float32).reshape(1)
    s, tri = pl.pallas_call(
        partial(_kernel, cull=cull, precision=precision, tri_tile=tri_tile,
                ray_tile=ray_tile, chunk=chunk, approx_rcp=not interpret,
                subtile=subtile),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(counts, edge_arr, ft, max_len.reshape(ng, subtile, ray_tile),
      tlist.reshape(ng, subtile, -1), tms.reshape(ng, subtile, -1), w4t)
    return s.reshape(-1), tri.reshape(-1)


def _apply_perm_rays(origin, direction, max_len, perm):
    """Permute rays with ONE row gather: [N]-shaped 1-D gathers run on the
    scalar core (~27 ms per 2M rays, measured); [N, C] row gathers are
    vectorized (~1 ms)."""
    packed = jnp.concatenate(
        [origin, direction, max_len[:, None]], axis=1)[perm]
    packed = jax.lax.optimization_barrier(packed)  # keep slice out of gather
    return packed[:, 0:3], packed[:, 3:6], packed[:, 6]


def _sort_perm(aabb_min, aabb_max, origin, direction, max_len, tri_tile,
               sort_hint, sort_mode, interpret, ray_tile):
    """Wavefront ordering: candidate-aware (nearest2) when requested for
    hinted (bounce/shadow) casts, else the surface-tile/octant key."""
    if sort_mode == "nearest2" and sort_hint is not None:
        if interpret:
            key = _nearest2_key_xla(aabb_min, aabb_max, origin, direction,
                                    max_len)
        else:
            key = nearest2_key(aabb_min, aabb_max, origin, direction,
                               max_len, ray_tile=ray_tile)
        perm = jnp.argsort(key, stable=True)
        return perm, jnp.argsort(perm)
    lo = jnp.min(aabb_min, axis=0)
    hi = jnp.max(aabb_max, axis=0)
    cluster = min(CLUSTER, tri_tile)
    n_tiles = aabb_min.shape[0] * cluster // tri_tile
    return sort_spatial(origin, direction, lo, hi, max_len,
                        prev_tri=sort_hint, tri_tile=tri_tile,
                        n_tiles=n_tiles)


def _run(w4t, w4f, aabb_min, aabb_max, origin, direction, max_len, cull,
         interpret, precision, tri_tile, ray_tile, chunk, sort_rays,
         edge=BIAS, sort_hint=None, sort_mode: str = "prevtile",
         subtile: int = 1):
    from .intersect_kernel import _prep

    if sort_rays:
        perm, inv_perm = _sort_perm(aabb_min, aabb_max, origin, direction,
                                    max_len, tri_tile, sort_hint, sort_mode,
                                    interpret, ray_tile)
        origin, direction, max_len = _apply_perm_rays(
            origin, direction, max_len, perm)
    o, d, ml, n, rt = _prep(origin, direction, max_len, ray_tile * subtile)
    rt = o.shape[0] // ray_tile
    wt = w4t.shape[0]
    if interpret:
        tmins = _tmins_xla(aabb_min, aabb_max, o, d, ml, rt, wt, ray_tile)
    else:
        tmins = flags_sparse(aabb_min, aabb_max, o, d, ml,
                             tri_tile=tri_tile, ray_tile=ray_tile)
    tlist, tms, counts = _compact(tmins, chunk)
    f = _ray_features(o, d)
    s_key, tri = _intersect_sparse(w4t, tlist, tms, counts, f.T, ml,
                                   cull=cull, interpret=interpret,
                                   precision=precision, tri_tile=tri_tile,
                                   ray_tile=ray_tile, chunk=chunk, edge=edge,
                                   subtile=subtile)
    tri = tri[:n]
    # Exact f32 (s, u, v) of the winner: one vectorized row gather of its
    # MT constants + 16-wide dots (channel-major; see _recover_suv) —
    # the kernel's distance is only an approx-reciprocal argmin key and
    # never leaves this function.
    fch = [f[:n, k] for k in range(16)]
    det, udet, vdet, sdet = _recover_suv(w4f, tri, fch, n)
    inv = 1.0 / jnp.where(det != 0.0, det, 1.0)
    hit = tri >= 0
    s = jnp.where(hit, sdet * inv, POW32)
    u = jnp.where(hit, udet * inv, 0.0)
    v = jnp.where(hit, vdet * inv, 0.0)
    if sort_rays:
        packed = jnp.stack(
            [s, u, v, tri.astype(jnp.float32)], axis=1)[inv_perm]
        packed = jax.lax.optimization_barrier(packed)
        s, u, v = packed[:, 0], packed[:, 1], packed[:, 2]
        tri = packed[:, 3].astype(jnp.int32)   # drawable ids < 2^24: exact
    return s, u, v, tri



def _recover_suv(w4f, tri, fch, n):
    """Exact f32 (det, udet, vdet, sdet) of each ray's winning triangle
    from its 64 MT constants + the ray's 16 features.

    Default "legacy" form: the [n, 4, 16] product reduce. The
    "chanmajor" variant (FLEXLIGHT_SPARSE_RECOVERY=chanmajor — one
    transpose + 64 dense-[n] FMAs) measures 3.95 vs 27.2 ms STANDALONE
    (bench_recovery) but regresses the dragon frame 611 -> 1049 ms
    IN-SITU (batch r5c C1/C3): inside the real frame XLA fuses the
    legacy reduce into its consumers while the chanmajor transpose
    serializes against them. Kept as a documented negative result;
    values differ only in f32 summation order (~1 ulp)."""
    import os as _os

    w = jax.lax.optimization_barrier(w4f[jnp.maximum(tri, 0)])   # [n, 64]
    if _os.environ.get("FLEXLIGHT_SPARSE_RECOVERY", "legacy") == "legacy":
        f = jnp.stack(fch, axis=-1)                              # [n, 16]
        dots = (w.reshape(-1, 4, 16) * f[:, None, :]).sum(axis=-1)
        return dots[:, 0], dots[:, 1], dots[:, 2], dots[:, 3]
    wt = w.T                                                     # [64, n]
    outs = []
    for p_ in range(4):
        acc = wt[16 * p_] * fch[0]
        for k in range(1, 16):
            acc = acc + wt[16 * p_ + k] * fch[k]
        outs.append(acc)
    return outs[0], outs[1], outs[2], outs[3]


def _carry_sort(key, cols):
    """Sort `cols` by `key` with ONE multi-operand lax.sort: the payload
    rides the sort network instead of argsort + [N, C] row gathers whose
    7-wide rows pad to full 128-lane tiles (scripts/bench_sort.py).
    Returns (perm, sorted_cols); perm (the carried iota) feeds
    _carry_unsort."""
    iota = jax.lax.iota(jnp.int32, key.shape[0])
    outs = jax.lax.sort((key, iota, *cols), num_keys=1, is_stable=True)
    return outs[1], outs[2:]


def _carry_unsort(perm, cols):
    """Inverse permutation by sorting on `perm` (a permutation of iota —
    unique keys, so the unpermute is exact and stability is irrelevant)."""
    outs = jax.lax.sort((perm, *cols), num_keys=1, is_stable=False)
    return outs[1:]


def _sort_key_soa(aabb_min, aabb_max, o3, d3, max_len, tri_tile,
                  sort_hint, sort_mode, interpret, ray_tile):
    """_sort_perm's ordering as a single int32 key from SoA channels (for
    carry-sorting). The >512-tile two-pass prevtile composite has no
    single-key form — callers route those scenes to the row path."""
    if sort_mode == "nearest2" and sort_hint is not None:
        if interpret:
            return _nearest2_key_xla(aabb_min, aabb_max,
                                     jnp.stack(o3, axis=-1),
                                     jnp.stack(d3, axis=-1), max_len)
        return nearest2_key_soa(aabb_min, aabb_max, o3, d3, max_len,
                                ray_tile=ray_tile)
    lo = jnp.min(aabb_min, axis=0)
    hi = jnp.max(aabb_max, axis=0)
    dead = max_len <= 0.0
    if sort_hint is not None:
        cluster = min(CLUSTER, tri_tile)
        n_tiles = aabb_min.shape[0] * cluster // tri_tile
        if n_tiles > 512:
            raise ValueError("single-key prevtile needs <= 512 tiles; "
                             "use the row (AoS) path for this scene")
        # "history" mode shares the prevtile key formula; its hint is the
        # same pixel's LAST-FRAME hit triangle at this bounce index (a
        # prediction of where the ray is GOING) instead of the surface
        # the ray leaves. Unknown predictions (-1: first frame, or the
        # pixel was dead last frame) group after every known tile but
        # before dead rays.
        tile = sort_hint.astype(jnp.int32) // tri_tile
        tile = jnp.where(sort_hint < 0, jnp.int32(n_tiles), tile)
        key = (tile << 21) | _morton_soa(o3, lo, hi, 7)
        return jnp.where(dead, jnp.int32(1) << 30, key)
    oct_key = ((d3[0] > 0) * 4 + (d3[1] > 0) * 2
               + (d3[2] > 0)).astype(jnp.int32)
    key = (oct_key << 15) | _morton_soa(o3, lo, hi, 5)
    return jnp.where(dead, jnp.int32(1) << 20, key)


def _run_soa(w4t, w4f, aabb_min, aabb_max, o3, d3, max_len, cull,
             interpret, precision, tri_tile, ray_tile, chunk, sort_rays,
             edge=BIAS, sort_hint=None, sort_mode: str = "prevtile",
             subtile: int = 1):
    """_run on SoA ray channels: carry-sorted wavefront (no lane-padded
    [N, C] permute gathers), channel-major features straight into the
    kernel, SoA (s, u, v, tri) out."""
    from .intersect_kernel import _prep_soa, _ray_features_t

    if sort_rays:
        key = _sort_key_soa(aabb_min, aabb_max, o3, d3, max_len, tri_tile,
                            sort_hint, sort_mode, interpret, ray_tile)
        perm, cols = _carry_sort(key, (*o3, *d3, max_len))
        o3, d3, max_len = cols[0:3], cols[3:6], cols[6]
    o3, d3, ml, n, _ = _prep_soa(o3, d3, max_len, ray_tile * subtile)
    rt = o3[0].shape[0] // ray_tile
    if interpret:
        tmins = _tmins_xla(aabb_min, aabb_max, jnp.stack(o3, axis=-1),
                           jnp.stack(d3, axis=-1), ml, rt, w4t.shape[0],
                           ray_tile)
    else:
        rays = _rays8_soa(o3, d3, ml, ray_tile)
        tmins = _flags_call(rays, aabb_min, aabb_max, tri_tile, ray_tile,
                            interpret)
    tlist, tms, counts = _compact(tmins, chunk)
    ft = _ray_features_t(o3, d3)                 # [16, Np] channel-major
    s_key, tri = _intersect_sparse(w4t, tlist, tms, counts, ft, ml,
                                   cull=cull, interpret=interpret,
                                   precision=precision, tri_tile=tri_tile,
                                   ray_tile=ray_tile, chunk=chunk, edge=edge,
                                   subtile=subtile)
    tri = tri[:n]
    # Exact (s, u, v) of the winner — same expression as _run's tail
    # (channel-major, _recover_suv), so values are bit-identical to the
    # row path.
    fch = ([jnp.ones_like(o3[0][:n])] + [c[:n] for c in o3]
           + [c[:n] for c in d3]
           + [d3[c][:n] * o3[k][:n] for c in range(3) for k in range(3)])
    det, udet, vdet, sdet = _recover_suv(w4f, tri, fch, n)
    inv = 1.0 / jnp.where(det != 0.0, det, 1.0)
    hit = tri >= 0
    s = jnp.where(hit, sdet * inv, POW32)
    u = jnp.where(hit, udet * inv, 0.0)
    v = jnp.where(hit, vdet * inv, 0.0)
    if sort_rays:
        s, u, v, tri = _carry_unsort(perm, (s, u, v, tri))
    return s, u, v, tri


@partial(jax.jit, static_argnames=("interpret", "precision", "tri_tile",
                                   "ray_tile", "chunk", "sort_rays",
                                   "sort_mode", "subtile"))
def traverse_sparse_soa(w4t, w4f, aabb_min, aabb_max, o3, d3,
                        interpret: bool = False,
                        precision=jax.lax.Precision.HIGHEST,
                        tri_tile: int = TRI_TILE, ray_tile: int = RAY_TILE,
                        chunk: int = CHUNK, sort_rays: bool = False,
                        alive=None, edge=BIAS, sort_hint=None,
                        sort_mode: str = "prevtile", subtile: int = 1):
    """traverse_sparse with SoA ray channels in and (s, u, v, tri) SoA out
    — same results (see _run_soa), none of the row path's lane-padded
    [N, 3]/[N, 16] temps or permute row gathers."""
    max_len = jnp.full(o3[0].shape, POW32, dtype=jnp.float32)
    if alive is not None:
        max_len = jnp.where(alive, max_len, 0.0)
    s, u, v, tri = _run_soa(w4t, w4f, aabb_min, aabb_max, o3, d3,
                            max_len, False, interpret, precision, tri_tile,
                            ray_tile, chunk, sort_rays, edge=edge,
                            sort_hint=sort_hint, sort_mode=sort_mode,
                            subtile=subtile)
    hit = tri >= 0
    zero = jnp.zeros_like(s)
    return (jnp.where(hit, s, zero), jnp.where(hit, u, zero),
            jnp.where(hit, v, zero),
            jnp.where(hit, tri, -1).astype(jnp.int32))


@partial(jax.jit, static_argnames=("interpret", "precision", "tri_tile",
                                   "ray_tile", "chunk", "sort_rays",
                                   "sort_mode", "subtile"))
def shadow_sparse_soa(w4t, aabb_min, aabb_max, o3, d3, max_len,
                      interpret: bool = False,
                      precision=jax.lax.Precision.HIGHEST,
                      tri_tile: int = TRI_TILE, ray_tile: int = RAY_TILE,
                      chunk: int = CHUNK, sort_rays: bool = False,
                      alive=None, sort_hint=None,
                      sort_mode: str = "prevtile",
                      subtile: int = 1) -> jnp.ndarray:
    """shadow_sparse with SoA ray channels (see traverse_sparse_soa)."""
    from .intersect_kernel import _prep_soa, _ray_features_t

    if alive is not None:
        max_len = jnp.where(alive, max_len, 0.0)
    if sort_rays:
        key = _sort_key_soa(aabb_min, aabb_max, o3, d3, max_len, tri_tile,
                            sort_hint, sort_mode, interpret, ray_tile)
        perm, cols = _carry_sort(key, (*o3, *d3, max_len))
        o3, d3, max_len = cols[0:3], cols[3:6], cols[6]
    o3, d3, ml, n, _ = _prep_soa(o3, d3, max_len, ray_tile * subtile)
    rt = o3[0].shape[0] // ray_tile
    if interpret:
        tmins = _tmins_xla(aabb_min, aabb_max, jnp.stack(o3, axis=-1),
                           jnp.stack(d3, axis=-1), ml, rt, w4t.shape[0],
                           ray_tile)
    else:
        rays = _rays8_soa(o3, d3, ml, ray_tile)
        tmins = _flags_call(rays, aabb_min, aabb_max, tri_tile, ray_tile,
                            interpret)
    tlist, _, counts = _compact(tmins, chunk)
    ft = _ray_features_t(o3, d3)
    hitc = _any_hit_sparse(w4t, tlist, counts, ft, ml, interpret=interpret,
                           precision=precision, tri_tile=tri_tile,
                           ray_tile=ray_tile, chunk=chunk,
                           subtile=subtile)[:n]
    if sort_rays:
        (hitc,) = _carry_unsort(perm, (hitc,))
    return hitc > 0


@partial(jax.jit, static_argnames=("interpret", "precision", "tri_tile",
                                   "ray_tile", "chunk", "sort_rays",
                                   "sort_mode", "subtile"))
def traverse_sparse(w4t, w4f, aabb_min, aabb_max, origin, direction,
                    interpret: bool = False,
                    precision=jax.lax.Precision.HIGHEST,
                    tri_tile: int = TRI_TILE, ray_tile: int = RAY_TILE,
                    chunk: int = CHUNK, sort_rays: bool = False,
                    alive=None, edge=BIAS, sort_hint=None,
                    sort_mode: str = "prevtile", subtile: int = 1) -> Hit:
    """Closest hit of N rays against all triangles; worklist-sparse.

    Hit.triangle is the DRAWABLE index (position in id_buffer order), not
    the geometry slot — map with id_buffer[tri] or use drawable-ordered
    tables downstream. `sort_hint` (optional int32 [N]): the drawable
    index each ray just bounced off; switches the wavefront sort to the
    surface-tile-locality key (see sort_spatial). `sort_mode="nearest2"`
    instead sorts hinted casts by the candidate-aware nearest2_key.
    """
    max_len = jnp.full(origin.shape[:1], POW32, dtype=jnp.float32)
    if alive is not None:
        max_len = jnp.where(alive, max_len, 0.0)
    s, u, v, tri = _run(w4t, w4f, aabb_min, aabb_max, origin, direction,
                        max_len, False, interpret, precision, tri_tile,
                        ray_tile, chunk, sort_rays, edge=edge,
                        sort_hint=sort_hint, sort_mode=sort_mode,
                        subtile=subtile)
    hit = tri >= 0
    suv = jnp.where(hit[:, None], jnp.stack([s, u, v], axis=-1), 0.0)
    return Hit(suv=suv, triangle=jnp.where(hit, tri, -1).astype(jnp.int32))


@partial(jax.jit, static_argnames=("interpret", "precision", "tri_tile",
                                   "ray_tile", "chunk", "sort_rays",
                                   "sort_mode", "subtile"))
def shadow_sparse(w4t, aabb_min, aabb_max, origin, direction, max_len,
                  interpret: bool = False,
                  precision=jax.lax.Precision.HIGHEST,
                  tri_tile: int = TRI_TILE, ray_tile: int = RAY_TILE,
                  chunk: int = CHUNK, sort_rays: bool = False,
                  alive=None, sort_hint=None,
                  sort_mode: str = "prevtile",
                  subtile: int = 1) -> jnp.ndarray:
    """Front-face-culled any-hit within max_len; worklist-sparse with
    per-tile early exit (see _shadow_kernel)."""
    from .intersect_kernel import _prep

    if alive is not None:
        max_len = jnp.where(alive, max_len, 0.0)
    if sort_rays:
        perm, inv_perm = _sort_perm(aabb_min, aabb_max, origin, direction,
                                    max_len, tri_tile, sort_hint, sort_mode,
                                    interpret, ray_tile)
        origin, direction, max_len = _apply_perm_rays(
            origin, direction, max_len, perm)
    o, d, ml, n, rt = _prep(origin, direction, max_len, ray_tile * subtile)
    rt = o.shape[0] // ray_tile
    wt = w4t.shape[0]
    if interpret:
        tmins = _tmins_xla(aabb_min, aabb_max, o, d, ml, rt, wt, ray_tile)
    else:
        tmins = flags_sparse(aabb_min, aabb_max, o, d, ml,
                             tri_tile=tri_tile, ray_tile=ray_tile)
    tlist, _, counts = _compact(tmins, chunk)
    f = _ray_features(o, d)
    hit = _any_hit_sparse(w4t, tlist, counts, f.T, ml, interpret=interpret,
                          precision=precision, tri_tile=tri_tile,
                          ray_tile=ray_tile, chunk=chunk,
                          subtile=subtile)[:n]
    if sort_rays:
        # 4-wide row gather instead of a scalar-core 1-D gather
        hit4 = jnp.tile(hit[:, None].astype(jnp.float32), (1, 4))[inv_perm]
        hit = jax.lax.optimization_barrier(hit4)[:, 0]
    return hit > 0


@partial(jax.jit, static_argnames=("interpret", "precision", "tri_tile",
                                   "ray_tile", "chunk", "sort_rays",
                                   "sort_mode", "subtile"))
def pair_sparse(w4t, w4f, aabb_min, aabb_max,
                shadow_origin, shadow_dir, shadow_max_len,
                bounce_origin, bounce_dir,
                interpret: bool = False,
                precision=jax.lax.Precision.HIGHEST,
                tri_tile: int = TRI_TILE, ray_tile: int = RAY_TILE,
                chunk: int = CHUNK, sort_rays: bool = False,
                shadow_alive=None, bounce_alive=None, edge=BIAS,
                sort_hint=None, sort_mode: str = "prevtile",
                subtile: int = 1):
    """The NEE shadow any-hit and the next-bounce closest hit of one
    bounce iteration, sharing ONE wavefront permutation.

    Both casts leave the same hit point (offset_target == hit + eps*n,
    bounce origin == hit), so one locality key groups both wavefronts;
    running them as separate shadow_sparse/traverse_sparse casts pays the
    sort machinery twice (key pass + argsort + inverse + [N, C] permute
    gathers ~= 15 ms per 2M-ray cast on chip, scripts/bench_sort.py).
    Here: one key (from the bounce ray, whose candidate spread is the
    wider of the two), one packed [N, 14] permute gather, the two casts
    on pre-permuted rays, and one packed [N, 5] unpermute.

    Results are bit-identical to the separate casts (sort keys only
    group work; pinned by test_pair_sparse_matches_separate_casts).
    Returns (Hit for the bounce rays, shadowed bool [N])."""
    sml = shadow_max_len
    if shadow_alive is not None:
        sml = jnp.where(shadow_alive, sml, 0.0)
    bml = jnp.full(bounce_origin.shape[:1], POW32, dtype=jnp.float32)
    if bounce_alive is not None:
        bml = jnp.where(bounce_alive, bml, 0.0)

    inv_perm = None
    if sort_rays:
        perm, inv_perm = _sort_perm(aabb_min, aabb_max, bounce_origin,
                                    bounce_dir, bml, tri_tile, sort_hint,
                                    sort_mode, interpret, ray_tile)
        packed = jnp.concatenate(
            [shadow_origin, shadow_dir, sml[:, None],
             bounce_origin, bounce_dir, bml[:, None]], axis=1)[perm]
        packed = jax.lax.optimization_barrier(packed)
        shadow_origin, shadow_dir, sml = (packed[:, 0:3], packed[:, 3:6],
                                          packed[:, 6])
        bounce_origin, bounce_dir, bml = (packed[:, 7:10], packed[:, 10:13],
                                          packed[:, 13])

    shadowed = shadow_sparse(w4t, aabb_min, aabb_max, shadow_origin,
                             shadow_dir, sml, interpret=interpret,
                             precision=precision, tri_tile=tri_tile,
                             ray_tile=ray_tile, chunk=chunk,
                             sort_rays=False, subtile=subtile)
    s, u, v, tri = _run(w4t, w4f, aabb_min, aabb_max, bounce_origin,
                        bounce_dir, bml, False, interpret, precision,
                        tri_tile, ray_tile, chunk, sort_rays=False,
                        edge=edge, subtile=subtile)
    if sort_rays:
        out = jnp.stack([s, u, v, tri.astype(jnp.float32),
                         shadowed.astype(jnp.float32)], axis=1)[inv_perm]
        out = jax.lax.optimization_barrier(out)
        s, u, v = out[:, 0], out[:, 1], out[:, 2]
        tri = out[:, 3].astype(jnp.int32)      # drawable ids < 2^24: exact
        shadowed = out[:, 4] > 0.0
    hit = tri >= 0
    suv = jnp.where(hit[:, None], jnp.stack([s, u, v], axis=-1), 0.0)
    return Hit(suv=suv, triangle=jnp.where(hit, tri, -1).astype(jnp.int32)), \
        shadowed
