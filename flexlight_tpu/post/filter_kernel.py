"""Pallas TPU kernels for the edge-aware denoise filter passes.

The reference filters (pathtracer_{first,second,final}_filter.glsl) take
37 disc taps at per-pixel offsets ``ivec2(stencil * scale(pixel))`` — a
dynamic gather, which on TPU runs at ~2.5 cycles/row (77M rows per 1080p
pass). These kernels replace the gather with an exact decomposition over
the *integer offsets* the stencil can produce: ``scale`` is bounded per
filter, so tap ``k``'s offset ``trunc(s_k * scale)`` ranges over a small
static set (the staircase of its stencil ray). Enumerating the distinct
reachable offsets at trace time, the contribution of offset ``o`` is

    w    = #taps k with trunc(s_k * scale) == o      (per-pixel count)
    acc += gate(center, img[p + o]) * w * contrib(img[p + o])

(the reference's gate depends only on the neighbor pixel, never the tap,
so taps landing on the same offset share one gated read). Each offset is
a *compile-time constant*, so the shifted read is a static VMEM slice —
the TPU-fast form; no dynamic rolls. The tap counts come from shared
"staircase" arrays ``trunc(s * scale)`` computed once per tile for the
few distinct stencil magnitudes (s ∈ {1, 2, 3}), making each tap test two
integer compares. Offsets whose scale interval does not intersect the
tile's [min, max] scale range are skipped at run time (same flag-skipping
idea as ops.intersect_kernel); the first filter additionally excludes its
passthrough pixels (originalColor.w == 0, first_filter.glsl:96-98) from
the tile range, so fully-passthrough tiles skip every offset.

Every filter input is an rgba8-quantized image (values k/255 — the
reference stores every pass in RGBA8 textures), so the four channels
pack losslessly into one int32 per pixel; the reference's id-equality
gates become single integer compares. Bytes unpack back to the exact
quantized floats (k * f32(1/255)), so the arithmetic is unchanged.

vs the reference's per-tap loop, two float deviations remain, both
absorbed by the rgba8 quantization between passes: the tree-reduction
order of the accumulator differs, and coincident taps add ``w * x``
instead of ``x + ... + x`` (≤1 ulp, only when several taps truncate onto
one offset).

Layout: packed channels-first [5, H, W] int32 with zero halo padding
(zero = rgba 0, matching the gather path's zero out-of-bounds).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax._src.pallas.core as pl_core

from .common import INV_256, quantize_rgba8, reinhard_gamma, shifted
from .filters import STENCIL3, STENCIL3_NO_CENTER

TY = 128
TX = 128
RX = 64  # lane halo: (TX + 2*RX) must be a multiple of 128

INV_255_F32 = np.float32(1.0 / 255.0)

# scale bounds per filter (see scale formulas in filters.py):
#   first : (1 + ow)^2 * 3.5, ow in [0, 1]        -> [3.5, 14]
#   second: 1 + 2*tanh(x), x >= 0                  -> [1, 3)
#   final : 0.7 + 2*tanh(x), x >= 0                -> [0.7, 2.7)
FIRST_BOUNDS = (3.5, 14.0)
SECOND_BOUNDS = (1.0, 3.0)
FINAL_BOUNDS = (0.7, 2.7)

# packed-channel indices
ID, OID, COLOR, IP, OCOLOR = range(5)

# Per-offset pl.when (1) vs unconditional masked updates (0, default
# since the round-5 chip A/B: theater fast chain 48.1 -> 46.8 ms — ~150
# scalar branches per (tile, band) cost more than the masked vector
# updates they skip; equality pinned by test_offset_when_off_matches_on).
_OFFSET_WHEN = os.environ.get("FLEXLIGHT_FILTER_OFFSET_WHEN", "0") != "0"



def pack_rgba8(img: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] f32 with values k/255 -> [...] int32 (b0|b1<<8|b2<<16|b3<<24)."""
    b = jnp.round(img * 255.0).astype(jnp.int32)
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)


def _byte_i(x: jnp.ndarray, i: int) -> jnp.ndarray:
    return lax.shift_right_logical(x, np.int32(8 * i)) & np.int32(0xFF)


def _byte_f(x: jnp.ndarray, i: int) -> jnp.ndarray:
    """Byte i as the exact quantized float k * f32(1/255)."""
    return _byte_i(x, i).astype(jnp.float32) * INV_255_F32


def _rgb_f(x: jnp.ndarray) -> jnp.ndarray:
    """[...] packed -> [3, ...] quantized floats."""
    return jnp.stack([_byte_f(x, 0), _byte_f(x, 1), _byte_f(x, 2)], axis=0)


def _rgba_f(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([_byte_f(x, 0), _byte_f(x, 1), _byte_f(x, 2),
                      _byte_f(x, 3)], axis=0)


_XYZ = np.int32(0x00FFFFFF)


def _xyz_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """rgb-equality of two packed pixels (one int compare)."""
    return (a & _XYZ) == (b & _XYZ)


def _halo_ry(r: int) -> int:
    """Smallest sublane halo >= r keeping (TY + 2*ry) % 8 == 0."""
    return -(-r // 4) * 4


@lru_cache(maxsize=None)
def _offset_table(stencil_key: str, smin: float, smax: float):
    """Enumerate the distinct integer offsets the scaled stencil can
    produce for scale in [smin, smax].

    Each tap's offset trunc(s * scale) is a monotone staircase of scale,
    so a tap reaches each offset over one contiguous scale interval; the
    table records, per offset, the taps that can reach it and the union
    of their intervals (used only for conservative run-time skipping —
    the in-kernel tap masks are exact).

    Returns (entries, max_radius, svals): entries = tuple of
    (oy, ox, union_lo, union_hi, taps) sorted by (oy, ox) with taps a
    tuple of (sy, sx, tap_lo, tap_hi); svals = distinct |s| stencil
    magnitudes."""
    stencil = {"disc37": STENCIL3, "disc36": STENCIL3_NO_CENTER}[stencil_key]
    ts = np.linspace(smin, smax, 400001).astype(np.float32)
    margin = float(ts[1] - ts[0]) * 2.0
    offs = {}
    max_r = 0
    for sy, sx in stencil.astype(np.float32):
        dy = np.trunc(sy * ts).astype(np.int64)
        dx = np.trunc(sx * ts).astype(np.int64)
        code = dy * 100000 + dx
        change = np.flatnonzero(np.diff(code)) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change - 1, [len(ts) - 1]])
        for s0, s1 in zip(starts, ends):
            oy, ox = int(dy[s0]), int(dx[s0])
            lo, hi = float(ts[s0]) - margin, float(ts[s1]) + margin
            e = offs.setdefault((oy, ox), [np.inf, -np.inf, []])
            e[0] = min(e[0], lo)
            e[1] = max(e[1], hi)
            e[2].append((int(sy), int(sx), lo, hi))
            max_r = max(max_r, abs(oy), abs(ox))
    entries = tuple(
        (oy, ox, lo, hi, tuple(taps))
        for (oy, ox), (lo, hi, taps) in sorted(offs.items()))
    svals = tuple(sorted({abs(int(s)) for s in stencil.flatten() if s != 0}))
    return entries, max_r, svals


@lru_cache(maxsize=None)
def _banded_entries(stencil_key: str, smin: float, smax: float,
                    edges: tuple):
    """Partition the offset table into scale bands [e_i, e_{i+1}).

    A tap joins every band its scale interval intersects; the per-pixel
    band-membership mask applied in the kernel makes each (pixel, tap)
    fire in exactly one band, so the bands' partial accumulators sum to
    the unbanded result. Returns a list of (band_lo, band_hi, entries)."""
    entries, _, _ = _offset_table(stencil_key, smin, smax)
    cuts = [-np.inf] + list(edges) + [np.inf]
    bands = []
    for blo, bhi in zip(cuts[:-1], cuts[1:]):
        clo = max(blo, smin)
        chi = min(bhi, smax)
        band = []
        for oy, ox, _, _, taps in entries:
            kept = tuple(t for t in taps if t[2] < chi and t[3] > clo)
            if kept:
                ulo = min(t[2] for t in kept)
                uhi = max(t[3] for t in kept)
                band.append((oy, ox, max(ulo, blo), min(uhi, bhi), kept))
        bands.append((blo, bhi, tuple(band)))
    return bands


def _group_by_ox(entries):
    """entries -> [(ox, lo, hi, [(oy, lo, hi, taps)])] with per-group
    union intervals, for the column-hoisted kernel loop. Hoisting by ox
    (not oy) is what makes the inner loop cheap: the expensive unaligned
    LANE slice happens once per ox-group into VMEM scratch, and each
    (oy, ox) offset then reads the scratch at a sublane offset — plain
    addressing, no vector realignment (measured ~2.8x on the first
    filter's offset set)."""
    by = {}
    for oy, ox, lo, hi, taps in entries:
        g = by.setdefault(ox, [np.inf, -np.inf, []])
        g[0] = min(g[0], lo)
        g[1] = max(g[1], hi)
        g[2].append((oy, lo, hi, taps))
    return [(ox, lo, hi, tuple(sorted(items)))
            for ox, (lo, hi, items) in sorted(by.items())]


class _Nb:
    """Sublane slicer over the per-ox scratch planes, handed to update
    fns: i(k)/f(k) read int/float scratch plane k at this oy offset,
    fs(a, b) reads a contiguous float plane range in one ref load."""

    __slots__ = ("_i", "_f", "_y", "_ty")

    def __init__(self, sc_i, sc_f, oy, ry, ty):
        self._i = sc_i
        self._f = sc_f
        self._y = ry + oy
        self._ty = ty

    def i(self, k: int):
        return self._i[k, self._y:self._y + self._ty, :]

    def f(self, k: int):
        return self._f[k, self._y:self._y + self._ty, :]

    def fs(self, a: int, b: int):
        return self._f[a:b, self._y:self._y + self._ty, :]


def _gated_weight(gate, w):
    """Per-pixel f32 multiplicity of gated taps. ``w`` is None (exactly
    one always-firing tap), bool (one conditional tap) or f32 (count)."""
    if w is None:
        return gate.astype(jnp.float32)
    if w.dtype == jnp.bool_:
        return (gate & w).astype(jnp.float32)
    return jnp.where(gate, w, 0.0)


def _disc_kernel(*args, scale_fn, prep_fn, ctx_fn,
                 init_fn, update_fn, finish_fn, entries, svals,
                 ry: int, rx: int, ty: int, tx: int, band=None,
                 compact: bool = False):
    """Generic disc pass: out refs, then scratch [A, ty, tx] f32
    accumulator + per-ox int/float plane blocks.

    The offset loop is fully unrolled at trace time, hoisted by COLUMN:
    each active ox-group takes ONE unaligned lane slice of the window
    (the expensive realigning read), preps its planes and parks them in
    VMEM scratch; each active (oy, ox) offset then reads the scratch at
    a static sublane offset — plain addressing, no lane realignment.
    Tap tests are two compares against the shared staircase arrays.
    Groups and offsets are predicated on the tile's scale range. (The
    pl.when regions also bound register pressure: one big straight-line
    unroll makes the register allocator spill hundreds of MB.)

    `compact` = banded active-tile compaction: the grid is 1-D over a
    scalar-prefetched tile remap (actives first), inactive programs
    write zeros and their window DMA points at a parked tile shared by
    every inactive program (consecutive equal block indices skip the
    copy), so a band's cost is proportional to its ACTIVE tiles."""
    if compact:
        meta_ref, tlohi_ref, win_ref = args[0], args[1], args[2]
        refs = args[3:]
        p = pl.program_id(0)
        ti = meta_ref[p, 0]
        tj = meta_ref[p, 1]
        is_real = meta_ref[p, 4] == 1
    else:
        tlohi_ref, win_ref = args[0], args[1]
        refs = args[2:]
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        is_real = None
    acc_ref, sc_i_ref, sc_f_ref = refs[-3], refs[-2], refs[-1]
    out_refs = refs[:-3]

    if is_real is not None:
        @pl.when(jnp.logical_not(is_real))
        def _():
            for ref in out_refs:
                ref[:] = jnp.zeros(ref.shape, ref.dtype)

        @pl.when(is_real)
        def _():
            _disc_body(tlohi_ref, win_ref, out_refs, acc_ref, sc_i_ref,
                       sc_f_ref, ti, tj, scale_fn, prep_fn, ctx_fn, init_fn,
                       update_fn, finish_fn, entries, svals, ry, rx, ty, tx,
                       band)
    else:
        _disc_body(tlohi_ref, win_ref, out_refs, acc_ref, sc_i_ref,
                   sc_f_ref, ti, tj, scale_fn, prep_fn, ctx_fn, init_fn,
                   update_fn, finish_fn, entries, svals, ry, rx, ty, tx,
                   band)


def _disc_body(tlohi_ref, win_ref, out_refs, acc_ref, sc_i_ref, sc_f_ref,
               ti, tj, scale_fn, prep_fn, ctx_fn, init_fn, update_fn,
               finish_fn, entries, svals, ry, rx, ty, tx, band):
    center = win_ref[:, ry:ry + ty, rx:rx + tx]    # [5, ty, tx]
    scale = scale_fn(center)                       # [ty, tx] f32
    acc_ref[:] = init_fn(center)
    ctx = ctx_fn(center)

    # staircases trunc(s * scale) for the distinct stencil magnitudes;
    # trunc(-s * scale) == -trunc(s * scale) (GLSL float->int truncates
    # toward zero), so negatives reuse them with a negated target.
    stair = {s: jnp.trunc(np.float32(s) * scale) for s in svals}
    tmin = tlohi_ref[ti, tj, 0]
    tmax = tlohi_ref[ti, tj, 1]
    # scale-band membership: each (pixel, tap) fires in exactly one band
    # of a banded run (see _banded_entries)
    bandm = None
    if band is not None:
        blo, bhi = band
        if np.isfinite(blo) and np.isfinite(bhi):
            bandm = (scale >= np.float32(blo)) & (scale < np.float32(bhi))
        elif np.isfinite(bhi):
            bandm = scale < np.float32(bhi)
        elif np.isfinite(blo):
            bandm = scale >= np.float32(blo)

    def axis_mask(s: int, o: int):
        if s == 0:
            return o == 0  # static: zero-component taps only reach o == 0
        if s > 0:
            return stair[s] == np.float32(o)
        return stair[-s] == np.float32(-o)

    # perf bisection only (WRONG RESULTS): replace every ox-group's
    # unaligned lane slice with the aligned center read, to measure the
    # vector-realignment share of the pass cost
    aligntest = os.environ.get("FLEXLIGHT_FILTER_ALIGNTEST", "") == "1"
    for ox, grp_lo, grp_hi, items in _group_by_ox(entries):
        @pl.when((tmax >= grp_lo) & (tmin <= grp_hi))
        def _(ox=ox, items=items):
            xo = 0 if aligntest else ox
            col = win_ref[:, :, rx + xo:rx + xo + tx]   # [5, TYW, tx]
            int_planes, f32_planes = prep_fn(col)
            for k, v in enumerate(int_planes):
                sc_i_ref[k] = v
            for k, v in enumerate(f32_planes):
                sc_f_ref[k] = v
            # lane-axis tap masks are shared by every offset in the group
            mxs = {}
            for _oy, _olo, _ohi, taps in items:
                for sy, sx, _tlo, _thi in taps:
                    if sx not in mxs:
                        mxs[sx] = axis_mask(sx, ox)
            for oy, olo, ohi, taps in items:
                def _offset_update(oy=oy, ox=ox, taps=taps, mxs=mxs):
                    masks = []
                    for sy, sx, _tlo, _thi in taps:
                        my = axis_mask(sy, oy)
                        mx = mxs[sx]
                        if my is False or mx is False:
                            continue
                        if my is True and mx is True:
                            masks.append(None)
                        elif my is True:
                            masks.append(mx)
                        elif mx is True:
                            masks.append(my)
                        else:
                            masks.append(my & mx)
                    if not masks:
                        return
                    if len(masks) == 1:
                        w = masks[0]
                    else:
                        # None = always-firing tap (s == 0 both axes): 1
                        const = float(sum(1 for m in masks if m is None))
                        arrs = [m.astype(jnp.float32) for m in masks
                                if m is not None]
                        w = arrs[0] if arrs else jnp.zeros_like(scale)
                        for m in arrs[1:]:
                            w = w + m
                        if const:
                            w = w + np.float32(const)
                    if bandm is not None:
                        if w is None:
                            w = bandm
                        elif w.dtype == jnp.bool_:
                            w = w & bandm
                        else:
                            w = jnp.where(bandm, w, 0.0)
                    nb = _Nb(sc_i_ref, sc_f_ref, oy, ry, ty)
                    acc_ref[:] = update_fn(acc_ref[:], ctx, nb, w)

                if _OFFSET_WHEN:
                    pl.when((tmax >= olo) & (tmin <= ohi))(_offset_update)
                else:
                    # unconditional: the in-kernel tap masks are exact
                    # (w = 0 where a tap does not fire), so the per-
                    # offset pl.when is a pure skip optimization — at
                    # ~150 scalar branches per (tile, band) the branch
                    # overhead can exceed the masked vector update
                    # (round-5 A/B knob)
                    _offset_update()

    outs = finish_fn(acc_ref[:], center)
    for ref, val in zip(out_refs, outs):
        ref[:] = val


def _run_disc(imgs_hwc, stencil_key: str, bounds, n_acc: int, out_chs,
              scale_fn, prep_fn, ctx_fn, init_fn, update_fn, finish_fn,
              valid_fn=None, interpret: bool = False,
              ty: int = TY, tx: int = TX, band_edges=None,
              n_int: int = 4, n_f32: int = 4, compact: bool = True,
              packed5=None, chw_out: bool = False):
    """Drive a disc-filter kernel over packed rgba8 images.

    imgs_hwc: (ids, oid, color, ip, ocolor) as [H, W, 4] quantized f32 —
    or None with `packed5` a [5, H, W] int32 already-packed stack (the
    packed-pipeline chain: no per-pass [H, W, 4] relayouts).
    valid_fn: optional per-pixel predicate over the packed image selecting
    pixels whose blur output is actually consumed; excluded pixels do not
    widen the tile scale range (their output must not depend on acc).
    ty/tx: tile shape — smaller ty tightens the per-tile scale range (more
    offset skipping) at the cost of halo overhead.
    band_edges: split the offset table into scale bands compiled as
    separate kernels (bounds Mosaic code size for wide-scale filters);
    the band partials sum in XLA and finish_fn runs there.
    n_int/n_f32: per-ox scratch plane counts (prep_fn's two tuples).
    Returns one [H, W, c] f32 output per out_chs entry — or, with
    `chw_out`, channels-first [c, H, W] (no transpose; the packed chain
    packs bytes straight off these planes)."""
    if packed5 is not None:
        h, w = packed5.shape[1], packed5.shape[2]
    else:
        h, w = imgs_hwc[0].shape[0], imgs_hwc[0].shape[1]
    entries, max_r, svals = _offset_table(stencil_key, *bounds)
    ry = _halo_ry(max_r)
    rx = RX
    assert max_r <= rx, (max_r, rx)

    hp = -(-h // ty) * ty
    wp = -(-w // tx) * tx
    packed = (packed5 if packed5 is not None
              else jnp.stack([pack_rgba8(im) for im in imgs_hwc], axis=0))
    padded = jnp.pad(packed, ((0, 0), (ry, ry + hp - h), (rx, rx + wp - w)))

    # per-tile scale range for offset skipping (zero-padding keeps scale
    # finite; extra activity on edge tiles is harmless)
    packed_full = jnp.pad(packed, ((0, 0), (0, hp - h), (0, wp - w)))
    scale_full = scale_fn(packed_full)
    if valid_fn is not None:
        valid = valid_fn(packed_full)
        s_min = jnp.where(valid, scale_full, np.float32(np.inf))
        s_max = jnp.where(valid, scale_full, -np.float32(np.inf))
    else:
        s_min = s_max = scale_full
    s_min = s_min.reshape(hp // ty, ty, wp // tx, tx).min(axis=(1, 3))
    s_max = s_max.reshape(hp // ty, ty, wp // tx, tx).max(axis=(1, 3))
    tlohi = jnp.stack([s_min, s_max], axis=-1)

    nti, ntj = hp // ty, wp // tx
    grid = (nti, ntj)
    tyw, txw = ty + 2 * ry, tx + 2 * rx
    # Per-filter default (chip A/B 2026-08-19, 1080p: compaction wins the
    # first filter — mixed 30.7 -> 25.3, uniform 17.8 -> 4.6 ms — but
    # costs the second +2.7 and the final +0.2: their scale keys leave
    # too few fully-inactive tiles to repay the remap's arbitrary-order
    # grid). Env var overrides both ways for A/Bs.
    env_compact = os.environ.get("FLEXLIGHT_FILTER_COMPACT", "")
    if env_compact != "":
        compact = env_compact != "0"

    def remap_for(bentries):
        """Per-band tile remap [P, 5] int32 (ti, tj, win_i, win_j, real):
        tiles whose scale range intersects the band's offset-interval
        union first, inactive tiles after — the kernel zero-fills those,
        and their window DMA parks on the first tile in the order so
        consecutive inactive programs skip the copy entirely."""
        blo_u = min(e[2] for e in bentries)
        bhi_u = max(e[3] for e in bentries)
        act = ((s_max >= np.float32(blo_u))
               & (s_min <= np.float32(bhi_u))).reshape(-1)
        order = jnp.argsort(jnp.logical_not(act).astype(jnp.int32),
                            stable=True).astype(jnp.int32)
        ti = order // ntj
        tj = order % ntj
        real = act[order].astype(jnp.int32)
        win_i = jnp.where(real == 1, ti, ti[0])
        win_j = jnp.where(real == 1, tj, tj[0])
        return jnp.stack([ti, tj, win_i, win_j, real], axis=1)

    def call(kernel_entries, band, chans, kinit, kfinish, remap=None):
        out_shape = [jax.ShapeDtypeStruct((oc, hp, wp), jnp.float32)
                     for oc in chans]
        kern = partial(_disc_kernel, scale_fn=scale_fn, prep_fn=prep_fn,
                       ctx_fn=ctx_fn, init_fn=kinit, update_fn=update_fn,
                       finish_fn=kfinish, entries=kernel_entries,
                       svals=svals, ry=ry, rx=rx, ty=ty, tx=tx, band=band,
                       compact=remap is not None)
        scratch = [
            pltpu.VMEM((n_acc, ty, tx), jnp.float32),
            pltpu.VMEM((n_int, tyw, tx), jnp.int32),
            pltpu.VMEM((n_f32, tyw, tx), jnp.float32),
        ]
        if remap is None:
            out_specs = [pl.BlockSpec((oc, ty, tx),
                                      lambda i, j, *_: (0, i, j))
                         for oc in chans]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[pl.BlockSpec(
                    (pl_core.Element(5), pl_core.Element(tyw),
                     pl_core.Element(txw)),
                    lambda i, j, *_: (0, i * ty, j * tx))],
                out_specs=out_specs,
                scratch_shapes=scratch,
            )
            return pl.pallas_call(
                kern, grid_spec=grid_spec, out_shape=out_shape,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel")),
                interpret=interpret,
            )(tlohi, padded)
        out_specs = [pl.BlockSpec(
            (oc, ty, tx), lambda p, m, t: (0, m[p, 0], m[p, 1]))
            for oc in chans]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nti * ntj,),
            in_specs=[pl.BlockSpec(
                (pl_core.Element(5), pl_core.Element(tyw),
                 pl_core.Element(txw)),
                lambda p, m, t: (0, m[p, 2] * ty, m[p, 3] * tx))],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(remap, tlohi, padded)

    if band_edges is None:
        outs = call(entries, None, out_chs, init_fn, finish_fn)
    else:
        bands = _banded_entries(stencil_key, *bounds, tuple(band_edges))
        zero_init = lambda c: jnp.zeros((n_acc,) + c.shape[1:], jnp.float32)
        emit_acc = lambda acc, c: (acc,)
        acc = init_fn(packed_full)
        for blo, bhi, bentries in bands:
            if not bentries:
                continue
            remap = remap_for(bentries) if compact else None
            acc = acc + call(bentries, (blo, bhi), (n_acc,),
                             zero_init, emit_acc, remap=remap)[0]
        outs = finish_fn(acc, packed_full)
    if chw_out:
        return [o[:, :h, :w] for o in outs]
    return [jnp.transpose(o, (1, 2, 0))[:h, :w] for o in outs]


# ---------------------------------------------------------------------------
# first filter (pathtracer_first_filter.glsl) — vote repair + gated blur
# ---------------------------------------------------------------------------

def vote_repair_packed(ids_p: jnp.ndarray, oid_p: jnp.ndarray,
                       ip_w: jnp.ndarray):
    """filters.vote_repair on packed rgba8 pixels — identical outputs on
    quantized inputs (pinned by test_filter_kernel), ~4x less work: every
    id-equality test (first_filter.glsl:60-94 votes) is ONE masked int32
    compare instead of 3-4 float channel compares + an all-reduce, and
    the [H, W, 4, 4] neighbor stacks / take_along_axis of the float path
    disappear (4 shifted [H, W] int planes instead).

    ids_p/oid_p: [H, W] int32 packed; ip_w: [H, W] quantized f32.
    Returns (render_id_packed [H, W] int32, render_ip_w [H, W] f32)."""
    from .filters import STENCIL1

    n_ids = [shifted(ids_p, int(r[0]), int(r[1])) for r in STENCIL1]
    n_oids = [shifted(oid_p, int(r[0]), int(r[1])) for r in STENCIL1]
    n_ipws = [shifted(ip_w, int(r[0]), int(r[1])) for r in STENCIL1]

    votes = []
    for i in range(4):
        gate = n_ipws[i] == 0.0
        v = gate.astype(jnp.int32)
        match_center = (_xyz_eq(n_ids[i], ids_p)) & (n_oids[i] == oid_p)
        v = v + (gate & match_center).astype(jnp.int32)
        for j in range(i + 1, 4):
            pair = (_xyz_eq(n_ids[i], n_ids[j])) & (n_oids[i] == n_oids[j])
            v = v + (gate & pair).astype(jnp.int32)
        votes.append(v)

    max_vote = votes[0]
    voted_id = n_ids[0]
    for i in range(1, 4):
        better = votes[i] >= max_vote
        max_vote = jnp.where(better, votes[i], max_vote)
        voted_id = jnp.where(better, n_ids[i], voted_id)

    oid_w = _byte_i(oid_p, 3)
    repair = (oid_w != 0) & (ip_w != 0.0)
    render_id_p = jnp.where(repair, voted_id, ids_p)
    render_ip_w = jnp.where(repair, (max_vote == 0).astype(jnp.float32),
                            ip_w)
    return render_id_p, render_ip_w


def _first_scale(center):
    return (1.0 + _byte_f(center[OCOLOR], 3)) ** 2 * 3.5


def _first_valid(packed):
    # originalColor.w == 0 pixels pass through (first_filter.glsl:96-98);
    # their blur accumulator is never read.
    return _byte_i(packed[OCOLOR], 3) != 0


# id with its light/shadow byte masked down to the light index: equality
# of (xyz | lightnum) keys folds first_filter.glsl:104's integer
# light/shadow logic into masked int compares (no byte extraction):
#   lightNum != || shadow ==  <=>  !(kl eq) || (full id eq)   given xyz eq
_KL = np.int32(np.uint32(0xFEFFFFFF))


def _first_prep(col):
    contrib = _rgb_f(col[COLOR]) + _rgb_f(col[IP]) * 256.0
    ids = col[ID]
    return ((ids & _XYZ, ids & _KL, ids, col[OID]),
            (contrib[0], contrib[1], contrib[2]))


def _first_ctx(center):
    c_id = center[ID]
    return (c_id & _XYZ, c_id & _KL, c_id, center[OID])


def _first_init(center):
    return jnp.zeros((4,) + center.shape[1:], jnp.float32)


def _first_update(acc, ctx, nb, w):
    c_xyz, c_kl, c_id, c_oid = ctx
    gate = ((nb.i(0) == c_xyz) & (nb.i(3) == c_oid)
            & ((nb.i(1) != c_kl) | (nb.i(2) == c_id)))
    wf = _gated_weight(gate, w)
    return acc + jnp.concatenate(
        [nb.fs(0, 3) * wf[None], wf[None]], axis=0)


def _first_finish(acc, center):
    c_color = _rgba_f(center[COLOR])
    ocw = _byte_f(center[OCOLOR], 3)
    no_blur = ocw == 0.0
    out3 = jnp.where(no_blur[None], c_color[0:3], acc[0:3])
    count = jnp.where(no_blur, 1.0, jnp.maximum(acc[3], 1.0))
    inv = 1.0 / count[None]
    sgn = jnp.sign(c_color[3:4])
    new_color = sgn * jnp.concatenate(
        [jnp.mod(out3 * inv, 1.0), c_color[3:4]], axis=0)
    new_ip3 = sgn * jnp.floor(out3 * inv) * INV_256
    return (quantize_rgba8(new_color), quantize_rgba8(new_ip3))


# The first filter's scale spans [3.5, 14] -> 705 reachable offsets; one
# kernel at that size compiles for tens of minutes. Four scale bands keep
# each kernel ~<=300 offsets; band partials sum exactly (per-pixel band
# membership masks).
FIRST_BAND_EDGES = (5.5, 8.0, 11.0)


def first_filter_tpu(color, ip, ocolor, ids, oid, interpret=False,
                     ty: int = 32, tx: int = TX):
    # ty=32 default from the chip ty-sweep (2026-08-19, compaction on,
    # mixed keys 1080p): 15.1 ms vs 21.1 at ty=64, 23.0 at ty=128 —
    # smaller tiles tighten per-tile scale ranges so compaction skips
    # more; ty=16 exceeds the 1 MB SMEM remap budget.
    """first_filter with the dynamic disc blur in a Pallas kernel and the
    static-stencil vote repair as packed-int XLA (vote_repair_packed).
    Same signature/returns as filters.first_filter. ty/tx tune the tile
    shape: smaller tiles tighten the per-tile scale range (more offset
    skipping) at the cost of halo overhead."""
    render_id_p, render_ip_w = vote_repair_packed(
        pack_rgba8(ids), pack_rgba8(oid), ip[..., 3])
    render_id = jnp.transpose(_rgba_f(render_id_p), (1, 2, 0))
    new_color, new_ip3 = _run_disc(
        (ids, oid, color, ip, ocolor), "disc37", FIRST_BOUNDS,
        n_acc=4, out_chs=(4, 3),
        scale_fn=_first_scale, prep_fn=_first_prep, ctx_fn=_first_ctx,
        init_fn=_first_init, update_fn=_first_update,
        finish_fn=_first_finish, valid_fn=_first_valid,
        interpret=interpret, band_edges=FIRST_BAND_EDGES,
        n_int=4, n_f32=3, ty=ty, tx=tx)
    sgn = jnp.sign(color[..., 3:4])
    ip_w = quantize_rgba8(sgn * render_ip_w[..., None])
    new_ip = jnp.concatenate([new_ip3, ip_w], axis=-1)
    return new_color, new_ip, quantize_rgba8(render_id)


# ---------------------------------------------------------------------------
# second filter (pathtracer_second_filter.glsl)
# ---------------------------------------------------------------------------

def _second_scale(center):
    return 1.0 + 2.0 * jnp.tanh(_byte_f(center[OCOLOR], 3)
                                + _byte_f(center[OID], 3) * 4.0)


def _second_prep(col):
    c = _rgba_f(col[COLOR])
    contrib = jnp.concatenate([c[0:3] + _rgb_f(col[IP]) * 256.0, c[3:4]],
                              axis=0)
    ids, oid = col[ID], col[OID]
    oc = _rgba_f(col[OCOLOR])
    return ((ids, ids & _XYZ, oid & _XYZ),
            (contrib[0], contrib[1], contrib[2], contrib[3],
             _byte_f(col[IP], 3), oc[0], oc[1], oc[2], oc[3],
             _byte_f(oid, 3)))


def _second_ctx(center):
    c_id, c_oid = center[ID], center[OID]
    return (c_id, c_id & _XYZ, c_oid & _XYZ, _byte_f(center[IP], 3),
            _byte_f(c_oid, 3))


def _second_init(center):
    c_color = _rgba_f(center[COLOR])
    c_ip = _rgba_f(center[IP])
    c_ocolor = _rgba_f(center[OCOLOR])
    acc_color = jnp.concatenate(
        [c_color[0:3] + c_ip[0:3] * 256.0, c_color[3:4]], axis=0)
    ones = jnp.ones((1,) + c_color.shape[1:], jnp.float32)
    # acc: acc_color[0:4], count[4], ipw[5], acc_ocolor[6:10], ocount[10]
    return jnp.concatenate(
        [acc_color, ones, c_ip[3:4], c_ocolor, ones], axis=0)


def _second_update(acc, ctx, nb, w):
    c_id, c_id_xyz, c_oid_xyz, c_ipw, c_oidw = ctx
    b_ipw = nb.f(4)

    oid_xyz = nb.i(2) == c_oid_xyz
    full_id = nb.i(0) == c_id
    id_xyz = nb.i(1) == c_id_xyz
    glassy = ((jnp.minimum(c_oidw, nb.f(9)) > 0.1)
              & (full_id | (jnp.maximum(b_ipw, c_ipw) >= 0.1)))
    branch_a = oid_xyz & glassy
    add_color = branch_a | (oid_xyz & ~glassy & id_xyz)

    wa = _gated_weight(branch_a, w)
    wc = _gated_weight(add_color, w)
    return acc + jnp.concatenate([
        nb.fs(0, 4) * wc[None],
        wc[None],
        (b_ipw * wa)[None],
        nb.fs(5, 9) * wa[None],
        wa[None],
    ], axis=0)


def _second_finish(acc, center):
    c_color = _rgba_f(center[COLOR])
    inv = 1.0 / acc[4:5]
    cw = c_color[3:4]
    new_color = cw * jnp.concatenate(
        [jnp.mod(acc[0:3] * inv, 1.0), acc[3:4] * inv], axis=0)
    new_ip = cw * jnp.concatenate(
        [jnp.floor(acc[0:3] * inv) * INV_256, acc[5:6]], axis=0)
    new_ocolor = cw * acc[6:10] / acc[10:11]
    return (quantize_rgba8(new_color), quantize_rgba8(new_ip),
            quantize_rgba8(new_ocolor))


# Real frames are dominated by scale == 1 tiles (no glass, no blur key:
# 1 + 2*tanh(0)); banding + active-tile compaction makes those tiles pay
# the 36-entry low band instead of all 148 offsets.
SECOND_BAND_EDGES = (1.05, 2.0)


def second_filter_tpu(color, ip, ocolor, ids, oid, interpret=False,
                      ty: int = TY, tx: int = TX, compact: bool = False,
                      banded: bool = True):
    """Same signature/returns as filters.second_filter. compact=True pays
    off when the blur key is tile-uniform (filter_mode="fast"); on compat
    per-pixel keys too few tiles go inactive to repay the remap grid.
    banded=False runs ONE unbanded call (the 148-offset table fits one
    Mosaic program): with tile-uniform fast keys each band call costs a
    full program grid, so 3 band sweeps triple the program count for no
    extra skipping — per-offset pl.when on the tile's (single-valued)
    scale range already skips everything a band would."""
    outs = _run_disc(
        (ids, oid, color, ip, ocolor), "disc36", SECOND_BOUNDS,
        n_acc=11, out_chs=(4, 4, 4),
        scale_fn=_second_scale, prep_fn=_second_prep, ctx_fn=_second_ctx,
        init_fn=_second_init, update_fn=_second_update,
        finish_fn=_second_finish, interpret=interpret,
        band_edges=SECOND_BAND_EDGES if banded else None,
        n_int=3, n_f32=10, ty=ty, tx=tx, compact=compact)
    return outs[0], outs[1], outs[2]


# ---------------------------------------------------------------------------
# final filter (pathtracer_final_filter.glsl)
# ---------------------------------------------------------------------------

def _final_scale(center):
    return 0.7 + 2.0 * jnp.tanh(_byte_f(center[OCOLOR], 3)
                                + _byte_f(center[OID], 3) * 4.0)


def _final_prep(col):
    # 255, not 256 (final_filter.glsl:51)
    contrib = _rgba_f(col[COLOR]) + _rgba_f(col[IP]) * 255.0
    oc = _rgb_f(col[OCOLOR])
    oid = col[OID]
    return ((col[ID] & _XYZ, oid & _XYZ),
            (contrib[0], contrib[1], contrib[2], contrib[3],
             _byte_f(col[IP], 3), oc[0], oc[1], oc[2], _byte_f(oid, 3)))


def _final_ctx(center):
    return (center[ID] & _XYZ, center[OID] & _XYZ,
            _byte_f(center[IP], 3), _byte_f(center[OID], 3))


def _final_init(center):
    return jnp.zeros((9,) + center.shape[1:], jnp.float32)


def _final_update(acc, ctx, nb, w):
    c_id_xyz, c_oid_xyz, c_ipw, c_oidw = ctx
    blur_tr = ((jnp.maximum(nb.f(4), c_ipw) != 0.0)
               & (jnp.minimum(c_oidw, nb.f(8)) > 0.0))
    oid_xyz = nb.i(1) == c_oid_xyz
    id_xyz = nb.i(0) == c_id_xyz
    wo = _gated_weight(blur_tr & oid_xyz, w)
    wc = _gated_weight((blur_tr | id_xyz) & oid_xyz, w)
    return acc + jnp.concatenate([
        nb.fs(0, 4) * wc[None],
        wc[None],
        nb.fs(5, 8) * wo[None],
        wo[None],
    ], axis=0)


def _final_finish_factory(hdr: bool):
    def finish(acc, center):
        c_ocolor = _rgb_f(center[OCOLOR])
        count = acc[4]
        ocount = acc[8]
        final = acc[0:3] / jnp.maximum(count, 1.0)[None]
        o_final = jnp.where((ocount == 0.0)[None], c_ocolor,
                            acc[5:8] / jnp.maximum(ocount, 1.0)[None])
        final = final * o_final
        if hdr:
            final = reinhard_gamma(final)
        covered = _byte_f(center[COLOR], 3) > 0.0
        return (jnp.where(covered[None], jnp.clip(final, 0.0, 1.0), 0.0),)
    return finish


# ---------------------------------------------------------------------------
# Packed-pipeline pass variants (round 5). The [H, W, 4] float images the
# legacy wrappers exchange between passes are lane-padded on TPU (minor
# dim 4 -> 128-lane tiles), so every pass paid a [C,H,W] -> [H,W,4]
# transpose + re-pack in XLA — measured 2-4 ms/pass at 1080p, roughly
# HALF the fast-chain cost (scripts/bench_filter_io.py). These variants
# keep the chain on packed [H, W] int32 planes end to end: inputs are
# the packed stack, outputs pack straight off the kernels' channels-first
# planes. Values are IDENTICAL to the legacy wrappers (packing rgba8-
# quantized floats is lossless; pinned by test_filter_kernel).
# ---------------------------------------------------------------------------


def _pack_planes(planes):
    """[H, W] quantized-f32 planes (k/255) -> one packed int32 plane."""
    out = jnp.round(planes[0] * 255.0).astype(jnp.int32)
    for i, p in enumerate(planes[1:], 1):
        out = out | (jnp.round(p * 255.0).astype(jnp.int32) << (8 * i))
    return out


def first_filter_tpu_packed(color_p, ip_p, ocolor_p, ids_p, oid_p,
                            interpret=False, ty: int = 32, tx: int = TX):
    """first_filter_tpu on packed int32 [H, W] planes in and out.
    Returns (color_p, ip_p, render_id_p)."""
    render_id_p, render_ip_w = vote_repair_packed(
        ids_p, oid_p, _byte_f(ip_p, 3))
    packed5 = jnp.stack([ids_p, oid_p, color_p, ip_p, ocolor_p], axis=0)
    new_color, new_ip3 = _run_disc(
        None, "disc37", FIRST_BOUNDS, n_acc=4, out_chs=(4, 3),
        scale_fn=_first_scale, prep_fn=_first_prep, ctx_fn=_first_ctx,
        init_fn=_first_init, update_fn=_first_update,
        finish_fn=_first_finish, valid_fn=_first_valid,
        interpret=interpret, band_edges=FIRST_BAND_EDGES,
        n_int=4, n_f32=3, ty=ty, tx=tx, packed5=packed5, chw_out=True)
    # color.w is rgba8-quantized (>= 0), so sign(w) == (w > 0)
    sgn = (_byte_i(color_p, 3) > 0).astype(jnp.float32)
    ip_w = quantize_rgba8(sgn * render_ip_w)
    return (_pack_planes([new_color[c] for c in range(4)]),
            _pack_planes([new_ip3[0], new_ip3[1], new_ip3[2], ip_w]),
            render_id_p)


def second_filter_tpu_packed(color_p, ip_p, ocolor_p, ids_p, oid_p,
                             interpret=False, ty: int = TY, tx: int = TX,
                             compact: bool = False, banded: bool = True):
    """second_filter_tpu on packed planes. Returns (color_p, ip_p,
    ocolor_p)."""
    packed5 = jnp.stack([ids_p, oid_p, color_p, ip_p, ocolor_p], axis=0)
    outs = _run_disc(
        None, "disc36", SECOND_BOUNDS, n_acc=11, out_chs=(4, 4, 4),
        scale_fn=_second_scale, prep_fn=_second_prep, ctx_fn=_second_ctx,
        init_fn=_second_init, update_fn=_second_update,
        finish_fn=_second_finish, interpret=interpret,
        band_edges=SECOND_BAND_EDGES if banded else None,
        n_int=3, n_f32=10, ty=ty, tx=tx, compact=compact,
        packed5=packed5, chw_out=True)
    return tuple(_pack_planes([o[c] for c in range(4)]) for o in outs)


def final_filter_tpu_packed(color_p, ip_p, ocolor_p, ids_p, oid_p,
                            hdr: bool, interpret=False, ty: int = TY,
                            tx: int = TX, compact: bool = False,
                            banded: bool = True):
    """final_filter_tpu on packed planes in; returns the display image
    [H, W, 3] f32 (the chain's one unavoidable relayout)."""
    packed5 = jnp.stack([ids_p, oid_p, color_p, ip_p, ocolor_p], axis=0)
    outs = _run_disc(
        None, "disc37", FINAL_BOUNDS, n_acc=9, out_chs=(3,),
        scale_fn=_final_scale, prep_fn=_final_prep, ctx_fn=_final_ctx,
        init_fn=_final_init, update_fn=_final_update,
        finish_fn=_final_finish_factory(hdr), interpret=interpret,
        band_edges=FINAL_BAND_EDGES if banded else None,
        n_int=2, n_f32=9, ty=ty, tx=tx, compact=compact,
        packed5=packed5)
    return outs[0]


def tileize_blur_key_packed(ocolor_p, ty: int = 32, tx: int = 128):
    """post.common.tileize_blur_key on a packed plane: byte 3 (the blur
    key) is replaced by its per-tile nonzero mean; bytes 0-2 untouched."""
    w = _byte_f(ocolor_p, 3)
    h, wd = w.shape
    hp = -(-h // ty) * ty
    wp = -(-wd // tx) * tx
    wpad = jnp.pad(w, ((0, hp - h), (0, wp - wd)))
    t = wpad.reshape(hp // ty, ty, wp // tx, tx)
    nz = t > 0.0
    s = jnp.sum(jnp.where(nz, t, 0.0), axis=(1, 3))
    c = jnp.sum(nz, axis=(1, 3)).astype(jnp.float32)
    mean = jnp.round(jnp.clip(s / jnp.maximum(c, 1.0), 0.0, 1.0) * 255.0)
    mean_full = jnp.broadcast_to(
        mean[:, None, :, None].astype(jnp.int32),
        t.shape).reshape(hp, wp)[:h, :wd]
    new_b3 = jnp.where(w > 0.0, mean_full, 0)
    return (ocolor_p & _XYZ) | (new_b3 << 24)


# scale == 0.7 tiles (the no-key common case) reach only 13 offsets.
FINAL_BAND_EDGES = (0.75, 1.6)


def final_filter_tpu(color, ip, ocolor, ids, oid, hdr: bool,
                     interpret=False, ty: int = TY, tx: int = TX,
                     compact: bool = False, banded: bool = True):
    """Same signature/returns as filters.final_filter. compact/banded:
    see second_filter_tpu."""
    outs = _run_disc(
        (ids, oid, color, ip, ocolor), "disc37", FINAL_BOUNDS,
        n_acc=9, out_chs=(3,),
        scale_fn=_final_scale, prep_fn=_final_prep, ctx_fn=_final_ctx,
        init_fn=_final_init, update_fn=_final_update,
        finish_fn=_final_finish_factory(hdr), interpret=interpret,
        band_edges=FINAL_BAND_EDGES if banded else None,
        n_int=2, n_f32=9, ty=ty, tx=tx, compact=compact)
    return outs[0]
