"""Pallas TPU kernels for the edge-aware denoise filter passes.

The reference filters (pathtracer_{first,second,final}_filter.glsl) take
37 disc taps at per-pixel offsets ``ivec2(stencil * scale(pixel))`` — a
dynamic gather, which on TPU runs at ~2.5 cycles/row (77M rows per 1080p
pass). These kernels replace the gather with an exact decomposition: the
offset of tap ``k`` is ``trunc(s_k * scale)`` with ``scale`` bounded per
filter, so each tap can only land on a small set of integer offsets (the
staircase of its stencil ray). Enumerating all (tap, offset) pairs at
trace time, a pair's contribution is

    mask = (trunc(sy*scale) == oy) & (trunc(sx*scale) == ox)
    acc += where(mask, gate(center, img[p + (oy,ox)]) * contrib, 0)

i.e. a *static* shifted read + select — the TPU-fast form. The kernel
keeps an image tile + halo resident in VMEM, realizes each shifted read
as two in-register rotates (``pltpu.roll``; dynamic sublane/lane slices
need 8/128-aligned starts, rotate+static-slice does not), and skips
pairs whose scale interval does not intersect the tile's [min, max]
scale range (same flag-skipping idea as ops.intersect_kernel).

Every filter input is an rgba8-quantized image (values k/255 — the
reference stores every pass in RGBA8 textures), so the four channels
pack losslessly into one int32 per pixel: the per-pair rotates move 5
packed channels instead of 20 floats, and the reference's id-equality
gates become single integer compares. Bytes unpack back to the exact
quantized floats (k * f32(1/255)), so the arithmetic is unchanged.

Pairs iterate in tap order, so per pixel the accumulation visits taps in
the same order as the reference's in-shader loop; only reduction
associativity differs from the jnp gather path (which tree-reduces), and
outputs are rgba8-quantized between passes, absorbing that.

Layout: packed channels-first [5, H, W] int32 with zero halo padding
(zero = rgba 0, matching the gather path's zero out-of-bounds).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax._src.pallas.core as pl_core

from .common import INV_256, quantize_rgba8, reinhard_gamma
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
    """[TY, TX] packed -> [3, TY, TX] quantized floats."""
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
def _pair_table(stencil_key: str, smin: float, smax: float):
    """Enumerate (tap, offset) pairs: all integer offsets each stencil tap
    can produce for scale in [smin, smax], with the scale interval over
    which it produces them.

    Pairs are sorted by row offset ``oy`` so the kernel can hoist the
    (expensive, full-window) sublane roll to once per oy-group; the head
    pair of each group carries the group's union scale interval for
    group-level skipping.

    Returns (pairs_i [P,3] int32 (oy, ox, is_group_head),
    pairs_f [P,8] f32 (sy, sx, oyf, oxf, lo, hi, group_lo, group_hi),
    max_radius)."""
    stencil = {"disc37": STENCIL3, "disc36": STENCIL3_NO_CENTER}[stencil_key]
    ts = np.linspace(smin, smax, 400001).astype(np.float32)
    raw = []
    max_r = 0
    for sy, sx in stencil.astype(np.float32):
        dy = np.trunc(sy * ts).astype(np.int64)
        dx = np.trunc(sx * ts).astype(np.int64)
        code = dy * 100000 + dx
        # first/last scale at which this tap yields each offset
        change = np.flatnonzero(np.diff(code)) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change - 1, [len(ts) - 1]])
        margin = float(ts[1] - ts[0]) * 2.0
        for s0, s1 in zip(starts, ends):
            oy, ox = int(dy[s0]), int(dx[s0])
            raw.append((oy, ox, float(sy), float(sx),
                        float(ts[s0]) - margin, float(ts[s1]) + margin))
            max_r = max(max_r, abs(oy), abs(ox))
    raw.sort(key=lambda r: (r[0], r[1], r[4]))
    groups = {}
    for oy, ox, sy, sx, lo, hi in raw:
        g = groups.setdefault(oy, [np.inf, -np.inf])
        g[0] = min(g[0], lo)
        g[1] = max(g[1], hi)
    pairs_i, pairs_f = [], []
    prev_oy = None
    for oy, ox, sy, sx, lo, hi in raw:
        head = 1 if oy != prev_oy else 0
        prev_oy = oy
        glo, ghi = groups[oy]
        pairs_i.append((oy, ox, head))
        pairs_f.append((sy, sx, float(oy), float(ox), lo, hi, glo, ghi))
    return (np.array(pairs_i, dtype=np.int32),
            np.array(pairs_f, dtype=np.float32), max_r)


def _disc_kernel(pairs_i_ref, pairs_f_ref, tlohi_ref, win_ref, *refs,
                 scale_fn, init_fn, update_fn, finish_fn, n_pairs: int,
                 ry: int, rx: int):
    """Generic disc pass: out refs, then [A, TY, TX] f32 accumulator and
    [5, TY, TXW] int32 row scratch.

    Pairs arrive sorted by oy; the sublane roll (full [5, TYW, TXW]
    window — the expensive move) runs once per oy-group into row_ref,
    skipped when the group's union scale interval misses the tile. Pairs
    then only lane-roll the [5, TY, TXW] row."""
    acc_ref = refs[-2]
    row_ref = refs[-1]
    out_refs = refs[:-2]
    i = pl.program_id(0)
    j = pl.program_id(1)

    win = win_ref[:]                               # [5, TYW, TXW] int32
    center = win[:, ry:ry + TY, rx:rx + TX]        # [5, TY, TX]
    scale = scale_fn(center)                       # [TY, TX] f32
    acc_ref[:] = init_fn(center)

    tyw = win.shape[1]
    txw = win.shape[2]
    tmin = tlohi_ref[i, j, 0]
    tmax = tlohi_ref[i, j, 1]

    def body(p, _):
        active_group = (tmax >= pairs_f_ref[p, 6]) & (tmin <= pairs_f_ref[p, 7])

        @pl.when((pairs_i_ref[p, 2] != 0) & active_group)
        def _():
            oy = pairs_i_ref[p, 0]
            # negative dynamic rotates miscompile on sublanes; cyclic
            # equivalence keeps shifts non-negative
            sh_y = jnp.where(oy > 0, tyw - oy, -oy)
            row_ref[:] = pltpu.roll(win, sh_y, axis=1)[:, ry:ry + TY, :]

        lo = pairs_f_ref[p, 4]
        hi = pairs_f_ref[p, 5]

        @pl.when((tmax >= lo) & (tmin <= hi))
        def _():
            mask = ((jnp.trunc(pairs_f_ref[p, 0] * scale) == pairs_f_ref[p, 2])
                    & (jnp.trunc(pairs_f_ref[p, 1] * scale) == pairs_f_ref[p, 3]))
            ox = pairs_i_ref[p, 1]
            sh_x = jnp.where(ox > 0, txw - ox, -ox)
            nb = pltpu.roll(row_ref[:], sh_x, axis=2)[:, :, rx:rx + TX]
            acc_ref[:] = update_fn(acc_ref[:], center, nb, mask)
        return 0

    lax.fori_loop(0, n_pairs, body, 0, unroll=False)
    outs = finish_fn(acc_ref[:], center)
    for ref, val in zip(out_refs, outs):
        ref[:] = val


def _run_disc(imgs_hwc, stencil_key: str, bounds, n_acc: int, out_chs,
              scale_fn, init_fn, update_fn, finish_fn, interpret: bool = False):
    """Drive a disc-filter kernel over packed rgba8 images.

    imgs_hwc: (ids, oid, color, ip, ocolor) as [H, W, 4] quantized f32.
    Returns one [H, W, c] f32 output per out_chs entry."""
    h, w = imgs_hwc[0].shape[0], imgs_hwc[0].shape[1]
    pairs_i_np, pairs_f_np, max_r = _pair_table(stencil_key, *bounds)
    ry = _halo_ry(max_r)
    rx = RX
    assert max_r <= rx, (max_r, rx)
    n_pairs = pairs_i_np.shape[0]

    hp = -(-h // TY) * TY
    wp = -(-w // TX) * TX
    packed = jnp.stack([pack_rgba8(im) for im in imgs_hwc], axis=0)  # [5,H,W]
    padded = jnp.pad(packed, ((0, 0), (ry, ry + hp - h), (rx, rx + wp - w)))

    # per-tile scale range for pair skipping (zero-padding keeps scale
    # finite; extra activity on edge tiles is harmless)
    scale_full = scale_fn(jnp.pad(packed, ((0, 0), (0, hp - h), (0, wp - w))))
    s_tiles = scale_full.reshape(hp // TY, TY, wp // TX, TX)
    tlohi = jnp.stack([s_tiles.min(axis=(1, 3)), s_tiles.max(axis=(1, 3))],
                      axis=-1)

    grid = (hp // TY, wp // TX)
    out_shape = [jax.ShapeDtypeStruct((oc, hp, wp), jnp.float32)
                 for oc in out_chs]
    out_specs = [pl.BlockSpec((oc, TY, TX), lambda i, j, *_: (0, i, j))
                 for oc in out_chs]
    tyw, txw = TY + 2 * ry, TX + 2 * rx
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[pl.BlockSpec(
            (pl_core.Element(5), pl_core.Element(tyw), pl_core.Element(txw)),
            lambda i, j, *_: (0, i * TY, j * TX))],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((n_acc, TY, TX), jnp.float32),
                        pltpu.VMEM((5, TY, txw), jnp.int32)],
    )
    outs = pl.pallas_call(
        partial(_disc_kernel, scale_fn=scale_fn, init_fn=init_fn,
                update_fn=update_fn, finish_fn=finish_fn, n_pairs=n_pairs,
                ry=ry, rx=rx),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(jnp.asarray(pairs_i_np), jnp.asarray(pairs_f_np), tlohi, padded)
    return [jnp.transpose(o, (1, 2, 0))[:h, :w] for o in outs]


# ---------------------------------------------------------------------------
# first filter (pathtracer_first_filter.glsl) — vote repair + gated blur
# ---------------------------------------------------------------------------

def _first_scale(center):
    return (1.0 + _byte_f(center[OCOLOR], 3)) ** 2 * 3.5


def _first_init(center):
    return jnp.zeros((4,) + center.shape[1:], jnp.float32)


def _first_update(acc, center, nb, mask):
    c_id = center[ID]
    c_idw = _byte_i(c_id, 3)
    gate = (_xyz_eq(nb[ID], c_id)
            & (nb[OID] == center[OID])
            & (((c_idw >> 1) != (_byte_i(nb[ID], 3) >> 1))
               | ((c_idw & 1) == (_byte_i(nb[ID], 3) & 1)))
            & mask)
    contrib = _rgb_f(nb[COLOR]) + _rgb_f(nb[IP]) * 256.0
    gf = gate.astype(jnp.float32)
    return acc + jnp.concatenate(
        [jnp.where(gate[None], contrib, 0.0), gf[None]], axis=0)


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


def first_filter_tpu(color, ip, ocolor, ids, oid, interpret=False):
    """first_filter with the dynamic disc blur in a Pallas kernel; the
    static-stencil vote repair stays in XLA (already fast there).
    Same signature/returns as filters.first_filter."""
    from .filters import vote_repair

    render_id, render_ip_w = vote_repair(color, ip, ocolor, ids, oid)
    new_color, new_ip3 = _run_disc(
        (ids, oid, color, ip, ocolor), "disc37", FIRST_BOUNDS,
        n_acc=4, out_chs=(4, 3),
        scale_fn=_first_scale, init_fn=_first_init,
        update_fn=_first_update, finish_fn=_first_finish,
        interpret=interpret)
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


def _second_update(acc, center, nb, mask):
    c_id = center[ID]
    c_oid = center[OID]
    c_ipw = _byte_f(center[IP], 3)
    b_ipw = _byte_f(nb[IP], 3)

    oid_xyz = _xyz_eq(nb[OID], c_oid)
    full_id = nb[ID] == c_id
    id_xyz = _xyz_eq(nb[ID], c_id)
    glassy = ((jnp.minimum(_byte_f(c_oid, 3), _byte_f(nb[OID], 3)) > 0.1)
              & (full_id | (jnp.maximum(b_ipw, c_ipw) >= 0.1)))
    branch_a = oid_xyz & glassy & mask
    add_color = branch_a | (oid_xyz & ~glassy & id_xyz & mask)

    b_color = _rgba_f(nb[COLOR])
    contrib = jnp.concatenate(
        [b_color[0:3] + _rgb_f(nb[IP]) * 256.0, b_color[3:4]], axis=0)
    return acc + jnp.concatenate([
        jnp.where(add_color[None], contrib, 0.0),
        add_color[None].astype(jnp.float32),
        jnp.where(branch_a, b_ipw, 0.0)[None],
        jnp.where(branch_a[None], _rgba_f(nb[OCOLOR]), 0.0),
        branch_a[None].astype(jnp.float32),
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


def second_filter_tpu(color, ip, ocolor, ids, oid, interpret=False):
    """Same signature/returns as filters.second_filter."""
    outs = _run_disc(
        (ids, oid, color, ip, ocolor), "disc36", SECOND_BOUNDS,
        n_acc=11, out_chs=(4, 4, 4),
        scale_fn=_second_scale, init_fn=_second_init,
        update_fn=_second_update, finish_fn=_second_finish,
        interpret=interpret)
    return outs[0], outs[1], outs[2]


# ---------------------------------------------------------------------------
# final filter (pathtracer_final_filter.glsl)
# ---------------------------------------------------------------------------

def _final_scale(center):
    return 0.7 + 2.0 * jnp.tanh(_byte_f(center[OCOLOR], 3)
                                + _byte_f(center[OID], 3) * 4.0)


def _final_init(center):
    return jnp.zeros((9,) + center.shape[1:], jnp.float32)


def _final_update(acc, center, nb, mask):
    c_ipw = _byte_f(center[IP], 3)
    blur_tr = ((jnp.maximum(_byte_f(nb[IP], 3), c_ipw) != 0.0)
               & (jnp.minimum(_byte_f(center[OID], 3), _byte_f(nb[OID], 3)) > 0.0))
    oid_xyz = _xyz_eq(nb[OID], center[OID])
    id_xyz = _xyz_eq(nb[ID], center[ID])
    o_gate = blur_tr & oid_xyz & mask
    c_gate = (blur_tr | id_xyz) & oid_xyz & mask

    # 255, not 256 (final_filter.glsl:51)
    contrib = _rgba_f(nb[COLOR]) + _rgba_f(nb[IP]) * 255.0
    return acc + jnp.concatenate([
        jnp.where(c_gate[None], contrib, 0.0),
        c_gate[None].astype(jnp.float32),
        jnp.where(o_gate[None], _rgb_f(nb[OCOLOR]), 0.0),
        o_gate[None].astype(jnp.float32),
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


def final_filter_tpu(color, ip, ocolor, ids, oid, hdr: bool,
                     interpret=False):
    """Same signature/returns as filters.final_filter."""
    outs = _run_disc(
        (ids, oid, color, ip, ocolor), "disc37", FINAL_BOUNDS,
        n_acc=9, out_chs=(3,),
        scale_fn=_final_scale, init_fn=_final_init,
        update_fn=_final_update, finish_fn=_final_finish_factory(hdr),
        interpret=interpret)
    return outs[0]
