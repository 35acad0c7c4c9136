"""Pallas TPU kernel for FXAA (modules/fxaa.js:7-137).

The XLA formulation (post.fxaa) materializes eight [H, W, 6(, 4)] shift
stacks plus per-iteration 6-way selects — several GB of HBM traffic at
1080p for what is arithmetically a radius-7 stencil. This kernel computes
the whole pass per full-width image strip with every plane VMEM-resident:
one HBM read of the strip window, one write of the strip.

It also removes the sequential search state. The reference's loop is,
per direction: take one step per iteration while not done, reading
sample k on the k-th taken step, and the positive direction starts only
after the negative one finishes, sharing the 6-iteration budget
(fxaa.js:117-134). That is exactly equivalent to a parallel form over
the static step index:

    active_n(k) = all(not done_n(j) for j < k)              # prefix
    s_n         = sum(active_n)                             # steps taken
    active_p(k) = (k < SEARCH_STEPS - s_n) and all(not done_p(j) for j < k)

so every (direction, step) sample is read exactly once at a static
offset — no dynamic indexing at all. Outputs match post.fxaa to fp
associativity (same expressions, same order).

Dependency radius: search offset 6 + 3x3 blur = 7; halo 8 zero-padding
reproduces fxaa()'s OOB-zero-texel semantics (fxaa.py:40-51).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax._src.pallas.core as pl_core

from .fxaa import (EDGE_THRESHOLD, EDGE_THRESHOLD_MIN, SEARCH_STEPS,
                   SUBPIX_CAP, SUBPIX_TRIM, SUBPIX_TRIM_SCALE)

R = SEARCH_STEPS + 2   # halo: search 6 + blur 1, rounded to 8
TY = 8                 # rows per strip; full image width per program.
                       # Strips are VMEM-bound: the unrolled 12-step span
                       # search keeps ~O(50) [ty, W] planes live, and the
                       # 16 MB scoped-vmem limit caps ty at 8 for W=1920.


def _luma(r, g, a):
    return (g * (0.587 / 0.299) + r) * a


def _fxaa_kernel(win_ref, out_ref, *, ty: int, tx: int):
    win = win_ref[:, :, :]                      # [4, tyw, txw] f32
    tyw, txw = win.shape[1], win.shape[2]

    # window-wide planes -------------------------------------------------
    luma_w = _luma(win[0], win[1], win[3])      # [tyw, txw]

    # 3x3 box blur, valid on the inner [tyw-2, txw-2] region; blur_w
    # coordinate (y, x) = window pixel (y+1, x+1)
    blur_w = sum(win[:, 1 + dy:tyw - 1 + dy, 1 + dx:txw - 1 + dx]
                 for dy in (-1, 0, 1) for dx in (-1, 0, 1)) / 9.0
    blur_luma_w = _luma(blur_w[0], blur_w[1], blur_w[3])

    def lum(dy, dx, ny, nx, oy, ox):
        """luma_w slice at (dy, dx) for a region of shape [ny, nx] whose
        origin is window pixel (oy, ox)."""
        return luma_w[oy + dy:oy + dy + ny, ox + dx:ox + dx + nx]

    # blend_l, valid wherever luma's 3x3 is: same inner region as blur
    iy, ix = tyw - 2, txw - 2
    lc = lum(0, 0, iy, ix, 1, 1)
    l_up = lum(-1, 0, iy, ix, 1, 1)
    l_dn = lum(1, 0, iy, ix, 1, 1)
    l_lf = lum(0, -1, iy, ix, 1, 1)
    l_rt = lum(0, 1, iy, ix, 1, 1)
    cross_min = jnp.minimum(jnp.minimum(l_up, l_lf), jnp.minimum(l_dn, l_rt))
    cross_max = jnp.maximum(jnp.maximum(l_up, l_lf), jnp.maximum(l_dn, l_rt))
    range_min_w = jnp.minimum(lc, cross_min)
    range_max_w = jnp.maximum(lc, cross_max)
    rng_w = range_max_w - range_min_w
    luma_l_w = 0.25 * (l_up + l_lf + l_dn + l_rt)
    range_l_w = jnp.abs(luma_l_w - lc)
    blend_w = jnp.minimum(SUBPIX_CAP, jnp.maximum(
        0.0, range_l_w / jnp.maximum(rng_w, 1e-10) - SUBPIX_TRIM)
        * SUBPIX_TRIM_SCALE)                    # [iy, ix], origin (1, 1)

    # center-tile planes -------------------------------------------------
    def lm(dy, dx):
        return lum(dy, dx, ty, tx, R, R)

    luma = lm(0, 0)
    rng = rng_w[R - 1:R - 1 + ty, R - 1:R - 1 + tx]
    range_max = range_max_w[R - 1:R - 1 + ty, R - 1:R - 1 + tx]
    low_contrast = rng < jnp.maximum(EDGE_THRESHOLD_MIN,
                                     range_max * EDGE_THRESHOLD)

    edge_vert = (
        jnp.abs(0.25 * lm(-1, -1) - 0.5 * lm(-1, 0) + 0.25 * lm(-1, 1))
        + jnp.abs(0.50 * lm(0, -1) - 1.0 * luma + 0.50 * lm(0, 1))
        + jnp.abs(0.25 * lm(1, -1) - 0.5 * lm(1, 0) + 0.25 * lm(1, 1)))
    edge_horz = (
        jnp.abs(0.25 * lm(-1, -1) - 0.5 * lm(0, -1) + 0.25 * lm(1, -1))
        + jnp.abs(0.50 * lm(-1, 0) - 1.0 * luma + 0.50 * lm(1, 0))
        + jnp.abs(0.25 * lm(-1, 1) - 0.5 * lm(0, 1) + 0.25 * lm(1, 1)))
    horz_span = edge_horz >= edge_vert

    luma_mcn = jnp.maximum(
        jnp.maximum(jnp.abs(lm(-1, 0) - luma), jnp.abs(lm(0, 1) - luma)),
        jnp.maximum(jnp.abs(lm(1, 0) - luma), jnp.abs(lm(0, -1) - luma)))
    gradient = jnp.abs(luma_mcn - luma)

    def at(dy, dx):
        """(img rgba, blur rgba, blur_luma, blend) at tile offset."""
        img = [win[c, R + dy:R + dy + ty, R + dx:R + dx + tx]
               for c in range(4)]
        blur = [blur_w[c, R - 1 + dy:R - 1 + dy + ty,
                       R - 1 + dx:R - 1 + dx + tx] for c in range(4)]
        bl_l = blur_luma_w[R - 1 + dy:R - 1 + dy + ty,
                           R - 1 + dx:R - 1 + dx + tx]
        bl = blend_w[R - 1 + dy:R - 1 + dy + ty, R - 1 + dx:R - 1 + dx + tx]
        return img, blur, bl_l, bl

    def span_sample(sign, step):
        """Sample along the span direction at |offset| = step + 1."""
        o = sign * (step + 1)
        ix_, bx, blx, wx = at(0, o)
        iy_, by, bly, wy = at(o, 0)
        img = [jnp.where(horz_span, a, b) for a, b in zip(ix_, iy_)]
        blur = [jnp.where(horz_span, a, b) for a, b in zip(bx, by)]
        bl_l = jnp.where(horz_span, blx, bly)
        bl = jnp.where(horz_span, wx, wy)
        contrib = [fv + (lb - fv) * bl for fv, lb in zip(img, blur)]
        done_at = jnp.abs(bl_l - luma_mcn) >= gradient
        return contrib, done_at

    color = [win[c, R:R + ty, R:R + tx] for c in range(4)]
    count = jnp.ones((ty, tx), jnp.float32)

    # negative direction: prefix-active over static steps
    active = jnp.ones((ty, tx), bool)
    steps_n = jnp.zeros((ty, tx), jnp.float32)
    for k in range(SEARCH_STEPS):
        contrib, done_at = span_sample(-1, k)
        color = [c + jnp.where(active, v, 0.0) for c, v in zip(color, contrib)]
        count = count + active.astype(jnp.float32)
        steps_n = steps_n + active.astype(jnp.float32)
        active = active & ~done_at

    # positive direction: shares the iteration budget (starts after the
    # negative search finishes)
    budget = np.float32(SEARCH_STEPS) - steps_n
    active = jnp.ones((ty, tx), bool)
    for k in range(SEARCH_STEPS):
        contrib, done_at = span_sample(1, k)
        take = active & (np.float32(k) < budget)
        color = [c + jnp.where(take, v, 0.0) for c, v in zip(color, contrib)]
        count = count + take.astype(jnp.float32)
        active = active & ~done_at

    out = [jnp.where(low_contrast, win[c, R:R + ty, R:R + tx],
                     color[c] / count)
           for c in range(4)]
    out_ref[:, :, :] = jnp.stack(out, axis=0)


def fxaa_tpu(img: jnp.ndarray, interpret: bool = False,
             ty: int = TY) -> jnp.ndarray:
    """Drop-in for post.fxaa.fxaa: [H, W, 4] -> [H, W, 4].

    Tiling is full-width y-strips: Mosaic requires the last two dims of
    every block to be (divisible by 8, divisible by 128) OR equal to the
    whole array dim, and overlapping halo windows can't satisfy the
    divisibility arm (tx + 2R and tx can't both be multiples of 128), so
    the width axis is kept whole (the equal-to-dim arm) and only y is
    tiled. Strips also read strictly less halo than 2-D tiles: the x
    halo is fetched once per strip instead of once per tile.
    """
    h, w = img.shape[0], img.shape[1]
    hp = -(-h // ty) * ty
    chw = jnp.transpose(img, (2, 0, 1))
    padded = jnp.pad(chw, ((0, 0), (R, R + hp - h), (R, R)))
    tyw, txw = ty + 2 * R, w + 2 * R

    out = pl.pallas_call(
        partial(_fxaa_kernel, ty=ty, tx=w),
        grid=(hp // ty,),
        in_specs=[pl.BlockSpec(
            (pl_core.Element(4), pl_core.Element(tyw), pl_core.Element(txw)),
            lambda i: (0, i * ty, 0))],
        out_specs=pl.BlockSpec((4, ty, w), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, hp, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(padded)
    return jnp.transpose(out, (1, 2, 0))[:h]
