"""Fused whole-frame path tracing kernel for small scenes.

One Pallas program per ray tile runs the ENTIRE direct-render pipeline —
primary closest-hit, the full bounce loop with reservoir NEE and shadow
rays, Fresnel-chance refraction — with every intermediate in VMEM. The
XLA wavefront path (ops.pathtrace.render_mrt) round-trips dozens of
[N]-wide arrays through HBM per bounce and dispatches 2 traversal
kernels per bounce; here the only HBM traffic is camera rays in and MRT
channels out, and the only dispatch is one program per 512 rays.

The shading arithmetic is NOT duplicated: the kernel body traces the
same oracle-pinned `light_trace` (ops.pathtrace) with three injected
implementations —

- traversal: Möller-Trumbore as [T,16] @ [16, rays] MXU contractions
  against the whole (VMEM-resident) triangle set, the same math as
  ops.traverse_mxu (same accept windows, same first-min tie-breaking);
- material fetch: exact one-hot MXU row gather from the drawable-ordered
  material table;
- id-channel packing: deferred — arctan2 has no Mosaic lowering, so the
  kernel records each bounce's (df, normal, rme) inputs and the packed
  render_id channels are reconstructed OUTSIDE with identical arithmetic
  (same per-bounce sum order).

- texture fetch: per-lane gathers from an atlas cannot lower in Mosaic,
  so SMALL atlases (<= MAX_TEXELS texels — every tiny/1x1-texture scene:
  wave, eth, example2) are sampled by an exact one-hot contraction over
  the whole atlas, with the reference's exact index arithmetic.

Eligibility (checked by `fused_eligible`): the scene's triangle count
fits the in-VMEM tables (<= MAX_TRIS), the light count fits the
unrolled in-kernel reservoir (<= MAX_LIGHTS), and every atlas has
<= MAX_TEXELS texels. Scenes with bigger atlases run the per-bounce
SPLIT pipeline instead (`render_mrt_fused_split`, scheme="fused_split",
second half of this file — since round 4 the DEFAULT scheme for every
<=512-triangle scene): subtile-looped POST kernels (bounce_post + fused
next bounce_pre) around the XLA atlas gathers, loop-carried state
crossing HBM as one packed brick-channel block. Scenes over MAX_TRIS
(dragon) keep the sparse wavefront path.

Equivalence: in interpret mode the kernel traces to the same XLA ops as
scheme="mxu", so tests pin near-exact equality; on real TPU hardware the
transcendental codegen (sin in the hash RNG) may differ from XLA's, with
the same chaotic-pixel consequences the golden harness already budgets
for.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .buffers import SceneBuffers, fetch_tex_val_soa
from .geometry import world_geometry
from .intersect import BIAS, POW32
from .pathtrace import (MRT, INV_255, BounceCarry, BounceSurface,
                        ReservoirPick, ShadeRequest, bounce_apply,
                        bounce_carry_init, bounce_commit, bounce_pre,
                        bounce_post, bounce_shade, bounce_tex,
                        build_material_table, camera_rays,
                        combine_normal_rme_soa, fetch_rows_t, light_trace)
from .traverse_mxu import MATMUL_PRECISION, tri_rows
from . import vec3 as v3

MAX_TRIS = 1024        # w-plane products [Tp, rays] x4 must fit VMEM
MAX_TEXELS = 4096      # one-hot atlas sampling: [texels, rays] per fetch
RAY_TILE = 512
SPLIT_RAY_TILE = 1024  # split pipeline: state crossings amortize grid steps


class _Atlas:
    """In-kernel atlas handle: [3, texels] VMEM value + static dims."""

    __slots__ = ("data", "h", "w")

    def __init__(self, data, h: int, w: int):
        self.data = data
        self.h = h
        self.w = w


MAX_LIGHTS = 256       # in-kernel reservoir: unrolled light loop below
                       # SCAN_LIGHTS_MIN, a Mosaic-lowerable fori_loop with
                       # one-hot row fetch above it (lax.scan cannot lower);
                       # the cap only bounds the sequential in-kernel loop


def _unroll_mode(n_lights: int):
    """In-kernel reservoir mode: unroll below SCAN_LIGHTS_MIN (XLA fuses
    the chain), fori_loop above it (bounded compile time; Mosaic cannot
    lower the scan the wavefront path uses)."""
    from .pathtrace import SCAN_LIGHTS_MIN

    return True if n_lights < SCAN_LIGHTS_MIN else "fori"


def fused_eligible(buffers: SceneBuffers, config=None) -> bool:
    """Scene fits the in-kernel tables and atlas one-hot sampling."""
    atlases = (buffers.albedo_atlas, buffers.pbr_atlas, buffers.tpo_atlas)
    return (buffers.id_buffer.shape[0] <= MAX_TRIS
            and buffers.lights.shape[0] <= MAX_LIGHTS
            and all(a.shape[0] * a.shape[1] <= MAX_TEXELS for a in atlases))


def _pad_rows(a: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.pad(a, [(0, rows - a.shape[0])] + [(0, 0)] * (a.ndim - 1))


def _make_mt_closures(w, tp: int, rt: int):
    """In-kernel Möller-Trumbore closures over the plane-grouped W matrix
    [16, 4Tp]. Same dot orientation as traverse_mxu._mt_products, so
    det/u/v/s match the mxu scheme (plane-grouped columns only permute
    independent output columns); products land [rt, Tp] and the epilogue
    reduces along lanes. Returns (mt_closest, traverse_soa, shadow_soa)
    operating on (1, rt)-shaped SoA tuples with drawable indices."""
    one = jnp.ones((1, rt), jnp.float32)
    cols_iota = lax.broadcasted_iota(jnp.int32, (rt, tp), 1)

    def mt_products(o3, d3):
        comps = [one, o3[0], o3[1], o3[2], d3[0], d3[1], d3[2]]
        comps += [d3[i] * o3[k] for i in range(3) for k in range(3)]
        f = jnp.concatenate(comps, axis=0).T            # [rt, 16]
        prod = jnp.dot(f, w, precision=MATMUL_PRECISION)  # [rt, 4Tp]
        det = prod[:, 0:tp]
        inv = 1.0 / det
        return (det, prod[:, tp:2 * tp] * inv, prod[:, 2 * tp:3 * tp] * inv,
                prod[:, 3 * tp:4 * tp] * inv)

    def mt_closest(o3, d3, edge):
        """traverse_mxu._closest_hit_block semantics; returns drawable
        indices (the material/location tables are drawable-ordered)."""
        det, u, v, s = mt_products(o3, d3)
        valid = (jnp.abs(det) >= BIAS)
        valid &= (u >= edge) & (u <= 1.0)
        valid &= (v >= edge) & (u + v <= 1.0)
        valid &= (s > BIAS)
        s_masked = jnp.where(valid, s, POW32)
        best_s = jnp.min(s_masked, axis=1, keepdims=True)
        # argmin tie-break = lowest column index among the minima
        best_col = jnp.min(jnp.where(s_masked == best_s, cols_iota, tp),
                           axis=1, keepdims=True)
        hit = best_s < POW32
        sel = cols_iota == best_col
        best_u = jnp.sum(jnp.where(sel, u, 0.0), axis=1, keepdims=True)
        best_v = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
        out = (jnp.where(hit, best_s, 0.0), jnp.where(hit, best_u, 0.0),
               jnp.where(hit, best_v, 0.0),
               jnp.where(hit, best_col, -1).astype(jnp.int32))
        return tuple(x.T for x in out)                   # [rt,1] -> (1, rt)

    def traverse_soa(o3, d3, alive=None, hint=None):
        return mt_closest(o3, d3, edge=BIAS)

    def shadow_soa(o3, d3, max_len, alive=None, hint=None):
        det, u, v, s = mt_products(o3, d3)
        valid = (det >= BIAS)
        valid &= (u >= BIAS) & (u <= 1.0)
        valid &= (v >= BIAS) & (u + v <= 1.0)
        valid &= (s > BIAS) & (s <= max_len.T)
        # Mosaic can't legalize tpu.transpose on i1 vectors — reduce and
        # transpose in f32, then compare back to bool.
        anyf = jnp.max(jnp.where(valid, 1.0, 0.0), axis=1, keepdims=True)
        return anyf.T > 0.5

    return mt_closest, traverse_soa, shadow_soa


def _fused_kernel(seed_ref, texw_ref, w_ref, mat_ref, lights_ref, amb_ref,
                  alb_ref, pbr_ref, tpo_ref, rays_ref, out_ref, *,
                  config, n_local: int, sample_offset: float,
                  n_bounce_rec: int, tex_dims):
    tp = w_ref.shape[1] // 4
    rays = rays_ref[0]                                  # [8, rt]
    rt = rays.shape[1]
    random_seed = seed_ref[0]
    texture_width = texw_ref[0]
    zero = jnp.zeros((1, rt), jnp.float32)
    one = jnp.ones((1, rt), jnp.float32)

    w = w_ref[...]                                      # [16, 4Tp] grouped
    mat = mat_ref[...]                                  # [Tp, C]
    rows_iota = lax.broadcasted_iota(jnp.int32, (tp, rt), 0)

    shim = SceneBuffers(
        geometry=None, attributes=None, id_buffer=None, rotations=None,
        shifts=None, lights=lights_ref[...], ambient=amb_ref[0],
        albedo_atlas=_Atlas(alb_ref[...], *tex_dims[0]),
        pbr_atlas=_Atlas(pbr_ref[...], *tex_dims[1]),
        tpo_atlas=_Atlas(tpo_ref[...], *tex_dims[2]),
        texture_width=texture_width)

    def tex_fetch(atlas: _Atlas, u, v, tex_num, default3, tw):
        """fetch_tex_val_soa with the gather as an exact one-hot
        contraction over the whole (small) atlas."""
        h, aw = atlas.h, atlas.w
        miss = tex_num == -1.0
        if h * aw == 1:
            return tuple(jnp.where(miss, d, atlas.data[c, 0])
                         for c, d in enumerate(default3))
        height_factor = jnp.float32(aw) / jnp.float32(h)
        cx = (u + jnp.mod(tex_num, tw)) / tw
        cy = (v + jnp.floor(tex_num / tw)) * height_factor / tw
        px = jnp.floor(jnp.mod(cx, 1.0) * aw).astype(jnp.int32).clip(0, aw - 1)
        py = jnp.floor(jnp.mod(cy, 1.0) * h).astype(jnp.int32).clip(0, h - 1)
        flat = py * aw + px                            # (1, rt)
        iota = lax.broadcasted_iota(jnp.int32, (h * aw, rt), 0)
        onehot = (flat == iota).astype(jnp.float32)
        sampled = jnp.dot(atlas.data, onehot,
                          precision=MATMUL_PRECISION)  # [3, rt]
        return tuple(jnp.where(miss, d, sampled[c:c + 1])
                     for c, d in enumerate(default3))

    mt_closest, traverse_soa, shadow_soa = _make_mt_closures(w, tp, rt)

    def fetch_rows(table, idx):
        onehot = (idx == rows_iota).astype(table.dtype)     # [Tp, rt]
        rows = jnp.dot(table.T, onehot, precision=MATMUL_PRECISION)
        return rows[:, None, :]                             # [C, 1, rt]

    def pack_id_stub(n3, rough, metal, emis):
        return (zero, zero, zero)

    records = []

    def bounce_hook(i, df, n3, rough, metal, emis):
        if len(records) <= i:
            records.append([])
        records[i] = [df.astype(jnp.float32), n3[0], n3[1], n3[2],
                      rough, metal, emis]

    # camera origin/direction/ndc for this tile (packed as sublanes)
    o3 = (rays[0:1], rays[1:2], rays[2:3])
    d3 = (rays[3:4], rays[4:5], rays[5:6])
    ndc2 = (rays[6:7], rays[7:8])

    # primary hits use the relaxed edge window (see render_mrt)
    ps, pu, pv, ptri = mt_closest(o3, d3, edge=-BIAS)
    primary_parts = (ps, pu, pv, ptri)

    aux = ((zero, zero, zero, zero), (zero, zero, zero, zero),
           zero, zero, zero, one)
    total = (zero, zero, zero)
    original_color = (one, one, one)
    original_tpo_x = zero
    # render_id[0:3] accumulates ACROSS samples (aux is carried), so the
    # packing inputs are emitted per (sample, bounce), sample-major —
    # matching the reconstruction order in render_mrt_fused.
    sample_records = []
    for s in range(n_local):
        records.clear()
        cos_sample_n = jnp.cos(jnp.float32(s) + jnp.float32(sample_offset))
        color, original_color, original_tpo_x, aux = light_trace(
            shim, mat, primary_parts, o3, d3, ndc2, cos_sample_n, config,
            random_seed, traverse_soa, shadow_soa, aux,
            fetch_rows_fn=fetch_rows, pack_id_fn=pack_id_stub,
            bounce_hook=bounce_hook,
            force_unroll_lights=_unroll_mode(lights_ref.shape[0]),
            tex_fetch_fn=tex_fetch)
        total = v3.add3(total, color)
        sample_records.extend(list(r) for r in records)

    final_color = v3.scale3(total, 1.0 / config.samples_per_ray)
    render_id, _oid_acc, glass, rme_x, original_tpo_x, frl = aux

    chans = [
        final_color[0], final_color[1], final_color[2],
        original_color[0], original_color[1], original_color[2],
        original_tpo_x, glass, rme_x, frl,
        render_id[3],
        ptri.astype(jnp.float32), pu, pv,
    ]
    for rec in sample_records:
        chans.extend(rec)
    # pad to the static (8-aligned) channel count (Mosaic block shapes)
    while len(chans) < out_ref.shape[1]:
        chans.append(zero)
    out_ref[0] = jnp.concatenate(chans, axis=0)


class _ValRef:
    """Array-as-ref shim so _fused_kernel can run OUTSIDE pallas (the
    `pallas=False` test/debug mode — same trace, whole image as one tile,
    fused by XLA). Interpret-mode Pallas evaluates per-op, which changes
    sin codegen, which the hash RNG amplifies into flipped pixels — so
    exact-equivalence tests vs the wavefront schemes must run the kernel
    function under plain XLA, where it matches scheme="mxu" bit-for-bit
    (tests/test_fused.py)."""

    def __init__(self, v):
        self.v = jnp.asarray(v)

    @property
    def shape(self):
        return self.v.shape

    def __getitem__(self, idx):
        return self.v[idx]


class _OutRef:
    def __init__(self, shape):
        self.shape = shape

    def __setitem__(self, idx, val):
        assert idx == 0
        self.val = val


def render_mrt_fused(buffers: SceneBuffers, width: int, height: int,
                     camera_pos, view_matrix, config, random_seed,
                     row0=0, rows: int | None = None, sample_offset=0.0,
                     local_samples: int | None = None,
                     with_raw_aux: bool = False, interpret: bool | None = None,
                     ray_tile: int | None = None, pallas: bool = True):
    """Drop-in for ops.pathtrace.render_mrt(scheme="fused")."""
    assert fused_eligible(buffers), "scene not eligible for the fused kernel"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rt = ray_tile or int(os.environ.get("FLEXLIGHT_FUSED_RAY_TILE", "0")) or RAY_TILE

    world_geom = world_geometry(buffers)
    det, udet, vdet, sdet = tri_rows(world_geom, buffers.id_buffer)
    t = det.shape[0]
    tp = max(-(-t // 128) * 128, 128)
    # plane-grouped [16, 4Tp]: columns [det | udet | vdet | sdet]
    w_grouped = jnp.concatenate(
        [_pad_rows(x, tp) for x in (det, udet, vdet, sdet)], axis=0).T
    mat = _pad_rows(build_material_table(buffers, world_geom)[buffers.id_buffer], tp)
    # atlases as [3, texels] (lane-major) + static dims for the in-kernel
    # one-hot sampler
    atlases = (buffers.albedo_atlas, buffers.pbr_atlas, buffers.tpo_atlas)
    tex_dims = tuple((a.shape[0], a.shape[1]) for a in atlases)
    atlas2d = tuple(a.reshape(-1, a.shape[-1]).T for a in atlases)
    loc_geometry = buffers.geometry[buffers.id_buffer]

    n_rows = height if rows is None else rows
    origin, direction, ndc = camera_rays(width, height, camera_pos,
                                         view_matrix, row0=row0, rows=n_rows)
    n = origin.shape[0]
    if not pallas:
        rt = -(-n // 128) * 128  # whole image as one tile
    pad = (-n) % rt
    g = (n + pad) // rt

    def grid_arr(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(g, rt)

    o_t, d_t, ndc_t = origin.T, direction.T, ndc.T
    # camera rays packed channel-as-sublane: [G, 8, rt] (Mosaic block
    # shapes must have 8/128-divisible trailing dims)
    rays_in = jnp.stack(
        [grid_arr(o_t[0]), grid_arr(o_t[1]), grid_arr(o_t[2]),
         grid_arr(d_t[0]), grid_arr(d_t[1]), grid_arr(d_t[2], 1.0),
         grid_arr(ndc_t[0]), grid_arr(ndc_t[1])], axis=1)

    n_local = config.samples_per_ray if local_samples is None else local_samples
    n_bounce_rec = config.max_reflections * n_local
    n_chan_real = 14 + 7 * n_bounce_rec
    n_chan = -(-n_chan_real // 8) * 8

    full = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            full((16, 4 * tp)),
            full((tp, mat.shape[1])),
            full(tuple(buffers.lights.shape)),
            full((1, 3)),
            full(tuple(atlas2d[0].shape)),
            full(tuple(atlas2d[1].shape)),
            full(tuple(atlas2d[2].shape)),
            pl.BlockSpec((1, 8, rt), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_chan, rt), lambda i, *_: (i, 0, 0)),
    )
    kernel = partial(_fused_kernel, config=config, n_local=n_local,
                     sample_offset=float(sample_offset),
                     n_bounce_rec=n_bounce_rec, tex_dims=tex_dims)
    args = (jnp.asarray(random_seed, jnp.float32).reshape(1),
            jnp.asarray(buffers.texture_width, jnp.float32).reshape(1),
            w_grouped, mat, buffers.lights, buffers.ambient.reshape(1, 3),
            *atlas2d)
    if pallas:
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((g, n_chan, rt), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(*args, rays_in)
        chan = jnp.moveaxis(out, 1, 0).reshape(n_chan, -1)[:, :n]  # [C, N]
    else:
        oref = _OutRef((1, n_chan, rt))
        kernel(*[_ValRef(a) for a in args], _ValRef(rays_in), oref)
        chan = oref.val[:, :n]
    fields = [chan[i] for i in range(14)]
    records = []
    for k in range(n_bounce_rec):
        base = 14 + 7 * k
        records.append((chan[base] > 0.0,
                        (chan[base + 1], chan[base + 2], chan[base + 3]),
                        chan[base + 4], chan[base + 5], chan[base + 6]))
    return _mrt_from_channels(fields, records, loc_geometry, camera_pos,
                              config, with_raw_aux)


def _mrt_from_channels(fields, records, loc_geometry, camera_pos, config,
                       with_raw_aux: bool):
    """Shared MRT assembly for the fused paths: reconstructs the deferred
    render_id packing from per-(sample, bounce) records with light_trace's
    exact accumulation order, computes the primary-hit location channel
    (glsl:641-642), and applies the coverage masks (glsl:601-646)."""
    (fc0, fc1, fc2, oc0, oc1, oc2, otpo, glass, rme_x, frl, idw,
     ptri_f, pu, pv) = fields
    n = fc0.shape[0]
    ptri = ptri_f.astype(jnp.int32)
    covered = ptri != -1

    rid = (jnp.zeros_like(idw),) * 3
    n_bounces = config.max_reflections
    for k, (df, n3, rough, metal, emis) in enumerate(records):
        i = k % n_bounces                # records are sample-major
        idu = combine_normal_rme_soa(n3, rough, metal, emis)
        scale_i = 2.0 ** -i
        rid = tuple(rid[c] + jnp.where(df, scale_i * idu[c], 0.0)
                    for c in range(3))

    # location id from the primary hit (glsl:641-642), drawable-ordered
    lrow = fetch_rows_t(loc_geometry, jnp.maximum(ptri, 0))      # [12, N]
    puvw = (1.0 - pu - pv, pu, pv)
    rel_pos = (jnp.zeros_like(pu),) * 3
    for k in range(3):
        lv = (lrow[3 * k], lrow[3 * k + 1], lrow[3 * k + 2])
        rel_pos = v3.add3(rel_pos, v3.scale3(lv, puvw[k]))
    cam3 = tuple(jnp.broadcast_to(camera_pos[c], pu.shape) for c in range(3))
    div = jnp.maximum(2.0 * v3.norm3(v3.sub3(rel_pos, cam3)), 1e-30)
    loc3 = tuple(jnp.mod(rel_pos[c], div) / div for c in range(3))

    covf = covered[:, None]
    zero3 = jnp.zeros((n, 3), dtype=jnp.float32)
    render_id4 = jnp.stack([rid[0], rid[1], rid[2], idw + INV_255], axis=-1)
    location_id4 = jnp.stack(
        [loc3[0], loc3[1], loc3[2], jnp.full((n,), INV_255)], axis=-1)
    mrt = MRT(
        color=jnp.where(covf, jnp.stack([fc0, fc1, fc2], axis=-1), zero3),
        glass=jnp.where(covered, glass, 0.0),
        original_color=jnp.where(covf, jnp.stack([oc0, oc1, oc2], axis=-1),
                                 zero3),
        original_w=jnp.where(covered, jnp.minimum(rme_x, frl) + INV_255, 0.0),
        render_id=jnp.where(covf, render_id4, jnp.zeros((n, 4))),
        original_id_w=jnp.where(covered, otpo + INV_255, 0.0),
        location_id=jnp.where(covf, location_id4, jnp.zeros((n, 4))),
        alpha=covered.astype(jnp.float32),
    )
    if with_raw_aux:
        return mrt, (rme_x, frl)
    return mrt


# ---------------------------------------------------------------------------
# Split per-bounce pipeline — big-atlas scenes (theater class).
#
# The whole-frame kernel above needs every atlas VMEM-resident, which caps
# it at MAX_TEXELS. Scenes with real textures (theater: 3 multi-megatexel
# atlases over 20 triangles) instead run each bounce as
#
#     POST kernel  (bounce_post: shading frame, reservoir NEE + in-kernel
#                   shadow ray, radiance, next direction, next closest hit
#                   + FUSED bounce_pre(i+1): importance kill + one-hot
#                   material fetch + interp)
#  -> XLA          (the three atlas gathers of bounce_tex — arbitrary size)
#
# plus one i0 kernel per sample (primary closest hit + carry init +
# bounce_pre(0)). The whole inter-kernel contract is ONE packed
# [G, SP_C, rt] f32 block that stays in HBM untouched between launches;
# XLA reads only the texin slice (atlas uv/ids) and writes only the
# [G, SP_TEX, rt] tex block, so per-bounce host-graph glue is ~11 channel
# packs instead of a full-state repack (v1 of this pipeline repacked ~45
# channels twice per bounce and lost its chip A/B to program-launch
# overhead at rt=1024 — 2025 programs x ~23 us x 6 kernels; see
# docs/PERF.md r2b).
#
# v2 structural changes (round 4):
#  - in-program subtile loop: each Mosaic program walks `subtile`
#    consecutive rt-ray state slices (grid = G/subtile), so rays/program
#    reach 8192 at constant per-step VMEM — the same trick as
#    intersect_sparse/_intersect_ft;
#  - ONE Mosaic post program serves every bounce: the bounce index rides
#    scalar prefetch (i, 2^-i exact from host) and bounce_shade's traced-i
#    path masks the i==0/i==1 branches — no per-bounce program variants
#    (the r2 accept-window lesson: variants of a hot kernel regress) and
#    a 5x smaller Mosaic compile;
#  - bounce_pre(i+1) and the next closest hit always run (also after the
#    final bounce, where their outputs are dead) to keep the single
#    program — the waste is one MT cast + interp per frame.
#
# The shading arithmetic is the same oracle-pinned bounce_pre/bounce_tex/
# bounce_post stage functions light_trace itself is composed of; id
# packing is deferred exactly as in the whole-frame kernel (records
# reconstructed by _mrt_from_channels). Semantics anchor: bounce loop
# /root/reference/shaders/pathtracer_fragment.glsl:464-599.
# ---------------------------------------------------------------------------

N_CARRY = 29


def fused_split_eligible(buffers: SceneBuffers, config=None) -> bool:
    """Triangle tables fit VMEM; atlases are unconstrained (fetched by
    XLA gathers between the kernels). Same light cap as the whole-frame
    kernel (the POST kernel unrolls the reservoir loop)."""
    return (buffers.id_buffer.shape[0] <= MAX_TRIS
            and buffers.lights.shape[0] <= MAX_LIGHTS)


def _carry_to_channels(c: BounceCarry):
    """BounceCarry -> N_CARRY same-shaped f32 channels. render_id[0:3] and
    original_id_acc are dropped: the split kernels run with the id packing
    stubbed (arctan2 has no Mosaic lowering), so those stay zero in-kernel
    and are reconstructed outside from the per-bounce records."""
    return [
        c.alive.astype(jnp.float32), c.tri.astype(jnp.float32),
        c.hs, c.hu, c.hv,
        *c.ray_origin, *c.ray_dir, *c.last_hit_point,
        *c.importancy, *c.original_color,
        c.dont_filter.astype(jnp.float32),
        *c.final_color,
        c.render_id[3], c.glass, c.original_rme_x, c.original_tpo_x,
        c.first_ray_length,
    ]


def _carry_from_channels(ch, zero) -> BounceCarry:
    z4 = (zero, zero, zero, zero)
    return BounceCarry(
        alive=ch[0] > 0.0, tri=ch[1].astype(jnp.int32),
        hs=ch[2], hu=ch[3], hv=ch[4],
        ray_origin=(ch[5], ch[6], ch[7]), ray_dir=(ch[8], ch[9], ch[10]),
        last_hit_point=(ch[11], ch[12], ch[13]),
        importancy=(ch[14], ch[15], ch[16]),
        original_color=(ch[17], ch[18], ch[19]),
        dont_filter=ch[20] > 0.0,
        final_color=(ch[21], ch[22], ch[23]),
        render_id=(zero, zero, zero, ch[24]), original_id_acc=z4,
        glass=ch[25], original_rme_x=ch[26], original_tpo_x=ch[27],
        first_ray_length=ch[28])


# Split block channel layout: ONE [G, SP_C, rt] f32 block is the whole
# inter-kernel contract. Kernels consume the [0, SP_IN) prefix of the
# previous block; XLA consumes the texin/rec/ppart slices.
SP_SURF0 = N_CARRY       # m, smooth_normal xyz, geometry_offset (5)
SP_PPART0 = N_CARRY + 5  # primary ps, pu, pv, ptri (MRT assembly + resample)
SP_IN = 40               # kernel-consumed prefix (38 used + 2 pad)
SP_TEXIN0 = 40           # bary_u, bary_v, tex_nums3, inline alb/rme/tpo (14)
SP_REC0 = 54             # df, normal3, rough, metal, emis (id packing, 7)
SP_C = 64                # padded block channel count
SP_TEX = 16              # XLA->kernel: albedo3, rough, metal, emis, tpo3,
                         # ndc2 (11 used + 5 pad)
SP_SUBTILE = 8           # state slices walked per Mosaic program


def _sp_texin_channels(s: BounceSurface):
    return [s.bary_u, s.bary_v, *s.tex_nums, *s.inline_albedo,
            *s.inline_rme, *s.inline_tpo]


# In-kernel texture pipeline (flavor 3, round 4). The r4k chip ablation
# put the XLA tex stage at ~51 ms of theater's 104 ms direct frame —
# dominated not by the one unavoidable big-table gather (~4.3 ms/bounce)
# but by the per-bounce XLA index arithmetic, slot one-hots and channel
# packing around THREE fetch_tex_val_table pipelines. Since bounce_pre
# (i+1) already runs fused inside post(i), the surface (uv, tex ids,
# inline defaults) is in registers there — so the whole fetch arithmetic
# moves in-kernel: small texel lists sample via exact one-hot MXU
# contractions; a big list (theater's 262k-texel albedo) gets its flat
# index computed in-kernel and only the [K, 3] u8 row gather stays in
# XLA. Integer // and % are emulated in f32 (exact: all operands are
# < 2^24 for the tile geometries involved — see _sp_fetch_table).
SP3_ALBREQ = 40   # idx_f, miss_f, inline_albedo3 (xla-gathered table)
SP3_TEXVAL = 45   # albedo3 (in-kernel modes), rough, metal, emis, tpo3
SP3_REC = 54      # df, normal3, rough, metal, emis
SP3_IN = 54       # kernel-consumed prefix in flavor 3
SP_TEX3 = 8       # XLA->kernel: albedo3 (xla mode), ndc2, pad


def _sp_tex_modes(buffers: SceneBuffers):
    """Static per-table fetch mode for the in-kernel tex pipeline, or
    None when a table's geometry needs the legacy XLA bounce_tex flavor.
    Only the albedo table may defer its texel gather to XLA (its index
    still computes in-kernel)."""
    tabs = (buffers.albedo_tab, buffers.pbr_tab, buffers.tpo_tab)
    if any(t is None for t in tabs):
        return None
    modes = []
    for t in tabs:
        k, ns = int(t.texels.shape[0]), int(t.tile_info.shape[0])
        if k == 1:
            modes.append(("inline", ns, k))
        elif k <= 512 and ns <= 64:
            modes.append(("onehot", ns, k))
        elif ns <= 64:
            modes.append(("xla", ns, k))
        else:
            return None
    if modes[1][0] == "xla" or modes[2][0] == "xla":
        return None
    return tuple(modes)


def _sp_table_args(tab, mode):
    """(texelsT [3, Kp] f32 | zeros, infoT [3, Sp] f32) kernel inputs."""
    info = tab.tile_info.astype(jnp.float32).T            # [3, S]
    sp = -(-info.shape[1] // 128) * 128
    info_t = jnp.pad(info, ((0, 0), (0, sp - info.shape[1])))
    if mode == "xla":
        tex_t = jnp.zeros((3, 128), jnp.float32)
    else:
        tex = tab.texels.astype(jnp.float32)
        if tab.texels.dtype == jnp.uint8:
            tex = tex * jnp.float32(1.0 / 255.0)
        kp = -(-tex.shape[0] // 128) * 128
        tex_t = jnp.pad(tex.T, ((0, 0), (0, kp - tex.shape[0])))
    return tex_t, info_t


def _sp_fetch_table(tex_t, info_t, meta5, u, v, tex_num, default3, *,
                    mode: str, n_slots: int, n_texels: int):
    """fetch_tex_val_table (ops/buffers.py:140) inside a Mosaic kernel.
    Ray operands are dense (rb, 128) BRICKS (round 5: the original
    (1, rt) lane-row form ran every elementwise op at 1/8 VPU
    throughput — the same diagnosis as the fused_split brick relayout);
    meta5 = (std_w, std_h, tpr, h, w) as traced f32 scalars (values
    < 2^24, exact). Gathers become one-hot MXU contractions over
    lane-flattened indices; // and % run in f32 — exact because every
    intermediate (pixel coords <= 4096, products <= std*stored <= 2^23)
    is integer-valued and below 2^24, and f32 division of such pairs
    floors correctly (r/b <= 1 - 1/b stays a half-ulp away from 1).
    Returns (values3, None) or (None, (idx_f, miss_f)) for mode="xla";
    all outputs are bricks."""
    rb = u.shape[0]
    rt = rb * u.shape[1]
    miss = tex_num == -1.0
    if mode == "inline":
        return tuple(jnp.where(miss, d, tex_t[c, 0])
                     for c, d in enumerate(default3)), None
    std_w, std_h, tpr, hf, wf = meta5
    height_factor = wf / hf
    cx = (u + jnp.mod(tex_num, tpr)) / tpr
    cy = (v + jnp.floor(tex_num / tpr)) * height_factor / tpr
    px = jnp.clip(jnp.floor(jnp.mod(cx, 1.0) * wf), 0.0, wf - 1.0)
    py = jnp.clip(jnp.floor(jnp.mod(cy, 1.0) * hf), 0.0, hf - 1.0)
    col = jnp.floor(px / std_w)
    row = jnp.floor(py / std_h)
    slot = jnp.clip(row * tpr + col, 0.0, jnp.float32(n_slots - 1))
    s_iota = lax.broadcasted_iota(jnp.int32, (info_t.shape[1], rt), 0)
    hot = (_sp_flat(slot).astype(jnp.int32) == s_iota).astype(jnp.float32)
    info = jnp.dot(info_t, hot, precision=jax.lax.Precision.HIGHEST)
    off = _sp_brick(info[0:1], rb)
    sw = _sp_brick(info[1:2], rb)
    sh = _sp_brick(info[2:3], rb)
    sx = jnp.floor((px - col * std_w) * sw / std_w)
    sy = jnp.floor((py - row * std_h) * sh / std_h)
    idx = off + sy * sw + sx
    if mode == "xla":
        return None, (idx, jnp.where(miss, 1.0, 0.0))
    k_iota = lax.broadcasted_iota(jnp.int32, (tex_t.shape[1], rt), 0)
    k_hot = (_sp_flat(idx).astype(jnp.int32) == k_iota).astype(jnp.float32)
    sampled = jnp.dot(tex_t, k_hot, precision=jax.lax.Precision.HIGHEST)
    return tuple(jnp.where(miss, d, _sp_brick(sampled[c:c + 1], rb))
                 for c, d in enumerate(default3)), None


# Channel layout inside the kernels: every per-ray quantity is a DENSE
# (rb, 128) brick (rb = rt // 128) — a (1, rt) sublane slice occupies one
# sublane of each 8x128 vreg, so all elementwise VPU work on it runs at
# 1/8 throughput (the structural reason the round-2/3 megakernel A/Bs
# lost: wave fused 306.7 vs 200.2, shade kernel 242.2 vs 153.0). Rays are
# flattened to (1, rt) ONLY at the MXU contractions (MT products, one-hot
# row fetches), whose [rt, Tp] / [C, rt] operands are dense either way.


def _sp_flat(brick):
    """(rb, 128) brick -> (1, rt) lane row (for MXU contraction inputs)."""
    return brick.reshape(1, -1)


def _sp_brick(row, rb: int):
    """(1, rt) / [rt, 1]-transposed lane row -> (rb, 128) brick."""
    return row.reshape(rb, 128)


def _sp_emit(out_ref, k, chans, rb):
    zero = jnp.zeros((rb, 128), jnp.float32)
    chans = list(chans)
    while len(chans) < SP_C:
        chans.append(zero)
    out_ref[k] = jnp.stack(chans, axis=0)


def _sp_fetch_rows(mat, rt):
    rows_iota = lax.broadcasted_iota(jnp.int32, (mat.shape[0], rt), 0)
    rb = rt // 128

    def fetch_rows(table, idx):
        onehot = (_sp_flat(idx) == rows_iota).astype(table.dtype)
        rows = jnp.dot(table.T, onehot, precision=MATMUL_PRECISION)
        return rows.reshape(-1, rb, 128)                 # [C, rb, 128]

    return fetch_rows


def _make_mt_closures_x6(w6, tp: int, rt: int):
    """MT closures over x6-packed W [96, 4Tp] bf16: ONE DEFAULT-precision
    K=96 MXU pass per cast instead of XLA's 6-pass HIGHEST emulation of
    a K=16 f32 dot (the r1 "bf16x6 single-pass" trick the sparse/dense
    cast kernels already use; chip ablation r4g: the in-kernel shadow
    cast alone cost 46 ms/frame in the K=16 form). Products land
    [4Tp, rt], so the epilogue reduces along sublanes and yields (1, rt)
    rows with no transposes. bf16x6 is f32-faithful (~2 ulp) — same
    accept-window tie-flip budget class as the cast kernels."""
    one = jnp.ones((1, rt), jnp.float32)
    rows_iota = lax.broadcasted_iota(jnp.int32, (tp, rt), 0)

    def _pack_rhs_x6_inkernel(f):
        # intersect_sparse.pack_rhs_x6 without the optimization_barrier
        # (it guards an XLA excess-precision rewrite; Mosaic has no such
        # pass and may not lower the barrier primitive)
        from .intersect_sparse import _RHS_ORDER

        limbs = []
        r = f
        for _ in range(3):
            l = r.astype(jnp.bfloat16)
            limbs.append(l)
            r = r - l.astype(jnp.float32)
        return jnp.concatenate([limbs[i] for i in _RHS_ORDER], axis=0)

    def mt_products(o3, d3):
        comps = [one, o3[0], o3[1], o3[2], d3[0], d3[1], d3[2]]
        comps += [d3[i] * o3[k] for i in range(3) for k in range(3)]
        f = jnp.concatenate(comps, axis=0)              # [16, rt] f32
        f6 = _pack_rhs_x6_inkernel(f)                   # [96, rt] bf16
        prod = jax.lax.dot_general(
            w6, f6, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [4Tp, rt]
        det = prod[0:tp]
        inv = 1.0 / det
        return (det, prod[tp:2 * tp] * inv, prod[2 * tp:3 * tp] * inv,
                prod[3 * tp:4 * tp] * inv)

    def mt_closest(o3, d3, edge):
        det, u, v, s = mt_products(o3, d3)
        valid = (jnp.abs(det) >= BIAS)
        valid &= (u >= edge) & (u <= 1.0)
        valid &= (v >= edge) & (u + v <= 1.0)
        valid &= (s > BIAS)
        s_masked = jnp.where(valid, s, POW32)
        best_s = jnp.min(s_masked, axis=0, keepdims=True)
        # argmin tie-break = lowest row (drawable) index among the minima
        best_row = jnp.min(jnp.where(s_masked == best_s, rows_iota, tp),
                           axis=0, keepdims=True)
        hit = best_s < POW32
        sel = rows_iota == best_row
        best_u = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
        best_v = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)
        return (jnp.where(hit, best_s, 0.0), jnp.where(hit, best_u, 0.0),
                jnp.where(hit, best_v, 0.0),
                jnp.where(hit, best_row, -1).astype(jnp.int32))

    def traverse_soa(o3, d3, alive=None, hint=None):
        return mt_closest(o3, d3, edge=BIAS)

    def shadow_soa(o3, d3, max_len, alive=None, hint=None):
        det, u, v, s = mt_products(o3, d3)
        valid = (det >= BIAS)
        valid &= (u >= BIAS) & (u <= 1.0)
        valid &= (v >= BIAS) & (u + v <= 1.0)
        valid &= (s > BIAS) & (s <= max_len)            # (1, rt) broadcast
        anyf = jnp.max(jnp.where(valid, 1.0, 0.0), axis=0, keepdims=True)
        return anyf > 0.5

    return mt_closest, traverse_soa, shadow_soa


def _sp_mt_closures(w, tp: int, rt: int, x6: bool = False):
    """MT closures with brick-shaped (rb, 128) ray channels: inputs are
    flattened to (1, rt) lane rows only for the [rt/K-major, *] feature
    build feeding the MXU; outputs come back as bricks. Bool results
    reshape through f32 (Mosaic cannot relayout i1 vectors). `x6` selects
    the packed-bf16 single-pass closures (real kernels) vs the f32
    HIGHEST dots (the pallas=False exact-equivalence trace)."""
    make = _make_mt_closures_x6 if x6 else _make_mt_closures
    mt_closest, traverse_flat, shadow_flat = make(w, tp, rt)
    rb = rt // 128

    def flat3(c3):
        return tuple(_sp_flat(c) for c in c3)

    def closest_brick(o3, d3, edge):
        ps, pu, pv, ptri = mt_closest(flat3(o3), flat3(d3), edge)
        return (_sp_brick(ps, rb), _sp_brick(pu, rb), _sp_brick(pv, rb),
                _sp_brick(ptri, rb))

    def traverse_soa(o3, d3, alive=None, hint=None):
        s, u, v, tri = traverse_flat(flat3(o3), flat3(d3))
        return (_sp_brick(s, rb), _sp_brick(u, rb), _sp_brick(v, rb),
                _sp_brick(tri, rb))

    def shadow_soa(o3, d3, max_len, alive=None, hint=None):
        hit = shadow_flat(flat3(o3), flat3(d3), _sp_flat(max_len))
        return _sp_brick(hit.astype(jnp.float32), rb) > 0.5

    return closest_brick, traverse_soa, shadow_soa


def _sp_fetch_all(surface: BounceSurface, tabs, metas, modes, rb: int):
    """Run the three table fetches for `surface` inside the kernel.
    tabs = ((alb_texT, alb_infoT), (pbr...), (tpo...)); metas = three
    5-tuples of traced f32 scalars. Returns (albreq5 | None, texval9)
    as (rb, 128) bricks; albedo's value slot is zeros in "xla" mode
    (the driver gathers and re-injects it through the tex block)."""
    u = surface.bary_u
    v = surface.bary_v
    zero = jnp.zeros((rb, 128), jnp.float32)
    if os.environ.get("FLEXLIGHT_SPLIT_FETCHSTUB", ""):
        # decomposition stub: inline defaults instead of fetch arithmetic
        return ([zero] * 5, [*surface.inline_albedo, *surface.inline_rme,
                             *surface.inline_tpo])

    def run(ti, tex_num, default3):
        mode, n_slots, n_texels = modes[ti]
        return _sp_fetch_table(
            tabs[ti][0], tabs[ti][1], metas[ti], u, v, tex_num,
            tuple(default3), mode=mode, n_slots=n_slots, n_texels=n_texels)

    alb_vals, alb_req = run(0, surface.tex_nums[0], surface.inline_albedo)
    pbr_vals, _ = run(1, surface.tex_nums[1], surface.inline_rme)
    tpo_vals, _ = run(2, surface.tex_nums[2], surface.inline_tpo)
    if alb_req is not None:
        albreq5 = [alb_req[0], alb_req[1], *surface.inline_albedo]
        alb3 = (zero, zero, zero)
    else:
        albreq5 = [zero] * 5
        alb3 = alb_vals
    texval9 = [*alb3, *pbr_vals, *tpo_vals]
    return albreq5, texval9


def _sp_loop(body, subtile: int):
    """Walk `subtile` state slices inside one program. body(k) reads/
    writes refs at leading index k; results are identical to one program
    per slice (pure batching)."""
    if subtile == 1:
        body(0)
    else:
        def step(k, c):
            body(k)
            return c

        lax.fori_loop(0, subtile, step, 0)


def _sp_i0_kernel(scal_ref, w_ref, mat_ref, *rest, config, subtile: int,
                  resample: bool, x6: bool = False, tex_modes=None):
    """Primary closest hit (relaxed edge window, see render_mrt) + carry
    init + bounce_pre(0). With `resample` (samples 2..spp), the primary
    parts and carried aux channels are read from the previous sample's
    final state block instead of re-casting. With `tex_modes` (flavor 3)
    the bounce-0 texture fetch arithmetic runs here too."""
    rest = list(rest)
    tabs = None
    if tex_modes is not None:
        t6, rest = rest[:6], rest[6:]
        tabs = [(t6[0][...], t6[1][...]), (t6[2][...], t6[3][...]),
                (t6[4][...], t6[5][...])]
    if resample:
        rays_ref, prev_ref, out_ref = rest
    else:
        rays_ref, out_ref = rest
    tp = w_ref.shape[1] // 4
    rb = rays_ref.shape[2]
    rt = rb * rays_ref.shape[3]
    mt_closest, _, _ = _sp_mt_closures(w_ref[...], tp, rt, x6=x6)
    mat = mat_ref[...]
    fetch_rows = _sp_fetch_rows(mat, rt)
    zero = jnp.zeros((rb, 128), jnp.float32)
    one = jnp.ones((rb, 128), jnp.float32)
    metas = None
    if tex_modes is not None:
        metas = [tuple(scal_ref[1 + 5 * t + j] for j in range(5))
                 for t in range(3)]

    if os.environ.get("FLEXLIGHT_SPLIT_STUB", "") == "dma":
        # Skeleton decomposition (scripts/bench_skeleton.py): keep the
        # exact launch structure + block DMA shapes, skip the compute.
        def stub_body(k):
            rays = rays_ref[k]
            _sp_emit(out_ref, k, [rays[j % 8] for j in range(SP_IN)], rb)

        _sp_loop(stub_body, subtile)
        return

    def body(k):
        rays = rays_ref[k]                               # [8, rb, 128]
        o3 = (rays[0], rays[1], rays[2])
        d3 = (rays[3], rays[4], rays[5])
        if resample:
            prev = prev_ref[k]
            p = SP_PPART0
            ps, pu, pv = prev[p], prev[p + 1], prev[p + 2]
            ptri = prev[p + 3].astype(jnp.int32)
            aux = ((zero, zero, zero, prev[24]),
                   (zero, zero, zero, zero),
                   prev[25], prev[26], prev[27], prev[28])
        else:
            ps, pu, pv, ptri = mt_closest(o3, d3, edge=-BIAS)
            aux = ((zero, zero, zero, zero), (zero, zero, zero, zero),
                   zero, zero, zero, one)
        carry = bounce_carry_init((ps, pu, pv, ptri), o3, d3, aux)
        carry, s = bounce_pre(carry, 0, mat, config, fetch_rows_fn=fetch_rows)
        head = (_carry_to_channels(carry)
                + [s.m.astype(jnp.float32), *s.smooth_normal,
                   s.geometry_offset,
                   ps, pu, pv, ptri.astype(jnp.float32), zero, zero])
        if tex_modes is None:
            chans = head + _sp_texin_channels(s)
        else:
            albreq5, texval9 = _sp_fetch_all(s, tabs, metas, tex_modes, rb)
            chans = head + albreq5 + texval9
        _sp_emit(out_ref, k, chans, rb)

    _sp_loop(body, subtile)


def _sp_post_kernel(scal_ref, w_ref, lights_ref, cam_ref, mat_ref, *rest,
                    config, subtile: int, x6: bool = False, tex_modes=None,
                    allow_skip: bool = True):
    """bounce_post for the bounce index carried in scalar prefetch
    (scal = [seed, cos_sample_n, i, 2^-i, (flavor-3: 3x5 table metas)])
    + fused bounce_pre(i+1). One Mosaic program serves every bounce; the
    in-kernel shadow ray and next closest hit run as MT contractions
    over the whole (VMEM-resident) triangle set. With `tex_modes` the
    NEXT bounce's texture fetch arithmetic also runs here (see
    _sp_fetch_table)."""
    rest = list(rest)
    tabs = None
    if tex_modes is not None:
        t6, rest = rest[:6], rest[6:]
        tabs = [(t6[0][...], t6[1][...]), (t6[2][...], t6[3][...]),
                (t6[4][...], t6[5][...])]
    prev_ref, tex_ref, out_ref = rest
    tp = w_ref.shape[1] // 4
    rb = prev_ref.shape[2]
    rt = rb * prev_ref.shape[3]
    _, traverse_soa, shadow_soa = _sp_mt_closures(w_ref[...], tp, rt, x6=x6)
    mat = mat_ref[...]
    fetch_rows = _sp_fetch_rows(mat, rt)
    shim = SceneBuffers(
        geometry=None, attributes=None, id_buffer=None, rotations=None,
        shifts=None, lights=lights_ref[...], ambient=None,
        albedo_atlas=None, pbr_atlas=None, tpo_atlas=None,
        texture_width=None)
    zero = jnp.zeros((rb, 128), jnp.float32)
    random_seed = scal_ref[0]
    cos_sample_n = scal_ref[1]
    i_f = scal_ref[2]
    i_scale = scal_ref[3]
    metas = None
    if tex_modes is not None:
        metas = [tuple(scal_ref[4 + 5 * t + j] for j in range(5))
                 for t in range(3)]

    if os.environ.get("FLEXLIGHT_SPLIT_STUB", "") == "dma":
        def stub_body(k):
            prev = prev_ref[k]
            texb = tex_ref[k]
            n_in = SP_IN if tex_modes is None else SP3_IN
            _sp_emit(out_ref, k,
                     [prev[j] for j in range(n_in)] + [texb[0]], rb)

        _sp_loop(stub_body, subtile)
        return

    # Dead-subtile skip (round 5): bounce alive fractions collapse
    # (theater ~98/43/13/4%) and alive-at-bounce-k pixels cluster
    # spatially (camera-order tiles), so whole subtiles go dead from
    # bounce 2 on. When no ray in the slice has surface.m set, every
    # carry write in bounce_post/bounce_pre is m-guarded (pathtrace.py:
    # bounce_shade/apply/commit where-guards), so the true output equals
    # the input with surf.m forced 0 (bounce_pre(i+1) would recompute
    # m = False: commit kills alive wherever m was False) and the rec df
    # channel 0 — which is exactly what the copy branch emits. Pinned by
    # test_fused.py::test_fused_split_dead_subtile_skip (interpret,
    # skip on == off exactly).
    skip_dead = allow_skip and os.environ.get(
        "FLEXLIGHT_SPLIT_SKIP", "1") != "0"

    def body(k):
        prev = prev_ref[k]                               # [*, rb, 128]
        texb = tex_ref[k]
        n_in = SP_IN if tex_modes is None else SP3_IN
        if skip_dead:
            any_live = jnp.max(prev[SP_SURF0]) > 0.0

            @pl.when(jnp.logical_not(any_live))
            def _():
                chc = [prev[j] for j in range(n_in)]
                chc[SP_SURF0] = jnp.zeros((rb, 128), jnp.float32)
                _sp_emit(out_ref, k, chc, rb)

            @pl.when(any_live)
            def _():
                _body_live(k, prev, texb, n_in)
        else:
            _body_live(k, prev, texb, n_in)

    def _body_live(k, prev, texb, n_in):
        ch = [prev[j] for j in range(n_in)]
        carry = _carry_from_channels(ch[:N_CARRY], zero)
        b = SP_SURF0
        surface = BounceSurface(
            m=ch[b] > 0.0, smooth_normal=(ch[b + 1], ch[b + 2], ch[b + 3]),
            geometry_offset=ch[b + 4],
            # bounce_post only consumes m/smooth_normal/geometry_offset
            bary_u=zero, bary_v=zero, tex_nums=(zero,) * 3,
            inline_albedo=(zero,) * 3, inline_rme=(zero,) * 3,
            inline_tpo=(zero,) * 3)
        if tex_modes is None:
            tex = ((texb[0], texb[1], texb[2]), texb[3], texb[4],
                   texb[5], (texb[6], texb[7], texb[8]))
            ndc2 = (texb[9], texb[10])
        else:
            tv = SP3_TEXVAL
            if tex_modes[0][0] == "xla":
                albedo = (texb[0], texb[1], texb[2])
            else:
                albedo = (ch[tv], ch[tv + 1], ch[tv + 2])
            tex = (albedo, ch[tv + 3], ch[tv + 4], ch[tv + 5],
                   (ch[tv + 6], ch[tv + 7], ch[tv + 8]))
            ndc2 = (texb[3], texb[4])

        rec = []

        def bounce_hook(bi, df, n3, rough, metal, emis):
            rec[:] = [df.astype(jnp.float32), n3[0], n3[1], n3[2],
                      rough, metal, emis]

        def pack_id_stub(n3, rough, metal, emis):
            return (zero, zero, zero)

        carry = bounce_post(
            carry, surface, tex, i_f, shim, cam_ref[0], ndc2, cos_sample_n,
            config, random_seed, traverse_soa, shadow_soa,
            pack_id_fn=pack_id_stub, bounce_hook=bounce_hook,
            force_unroll_lights=_unroll_mode(lights_ref.shape[0]),
            next_traverse=True, i_scale=i_scale)
        # fused bounce_pre(i+1); after the final bounce its outputs (and
        # the next closest hit above) are dead — the channels the
        # epilogue/resample read (14-28, 34-38) are untouched by both.
        carry, s2 = bounce_pre(carry, 0, mat, config,
                               fetch_rows_fn=fetch_rows)
        p = SP_PPART0
        head = (_carry_to_channels(carry)
                + [s2.m.astype(jnp.float32), *s2.smooth_normal,
                   s2.geometry_offset,
                   ch[p], ch[p + 1], ch[p + 2], ch[p + 3], zero, zero])
        if tex_modes is None:
            chans = head + _sp_texin_channels(s2) + rec
        else:
            albreq5, texval9 = _sp_fetch_all(s2, tabs, metas, tex_modes, rb)
            chans = head + albreq5 + texval9 + rec
        _sp_emit(out_ref, k, chans, rb)

    _sp_loop(body, subtile)


def render_mrt_fused_split(buffers: SceneBuffers, width: int, height: int,
                           camera_pos, view_matrix, config, random_seed,
                           row0=0, rows: int | None = None, sample_offset=0.0,
                           local_samples: int | None = None,
                           with_raw_aux: bool = False,
                           interpret: bool | None = None,
                           ray_tile: int | None = None, pallas: bool = True,
                           subtile: int | None = None):
    """Drop-in for ops.pathtrace.render_mrt(scheme="fused_split")."""
    assert fused_split_eligible(buffers), \
        "scene too large for the split fused pipeline"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rt = (ray_tile
          or int(os.environ.get("FLEXLIGHT_SPLIT_RAY_TILE", "0"))
          or SPLIT_RAY_TILE)

    world_geom = world_geometry(buffers)
    det, udet, vdet, sdet = tri_rows(world_geom, buffers.id_buffer)
    t = det.shape[0]
    tp = max(-(-t // 128) * 128, 128)
    if ray_tile is None and not os.environ.get("FLEXLIGHT_SPLIT_RAY_TILE"):
        # cap the in-kernel MT product [rt, 4*Tp] at ~4 MB of VMEM: at
        # Tp=1024 (bike) the default 1024-ray tile would need 16 MB
        budget_rays = ((4 << 20) // (16 * tp)) // 128 * 128
        rt = max(256, min(rt, budget_rays))
    sub = (subtile
           or int(os.environ.get("FLEXLIGHT_SPLIT_SUBTILE", "0"))
           or SP_SUBTILE)
    # grouped rays per program capped at the known-good 8192-ray envelope
    # (the same scoped-VMEM reasoning as intersect_kernel._intersect_ft);
    # FLEXLIGHT_SPLIT_VMEM_MB raises the Mosaic scoped-vmem limit AND the
    # cap proportionally (A/B knob: fewer programs per launch).
    vmem_mb = int(os.environ.get("FLEXLIGHT_SPLIT_VMEM_MB", "0"))
    ray_cap = 8192 * max(1, vmem_mb // 16) if vmem_mb else 8192
    sub = max(1, min(sub, ray_cap // rt))
    w_grouped = jnp.concatenate(
        [_pad_rows(x, tp) for x in (det, udet, vdet, sdet)], axis=0).T
    # Real kernels contract the x6-packed bf16 W in ONE K=96 MXU pass;
    # the pallas=False exact-equivalence trace keeps the f32 HIGHEST dot.
    use_x6 = pallas and os.environ.get("FLEXLIGHT_SPLIT_X6", "1") != "0"
    if use_x6:
        from .intersect_sparse import pack_lhs_x6

        w_grouped = pack_lhs_x6(w_grouped, axis=0)       # [96, 4Tp] bf16
    mat = _pad_rows(
        build_material_table(buffers, world_geom)[buffers.id_buffer], tp)
    loc_geometry = buffers.geometry[buffers.id_buffer]
    cam = jnp.stack([jnp.asarray(camera_pos[c], jnp.float32)
                     for c in range(3)]).reshape(1, 3)

    # Flavor 3 (FLEXLIGHT_SPLIT_TEX=inkernel): texture fetch arithmetic
    # in-kernel (see _sp_fetch_table). Default OFF — re-rejected in
    # round 5 with the right attribution (docs/PERF.md r5 batch A): the
    # XLA tex stage really was ~53 ms of theater's 105 ms frame (the r4m
    # "moved nothing" conclusion was wrong), but flavor 3 loses anyway —
    # its in-kernel fetch costs ~44 ms even with brick-layout math
    # (Mosaic lowering/register pressure) and its residual XLA part
    # ~37 ms. The fix that stuck is in the LEGACY stage instead: drop
    # the [N,3]->[3,N] moveaxis after the big-table gather
    # (ops/buffers.py fetch_tex_val_table). Kept env-gated (fully
    # tested: exact-equality vs mxu incl. the f32-emulated integer ops)
    # as a documented negative result.
    tex_modes = (_sp_tex_modes(buffers)
                 if os.environ.get("FLEXLIGHT_SPLIT_TEX", "") == "inkernel"
                 else None)
    tex_tables = []
    tex_metas = []
    if tex_modes is not None:
        for tab, (mode, _, _) in zip((buffers.albedo_tab, buffers.pbr_tab,
                                      buffers.tpo_tab), tex_modes):
            tex_t, info_t = _sp_table_args(tab, mode)
            tex_tables += [tex_t, info_t]
            tex_metas.append(tab.meta.astype(jnp.float32))

    n_rows = height if rows is None else rows
    origin, direction, ndc = camera_rays(width, height, camera_pos,
                                         view_matrix, row0=row0, rows=n_rows)
    n = origin.shape[0]
    if not pallas:
        rt = -(-n // 128) * 128  # whole image as one tile
        sub = 1
    pad = (-n) % rt
    g = (n + pad) // rt
    sub = max(1, min(sub, g))
    gpad = (-g) % sub
    g += gpad
    pad += gpad * rt

    def grid_arr(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(g, rt)

    o_t, d_t, ndc_t = origin.T, direction.T, ndc.T
    rb = rt // 128

    def brick_arr(x, fill=0.0):
        return grid_arr(x, fill).reshape(g, rb, 128)

    # padded rays get d=(0,0,1): a valid unit direction, dead via ptri=-1
    rays_in = jnp.stack(
        [brick_arr(o_t[0]), brick_arr(o_t[1]), brick_arr(o_t[2]),
         brick_arr(d_t[0]), brick_arr(d_t[1]), brick_arr(d_t[2], 1.0),
         brick_arr(ndc_t[0]), brick_arr(ndc_t[1])],
        axis=1)                                         # [G, 8, rb, 128]
    ndc2 = (rays_in[:, 6], rays_in[:, 7])               # [G, rb, 128]

    full = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))

    def run_kernel(kernel, scalars, tables, blocks, block_chans):
        """blocks: [G, C_k, rb, 128] arrays; block_chans: channels the
        kernel consumes from each (the BlockSpec slices the prefix)."""
        if pallas:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(g // sub,),
                in_specs=[full(tuple(a.shape)) for a in tables]
                + [pl.BlockSpec((sub, c, rb, 128),
                                lambda i, *_: (i, 0, 0, 0))
                   for c in block_chans],
                out_specs=pl.BlockSpec((sub, SP_C, rb, 128),
                                       lambda i, *_: (i, 0, 0, 0)),
            )
            cp = dict(dimension_semantics=("parallel",))
            if vmem_mb:
                cp["vmem_limit_bytes"] = vmem_mb << 20
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((g, SP_C, rb, 128),
                                               jnp.float32),
                compiler_params=pltpu.CompilerParams(**cp),
                interpret=interpret,
            )(scalars, *tables, *blocks)
        oref = _OutRef((1, SP_C, rb, 128))
        kernel(*[_ValRef(a) for a in (scalars, *tables, *blocks)], oref)
        return oref.val[None]

    seedf = jnp.asarray(random_seed, jnp.float32)
    n_local = (config.samples_per_ray if local_samples is None
               else local_samples)
    n_bounces = config.max_reflections
    chan = lambda st, j: st[:, j].reshape(g, rt)            # [G, rt]
    ndc2 = tuple(c.reshape(g, rt) for c in ndc2)

    flavor3 = tex_modes is not None
    meta_f = (jnp.concatenate(tex_metas) if flavor3
              else jnp.zeros(0, jnp.float32))
    in_ch = SP3_IN if flavor3 else SP_IN
    total = None
    records = []
    state = None
    for s in range(n_local):
        i0 = partial(_sp_i0_kernel, config=config, subtile=sub,
                     resample=s > 0, x6=use_x6, tex_modes=tex_modes)
        i0_scal = jnp.concatenate([seedf.reshape(1), meta_f])
        if s == 0:
            state = run_kernel(i0, i0_scal,
                               [w_grouped, mat] + tex_tables,
                               [rays_in], [8])
        else:
            state = run_kernel(i0, i0_scal,
                               [w_grouped, mat] + tex_tables,
                               [rays_in, state], [8, in_ch])
        cos_sample_n = jnp.cos(jnp.float32(s) + jnp.float32(sample_offset))
        for i in range(n_bounces):
            if flavor3:
                # the only XLA tex work left: the big-table texel gather
                # by the in-kernel-computed index (u8 row gather), or
                # nothing at all when every table samples in-kernel.
                if tex_modes[0][0] == "xla":
                    tab = buffers.albedo_tab
                    idx = chan(state, SP3_ALBREQ).astype(jnp.int32)
                    missf = chan(state, SP3_ALBREQ + 1)
                    safe = jax.lax.optimization_barrier(
                        jnp.clip(idx, 0, tab.texels.shape[0] - 1))
                    sampled = jax.lax.optimization_barrier(
                        tab.texels[safe]).astype(jnp.float32)
                    if tab.texels.dtype == jnp.uint8:
                        sampled = sampled * jnp.float32(1.0 / 255.0)
                    albedo = tuple(
                        jnp.where(missf > 0.5,
                                  chan(state, SP3_ALBREQ + 2 + c),
                                  sampled[..., c]) for c in range(3))
                else:
                    albedo = (ndc2[0] * 0.0,) * 3  # unused by the kernel
                tex_block = jnp.stack(
                    [*albedo, *ndc2, *([ndc2[0] * 0.0] * (SP_TEX3 - 5))],
                    axis=1).reshape(g, SP_TEX3, rb, 128)
            elif os.environ.get("FLEXLIGHT_SPLIT_TEXSTUB", ""):
                # skeleton decomposition: drop the XLA tex stage (constant
                # tex block, hoisted out of timing loops) while keeping
                # the kernel launch structure intact
                tex_block = jnp.zeros((g, SP_TEX, rb, 128), jnp.float32)
            else:
                # legacy flavor: all three atlas fetches in XLA. Only the
                # texin slice of the state block is read and only the
                # small tex block is packed; the state stays in HBM.
                tx = SP_TEXIN0
                surface = BounceSurface(
                    m=None, smooth_normal=(None,) * 3, geometry_offset=None,
                    bary_u=chan(state, tx), bary_v=chan(state, tx + 1),
                    tex_nums=tuple(chan(state, tx + 2 + c)
                                   for c in range(3)),
                    inline_albedo=tuple(chan(state, tx + 5 + c)
                                        for c in range(3)),
                    inline_rme=tuple(chan(state, tx + 8 + c)
                                     for c in range(3)),
                    inline_tpo=tuple(chan(state, tx + 11 + c)
                                     for c in range(3)))
                albedo, rough, metal, emis, tpo = bounce_tex(buffers,
                                                             surface)
                zgr = jnp.zeros_like(rough)
                tex_block = jnp.stack(
                    [*albedo, rough, metal, emis, *tpo, *ndc2,
                     *([zgr] * (SP_TEX - 11))],
                    axis=1).reshape(g, SP_TEX, rb, 128)
            scalars = jnp.concatenate(
                [jnp.stack([seedf, cos_sample_n, jnp.float32(float(i)),
                            jnp.float32(2.0 ** -i)]), meta_f])
            post = partial(_sp_post_kernel, config=config, subtile=sub,
                           x6=use_x6, tex_modes=tex_modes,
                           allow_skip=pallas)
            state = run_kernel(post, scalars,
                               [w_grouped, buffers.lights, cam, mat]
                               + tex_tables,
                               [state, tex_block],
                               [in_ch, SP_TEX3 if flavor3 else SP_TEX])
            r = SP3_REC if flavor3 else SP_REC0
            records.append(
                (chan(state, r) > 0.0,
                 tuple(chan(state, r + 1 + c) for c in range(3)),
                 chan(state, r + 4), chan(state, r + 5), chan(state, r + 6)))
        # light_trace epilogue (glsl:595-597): ambient by importancy
        color = tuple(chan(state, 21 + c)
                      + chan(state, 14 + c) * buffers.ambient[c]
                      for c in range(3))
        total = color if total is None else v3.add3(total, color)

    final_color = v3.scale3(total, 1.0 / config.samples_per_ray)

    flat = lambda x: x.reshape(-1)[:n]
    p = SP_PPART0
    fields = [flat(final_color[0]), flat(final_color[1]),
              flat(final_color[2]),
              flat(chan(state, 17)), flat(chan(state, 18)),
              flat(chan(state, 19)),                     # original_color
              flat(chan(state, 27)), flat(chan(state, 25)),
              flat(chan(state, 26)), flat(chan(state, 28)),
              flat(chan(state, 24)),                     # otpo/glass/rme/frl/idw
              flat(chan(state, p + 3)),                  # primary tri (f32)
              flat(chan(state, p + 1)), flat(chan(state, p + 2))]
    flat_records = [
        (flat(df), tuple(flat(c) for c in n3), flat(ro), flat(me), flat(em))
        for df, n3, ro, me, em in records]
    return _mrt_from_channels(fields, flat_records, loc_geometry, camera_pos,
                              config, with_raw_aux)


# ---------------------------------------------------------------------------
# Shade kernel — sparse-scheme scenes (dragon class).
#
# Scenes over MAX_TRIS keep their traversals in the sparse worklist
# kernels (ops.intersect_sparse), but their per-bounce SHADING still ran
# as hundreds of XLA ops round-tripping [N]-wide arrays through HBM
# (theater ablation: shading, not traversal, dominates the direct frame).
# `make_shade_bounce_post` builds a bounce_post drop-in that runs
# bounce_shade — the shading frame, Fresnel-chance decision, bookkeeping
# and the reservoir light SELECTION — as one Pallas program per ray tile,
# while the NEE shadow ray and the next closest hit stay with the
# caller's traversal closures, and bounce_apply/bounce_commit stay in XLA
# (cheap glue). Enabled by FLEXLIGHT_SHADE_KERNEL=1 in render_mrt; needs
# the 2-D [G, 1024] shading layout and no DEBUG_DISABLE ablations.
# ---------------------------------------------------------------------------

N_SHADE_IN = N_CARRY + 16   # carry + surface(m,normal,goff) + tex(8) + ndc
N_SHADE_OUT = 64            # carry(29) + request(26) + record(7), 8-aligned


def _shade_kernel(scal_ref, lights_ref, cam_ref, state_ref, out_ref, *,
                  config, i: int):
    state = state_ref[0]
    rt = state.shape[1]
    zero = jnp.zeros((1, rt), jnp.float32)
    ch = [state[k:k + 1] for k in range(N_SHADE_IN)]
    carry = _carry_from_channels(ch[:N_CARRY], zero)
    b = N_CARRY
    surface = BounceSurface(
        m=ch[b] > 0.0, smooth_normal=(ch[b + 1], ch[b + 2], ch[b + 3]),
        geometry_offset=ch[b + 4],
        # bounce_shade only consumes m/smooth_normal/geometry_offset
        bary_u=zero, bary_v=zero, tex_nums=(zero,) * 3,
        inline_albedo=(zero,) * 3, inline_rme=(zero,) * 3,
        inline_tpo=(zero,) * 3)
    tex = ((ch[b + 5], ch[b + 6], ch[b + 7]), ch[b + 8], ch[b + 9],
           ch[b + 10], (ch[b + 11], ch[b + 12], ch[b + 13]))
    ndc2 = (ch[b + 14], ch[b + 15])
    shim = SceneBuffers(
        geometry=None, attributes=None, id_buffer=None, rotations=None,
        shifts=None, lights=lights_ref[...], ambient=None,
        albedo_atlas=None, pbr_atlas=None, tpo_atlas=None,
        texture_width=None)

    rec = []

    def bounce_hook(bi, df, n3, rough, metal, emis):
        rec[:] = [df.astype(jnp.float32), n3[0], n3[1], n3[2],
                  rough, metal, emis]

    def pack_id_stub(n3, rough, metal, emis):
        return (zero, zero, zero)

    carry, req = bounce_shade(
        carry, surface, tex, i, shim, cam_ref[0], ndc2, scal_ref[1],
        config, scal_ref[0], pack_id_fn=pack_id_stub,
        bounce_hook=bounce_hook,
        force_unroll_lights=_unroll_mode(lights_ref.shape[0]))
    p = req.pick
    chans = (_carry_to_channels(carry)
             + [*req.ray_dir, *req.smooth_normal, req.sign_dir,
                *req.random_sphere, req.roughness_brdf,
                req.is_solid.astype(jnp.float32),
                req.write_id_w.astype(jnp.float32),
                *p.local_color, p.res_num.astype(jnp.float32),
                p.show_color.astype(jnp.float32),
                p.show_shadow.astype(jnp.float32),
                *p.offset_target, *p.light_dir, p.max_len]
             + rec)
    while len(chans) < out_ref.shape[1]:
        chans.append(zero)
    out_ref[0] = jnp.concatenate(chans, axis=0)


def shade_kernel_eligible(buffers: SceneBuffers) -> bool:
    return buffers.lights.shape[0] <= MAX_LIGHTS


def make_shade_bounce_post(buffers: SceneBuffers, camera_pos, config,
                           interpret: bool | None = None,
                           pallas: bool = True):
    """Returns a bounce_post drop-in (light_trace's `bounce_post_impl`)
    running bounce_shade in a Pallas kernel. The caller's traversal
    closures keep the shadow ray and next closest hit; the deferred id
    packing is re-applied outside with identical arithmetic, so carried
    render_id channels stay exact."""
    assert shade_kernel_eligible(buffers)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cam = jnp.stack([jnp.asarray(camera_pos[c], jnp.float32)
                     for c in range(3)]).reshape(1, 3)
    full = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))
    c_in = -(-N_SHADE_IN // 8) * 8

    def bounce_post_fn(carry, surface, tex, i, buffers_, camera_pos_, ndc2,
                       cos_sample_n, config_, random_seed, traverse_soa,
                       shadow_soa, pack_id_fn=None, bounce_hook=None,
                       force_unroll_lights=False,
                       next_traverse=None) -> BounceCarry:
        assert pack_id_fn is None and bounce_hook is None, \
            "shade kernel cannot honor injected packing hooks"
        assert carry.hs.ndim == 2, "shade kernel needs the 2-D ray layout"
        albedo, rough, metal, emis, tpo = tex
        g, rt = carry.hs.shape
        chans = (_carry_to_channels(carry)
                 + [surface.m.astype(jnp.float32), *surface.smooth_normal,
                    surface.geometry_offset, *albedo, rough, metal, emis,
                    *tpo, *ndc2])
        zero = jnp.zeros((g, rt), jnp.float32)
        state = jnp.stack(chans + [zero] * (c_in - len(chans)), axis=1)
        scalars = jnp.stack([jnp.asarray(random_seed, jnp.float32),
                             jnp.asarray(cos_sample_n, jnp.float32)])
        kern = partial(_shade_kernel, config=config, i=i)
        if pallas:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(g,),
                in_specs=[full(tuple(buffers.lights.shape)), full((1, 3)),
                          pl.BlockSpec((1, c_in, rt),
                                       lambda i, *_: (i, 0, 0))],
                out_specs=pl.BlockSpec((1, N_SHADE_OUT, rt),
                                       lambda i, *_: (i, 0, 0)),
            )
            out = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((g, N_SHADE_OUT, rt),
                                               jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=interpret,
            )(scalars, buffers.lights, cam, state)
        else:
            oref = _OutRef((1, N_SHADE_OUT, rt))
            kern(_ValRef(scalars), _ValRef(buffers.lights), _ValRef(cam),
                 _ValRef(state), oref)
            out = oref.val[None]

        c = lambda k: out[:, k]
        carry2 = _carry_from_channels([c(k) for k in range(N_CARRY)], zero)
        q = N_CARRY
        req = ShadeRequest(
            m=surface.m, ray_dir=(c(q), c(q + 1), c(q + 2)),
            smooth_normal=(c(q + 3), c(q + 4), c(q + 5)), sign_dir=c(q + 6),
            random_sphere=(c(q + 7), c(q + 8), c(q + 9)),
            roughness_brdf=c(q + 10), is_solid=c(q + 11) > 0.0,
            write_id_w=c(q + 12) > 0.0,
            pick=ReservoirPick(
                local_color=(c(q + 13), c(q + 14), c(q + 15)),
                res_num=c(q + 16).astype(jnp.int32),
                show_color=c(q + 17) > 0.0, show_shadow=c(q + 18) > 0.0,
                offset_target=(c(q + 19), c(q + 20), c(q + 21)),
                light_dir=(c(q + 22), c(q + 23), c(q + 24)),
                max_len=c(q + 25)))
        # re-apply the deferred id packing with light_trace's exact
        # arithmetic (arctan2 has no Mosaic lowering)
        df = c(q + 26) > 0.0
        idu = combine_normal_rme_soa(
            (c(q + 27), c(q + 28), c(q + 29)), c(q + 30), c(q + 31),
            c(q + 32))
        scale_i = 2.0 ** -i
        rid = tuple(carry.render_id[k] + jnp.where(df, scale_i * idu[k], 0.0)
                    for k in range(3))
        if i == 0:
            oid = tuple(
                carry.original_id_acc[k] + jnp.where(df, scale_i * idu[k], 0.0)
                for k in range(3)) + (carry.original_id_acc[3],)
        else:
            oid = carry.original_id_acc
        carry2 = carry2._replace(render_id=rid + (carry2.render_id[3],),
                                 original_id_acc=oid)

        shadowed = shadow_soa(req.pick.offset_target, req.pick.light_dir,
                              req.pick.max_len, alive=req.m, hint=carry.tri)
        carry2 = bounce_apply(carry2, tex, req, shadowed, i, config)
        return bounce_commit(carry2, req.m, i, config, traverse_soa,
                             next_traverse=next_traverse)

    return bounce_post_fn


# ---------------------------------------------------------------------------
# Combined interp+shade kernel — trivial-atlas sparse scenes (dragon).
#
# When every atlas is the 1x1 placeholder (dragon: inline materials only),
# bounce_tex is a constant select and the whole pre(interp) -> tex ->
# shade chain fuses into ONE program per ray tile; only the material row
# GATHER (XLA's fast [N,C] row-gather form) and the two traversals stay
# outside. Selected automatically by FLEXLIGHT_SHADE_KERNEL=1 when
# eligible; big-atlas scenes keep the shade-only kernel above.
# ---------------------------------------------------------------------------

N_STEP_IN = N_CARRY + 2      # carry + ndc2
N_STEP_OUT = 72              # carry(29) + m + req(26) + rec(7) + emis,tpo3


def fused_step_eligible(buffers: SceneBuffers) -> bool:
    atlases = (buffers.albedo_atlas, buffers.pbr_atlas, buffers.tpo_atlas)
    return (buffers.lights.shape[0] <= MAX_LIGHTS
            and all(a.shape[0] * a.shape[1] == 1 for a in atlases))


def _interp_shade_kernel(scal_ref, lights_ref, cam_ref, alb_ref, pbr_ref,
                         tpo_ref, rows_ref, state_ref, out_ref, *,
                         config, i: int):
    state = state_ref[0]
    rt = state.shape[1]
    zero = jnp.zeros((1, rt), jnp.float32)
    ch = [state[k:k + 1] for k in range(N_STEP_IN)]
    carry = _carry_from_channels(ch[:N_CARRY], zero)
    ndc2 = (ch[N_CARRY], ch[N_CARRY + 1])
    rows2 = rows_ref[0]                                 # [49, rt]
    # bounce_pre consumes the fetch as rowt[k] -> [1, rt] planes; a list
    # of sublane slices gives it that without any in-kernel relayout.
    rows = [rows2[k:k + 1] for k in range(rows2.shape[0])]

    def fetch_rows(table, idx):
        return rows

    carry, surface = bounce_pre(carry, i, None, config,
                                fetch_rows_fn=fetch_rows)
    shim = SceneBuffers(
        geometry=None, attributes=None, id_buffer=None, rotations=None,
        shifts=None, lights=lights_ref[...], ambient=None,
        albedo_atlas=alb_ref[...].reshape(1, 1, 3),
        pbr_atlas=pbr_ref[...].reshape(1, 1, 3),
        tpo_atlas=tpo_ref[...].reshape(1, 1, 3), texture_width=None)
    tex = bounce_tex(shim, surface)      # 1x1 atlases: constant select
    albedo, rough, metal, emis, tpo = tex

    rec = []

    def bounce_hook(bi, df, n3, ro, me, em):
        rec[:] = [df.astype(jnp.float32), n3[0], n3[1], n3[2], ro, me, em]

    def pack_id_stub(n3, ro, me, em):
        return (zero, zero, zero)

    carry, req = bounce_shade(
        carry, surface, tex, i, shim, cam_ref[0], ndc2, scal_ref[1],
        config, scal_ref[0], pack_id_fn=pack_id_stub,
        bounce_hook=bounce_hook,
        force_unroll_lights=_unroll_mode(lights_ref.shape[0]))
    p = req.pick
    chans = (_carry_to_channels(carry)
             + [req.m.astype(jnp.float32)]
             + [*req.ray_dir, *req.smooth_normal, req.sign_dir,
                *req.random_sphere, req.roughness_brdf,
                req.is_solid.astype(jnp.float32),
                req.write_id_w.astype(jnp.float32),
                *p.local_color, p.res_num.astype(jnp.float32),
                p.show_color.astype(jnp.float32),
                p.show_shadow.astype(jnp.float32),
                *p.offset_target, *p.light_dir, p.max_len]
             + rec + [emis, *tpo])
    while len(chans) < out_ref.shape[1]:
        chans.append(zero)
    out_ref[0] = jnp.concatenate(chans, axis=0)


def make_fused_bounce_step(buffers: SceneBuffers, camera_pos, config,
                           interpret: bool | None = None,
                           pallas: bool = True):
    """Returns light_trace's `bounce_step_impl`: one Pallas program per
    ray tile runs interp + (trivial) texture select + shading; the row
    gather and the two traversals stay with the caller."""
    assert fused_step_eligible(buffers)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cam = jnp.stack([jnp.asarray(camera_pos[c], jnp.float32)
                     for c in range(3)]).reshape(1, 3)
    atl = tuple(a.reshape(1, 3) for a in (buffers.albedo_atlas,
                                          buffers.pbr_atlas,
                                          buffers.tpo_atlas))
    full = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))
    c_in = -(-N_STEP_IN // 8) * 8

    def bounce_step_fn(carry, i, mat, ndc2, cos_sample_n, random_seed,
                       traverse_soa, shadow_soa,
                       next_traverse=None) -> BounceCarry:
        assert carry.hs.ndim == 2, "step kernel needs the 2-D ray layout"
        g, rt = carry.hs.shape
        # [G, 49, rt]: the per-program axis must lead — Mosaic rejects
        # blocks whose second-to-last dim is 1 on a larger array, so a
        # [49, G, rt] layout with (49, 1, rt) blocks cannot lower.
        rows = jnp.swapaxes(fetch_rows_t(mat, carry.tri), 0, 1)
        chans = _carry_to_channels(carry) + [*ndc2]
        zero = jnp.zeros((g, rt), jnp.float32)
        state = jnp.stack(chans + [zero] * (c_in - len(chans)), axis=1)
        scalars = jnp.stack([jnp.asarray(random_seed, jnp.float32),
                             jnp.asarray(cos_sample_n, jnp.float32)])
        kern = partial(_interp_shade_kernel, config=config, i=i)
        n_rows = rows.shape[1]
        if pallas:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(g,),
                in_specs=[full(tuple(buffers.lights.shape)), full((1, 3)),
                          full((1, 3)), full((1, 3)), full((1, 3)),
                          pl.BlockSpec((1, n_rows, rt),
                                       lambda i, *_: (i, 0, 0)),
                          pl.BlockSpec((1, c_in, rt),
                                       lambda i, *_: (i, 0, 0))],
                out_specs=pl.BlockSpec((1, N_STEP_OUT, rt),
                                       lambda i, *_: (i, 0, 0)),
            )
            out = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((g, N_STEP_OUT, rt),
                                               jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
                interpret=interpret,
            )(scalars, buffers.lights, cam, *atl, rows, state)
        else:
            oref = _OutRef((1, N_STEP_OUT, rt))
            kern(_ValRef(scalars), _ValRef(buffers.lights), _ValRef(cam),
                 *[_ValRef(a) for a in atl], _ValRef(rows), _ValRef(state),
                 oref)
            out = oref.val[None]

        c = lambda k: out[:, k]
        carry2 = _carry_from_channels([c(k) for k in range(N_CARRY)], zero)
        m = c(N_CARRY) > 0.0
        q = N_CARRY + 1
        req = ShadeRequest(
            m=m, ray_dir=(c(q), c(q + 1), c(q + 2)),
            smooth_normal=(c(q + 3), c(q + 4), c(q + 5)), sign_dir=c(q + 6),
            random_sphere=(c(q + 7), c(q + 8), c(q + 9)),
            roughness_brdf=c(q + 10), is_solid=c(q + 11) > 0.0,
            write_id_w=c(q + 12) > 0.0,
            pick=ReservoirPick(
                local_color=(c(q + 13), c(q + 14), c(q + 15)),
                res_num=c(q + 16).astype(jnp.int32),
                show_color=c(q + 17) > 0.0, show_shadow=c(q + 18) > 0.0,
                offset_target=(c(q + 19), c(q + 20), c(q + 21)),
                light_dir=(c(q + 22), c(q + 23), c(q + 24)),
                max_len=c(q + 25)))
        df = c(q + 26) > 0.0
        idu = combine_normal_rme_soa(
            (c(q + 27), c(q + 28), c(q + 29)), c(q + 30), c(q + 31),
            c(q + 32))
        tex = ((zero, zero, zero), zero, zero, c(q + 33),
               (c(q + 34), c(q + 35), c(q + 36)))
        scale_i = 2.0 ** -i
        rid = tuple(carry.render_id[k] + jnp.where(df, scale_i * idu[k], 0.0)
                    for k in range(3))
        if i == 0:
            oid = tuple(
                carry.original_id_acc[k] + jnp.where(df, scale_i * idu[k], 0.0)
                for k in range(3)) + (carry.original_id_acc[3],)
        else:
            oid = carry.original_id_acc
        carry2 = carry2._replace(render_id=rid + (carry2.render_id[3],),
                                 original_id_acc=oid)

        shadowed = shadow_soa(req.pick.offset_target, req.pick.light_dir,
                              req.pick.max_len, alive=req.m, hint=carry.tri)
        carry2 = bounce_apply(carry2, tex, req, shadowed, i, config)
        return bounce_commit(carry2, req.m, i, config, traverse_soa,
                             next_traverse=next_traverse)

    return bounce_step_fn
