#!/usr/bin/env python
"""Decompose one sparse cast (dragon class) into its machinery terms
(VERDICT r4 weak #2 prep): flags, key, compact, carry sort/unsort, the
worklist kernel itself, and the exact-recovery tail — for the primary
(coherent, unhinted-sort) wavefront and a synthetic bounce-like
(incoherent, nearest2-sorted) wavefront at full frame scale.

Usage: python scripts/bench_sparse_anatomy.py [scene] [W H] [iters]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib
from functools import partial

import jax
import jax.numpy as jnp

from flexlight_tpu import Config
from flexlight_tpu.ops import intersect_sparse as isp
from flexlight_tpu.ops.buffers import build_scene_buffers
from flexlight_tpu.ops.geometry import world_geometry
from flexlight_tpu.ops.intersect import POW32
from flexlight_tpu.ops.intersect_kernel import _prep_soa, _ray_features_t
from flexlight_tpu.ops.pathtrace import camera_rays
from flexlight_tpu.utils.compile_cache import enable_compile_cache
from flexlight_tpu.utils.devtime import device_time

enable_compile_cache()


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    buffers = build_scene_buffers(engine.scene)
    wg = world_geometry(buffers)
    s_tt = int(os.environ.get("FLEXLIGHT_SPARSE_TRI_TILE", "0")) or 128
    s_ck = int(os.environ.get("FLEXLIGHT_SPARSE_CHUNK", "0")) or 2
    sub = int(os.environ.get("FLEXLIGHT_SPARSE_SUBTILE", "8"))
    brt = int(os.environ.get("FLEXLIGHT_BOUNCE_RT", "0")) or 1024
    w4t, amin, amax, w4f = isp.build_w4_tiled(wg, buffers.id_buffer,
                                              tri_tile=s_tt)
    interp = jax.default_backend() == "cpu"
    print(f"=== sparse anatomy: {scene} {w}x{h} tiles={w4t.shape[0]} "
          f"tt={s_tt} ck={s_ck} sub={sub} brt={brt} ===", flush=True)

    view = jnp.asarray(engine.camera.view_matrix(w, h))
    pos = jnp.asarray(engine.camera.position)
    origin, direction, _ = camera_rays(w, h, pos, view)
    o3p = tuple(origin[:, c] for c in range(3))
    d3p = tuple(direction[:, c] for c in range(3))
    n = origin.shape[0]

    def t(tag, fn, *args, perturb_index=0):
        dt = device_time(fn, *args, iters=iters,
                        perturb_index=perturb_index)
        print(f"{tag}: {dt * 1000.0:.2f} ms", flush=True)
        return dt

    # ---- primary cast (coherent; prod: sort_rays=True unhinted) ----
    def prim(o3, d3, sort):
        return isp.traverse_sparse_soa(
            w4t, w4f, amin, amax, o3, d3, sort_rays=sort, ray_tile=1024,
            sort_mode="nearest2", subtile=sub, tri_tile=s_tt, chunk=s_ck,
            interpret=interp)

    t("P full primary cast (sorted, prod default)", partial(prim, sort=True),
      o3p, d3p)
    t("P full primary cast (UNSORTED)", partial(prim, sort=False), o3p, d3p)

    # component times on the primary wavefront
    max_len = jnp.full((n,), POW32, jnp.float32)

    def key_unhinted(o3, d3):
        return isp._sort_key_soa(amin, amax, o3, d3, max_len, s_tt,
                                 None, "nearest2", False, 1024)

    t("P sort key (octant+morton)", key_unhinted, o3p, d3p)

    def carry_roundtrip(o3, d3):
        key = key_unhinted(o3, d3)
        perm, cols = isp._carry_sort(key, (*o3, *d3, max_len))
        return isp._carry_unsort(perm, cols[0:4])

    t("P key + carry sort + unsort", carry_roundtrip, o3p, d3p)

    o3pp, d3pp, mlp, _, _ = _prep_soa(o3p, d3p, max_len, 1024 * sub)

    def flags(o3, d3, ml):
        rays = isp._rays8_soa(o3, d3, ml, 1024)
        return isp._flags_call(rays, amin, amax, s_tt, 1024, interp)

    t("P flags pass", flags, o3pp, d3pp, mlp)

    tmins_p = jax.jit(flags)(o3pp, d3pp, mlp)

    def compact(tm):
        return isp._compact(tm, s_ck)

    t("P compact (argsort tmins)", compact, tmins_p)

    tlist_p, tms_p, counts_p = jax.jit(partial(compact))(tmins_p)
    ft_p = jax.jit(_ray_features_t)(o3pp, d3pp)

    def kern(ft, ml):
        return isp._intersect_sparse(w4t, tlist_p, tms_p, counts_p, ft, ml,
                                     cull=False, tri_tile=s_tt,
                                     ray_tile=1024, chunk=s_ck, subtile=sub,
                                     interpret=interp)

    t("P worklist kernel only", kern, ft_p, mlp)

    s_key, tri_p = jax.jit(partial(kern))(ft_p, mlp)

    def recover(o3, d3, tri):
        wrow = jax.lax.optimization_barrier(w4f[jnp.maximum(tri[:n], 0)])
        fch = ([jnp.ones_like(o3[0][:n])] + [c[:n] for c in o3]
               + [c[:n] for c in d3]
               + [d3[c][:n] * o3[k][:n] for c in range(3) for k in range(3)])
        f = jnp.stack(fch, axis=-1)
        return (wrow.reshape(-1, 4, 16) * f[:, None, :]).sum(axis=-1)

    t("P exact recovery (gather+dot)", recover, o3pp, d3pp, tri_p)

    # ---- synthetic bounce wavefront: origins at primary hit points,
    # random hemisphere-ish directions; dead where the primary missed ----
    suv_tri = jax.jit(lambda o3, d3: isp.traverse_sparse_soa(
        w4t, w4f, amin, amax, o3, d3, sort_rays=False, ray_tile=1024,
        subtile=sub, tri_tile=s_tt, chunk=s_ck, interpret=interp))(o3p, d3p)
    hs, hu, hv, htri = suv_tri
    alive = htri >= 0
    hit3 = tuple(o3p[c] + hs * d3p[c] for c in range(3))
    key = jax.random.PRNGKey(0)
    rnd = jax.random.normal(key, (3, n))
    bd = tuple(rnd[c] + 0.05 * d3p[c] for c in range(3))
    norm = jnp.sqrt(sum(c * c for c in bd))
    bd3 = tuple(c / norm for c in bd)
    bo3 = tuple(jnp.where(alive, hit3[c], 0.0) for c in range(3))
    bd3 = tuple(jnp.where(alive, bd3[c], 1.0) for c in range(3))
    frac = float(jnp.mean(alive.astype(jnp.float32)))
    print(f"bounce wavefront: alive fraction {frac:.3f}", flush=True)

    def bounce(o3, d3, sort):
        return isp.traverse_sparse_soa(
            w4t, w4f, amin, amax, o3, d3, sort_rays=sort, alive=alive,
            sort_hint=htri, sort_mode="nearest2", ray_tile=brt,
            subtile=sub, tri_tile=s_tt, chunk=s_ck, interpret=interp)

    t("B full bounce cast (nearest2 sorted)", partial(bounce, sort=True),
      bo3, bd3)
    t("B full bounce cast (UNSORTED)", partial(bounce, sort=False), bo3, bd3)

    bml = jnp.where(alive, jnp.full((n,), POW32, jnp.float32), 0.0)

    def bkey(o3, d3):
        return isp.nearest2_key_soa(amin, amax, o3, d3, bml, ray_tile=brt,
                                    interpret=interp)

    t("B nearest2 key pass", bkey, bo3, bd3)

    def bcarry(o3, d3):
        key = bkey(o3, d3)
        perm, cols = isp._carry_sort(key, (*o3, *d3, bml))
        return isp._carry_unsort(perm, cols[0:4])

    t("B key + carry sort + unsort", bcarry, bo3, bd3)

    # sorted wavefront for the component times below
    keyv = jax.jit(bkey)(bo3, bd3)
    perm, cols = jax.jit(isp._carry_sort)(keyv, (*bo3, *bd3, bml))
    so3, sd3, sml = cols[0:3], cols[3:6], cols[6]
    so3, sd3, sml, _, _ = _prep_soa(so3, sd3, sml, brt * sub)

    def bflags(o3, d3, ml):
        rays = isp._rays8_soa(o3, d3, ml, brt)
        return isp._flags_call(rays, amin, amax, s_tt, brt, interp)

    t("B flags pass (sorted)", bflags, so3, sd3, sml)
    tmins_b = jax.jit(bflags)(so3, sd3, sml)
    t("B compact", compact, tmins_b)
    tlist_b, tms_b, counts_b = jax.jit(partial(compact))(tmins_b)
    ft_b = jax.jit(_ray_features_t)(so3, sd3)

    def bkern(ft, ml):
        return isp._intersect_sparse(w4t, tlist_b, tms_b, counts_b, ft, ml,
                                     cull=False, tri_tile=s_tt,
                                     ray_tile=brt, chunk=s_ck, subtile=sub,
                                     interpret=interp)

    t("B worklist kernel only", bkern, ft_b, sml)

    def bshadow(ft, ml):
        return isp._any_hit_sparse(w4t, tlist_b, counts_b, ft, ml,
                                   tri_tile=s_tt, ray_tile=brt, chunk=s_ck,
                                   subtile=sub, interpret=interp)

    t("B shadow kernel only (same worklists)", bshadow, ft_b, sml)


if __name__ == "__main__":
    main()
