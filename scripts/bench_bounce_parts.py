#!/usr/bin/env python
"""Additive per-part timing of the bounce pipeline at 1080p scale.

The DEBUG_DISABLE stub ablation came back wildly non-additive on theater
(removing reservoir+texfetch+interp together saved 4 ms while reservoir
alone "saved" 71 — stubs reshuffle XLA fusion). This bench instead times
each part IN ISOLATION with device_time on realistic shapes, giving an
additive budget to hold against the measured full frame:

  flat3        SoA [N] x3 -> [N, 3] stack (lane-padded minor dim)
  feat-row     _ray_features from [N, 3] (the current path)
  feat-soa     the same 16 features built channel-major [16, N]
  cast         traverse_kernel / shadow_kernel full cast (flags+features)
  matfetch     fetch_rows_t(mat, tri) + the 49 row reads
  pre/shade/apply/commit-skeleton   the per-bounce XLA stages, isolated

Usage: python scripts/bench_bounce_parts.py [scene] [W H]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib

import numpy as np

import jax
import jax.numpy as jnp

from flexlight_tpu import Config
import flexlight_tpu.ops.pathtrace as pt
from flexlight_tpu.ops import vec3 as v3
from flexlight_tpu.ops.geometry import world_geometry
from flexlight_tpu.ops.intersect_kernel import (build_w4, pick_tri_tile,
                                                shadow_kernel,
                                                traverse_kernel)
from flexlight_tpu.ops.traverse_mxu import _ray_features
from flexlight_tpu.utils.devtime import report


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "theater"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    engine.canvas = (w, h)
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    buffers = renderer._buffers
    config = Config(samples_per_ray=1, max_reflections=5, temporal=False,
                    filter=False, antialiasing=None)

    n = w * h
    rng = np.random.default_rng(3)
    geom = world_geometry(buffers)
    tri_tile = pick_tri_tile(buffers.id_buffer.shape[0])
    w4, amin, amax, ids = build_w4(geom, buffers.id_buffer, tri_tile)
    n_tris = buffers.id_buffer.shape[0]

    # bounce-like rays: origins on scene surfaces, random directions
    centers = np.asarray(geom[:, 0:9]).reshape(-1, 3, 3).mean(axis=1)
    o_np = centers[rng.integers(0, centers.shape[0], n)].astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o3 = tuple(jnp.asarray(o_np[:, c]) for c in range(3))
    d3 = tuple(jnp.asarray(d_np[:, c]) for c in range(3))
    onx3 = jnp.asarray(o_np)
    dnx3 = jnp.asarray(d_np)
    tri = jnp.asarray(rng.integers(0, n_tris, n, dtype=np.int32))
    ml = jnp.full((n,), 100.0, jnp.float32)

    rt = int(os.environ.get("FLEXLIGHT_DENSE_RAY_TILE", "0")) or 1024
    interp = jax.default_backend() == "cpu"

    report("flat3 (SoA -> [N,3])",
           lambda a, b, c: jnp.stack([a, b, c], axis=-1), *o3, iters=8)
    report("feat-row ([N,3] -> [N,16])",
           lambda o, d: _ray_features(o, d), onx3, dnx3, iters=8)

    def feat_soa(o3a, o3b, o3c, d3a, d3b, d3c):
        one = jnp.ones_like(o3a)
        o = (o3a, o3b, o3c)
        d = (d3a, d3b, d3c)
        rows = [one, *o, *d]
        for c in range(3):
            for k in range(3):
                rows.append(d[c] * o[k])
        return jnp.stack(rows, axis=0)           # [16, N], N minor

    report("feat-soa (SoA -> [16,N])", feat_soa, *o3, *d3, iters=8)
    report(f"cast closest (rt={rt})",
           lambda o, d: traverse_kernel(w4, amin, amax, ids, o, d,
                                        tri_tile=tri_tile, ray_tile=rt,
                                        interpret=interp).suv[:, 0],
           onx3, dnx3, iters=4)
    report(f"cast anyhit (rt={rt})",
           lambda o, d, m: shadow_kernel(w4, amin, amax, ids, o, d, m,
                                         tri_tile=tri_tile, ray_tile=rt,
                                         interpret=interp
                                         ).astype(jnp.float32),
           onx3, dnx3, ml, iters=4)

    mat = pt.build_material_table(buffers, geom)
    report("matfetch (rows [49,N])",
           lambda t: pt.fetch_rows_t(mat, jnp.abs(t).astype(jnp.int32)),
           tri.astype(jnp.float32), iters=8)

    # isolated per-bounce XLA stages (one bounce's worth each)
    zero = jnp.zeros((n,), jnp.float32)
    aux = ((zero, zero, zero, zero), (zero, zero, zero, zero), zero, zero,
           zero, jnp.ones((n,), jnp.float32))
    carry = pt.bounce_carry_init(
        (zero + 0.5, zero + 0.25, zero + 0.25, tri), jnp.zeros(3), d3, aux)
    ndc2 = (o3[0] * 0.001, o3[1] * 0.001)

    def stage_pre(hs):
        c, surface = pt.bounce_pre(carry._replace(hs=hs), 1, mat, config)
        return surface.smooth_normal[0] + surface.bary_u

    report("bounce_pre (matfetch+interp)", stage_pre, carry.hs + 0.1,
           iters=4)

    def stage_shade(hs):
        c = carry._replace(hs=hs)
        _, surface = pt.bounce_pre(c, 1, mat, config)
        tex = pt.bounce_tex(buffers, surface)
        c2, req = pt.bounce_shade(c, surface, tex, 1, buffers,
                                  jnp.zeros(3), ndc2, jnp.float32(1.0),
                                  config, jnp.float32(0.0))
        return req.roughness_brdf + req.pick.max_len

    report("pre+tex+shade (incl reservoir)", stage_shade, carry.hs + 0.1,
           iters=4)

    def stage_apply_nextdir(hs):
        c = carry._replace(hs=hs)
        _, surface = pt.bounce_pre(c, 1, mat, config)
        tex = pt.bounce_tex(buffers, surface)
        c2, req = pt.bounce_shade(c, surface, tex, 1, buffers,
                                  jnp.zeros(3), ndc2, jnp.float32(1.0),
                                  config, jnp.float32(0.0))
        shadowed = jnp.zeros_like(hs, dtype=bool)
        c3 = pt.bounce_apply(c2, tex, req, shadowed, 1, config)
        return c3.final_color[0] + c3.ray_dir[0]

    report("...+apply/nextdir (no casts)", stage_apply_nextdir,
           carry.hs + 0.1, iters=4)

    # Whole-frame marginal decomposition: frame(mr=k) adds exactly one
    # bounce per k, so the slope is the true per-bounce cost (with all
    # fusion effects) and the k=0 intercept = camera gen + primary cast
    # + MRT pack. Locates the budget gap the isolated stages leave.
    from flexlight_tpu.ops.pathtrace import render_mrt

    cam = jnp.zeros(3)
    scheme = renderer._resolved_scheme()

    for mr in (0, 1, 2, 3, 5):
        cfg = config.replace(max_reflections=mr)

        def frame(seed, cfg=cfg):
            mrt_out = render_mrt(buffers, w, h, cam, jnp.eye(3), cfg,
                                 seed, scheme=scheme)
            # consume EVERY channel: returning only color lets XLA DCE
            # the id-packing chains (first run's mr=0 measured 0.0 ms)
            return sum(jnp.sum(x) for x in jax.tree.leaves(mrt_out))

        report(f"frame direct mr={mr} ({scheme})", frame, jnp.float32(0.0),
               iters=4)


if __name__ == "__main__":
    main()
