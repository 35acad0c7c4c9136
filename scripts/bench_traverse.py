#!/usr/bin/env python
"""Component-level device timing of the sparse traversal at dragon scale.

Measures, on 1920x1080 = ~2.07M rays against dragon_lp (43.6k tris):
  - flags prepass (Pallas slab kernel)
  - spatial sort (argsort + permute)
  - worklist compaction (argsort over flags)
  - closest-hit kernel on coherent (primary) vs incoherent (diffuse) rays
  - any-hit (shadow) kernel on incoherent rays
  - full render_mrt for reference

Incoherent rays synthesize a post-bounce wavefront: origins on scene
surfaces (random triangle points), cosine-ish random directions.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

from flexlight_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from flexlight_tpu.ops.buffers import build_scene_buffers
from flexlight_tpu.ops.geometry import world_geometry
from flexlight_tpu.ops.intersect import POW32
from flexlight_tpu.ops.intersect_sparse import (
    _any_hit_sparse, _apply_perm_rays, _compact, _intersect_sparse,
    build_w4_tiled, flags_sparse, sort_spatial, traverse_sparse)
from flexlight_tpu.ops.intersect_kernel import _prep
from flexlight_tpu.ops.traverse_mxu import _ray_features
from flexlight_tpu.ops.pathtrace import camera_rays
from flexlight_tpu.utils.devtime import report

W, H = 1920, 1080
N = W * H


def main():
    import dragon as dragon_mod

    engine = dragon_mod.build_scene()
    engine = engine[0] if isinstance(engine, tuple) else engine
    scene, camera = engine.scene, engine.camera
    buffers = build_scene_buffers(scene)
    geom = world_geometry(buffers)
    w4t, amin, amax, w4f = build_w4_tiled(geom, buffers.id_buffer)
    print(f"tris={buffers.id_buffer.shape[0]} worklist_tiles={w4t.shape[0]}",
          flush=True)

    view = jnp.asarray(camera.view_matrix(W, H))
    pos = jnp.asarray(camera.position)
    o_p, d_p, _ = camera_rays(W, H, pos, view)

    # synthetic post-bounce wavefront: origins on random triangles
    rng = np.random.default_rng(0)
    tris = np.asarray(geom[buffers.id_buffer][:, 0:9]).reshape(-1, 3, 3)
    ti = rng.integers(0, tris.shape[0], N)
    u = rng.uniform(0, 1, (N, 1)); v = rng.uniform(0, 1, (N, 1))
    over = (u + v) > 1
    u = np.where(over, 1 - u, u); v = np.where(over, 1 - v, v)
    o_b = jnp.asarray(tris[ti, 0] + u * (tris[ti, 1] - tris[ti, 0])
                      + v * (tris[ti, 2] - tris[ti, 0]), jnp.float32)
    dr = rng.normal(size=(N, 3))
    dr /= np.linalg.norm(dr, axis=1, keepdims=True)
    d_b = jnp.asarray(dr, jnp.float32)
    ml = jnp.full((N,), POW32, dtype=jnp.float32)

    lo = jnp.min(amin, axis=0); hi = jnp.max(amax, axis=0)

    def flags_fn(o, d, ml):
        op, dp, mlp, _, _ = _prep(o, d, ml, 1024)
        return flags_sparse(amin, amax, op, dp, mlp)

    def sort_fn(o, d, ml):
        perm, inv = sort_spatial(o, d, lo, hi, ml)
        return _apply_perm_rays(o, d, ml, perm)[0]

    def compact_fn(tmins):
        return _compact(tmins, 4)[0]

    def kernel_fn(o, d, ml):
        op, dp, mlp, _, _ = _prep(o, d, ml, 1024)
        tmins = flags_sparse(amin, amax, op, dp, mlp)
        tlist, tms, counts = _compact(tmins, 4)
        f = _ray_features(op, dp)
        return _intersect_sparse(w4t, tlist, tms, counts, f, mlp,
                                 cull=False)[0]

    def shadow_fn(o, d, ml):
        op, dp, mlp, _, _ = _prep(o, d, ml, 1024)
        tmins = flags_sparse(amin, amax, op, dp, mlp)
        tlist, _, counts = _compact(tmins, 4)
        f = _ray_features(op, dp)
        return _any_hit_sparse(w4t, tlist, counts, f, mlp)

    for name, o, d in [("primary", o_p, d_p), ("bounce", o_b, d_b)]:
        tmins = flags_fn(o, d, ml)
        mean_wl = float((tmins < POW32).sum(axis=1).mean())
        print(f"{name}: mean worklist = {mean_wl:.1f} / {w4t.shape[0]}",
              flush=True)
        report(f"  flags[{name}]", flags_fn, o, d, ml, iters=4)
        report(f"  sort[{name}]", sort_fn, o, d, ml, iters=4)
        report(f"  kernel(closest)[{name}]", kernel_fn, o, d, ml, iters=4)
        report(f"  full(closest,sorted)[{name}]",
               lambda o, d, ml: traverse_sparse(w4t, w4f, amin, amax, o, d,
                                                sort_rays=True).suv,
               o, d, ml, iters=4)
        report(f"  kernel(anyhit)[{name}]", shadow_fn, o, d, ml, iters=4)


if __name__ == "__main__":
    main()
