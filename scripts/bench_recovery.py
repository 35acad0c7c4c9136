#!/usr/bin/env python
"""Variants of the sparse path's exact (s,u,v) recovery — the [n,64] w4f
gather + per-row 16-wide dots measured 39.6 ms at dragon 1080p (round-5
anatomy). The [n,4,16] intermediate lane-pads 16 -> 128 (8x traffic);
these variants restructure the layout.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib

import jax
import jax.numpy as jnp

from flexlight_tpu.ops.buffers import build_scene_buffers
from flexlight_tpu.ops.geometry import world_geometry
from flexlight_tpu.ops.intersect_sparse import build_w4_tiled
from flexlight_tpu.utils.compile_cache import enable_compile_cache
from flexlight_tpu.utils.devtime import device_time

enable_compile_cache()


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = 2073600
    mod = importlib.import_module("dragon")
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    b = build_scene_buffers(engine.scene)
    wg = world_geometry(b)
    _, _, _, w4f = build_w4_tiled(wg, b.id_buffer)
    tp = w4f.shape[0]
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    tri = jax.random.randint(k1, (n,), 0, tp)
    fch = [jax.random.uniform(k2, (n,)) + 0.01 * i for i in range(16)]
    f = jnp.stack(fch, axis=-1)
    w4f_128 = jnp.pad(w4f, ((0, 0), (0, 64)))
    w4f_i32 = w4f.view(jnp.int32) if hasattr(w4f, "view") else None

    def t(tag, fn, *args):
        dt = device_time(fn, *args, iters=iters)
        print(f"{tag}: {dt * 1000.0:.2f} ms", flush=True)

    def current(f, tri):
        w = jax.lax.optimization_barrier(w4f[jnp.maximum(tri, 0)])
        return (w.reshape(-1, 4, 16) * f[:, None, :]).sum(axis=-1)

    t("A current ([n,4,16] reduce)", current, f, tri)

    def nobarrier(f, tri):
        w = w4f[jnp.maximum(tri, 0)]
        return (w.reshape(-1, 4, 16) * f[:, None, :]).sum(axis=-1)

    t("B no barrier", nobarrier, f, tri)

    def chanmajor(f, tri):
        w = jax.lax.optimization_barrier(w4f[jnp.maximum(tri, 0)])
        wt = w.T                                   # [64, n]
        outs = []
        for p in range(4):
            acc = wt[16 * p] * fch[0]
            for k in range(1, 16):
                acc = acc + wt[16 * p + k] * fch[k]
            outs.append(acc)
        return outs

    t("C channel-major (transpose + 64 FMAs)", chanmajor, f, tri)

    def pad128(f, tri):
        w = jax.lax.optimization_barrier(w4f_128[jnp.maximum(tri, 0)])
        f4 = jnp.concatenate([f, f, f, f, f * 0.0, f * 0.0, f * 0.0,
                              f * 0.0], axis=-1)   # [n, 128]
        prod = w * f4
        return [prod[:, 16 * p:16 * p + 16].sum(-1) for p in range(4)]

    t("D [n,128]-row gather + slice reduces", pad128, f, tri)

    def dots64(f, tri):
        w = jax.lax.optimization_barrier(w4f[jnp.maximum(tri, 0)])
        f4 = jnp.concatenate([f, f, f, f], axis=-1)  # [n, 64]
        prod = w * f4
        return [prod[:, 16 * p:16 * p + 16].sum(-1) for p in range(4)]

    t("E [n,64] gather + slice reduces", dots64, f, tri)


if __name__ == "__main__":
    main()
