#!/usr/bin/env python
"""Isolate the fused_split XLA tex stage's cost terms (theater 1080p):
the legacy bounce_tex pipelines, each table's fetch alone, the raw
big-table gather, a packed-rgb-in-one-f32 gather variant, and the tex
block pack. Informs the round-5 tex-stage rewrite (VERDICT r5 item 1).
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib

import jax
import jax.numpy as jnp

from flexlight_tpu.ops.buffers import build_scene_buffers, fetch_tex_val_table
from flexlight_tpu.utils.compile_cache import enable_compile_cache
from flexlight_tpu.utils.devtime import device_time

enable_compile_cache()


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "theater"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    g, rt, rb = 2025, 1024, 8
    n = g * rt
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    b = build_scene_buffers(engine.scene)
    key = jax.random.PRNGKey(0)
    ku, kv, kt = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (g, rt))
    v = jax.random.uniform(kv, (g, rt))
    # ~20% miss, rest uniform over the 2 real textures
    tex_num = jnp.floor(jax.random.uniform(kt, (g, rt)) * 2.5) - 1.0
    d3 = (u * 0.5, v * 0.5, u * 0.25)

    def t(tag, fn, *args, perturb_index=0):
        dt = device_time(fn, *args, iters=iters, perturb_index=perturb_index)
        print(f"{tag}: {dt * 1000.0:.2f} ms", flush=True)
        return dt

    def fetch(tab):
        def f(u, v, tex_num):
            return fetch_tex_val_table(tab, u, v, tex_num, d3)
        return f

    t("albedo fetch_tex_val_table (262k u8, gather)", fetch(b.albedo_tab),
      u, v, tex_num)
    t("pbr fetch_tex_val_table (36 texels, one-hot)", fetch(b.pbr_tab),
      u, v, tex_num)
    t("tpo fetch_tex_val_table (2 texels, one-hot)", fetch(b.tpo_tab),
      u, v, tex_num)

    # raw albedo row gather + channel split (the flavor-3 'xla' residue)
    tab = b.albedo_tab
    kmax = tab.texels.shape[0] - 1
    idx = jnp.floor(u * kmax).astype(jnp.int32)

    def raw_gather(u, idx):
        s = tab.texels[jnp.clip(idx, 0, kmax)].astype(jnp.float32)
        s = s * jnp.float32(1.0 / 255.0)
        return tuple(s[..., c] + u * 0.0 for c in range(3))

    t("raw u8 [262k,3] row gather + 3 channel slices", raw_gather, u, idx)

    # packed variant: rgb in one f32 (exact, < 2^24), row width 8
    tex = tab.texels.astype(jnp.uint32)
    packed = (tex[:, 0] << 16) | (tex[:, 1] << 8) | tex[:, 2]
    packed8 = jnp.tile(packed.astype(jnp.float32)[:, None], (1, 8))

    def packed_gather(u, idx):
        p = packed8[jnp.clip(idx, 0, kmax)][..., 0]
        r = jnp.floor(p * (1.0 / 65536.0))
        rem = p - r * 65536.0
        gc = jnp.floor(rem * (1.0 / 256.0))
        bc = rem - gc * 256.0
        s = jnp.float32(1.0 / 255.0)
        return (r * s + u * 0.0, gc * s, bc * s)

    t("packed-f32 [262k,8] gather + unpack", packed_gather, u, idx)

    def packed4_gather(u, idx):
        p = packed8[:, :4][jnp.clip(idx, 0, kmax)][..., 0]
        r = jnp.floor(p * (1.0 / 65536.0))
        rem = p - r * 65536.0
        gc = jnp.floor(rem * (1.0 / 256.0))
        bc = rem - gc * 256.0
        s = jnp.float32(1.0 / 255.0)
        return (r * s + u * 0.0, gc * s, bc * s)

    t("packed-f32 [262k,4] gather + unpack", packed4_gather, u, idx)

    # tex block pack alone (16 channels [g, rt] -> [G, 16, rb, 128])
    def pack(u):
        chans = [u * float(c) for c in range(16)]
        return jnp.stack(chans, axis=1).reshape(g, 16, rb, 128)

    t("tex block pack (16 ch stack)", pack, u)

    def pack8(u):
        chans = [u * float(c) for c in range(8)]
        return jnp.stack(chans, axis=1).reshape(g, 8, rb, 128)

    t("tex block pack (8 ch stack)", pack8, u)

    # state-slice read: 14 channels of a [G, 64, rb, 128] block
    state = jnp.zeros((g, 64, rb, 128), jnp.float32) + u.reshape(
        g, 1, rb, 128)

    def slices(state):
        acc = 0.0
        for j in range(40, 54):
            acc = acc + state[:, j].reshape(g, rt)
        return acc

    t("state read (14 ch slices)", slices, state)


if __name__ == "__main__":
    main()
