#!/usr/bin/env python
"""Bisect fetch_tex_val_table's 7.9 ms cost for the theater albedo table
(262k texels u8, 4 slots): index arithmetic alone, + slot info (one-hot
vs select-chain vs row gather), + final texel gather, full. The isolated
raw gather is 0.31 ms (bench_texstage), so ~7.6 ms hides in this chain.
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
from flexlight_tpu.utils.compile_cache import enable_compile_cache
from flexlight_tpu.utils.devtime import device_time

enable_compile_cache()


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    g, rt = 2025, 1024
    mod = importlib.import_module("theater")
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    b = build_scene_buffers(engine.scene)
    tab = b.albedo_tab
    texels, tile_info, meta = tab
    n_slots = tile_info.shape[0]
    key = jax.random.PRNGKey(0)
    ku, kv, kt = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (g, rt))
    v = jax.random.uniform(kv, (g, rt))
    tex_num = jnp.floor(jax.random.uniform(kt, (g, rt)) * 2.5) - 1.0

    def t(tag, fn, *args):
        dt = device_time(fn, *args, iters=iters)
        print(f"{tag}: {dt * 1000.0:.2f} ms", flush=True)

    def index_math(u, v, tex_num):
        std_w, std_h, tpr = meta[0], meta[1], meta[2]
        hf = meta[3].astype(jnp.float32)
        wf = meta[4].astype(jnp.float32)
        tw = tpr.astype(jnp.float32)
        height_factor = wf / hf
        cx = (u + jnp.mod(tex_num, tw)) / tw
        cy = (v + jnp.floor(tex_num / tw)) * height_factor / tw
        px = jnp.clip(jnp.floor(jnp.mod(cx, 1.0) * wf).astype(jnp.int32),
                      0, meta[4] - 1)
        py = jnp.clip(jnp.floor(jnp.mod(cy, 1.0) * hf).astype(jnp.int32),
                      0, meta[3] - 1)
        col = px // std_w
        row = py // std_h
        slot = jnp.clip(row * tpr + col, 0, n_slots - 1)
        return px, py, col, row, slot

    t("A index math only", lambda u, v, tn: index_math(u, v, tn), u, v,
      tex_num)

    def with_info_onehot(u, v, tn):
        px, py, col, row, slot = index_math(u, v, tn)
        hot = (slot[..., None] == jnp.arange(n_slots)).astype(jnp.float32)
        info = jnp.dot(hot, tile_info.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
        return info[..., 0], info[..., 1], info[..., 2], px, py, col, row

    t("B + slot info one-hot (current)", with_info_onehot, u, v, tex_num)

    def with_info_select(u, v, tn):
        import numpy as np
        px, py, col, row, slot = index_math(u, v, tn)
        ti = np.asarray(tile_info)
        off = jnp.zeros_like(slot)
        sw = jnp.zeros_like(slot)
        sh = jnp.zeros_like(slot)
        for s in range(n_slots):
            is_s = slot == s
            off = jnp.where(is_s, int(ti[s, 0]), off)
            sw = jnp.where(is_s, int(ti[s, 1]), sw)
            sh = jnp.where(is_s, int(ti[s, 2]), sh)
        return off, sw, sh, px, py, col, row

    t("C + slot info select-chain", with_info_select, u, v, tex_num)

    def idx_from(info_fn, u, v, tn):
        off, sw, sh, px, py, col, row = info_fn(u, v, tn)
        std_w, std_h, tpr = meta[0], meta[1], meta[2]
        sx = ((px - col * std_w) * sw) // std_w
        sy = ((py - row * std_h) * sh) // std_h
        return off + sy * sw + sx

    t("D idx (one-hot info)", lambda u, v, tn: idx_from(with_info_onehot,
                                                        u, v, tn),
      u, v, tex_num)
    t("E idx (select info)", lambda u, v, tn: idx_from(with_info_select,
                                                       u, v, tn),
      u, v, tex_num)

    def full(info_fn, u, v, tn):
        idx = idx_from(info_fn, u, v, tn)
        sampled = texels[idx].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        miss = tn == -1.0
        return tuple(jnp.where(miss, u * 0.5, sampled[..., c])
                     for c in range(3))

    t("F full (one-hot info)", lambda u, v, tn: full(with_info_onehot,
                                                     u, v, tn),
      u, v, tex_num)
    t("G full (select info)", lambda u, v, tn: full(with_info_select,
                                                    u, v, tn),
      u, v, tex_num)

    def full_f32div(u, v, tn):
        """All-f32 index math (no i32 div/mod): exact below 2^24."""
        import numpy as np
        std_w = meta[0].astype(jnp.float32)
        std_h = meta[1].astype(jnp.float32)
        tw = meta[2].astype(jnp.float32)
        hf = meta[3].astype(jnp.float32)
        wf = meta[4].astype(jnp.float32)
        height_factor = wf / hf
        cx = (u + jnp.mod(tn, tw)) / tw
        cy = (v + jnp.floor(tn / tw)) * height_factor / tw
        px = jnp.clip(jnp.floor(jnp.mod(cx, 1.0) * wf), 0.0, wf - 1.0)
        py = jnp.clip(jnp.floor(jnp.mod(cy, 1.0) * hf), 0.0, hf - 1.0)
        col = jnp.floor(px / std_w)
        row = jnp.floor(py / std_h)
        slot = jnp.clip(row * tw + col, 0.0, float(n_slots - 1))
        ti = np.asarray(tile_info)
        off = jnp.zeros_like(slot)
        sw = jnp.zeros_like(slot)
        sh = jnp.zeros_like(slot)
        for s in range(n_slots):
            is_s = slot == float(s)
            off = jnp.where(is_s, float(ti[s, 0]), off)
            sw = jnp.where(is_s, float(ti[s, 1]), sw)
            sh = jnp.where(is_s, float(ti[s, 2]), sh)
        sx = jnp.floor((px - col * std_w) * sw / std_w)
        sy = jnp.floor((py - row * std_h) * sh / std_h)
        idx = (off + sy * sw + sx).astype(jnp.int32)
        sampled = texels[idx].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        miss = tn == -1.0
        return tuple(jnp.where(miss, u * 0.5, sampled[..., c])
                     for c in range(3))

    t("H full (all-f32 math + select info)", full_f32div, u, v, tex_num)

    def full_barrier(info_fn, u, v, tn):
        idx = idx_from(info_fn, u, v, tn)
        idx = jax.lax.optimization_barrier(
            jnp.clip(idx, 0, texels.shape[0] - 1))
        sampled = texels[idx].astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        sampled = jax.lax.optimization_barrier(sampled)
        miss = tn == -1.0
        return tuple(jnp.where(miss, u * 0.5, sampled[..., c])
                     for c in range(3))

    t("I full (one-hot info, BARRIER gather)",
      lambda u, v, tn: full_barrier(with_info_onehot, u, v, tn),
      u, v, tex_num)
    t("J full (select info, BARRIER gather)",
      lambda u, v, tn: full_barrier(with_info_select, u, v, tn),
      u, v, tex_num)


if __name__ == "__main__":
    main()
