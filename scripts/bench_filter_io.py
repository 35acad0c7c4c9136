#!/usr/bin/env python
"""Measure the filter chain's INTER-PASS io cost at 1080p: the
[C,H,W] -> [H,W,4] transpose + pack_rgba8 round trip every pass pays in
XLA, vs the packed [H,W] int32 planes a packed-pipeline chain would
carry (VERDICT r5 item 3). Also one second_filter_tpu pass end-to-end
(fast mode) as the in-situ control.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from flexlight_tpu.post.filter_kernel import (pack_rgba8, second_filter_tpu,
                                              final_filter_tpu)
from flexlight_tpu.utils.compile_cache import enable_compile_cache
from flexlight_tpu.utils.devtime import device_time

enable_compile_cache()

H, W = 1080, 1920


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    q = lambda k, c=4: jnp.round(
        jax.random.uniform(k, (H, W, c)) * 255.0) / 255.0
    color, ip, ocolor, ids, oid = (q(ks[i]) for i in range(5))
    # fast-mode operating point: tile-uniform blur keys
    from flexlight_tpu.post.common import tileize_blur_key
    ocolor = tileize_blur_key(ocolor)
    oid = jnp.concatenate([oid[..., 0:3] * 0.0,
                           jnp.where(oid[..., 3:4] > 0.9, oid[..., 3:4],
                                     0.0)], axis=-1)
    chw = jnp.transpose(color, (2, 0, 1))  # [4, H, W] f32 (kernel output form)

    def t(tag, fn, *args, perturb_index=0):
        dt = device_time(fn, *args, iters=iters, perturb_index=perturb_index)
        print(f"{tag}: {dt * 1000.0:.2f} ms", flush=True)
        return dt

    # the per-pass epilogue+prologue io: [C,hp,wp] -> [H,W,4] -> packed
    def io_roundtrip(chw):
        hwc = jnp.transpose(chw, (1, 2, 0))
        return pack_rgba8(hwc)

    t("io: [4,H,W] -> [H,W,4] -> packed int32", io_roundtrip, chw)

    def pack_chw(chw):
        b = jnp.round(chw * 255.0).astype(jnp.int32)
        return b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)

    t("io: [4,H,W] -> packed int32 (channels-first, no transpose)",
      pack_chw, chw)

    t("io: pack_rgba8([H,W,4]) alone", pack_rgba8, color)

    def transpose_only(chw):
        return jnp.transpose(chw, (1, 2, 0)) + 0.0

    t("io: transpose [4,H,W]->[H,W,4] alone", transpose_only, chw)

    # in-situ control: one fast-mode second pass end-to-end ([H,W,4] io)
    def second(color):
        return second_filter_tpu(color, ip, ocolor, ids, oid,
                                 ty=32, compact=True)[0]

    t("second_filter_tpu fast (end-to-end, hwc io)", second, color)

    def final(color):
        return final_filter_tpu(color, ip, ocolor, ids, oid, False,
                                ty=32, compact=True)

    t("final_filter_tpu fast (end-to-end, hwc io)", final, color)

    os.environ["FLEXLIGHT_FILTER_ALIGNTEST"] = "1"

    def second_at(color):
        return second_filter_tpu(color, ip, ocolor, ids, oid,
                                 ty=32, compact=True)[0]

    t("second fast ALIGNTEST (realign share; wrong results)", second_at,
      color)

    def final_at(color):
        return final_filter_tpu(color, ip, ocolor, ids, oid, False,
                                ty=32, compact=True)

    t("final fast ALIGNTEST (wrong results)", final_at, color)
    del os.environ["FLEXLIGHT_FILTER_ALIGNTEST"]


if __name__ == "__main__":
    main()
