#!/usr/bin/env python
"""Per-pass device cost of the REAL fast-mode filter chain (theater).

The r4b anatomy showed synthetic-uniform first at 2.0 ms while the real
fast chain totals ~43 ms over 7 passes — this script renders a real
theater MRT frame, builds the exact fast-chain inputs (temporal +
tileized keys), and times each pass and the whole chain device-side.

Usage: python scripts/bench_fastchain.py [scene] [W H]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib

import jax
import jax.numpy as jnp

from flexlight_tpu import Config
from flexlight_tpu.utils.compile_cache import enable_compile_cache
from flexlight_tpu.utils.devtime import report

enable_compile_cache()


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "theater"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    config = Config(samples_per_ray=1, max_reflections=5, temporal=True,
                    temporal_samples=4, filter=True, antialiasing="fxaa",
                    filter_mode="fast")
    engine.canvas = (w, h)
    engine.config = config
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    buffers = renderer._buffers
    view = jnp.asarray(engine.camera.view_matrix(w, h))
    pos = jnp.asarray(engine.camera.position)

    from flexlight_tpu.models.pathtracer import (_filter_chain,
                                                 _filter_passes,
                                                 _quantized_mrt)
    from flexlight_tpu.ops.pathtrace import render_mrt
    from flexlight_tpu.post.common import split_hdr, quantize_rgba8, tileize_blur_key
    from flexlight_tpu.post.temporal import TemporalState, push_frame, temporal_average

    scheme = renderer._resolved_scheme()
    mrt = render_mrt(buffers, w, h, pos, view, config, jnp.float32(0.0),
                     scheme=scheme)
    mrt = jax.tree.map(jax.block_until_ready, mrt)
    _, _, color_q, ip_q, id_q, oid_q, ocolor_q = _quantized_mrt(mrt, h, w)
    state = TemporalState.create(4, h, w)
    state = push_frame(state, color_q, ip_q, id_q, oid_q)
    t_color, t_glass, center_w = temporal_average(state)
    frac_q, high_q = split_hdr(t_color)
    r0 = jnp.concatenate([frac_q, center_w[..., None]], axis=-1)
    ip0 = jnp.concatenate([high_q, quantize_rgba8(t_glass)[..., None]],
                          axis=-1)
    r0, ip0, ocolor_q, id_q, oid_q = map(
        jax.block_until_ready, (r0, ip0, ocolor_q, id_q, oid_q))

    # whole chain
    def chain(r0, ip0, oc, idq, oid):
        return _filter_chain(config, r0, ip0, oc, idq, oid,
                             post_scheme="auto")

    report("fast chain total (3+3+final)", chain, r0, ip0, ocolor_q, id_q,
           oid_q, iters=4)

    # individual passes on realistic inputs
    from functools import partial

    from flexlight_tpu.post.filter_kernel import (final_filter_tpu,
                                                  first_filter_tpu,
                                                  second_filter_tpu)

    first_fn, second_fn, final_fn = _filter_passes("kernel", fast=True)
    key = tileize_blur_key(ocolor_q)
    key = jax.block_until_ready(key)

    report("first pass (fast default ty=32)", lambda a, b, c, d, e:
           first_fn(a, b, c, d, e), r0, ip0, key, id_q, oid_q, iters=6)
    c1, p1, id1 = first_fn(r0, ip0, key, id_q, oid_q)
    c1, p1, id1 = map(jax.block_until_ready, (c1, p1, id1))
    report("second pass (fast default: banded ty=32 compact)",
           lambda a, b, c, d, e: second_fn(a, b, c, d, e),
           c1, p1, key, id1, oid_q, iters=6)
    c2, p2, oc2 = second_fn(c1, p1, key, id1, oid_q)
    c2, p2, oc2 = map(jax.block_until_ready, (c2, p2, oc2))
    key2 = jax.block_until_ready(tileize_blur_key(oc2))
    report("final pass (fast default: banded ty=32 compact)",
           lambda a, b, c, d, e: final_fn(a, b, c, d, e, True),
           c2, p2, key2, id1, oid_q, iters=6)
    # the tileize quantizer itself (applied per consumed ocolor)
    report("tileize_blur_key", tileize_blur_key, ocolor_q, iters=8)

    # variants: unbanded single call (per-offset pl.when does the skipping
    # when tile keys are single-valued) x tile height
    for ty in (32, 64, 128):
        fn = partial(first_filter_tpu, ty=ty)
        report(f"first[banded ty={ty}]", lambda a, b, c, d, e, fn=fn:
               fn(a, b, c, d, e), r0, ip0, key, id_q, oid_q, iters=6)
    for ty in (32, 64, 128):
        fn = partial(second_filter_tpu, ty=ty, banded=False)
        report(f"second[nobands ty={ty}]", lambda a, b, c, d, e, fn=fn:
               fn(a, b, c, d, e), c1, p1, key, id1, oid_q, iters=6)
    for ty in (32, 64, 128):
        fn = partial(final_filter_tpu, ty=ty, banded=False)
        report(f"final[nobands ty={ty}]", lambda a, b, c, d, e, fn=fn:
               fn(a, b, c, d, e, True), c2, p2, key2, id1, oid_q, iters=6)
    # wider tiles: the ty=32 second/final floor is per-program fixed cost
    # (~18 us x 510 tiles); tx=256/512 quarters the program count
    for tx in (256, 512):
        fn = partial(first_filter_tpu, ty=32, tx=tx)
        report(f"first[banded ty=32 tx={tx}]", lambda a, b, c, d, e, fn=fn:
               fn(a, b, c, d, e), r0, ip0, key, id_q, oid_q, iters=6)
        fn = partial(second_filter_tpu, ty=32, tx=tx, compact=True)
        report(f"second[banded ty=32 tx={tx}]", lambda a, b, c, d, e, fn=fn:
               fn(a, b, c, d, e), c1, p1, key, id1, oid_q, iters=6)
        fn = partial(final_filter_tpu, ty=32, tx=tx, compact=True)
        report(f"final[banded ty=32 tx={tx}]", lambda a, b, c, d, e, fn=fn:
               fn(a, b, c, d, e, True), c2, p2, key2, id1, oid_q, iters=6)


if __name__ == "__main__":
    main()
