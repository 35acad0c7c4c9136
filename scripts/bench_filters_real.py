#!/usr/bin/env python
"""Time the denoise filter passes on REAL frame inputs.

The synthetic bench (bench_filters.py) estimates the chain at ~100 ms
at 1080p, but the real-frame stage breakdown measures +178 ms — real
key/id distributions must activate far more offsets. This renders one
real frame (direct + temporal exactly as postprocess_mrt does), times
each of the 7 passes on the actual pass inputs, and prints the
scale-key statistics the banding/compaction design cares about.

Usage: python scripts/bench_filters_real.py [scene] [W H]
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
from flexlight_tpu.models.pathtracer import _quantized_mrt
from flexlight_tpu.ops.pathtrace import render_mrt
from flexlight_tpu.post.common import quantize_rgba8, split_hdr
from flexlight_tpu.post.temporal import (TemporalState, push_frame,
                                         temporal_average)
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
    cam = jnp.asarray(engine.camera.position, jnp.float32)
    view = jnp.asarray(engine.camera.view_matrix(w, h, (0.0, 0.0)),
                       jnp.float32)
    config = Config(samples_per_ray=1, max_reflections=5, temporal=True,
                    filter=True, antialiasing=None)
    scheme = renderer._resolved_scheme()

    @jax.jit
    def make_inputs(seed):
        mrt = render_mrt(buffers, w, h, cam, view, config, seed,
                         scheme=scheme)
        (_color, _alpha, color_q, ip_q, id_q, oid_q,
         ocolor_q) = _quantized_mrt(mrt, h, w)
        state = TemporalState.create(config.temporal_samples, h, w)
        state = push_frame(state, color_q, ip_q, id_q, oid_q)
        t_color, t_glass, center_w = temporal_average(state)
        frac_q, high_q = split_hdr(t_color)
        r0 = jnp.concatenate([frac_q, center_w[..., None]], axis=-1)
        ip0 = jnp.concatenate(
            [high_q, quantize_rgba8(t_glass)[..., None]], axis=-1)
        return r0, ip0, ocolor_q, id_q, oid_q

    r0, ip0, ocolor_q, id_q, oid_q = jax.tree.map(
        jax.block_until_ready, make_inputs(jnp.float32(0.0)))

    # --- key statistics the kernels band/compact on ---
    ow = np.asarray(ocolor_q[..., 3])
    idw = np.asarray(oid_q[..., 3])
    print(f"ocolor.w: zero-frac {np.mean(ow == 0):.3f}  "
          f"mean {ow.mean():.4f}  p50/p90/p99 "
          f"{np.percentile(ow, [50, 90, 99]).round(4)}", flush=True)
    print(f"oid.w:    zero-frac {np.mean(idw == 0):.3f}  "
          f"mean {idw.mean():.4f}  p99 {np.percentile(idw, 99):.4f}",
          flush=True)
    # first-filter scale = (1+w)^2*3.5 on non-passthrough pixels
    for ty in (32, 128):
        th, tw = h // ty, w // 128
        tiles = ow[:th * ty, :tw * 128].reshape(th, ty, tw, 128)
        tmin = tiles.min(axis=(1, 3))
        tmax = tiles.max(axis=(1, 3))
        spread = (tmax - tmin)
        print(f"per-tile w-range ty={ty}: uniform-tiles "
              f"{np.mean(spread == 0):.3f}  mean-spread {spread.mean():.4f}",
              flush=True)

    # --- per-pass timing on the real inputs ---
    from flexlight_tpu.post import filter_kernel as K

    interp = jax.default_backend() == "cpu"
    inputs1 = (r0, ip0, ocolor_q, id_q, oid_q)
    report("first[real]",
           lambda c, p, oc, i, o: K.first_filter_tpu(
               c, p, oc, i, o, interpret=interp)[0], *inputs1, iters=4)
    # chain the real ping-pong to get each pass's true input
    c, p, idq = K.first_filter_tpu(*inputs1, interpret=interp)
    c, p, idq = K.first_filter_tpu(c, p, ocolor_q, idq, oid_q,
                                   interpret=interp)
    c, p, idq = K.first_filter_tpu(c, p, ocolor_q, idq, oid_q,
                                   interpret=interp)
    report("second[real,pass1-input]",
           lambda cc, pp, oc, i, o: K.second_filter_tpu(
               cc, pp, oc, i, o, interpret=interp)[0],
           c, p, ocolor_q, idq, oid_q, iters=4)
    c2, p2, oc2 = K.second_filter_tpu(c, p, ocolor_q, idq, oid_q,
                                      interpret=interp)
    report("final[real]",
           lambda cc, pp, oc, i, o: K.final_filter_tpu(
               cc, pp, oc, i, o, True, interpret=interp),
           c2, p2, oc2, idq, oid_q, iters=4)


if __name__ == "__main__":
    main()
