#!/usr/bin/env python
"""Stage attribution for the direct trace via the DEBUG_DISABLE ablation
hooks in ops.pathtrace (reservoir/texfetch/interp/shadow/nextdir): device-
times the full frame, then the frame with each stage stubbed; the delta is
that stage's cost (stages interact through fused codegen, so deltas are
attribution estimates, not exact).

Usage: python scripts/bench_ablate.py [scene] [W H] [bounces]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib

import jax.numpy as jnp

from flexlight_tpu import Config
import flexlight_tpu.ops.pathtrace as pt
from flexlight_tpu.utils.devtime import device_time

ABLATIONS = [
    (),                       # full frame
    ("reservoir",),           # NEE reservoir + its shadow rays
    ("shadow",),              # shadow rays only (reservoir math stays)
    ("texfetch",),            # texture-atlas fetches
    ("interp",),              # smooth-normal interpolation block
    ("nextdir",),             # reflect/refract next-ray math
    ("idchannels",),          # normal/rme packing (arctan2 pair per bounce)
    ("matfetch",),            # per-bounce material row gather + relayout
    ("reservoir", "texfetch", "interp"),   # traversal + skeleton
]


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "theater"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    bounces = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    config = Config(samples_per_ray=1, max_reflections=bounces,
                    temporal=False, filter=False, antialiasing=None)
    engine.canvas = (w, h)
    engine.config = config
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    scheme = renderer._resolved_scheme()
    buffers = renderer._buffers
    view = jnp.asarray(engine.camera.view_matrix(w, h))
    pos = jnp.asarray(engine.camera.position)

    full = None
    for ablate in ABLATIONS:
        pt.DEBUG_DISABLE = set(ablate)
        try:
            def frame(pos, view, buffers):
                mrt = pt.render_mrt(buffers, w, h, pos, view, config,
                                    jnp.float32(0.0), scheme=scheme)
                return mrt.color

            # render_mrt is unjitted; device_time jits a fresh loop per
            # ablation, so the trace reads the current DEBUG_DISABLE.
            dt = device_time(frame, pos, view, buffers, iters=3) * 1000.0
        finally:
            pt.DEBUG_DISABLE = set()
        name = "+".join(ablate) if ablate else "full"
        if full is None:
            full = dt
            print(f"{name:28s} {dt:8.1f} ms", flush=True)
        else:
            print(f"-{name:27s} {dt:8.1f} ms  (stage ~{full - dt:6.1f})",
                  flush=True)


if __name__ == "__main__":
    main()
