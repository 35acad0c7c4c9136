#!/usr/bin/env python
"""Device-side timing of render_mrt only (no post) for one scene.

Usage: python scripts/bench_direct.py [scene] [W H] [iters]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib

import jax.numpy as jnp

from flexlight_tpu import Config
from flexlight_tpu.ops.pathtrace import render_mrt
from flexlight_tpu.utils.compile_cache import enable_compile_cache
from flexlight_tpu.utils.devtime import device_time

enable_compile_cache()


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "theater"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    mr = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    brt = os.environ.get("FLEXLIGHT_BOUNCE_RT")
    if brt:
        import flexlight_tpu.ops.pathtrace as pt

        pt.SPARSE_BOUNCE_RAY_TILE = int(brt)
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    config = Config(samples_per_ray=1, max_reflections=mr, temporal=False,
                    filter=False, antialiasing=None)
    engine.canvas = (w, h)
    engine.config = config
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    scheme = renderer._resolved_scheme()
    buffers = renderer._buffers
    view = jnp.asarray(engine.camera.view_matrix(w, h))
    pos = jnp.asarray(engine.camera.position)

    def frame(pos, view, buffers):
        mrt = render_mrt(buffers, w, h, pos, view, config,
                         jnp.float32(0.0), scheme=scheme)
        return mrt.color

    dt = device_time(frame, pos, view, buffers, iters=iters)
    print(f"{scene} {w}x{h} scheme={scheme} mr={mr}: {dt * 1000.0:.1f} "
          "ms/frame", flush=True)


if __name__ == "__main__":
    main()
