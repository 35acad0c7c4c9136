#!/usr/bin/env python
"""Decompose the fused_split direct frame's 'skeleton' bucket (VERDICT r4
weak #1): per-launch fixed cost, state-block DMA, XLA tex stage, compute.

Method (all device-side via utils.devtime, theater 1080p by default):

  A  full direct frame, mr=0..5         -> intercept + per-bounce marginal
  B  FLEXLIGHT_SPLIT_TEXSTUB=1          -> frame minus the XLA tex stage
  C  FLEXLIGHT_SPLIT_STUB=dma           -> launches + state DMA + tex + glue
  D  STUB=dma + TEXSTUB=1               -> launches + state DMA + glue only
  E  D at sub=1/2/4/8 (programs/launch 2025..253) -> per-program fixed cost

Reading the table: compute = A - C; tex stage = A - B (and C - D);
skeleton floor = D; per-program slope from E.

Usage: python scripts/bench_skeleton.py [scene] [W H] [iters]
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
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    engine.canvas = (w, h)
    engine.config = Config(samples_per_ray=1, max_reflections=5,
                           temporal=False, filter=False, antialiasing=None)
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    buffers = renderer._buffers
    view = jnp.asarray(engine.camera.view_matrix(w, h))
    pos = jnp.asarray(engine.camera.position)

    def timed(tag, mr=5, env=None):
        env = env or {}
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            config = Config(samples_per_ray=1, max_reflections=mr,
                            temporal=False, filter=False, antialiasing=None)

            def frame(pos, view, buffers):
                return render_mrt(buffers, w, h, pos, view, config,
                                  jnp.float32(0.0),
                                  scheme="fused_split").color

            dt = device_time(frame, pos, view, buffers, iters=iters)
            print(f"{tag}: {dt * 1000.0:.1f} ms", flush=True)
            return dt
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    print(f"=== skeleton decomposition: {scene} {w}x{h} ===", flush=True)
    for mr in (0, 1, 2, 3, 5):
        timed(f"A mr={mr} full", mr=mr)
    timed("B texstub (no XLA tex)", env={"FLEXLIGHT_SPLIT_TEXSTUB": "1"})
    timed("C stub=dma (launch+DMA+tex+glue)",
          env={"FLEXLIGHT_SPLIT_STUB": "dma"})
    timed("D stub=dma+texstub (launch+DMA+glue)",
          env={"FLEXLIGHT_SPLIT_STUB": "dma", "FLEXLIGHT_SPLIT_TEXSTUB": "1"})
    for sub in ("1", "2", "4", "8"):
        timed(f"E stub sub={sub}",
              env={"FLEXLIGHT_SPLIT_STUB": "dma",
                   "FLEXLIGHT_SPLIT_TEXSTUB": "1",
                   "FLEXLIGHT_SPLIT_SUBTILE": sub})


if __name__ == "__main__":
    main()
