#!/usr/bin/env python
"""Cold-start compile budget (VERDICT r4 item 8 / missing #3): wall time
from process start to FIRST displayed frame at theater 1080p full
pipeline, with the persistent compile cache DISABLED (true cold) —
versus the warm-start time with the cache.

Usage: python scripts/bench_cold_compile.py [cold|warm]
"""

import os
import sys
import time

mode = sys.argv[1] if len(sys.argv) > 1 else "cold"
if mode == "cold":
    os.environ["FLEXLIGHT_NO_COMPILE_CACHE"] = "1"

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

T0 = time.perf_counter()

import importlib

from flexlight_tpu import Config
from flexlight_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    mod = importlib.import_module("theater")
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    engine.canvas = (1920, 1080)
    engine.config = Config(samples_per_ray=1, max_reflections=5,
                           temporal=True, filter=True, antialiasing="fxaa")
    engine.renderer = "pathtracer"
    t_scene = time.perf_counter()
    print(f"[{mode}] scene built at +{t_scene - T0:.1f} s", flush=True)
    frame = engine.renderer.render_frame_u8()
    t_first = time.perf_counter()
    print(f"[{mode}] first 1080p full-pipeline frame at "
          f"+{t_first - T0:.1f} s (shape {frame.shape})", flush=True)
    frame = engine.renderer.render_frame_u8()
    print(f"[{mode}] second frame +{time.perf_counter() - t_first:.2f} s",
          flush=True)


if __name__ == "__main__":
    main()
