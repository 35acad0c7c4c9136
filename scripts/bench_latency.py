#!/usr/bin/env python
"""Input-to-photon latency vs swapchain depth (VERDICT r4 item 7).

The depth-k swapchain hits e2e THROUGHPUT targets by keeping k frames in
flight, at k frames of display latency. This measures the actual
input-to-photon cost: move the camera once, then time from the move to
the first returned frame whose pixels reflect it, per depth 0..4.

Usage: python scripts/bench_latency.py [scene] [size] [reps]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib

import numpy as np

from flexlight_tpu import Config
from flexlight_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    engine.canvas = (size, size)
    engine.config = Config(samples_per_ray=1, max_reflections=5,
                           temporal=False, filter=False, antialiasing=None)
    engine.renderer = "pathtracer"
    r = engine.renderer
    cam = engine.camera
    x0 = cam.x

    for depth in (0, 1, 2, 3, 4):
        r.pipelined = depth
        r._pending_display = []
        # warm: fill the pipe + compile
        for _ in range(depth + 4):
            r.render_frame_u8()
        lats = []
        frames = []
        for rep in range(reps):
            before = r.render_frame_u8().copy()     # current pose
            # alternate between two camera poses so "reflects the move"
            # is a deterministic pixel change
            cam.x = x0 + (0.4 if rep % 2 == 0 else 0.0)
            t0 = time.perf_counter()
            n = 1
            while True:
                f = r.render_frame_u8()
                if not np.array_equal(f, before):
                    break
                n += 1
                if n > depth + 3:
                    break
            lats.append((time.perf_counter() - t0) * 1000.0)
            frames.append(n)
        print(f"depth {depth}: input-to-photon {np.median(lats):.1f} ms "
              f"(median of {reps}; {np.median(frames):.0f} frames)",
              flush=True)


if __name__ == "__main__":
    main()
