#!/usr/bin/env python
"""Device-side end-to-end frame timing for one BASELINE config.

Usage: python scripts/bench_e2e.py [scene] [width] [height] [pipeline]
  scene: cornell | emissive | obj | dragon | theater   (default theater)
  pipeline: direct | full | taa                        (default full)

Uses the persistent compilation cache so repeat runs skip the (large)
Pallas filter-kernel compiles.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))
sys.path.insert(0, os.path.join(ROOT, "tests"))

from flexlight_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from flexlight_tpu import Config, FlexLight
from flexlight_tpu.models.pathtracer import frame_pipeline
from flexlight_tpu.post.taa import TAAState
from flexlight_tpu.post.temporal import TemporalState
from flexlight_tpu.utils.devtime import device_time


def build(scene_name):
    if scene_name == "cornell":
        from scenes import cornell_scene

        e = FlexLight((256, 256))
        s, c = cornell_scene()
        e.scene = s
        e.camera = c
        return e
    mod = __import__(scene_name)
    out = mod.build_scene()
    return out[0] if isinstance(out, tuple) else out


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "theater"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    pipeline = sys.argv[4] if len(sys.argv) > 4 else "full"

    cfg = {
        "direct": Config(temporal=False, filter=False, antialiasing=None,
                         samples_per_ray=1, max_reflections=5),
        "full": Config(temporal=True, temporal_samples=4, filter=True,
                       antialiasing="fxaa", samples_per_ray=1,
                       max_reflections=5),
        "taa": Config(temporal=False, filter=False, antialiasing="taa",
                      samples_per_ray=1, max_reflections=5),
    }[pipeline]

    engine = build(scene_name)
    engine.canvas = (width, height)
    engine.config = cfg
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    scheme = renderer._resolved_scheme()
    buffers = renderer._buffers
    view = jnp.asarray(engine.camera.view_matrix(width, height))
    pos = jnp.asarray(engine.camera.position)
    temporal = TemporalState.create(cfg.temporal_samples, height, width)
    taa = TAAState.create(height, width)

    def frame(pos, view, buffers, temporal, taa):
        out, _, _ = frame_pipeline.__wrapped__(
            buffers, pos, view, jnp.float32(0.0), temporal, taa,
            width=width, height=height, config=cfg, scheme=scheme,
        )
        return out

    dt = device_time(frame, pos, view, buffers, temporal, taa, iters=4)
    n_rays = width * height * (1 + 2 * cfg.max_reflections)
    print(f"{scene_name} {width}x{height} {pipeline} scheme={scheme}: "
          f"{dt*1000:.1f} ms/frame  {1.0/dt:.1f} fps  "
          f"{n_rays/dt/1e6:.0f} Mrays/s", flush=True)

    # interactive e2e (render_frame incl. host fetch) across fetch modes
    import time

    for label, setup in (
            ("e2e f32", lambda r: None),
            ("e2e u8", lambda r: None),
            ("e2e u8+pipelined", lambda r: setattr(r, "pipelined", True))):
        engine.renderer = "rasterizer"  # drop cached renderer state
        engine.renderer = "pathtracer"
        r = engine.renderer
        setup(r)
        fetch = r.render_frame_u8 if "u8" in label else r.render_frame
        fetch()  # warm
        t0 = time.perf_counter()
        n = 8
        for _ in range(n):
            fetch()
        e2e = (time.perf_counter() - t0) / n
        print(f"  {label:18s} {e2e*1000:.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
