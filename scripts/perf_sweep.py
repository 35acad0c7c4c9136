#!/usr/bin/env python
"""Device-side perf sweep over the BASELINE.json scene configs.

Run on the TPU (plain `python scripts/perf_sweep.py`); prints one line per
config: scene, resolution, pipeline, device ms/frame, FPS, Mrays/s.
Results are recorded in docs/PERF.md.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))
sys.path.insert(0, os.path.join(ROOT, "tests"))

import jax
import jax.numpy as jnp

from flexlight_tpu import Config
from flexlight_tpu.ops.buffers import build_scene_buffers
from flexlight_tpu.ops.pathtrace import render_mrt
from flexlight_tpu.models.pathtracer import frame_pipeline, PathTracer
from flexlight_tpu.post.taa import TAAState
from flexlight_tpu.post.temporal import TemporalState
from flexlight_tpu.utils.devtime import device_time


def measure(name, engine_builder, width, height, config):
    engine = engine_builder() if callable(engine_builder) else engine_builder
    if isinstance(engine, tuple):
        engine = engine[0]
    engine.canvas = (width, height)
    engine.config = config
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    scheme = renderer._resolved_scheme()
    buffers = renderer._buffers
    view = jnp.asarray(engine.camera.view_matrix(width, height))
    pos = jnp.asarray(engine.camera.position)
    temporal = TemporalState.create(config.temporal_samples, height, width)
    taa = TAAState.create(height, width)

    def frame(pos, view, buffers, temporal, taa):
        out, _, _ = frame_pipeline.__wrapped__(
            buffers, pos, view, jnp.float32(0.0), temporal, taa,
            width=width, height=height, config=config, scheme=scheme)
        return out

    # buffers/state ride as arguments (a closure would bake the scene into
    # the program as padded constant literals)
    dt = device_time(frame, pos, view, buffers, temporal, taa, iters=4)
    n_rays = width * height * (1 + 2 * config.max_reflections)
    print(f"{name:28s} {width}x{height}  scheme={scheme:8s} "
          f"{dt*1000:9.2f} ms/frame  {1.0/dt:7.1f} fps  "
          f"{n_rays/dt/1e6:8.1f} Mrays/s", flush=True)


def main():
    from scenes import cornell_scene, cornell_config

    from flexlight_tpu import FlexLight

    direct = Config(temporal=False, filter=False, antialiasing=None,
                    samples_per_ray=1, max_reflections=5)
    full = Config(temporal=True, temporal_samples=4, filter=True,
                  antialiasing="fxaa", samples_per_ray=1, max_reflections=5)

    def cornell_engine():
        e = FlexLight((256, 256))
        s, c = cornell_scene()
        e.scene = s
        e.camera = c
        return e

    measure("cornell (PR1 ref)", cornell_engine, 256, 256, direct)
    measure("cornell full-pipeline", cornell_engine, 256, 256, full)

    import emissive as emissive_mod
    measure("emissive", lambda: emissive_mod.build_scene(), 512, 512, direct)

    import obj as obj_mod
    taa_cfg = Config(temporal=False, filter=False, antialiasing="taa",
                     samples_per_ray=1, max_reflections=5)
    measure("obj/monke + TAA", lambda: obj_mod.build_scene("monke"),
            1280, 720, taa_cfg)

    import dragon as dragon_mod
    measure("dragon", lambda: dragon_mod.build_scene(), 1920, 1080, direct)

    import theater as theater_mod
    try:
        measure("theater full-pipeline", lambda: theater_mod.build_scene(),
                1920, 1080, full)
    except Exception as exc:  # 1080p full denoise can exceed HBM
        print(f"theater 1080p full: {type(exc).__name__}: {str(exc)[:120]}",
              flush=True)
        measure("theater full-pipeline", lambda: theater_mod.build_scene(),
                1280, 720, full)


if __name__ == "__main__":
    main()
