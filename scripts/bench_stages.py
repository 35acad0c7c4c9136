#!/usr/bin/env python
"""Theater 1080p stage breakdown: direct / +temporal / +filter / +fxaa.

Run on the TPU: python scripts/bench_stages.py [scene] [W H]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib

import jax.numpy as jnp

from flexlight_tpu import Config
from flexlight_tpu.models.pathtracer import frame_pipeline
from flexlight_tpu.post.taa import TAAState
from flexlight_tpu.post.temporal import TemporalState
from flexlight_tpu.utils.devtime import device_time


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "theater"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]

    stages = [
        ("direct", dict(temporal=False, filter=False, antialiasing=None)),
        ("+temporal", dict(temporal=True, temporal_samples=4, filter=False,
                           antialiasing=None)),
        ("+filter", dict(temporal=True, temporal_samples=4, filter=True,
                         antialiasing=None)),
        ("+fxaa", dict(temporal=True, temporal_samples=4, filter=True,
                       antialiasing="fxaa")),
    ]
    prev = 0.0
    for name, kw in stages:
        config = Config(samples_per_ray=1, max_reflections=5, **kw)
        engine.canvas = (w, h)
        engine.config = config
        engine.renderer = "pathtracer"
        renderer = engine.renderer
        renderer.render()
        scheme = renderer._resolved_scheme()
        buffers = renderer._buffers
        view = jnp.asarray(engine.camera.view_matrix(w, h))
        pos = jnp.asarray(engine.camera.position)
        temporal = TemporalState.create(config.temporal_samples, h, w)
        taa = TAAState.create(h, w)

        def frame(pos, view, buffers, temporal, taa, config=config,
                  scheme=scheme):
            out, _, _ = frame_pipeline.__wrapped__(
                buffers, pos, view, jnp.float32(0.0), temporal, taa,
                width=w, height=h, config=config, scheme=scheme)
            return out

        dt = device_time(frame, pos, view, buffers, temporal, taa, iters=3)
        print(f"{name:10s} {dt * 1000.0:8.1f} ms  (+{(dt - prev) * 1000.0:7.1f})"
              f"  scheme={scheme}", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
