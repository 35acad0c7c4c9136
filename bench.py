#!/usr/bin/env python
"""Benchmark: Cornell-box path trace on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Primary metric is Mrays/s on the PR1 reference config from BASELINE.json:
cornell.js, 256x256, 1 spp, 5 bounces, filter off, temporal off. Rays
counted per frame: 1 primary + (bounce + shadow) per live bounce.

Measurement: this environment reaches the chip through a loopback relay
whose host<->device transfers and dispatch dominate naive wall-clock, and
block_until_ready is unreliable — so the renderer is timed DEVICE-SIDE by
chaining frames inside one jitted fori_loop (each frame's random seed
depends on the previous frame's radiance, preventing loop hoisting) and
fetching one scalar. End-to-end wall clock (with per-frame image fetch) is
reported in detail for reference.

The reference publishes no numbers (BASELINE.md); vs_baseline compares
against the driver's north star: 60 FPS at the bench resolution.
"""

import json
import os
import sys
import time

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

RES = 256
DEVICE_FRAMES = 16
E2E_FRAMES = 5


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flexlight_tpu import Config
    from flexlight_tpu.models.pathtracer import PathTracer
    from flexlight_tpu.ops.pathtrace import render_mrt

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from scenes import cornell_scene

    scene, camera = cornell_scene()
    config = Config(temporal=False, filter=False, antialiasing=None,
                    samples_per_ray=1, max_reflections=5)
    pt = PathTracer(RES, RES, scene, camera, config)
    pt.render()
    scheme = pt._resolved_scheme()
    buffers = pt._buffers
    view = jnp.asarray(camera.view_matrix(RES, RES))
    pos = jnp.asarray(camera.position)

    # --- device-side: chained frames inside one jit ---
    @jax.jit
    def chained(buffers, pos, view, n):
        def body(i, acc):
            seed = (acc * 1e-30) + i.astype(jnp.float32)
            mrt = render_mrt(buffers, RES, RES, pos, view, config, seed,
                             scheme=scheme)
            return acc + jnp.sum(mrt.color) * 1e-12

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chained(buffers, pos, view, 1))          # compile + warm
    t0 = time.perf_counter()
    float(chained(buffers, pos, view, 1))
    one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained(buffers, pos, view, DEVICE_FRAMES + 1))
    many = time.perf_counter() - t0
    device_ms = max(many - one, 1e-6) / DEVICE_FRAMES * 1000.0

    # --- end-to-end wall clock (includes relay transfer per frame) ---
    img = pt.render_frame()
    coverage = float((img.sum(axis=-1) > 0).mean())
    t0 = time.perf_counter()
    for _ in range(E2E_FRAMES):
        img = pt.render_frame()
    e2e_ms = (time.perf_counter() - t0) / E2E_FRAMES * 1000.0

    fps = 1000.0 / device_ms
    n_pixels = RES * RES
    rays_per_frame = n_pixels * (1 + 2 * config.max_reflections * coverage)
    mrays = rays_per_frame * fps / 1e6

    result = {
        "metric": "cornell_256_mrays_per_s",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(fps / 60.0, 3),
        "detail": {
            "device_ms_per_frame": round(device_ms, 2),
            "device_fps": round(fps, 1),
            "e2e_ms_per_frame_via_relay": round(e2e_ms, 2),
            "resolution": RES,
            "spp": 1,
            "max_reflections": config.max_reflections,
            "coverage": round(coverage, 3),
            "scheme": scheme,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
