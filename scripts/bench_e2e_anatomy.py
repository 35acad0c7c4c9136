#!/usr/bin/env python
"""Attribute the interactive e2e frame cost (VERDICT r3 item 6).

cornell-256: device 1.4 ms vs 18.5 ms e2e via the relay — this script
times each host-side step of the pipelined render_frame_u8 path to find
the residual: transform refresh, per-frame small uploads (camera/view/
seed), the jitted dispatch itself, the async fetch start, and the
np.asarray landing of the previous frame.

Usage: python scripts/bench_e2e_anatomy.py [N_FRAMES]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np

from flexlight_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
RES = 256


def main():
    import jax.numpy as jnp

    from flexlight_tpu import Config
    from flexlight_tpu.models.pathtracer import PathTracer, frame_pipeline
    from flexlight_tpu.models.pathtracer import _quantize_u8
    from scenes import cornell_scene

    scene, camera = cornell_scene()
    config = Config(temporal=False, filter=False, antialiasing=None,
                    samples_per_ray=1, max_reflections=5)
    pt = PathTracer(RES, RES, scene, camera, config)
    pt.render()
    pt.pipelined = True
    pt.render_frame_u8()
    pt.render_frame_u8()  # warm both swapchain slots

    # --- whole-path baseline -------------------------------------------------
    t0 = time.perf_counter()
    for _ in range(N):
        pt.render_frame_u8()
    full = (time.perf_counter() - t0) / N * 1000.0
    print(f"render_frame_u8 (pipelined): {full:.2f} ms/frame", flush=True)

    # --- step timings --------------------------------------------------------
    def t(label, fn, n=N):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n * 1000.0
        print(f"  {label}: {dt:.3f} ms", flush=True)
        return dt

    t("_refresh_transforms (version-gated)", pt._refresh_transforms)
    view = None

    def mk_view():
        nonlocal view
        view = jnp.asarray(camera.view_matrix(RES, RES))

    t("view matrix + jnp.asarray upload", mk_view)
    pos = jnp.asarray(camera.position)

    def upload3():
        jnp.asarray(camera.position)
        jnp.asarray(camera.view_matrix(RES, RES))
        jnp.float32(0.0)

    t("3 small uploads (pos, view, seed)", upload3)

    state = [pt._temporal_state, pt._taa_state]

    def dispatch():
        display, t2, a2 = frame_pipeline(
            pt._buffers, pos, view, jnp.float32(0.0), state[0], state[1],
            width=RES, height=RES, config=config,
            scheme=pt._resolved_scheme(), tile=pt.tile)
        state[0], state[1] = t2, a2
        return display

    t("frame_pipeline dispatch (async)", dispatch)
    disp = dispatch()
    dispq = _quantize_u8(disp)

    def fetch_sync():
        np.asarray(_quantize_u8(dispatch()))

    t("dispatch + sync fetch (unpipelined)", fetch_sync, n=max(N // 2, 5))

    def async_then_land():
        d = _quantize_u8(dispatch())
        try:
            d.copy_to_host_async()
        except AttributeError:
            pass
        return d

    pend = async_then_land()

    def landed_fetch():
        nonlocal pend
        nxt = async_then_land()
        np.asarray(pend)
        pend = nxt

    t("dispatch + async-start + land PREV", landed_fetch)

    # how long a bare landed np.asarray takes once the transfer finished
    d = async_then_land()
    time.sleep(0.1)
    t0 = time.perf_counter()
    np.asarray(d)
    print(f"  np.asarray after 100ms settle: "
          f"{(time.perf_counter() - t0) * 1000.0:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
