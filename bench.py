#!/usr/bin/env python
"""Benchmark: the five BASELINE.md configs in one JSON line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Primary metric is the BASELINE.md north star (BASELINE.md:20-22): FPS on
a 1920x1080, 1 spp, full-denoise frame (theater.js config: 9 lights,
temporal + 3-pass filter chain + FXAA). vs_baseline = fps / 60.

detail.configs carries every BASELINE.json config (cornell-256 direct,
emissive-512 direct, obj-720p TAA, dragon-1080p direct AND full
pipeline, theater-1080p full pipeline) so cross-round trends are
auditable from the driver artifact alone (VERDICT r3 weak #5).

Measurement: this environment reaches the chip through a loopback relay
whose host<->device transfers and dispatch dominate naive wall-clock, and
block_until_ready is unreliable — so the renderer is timed DEVICE-SIDE by
chaining frames inside one jitted fori_loop (each frame's random seed
depends on the previous frame's radiance, preventing loop hoisting) and
fetching one scalar. End-to-end wall clock (with per-frame image fetch) is
reported in detail.configs.cornell_256_direct for reference.
"""

import json
import os
import sys
import time

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(ROOT, "examples"))
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, ROOT)

from flexlight_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # the 1080p filter kernels take minutes cold

RES = 256
DEVICE_FRAMES = 16
E2E_FRAMES = 20
NS_W, NS_H = 1920, 1080
NS_FRAMES = 4


def _load_renderer(scene_name, w, h, config):
    import importlib

    import jax.numpy as jnp

    mod = importlib.import_module(scene_name)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    engine.canvas = (w, h)
    engine.config = config
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    view = jnp.asarray(engine.camera.view_matrix(w, h))
    pos = jnp.asarray(engine.camera.position)
    return renderer, pos, view


def bench_direct_cfg(scene_name, w, h, iters=3):
    """1 spp, 5 bounces, no post — the direct-frame cost (same shape as
    scripts/bench_direct.py: the timed fn returns mrt.color)."""
    import jax.numpy as jnp

    from flexlight_tpu import Config
    from flexlight_tpu.ops.pathtrace import render_mrt
    from flexlight_tpu.utils.devtime import device_time

    config = Config(samples_per_ray=1, max_reflections=5, temporal=False,
                    filter=False, antialiasing=None)
    renderer, pos, view = _load_renderer(scene_name, w, h, config)
    scheme = renderer._resolved_scheme()
    buffers = renderer._buffers

    def frame(pos, view, buffers):
        return render_mrt(buffers, w, h, pos, view, config,
                          jnp.float32(0.0), scheme=scheme).color

    dt = device_time(frame, pos, view, buffers, iters=iters)
    return {"ms_per_frame": round(dt * 1000.0, 2),
            "fps": round(1.0 / dt, 2),
            "resolution": [w, h], "scheme": scheme,
            "pipeline": "direct (1 spp, 5 bounces, no post)"}


def bench_pipeline_cfg(scene_name, w, h, antialiasing="fxaa",
                       use_filter=True, temporal=True, iters=NS_FRAMES):
    """Full-pipeline frame: temporal + denoise chain + AA as configured."""
    import jax.numpy as jnp

    from flexlight_tpu import Config
    from flexlight_tpu.models.pathtracer import frame_pipeline
    from flexlight_tpu.post.taa import TAAState
    from flexlight_tpu.post.temporal import TemporalState
    from flexlight_tpu.utils.devtime import device_time

    config = Config(temporal=temporal, temporal_samples=4,
                    filter=use_filter, antialiasing=antialiasing,
                    samples_per_ray=1, max_reflections=5)
    renderer, pos, view = _load_renderer(scene_name, w, h, config)
    scheme = renderer._resolved_scheme()
    buffers = renderer._buffers
    temporal_st = TemporalState.create(config.temporal_samples, h, w)
    taa = TAAState.create(h, w)

    def frame(pos, view, buffers, temporal_st, taa):
        out, _, _ = frame_pipeline.__wrapped__(
            buffers, pos, view, jnp.float32(0.0), temporal_st, taa,
            width=w, height=h, config=config, scheme=scheme)
        return out

    dt = device_time(frame, pos, view, buffers, temporal_st, taa,
                     iters=iters)
    parts = (["temporal"] if temporal else []) \
        + (["filter(3+3+final)"] if use_filter else []) \
        + ([antialiasing] if antialiasing else [])
    return {"ms_per_frame": round(dt * 1000.0, 2),
            "fps": round(1.0 / dt, 2),
            "resolution": [w, h], "scheme": scheme,
            "pipeline": "+".join(["direct"] + parts), "spp": 1,
            "max_reflections": config.max_reflections}


def bench_cornell():
    """Round-1 reference config: cornell 256^2 direct, device-side +
    the pipelined-relay e2e number (VERDICT r2 item 6 tracking)."""
    import jax
    import jax.numpy as jnp

    from flexlight_tpu import Config
    from flexlight_tpu.models.pathtracer import PathTracer
    from flexlight_tpu.ops.pathtrace import render_mrt
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

    @jax.jit
    def chained(buffers, pos, view, n):
        def body(i, acc):
            seed = (acc * 1e-30) + i.astype(jnp.float32)
            mrt = render_mrt(buffers, RES, RES, pos, view, config, seed,
                             scheme=scheme)
            return acc + jnp.sum(mrt.color) * 1e-12

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chained(buffers, pos, view, 1))          # compile + warm
    # median of 3 paired (1, N+1) measurements: a single relay hiccup in
    # the 1-frame call otherwise skews the subtraction wildly (a 0.19 ms
    # "device frame" was recorded once from exactly that)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(buffers, pos, view, 1))
        one = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chained(buffers, pos, view, DEVICE_FRAMES + 1))
        many = time.perf_counter() - t0
        samples.append(max(many - one, 1e-6) / DEVICE_FRAMES * 1000.0)
    device_ms = sorted(samples)[1]

    img = pt.render_frame()
    coverage = float((img.sum(axis=-1) > 0).mean())
    # e2e = the production interactive path (serve.py): u8 on-device
    # quantization + pipelined swapchain fetch (frame N-4's bytes land
    # while frame N computes). Depth 4: the relay transfer itself takes
    # ~30 ms regardless of host work (bench_e2e_anatomy), so several
    # transfers in flight are the only way below the transfer latency.
    pt.pipelined = 4
    for _ in range(4):
        pt.render_frame_u8()  # prime the swapchain
    t0 = time.perf_counter()
    for _ in range(E2E_FRAMES):
        img = pt.render_frame_u8()
    e2e_ms = (time.perf_counter() - t0) / E2E_FRAMES * 1000.0
    pt.pipelined = False

    fps = 1000.0 / device_ms
    rays_per_frame = RES * RES * (1 + 2 * config.max_reflections * coverage)
    return {
        "mrays_per_s": round(rays_per_frame * fps / 1e6, 2),
        "ms_per_frame": round(device_ms, 2),
        "fps": round(fps, 1),
        "e2e_ms_per_frame_via_relay": round(e2e_ms, 2),
        "swapchain_depth": 4,
        "resolution": [RES, RES],
        "coverage": round(coverage, 3),
        "scheme": scheme,
        "pipeline": "direct (1 spp, 5 bounces, no post)",
    }


def _claim_device():
    """The perf sweep (scripts/bench_all_tpu.sh) may hold the chip — the
    relay serializes concurrent TPU processes and inflates device
    timings 2-3x. Signal priority (the sweep yields between entries) and
    wait boundedly for its lock to clear; the wait happens BEFORE the
    watchdog budget starts."""
    import atexit
    import pathlib

    if os.environ.get("FLEXLIGHT_SWEEP_CHILD"):
        return                               # invoked BY the sweep itself
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        return                               # no device to contend for
    flag = pathlib.Path("/tmp/bench_priority")
    flag.write_text(str(os.getpid()))
    atexit.register(lambda: flag.unlink(missing_ok=True))
    lock = pathlib.Path("/tmp/tpu_sweep.lock")
    waited = 0.0
    while lock.exists() and waited < 2400.0:
        try:
            pid = int(lock.read_text().strip())
            os.kill(pid, 0)                  # raises if the holder died
        except (ValueError, OSError):
            break                            # stale lock — proceed
        time.sleep(15.0)
        waited += 15.0


def main():
    # Watchdog: if the TPU tunnel is unreachable, the first device use
    # blocks forever inside native code (grpc wait) — where SIGALRM's
    # Python handler can't run — and the driver would record NOTHING. A
    # daemon thread prints an honest error line and hard-exits instead.
    import threading

    _claim_device()

    deadline = float(os.environ.get("FLEXLIGHT_BENCH_TIMEOUT", "2700"))
    done = threading.Event()

    def _watchdog():
        if not done.wait(deadline):
            print(json.dumps({
                "metric": "theater_1080p_full_pipeline_fps", "value": 0.0,
                "unit": "fps", "vs_baseline": 0.0,
                "detail": {"error": "bench watchdog expired - device "
                                    "unreachable or compile stalled",
                           "configs": dict(configs)}}),
                  flush=True)
            os._exit(1)

    configs = {}
    threading.Thread(target=_watchdog, daemon=True).start()

    # Primary metric first so it exists even if a later config dies.
    ns = bench_pipeline_cfg("theater", NS_W, NS_H)
    configs["theater_1080p_full"] = ns
    ns_fps = ns["fps"]

    skip = set(os.environ.get("FLEXLIGHT_BENCH_SKIP", "").split(","))
    rest = [
        ("cornell_256_direct", bench_cornell, ()),
        ("emissive_512_direct", bench_direct_cfg, ("emissive", 512, 512)),
        ("obj_720p_taa", bench_pipeline_cfg,
         ("obj", 1280, 720, "taa", False, False)),
        ("dragon_1080p_direct", bench_direct_cfg, ("dragon", 1920, 1080)),
        ("dragon_1080p_full", bench_pipeline_cfg, ("dragon", 1920, 1080)),
        # the fifth-config alternate (BASELINE.md): 970 tris exercises the
        # 512-4096 band the scheme table left unmeasured until round 5
        ("bike_1080p_direct", bench_direct_cfg, ("bike", 1920, 1080)),
    ]
    for name, fn, args in rest:
        if name in skip:
            continue
        try:
            configs[name] = fn(*args)
        except Exception as exc:       # keep the primary metric printable
            configs[name] = {
                "error": f"{type(exc).__name__}: {str(exc)[:200]}"}

    result = {
        "metric": "theater_1080p_full_pipeline_fps",
        "value": round(ns_fps, 2),
        "unit": "fps",
        "vs_baseline": round(ns_fps / 60.0, 4),
        "detail": {**ns, "scene": "theater", "configs": configs},
    }
    done.set()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
