#!/usr/bin/env python
"""A/B: frame-coherent bounce-sort hints vs nearest2 (dragon class).

FLEXLIGHT_SPARSE_SORT=history sorts each bounce cast's wavefront by the
tile of the SAME pixel's last-frame hit at that bounce index (prediction
from temporal coherence) instead of nearest2's per-cast slab-entry
prepass. Frames chain inside one jitted fori_loop with the hint tuple as
loop carry and a per-frame random seed, so every frame has a fresh
wavefront (realistic temporal noise) and real hint reuse.

Usage: python scripts/bench_history.py [scene] [W H] [frames]
Prints ms/frame for: nearest2 (default), history, prevtile (control).
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib
import time

import jax
import jax.numpy as jnp

from flexlight_tpu import Config


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    frames = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    engine.canvas = (w, h)
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    buffers = renderer._buffers
    config = Config(samples_per_ray=1, max_reflections=5, temporal=False,
                    filter=False, antialiasing=None)
    view = jnp.asarray(engine.camera.view_matrix(w, h))
    pos = jnp.asarray(engine.camera.position)
    n = w * h

    def run(mode: str):
        os.environ["FLEXLIGHT_SPARSE_SORT"] = mode
        import flexlight_tpu.ops.pathtrace as pt

        use_hints = mode == "history"

        @jax.jit
        def chained(buffers, pos, view, nframes):
            hints0 = tuple(jnp.full((n,), -1, jnp.int32)
                           for _ in range(config.max_reflections))

            def body(i, carry):
                acc, hints = carry
                seed = (acc * 1e-30) + i.astype(jnp.float32)
                if use_hints:
                    mrt, new_hints = pt.render_mrt(
                        buffers, w, h, pos, view, config, seed,
                        scheme="sparse", trace_hints=hints,
                        with_trace_hints=True)
                else:
                    mrt = pt.render_mrt(buffers, w, h, pos, view, config,
                                        seed, scheme="sparse")
                    new_hints = hints
                acc = acc + sum(jnp.sum(x) for x in jax.tree.leaves(mrt)) * 1e-12
                return acc, new_hints

            return jax.lax.fori_loop(0, nframes, body,
                                     (jnp.float32(0.0), hints0))[0]

        float(chained(buffers, pos, view, 1))
        t0 = time.perf_counter()
        float(chained(buffers, pos, view, 1))
        one = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chained(buffers, pos, view, frames + 1))
        many = time.perf_counter() - t0
        ms = max(many - one, 1e-6) / frames * 1000.0
        print(f"{scene} {w}x{h} direct sort={mode}: {ms:.1f} ms/frame",
              flush=True)
        return ms

    prev = os.environ.get("FLEXLIGHT_SPARSE_SORT", "")
    try:
        for mode in ("nearest2", "history", "prevtile"):
            run(mode)
    finally:
        if prev:
            os.environ["FLEXLIGHT_SPARSE_SORT"] = prev
        else:
            os.environ.pop("FLEXLIGHT_SPARSE_SORT", None)


if __name__ == "__main__":
    main()
