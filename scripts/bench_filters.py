#!/usr/bin/env python
"""Device-side timing of the denoise filter chain at 1080p.

Synthesizes a frame-like input (mixed blur keys, clustered ids — the
skip-friendliness of real frames depends on the spatial distribution of
the scale keys, so both a `uniform`-key and a `mixed`-key variant run).

Usage: python scripts/bench_filters.py [cpu]
"""

import os
import sys

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def synth_inputs(h, w, key_mode: str, seed=3):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)

    def q(x):
        return np.round(np.clip(x, 0, 1) * 255) / 255.0

    # clustered ids: 32x32 blocks of constant id, like object interiors
    bh, bw = -(-h // 32), -(-w // 32)
    pool = q(rng.uniform(0, 1, (12, 4)))
    blocks = rng.integers(0, 12, (bh, bw))
    ids = pool[np.repeat(np.repeat(blocks, 32, 0), 32, 1)[:h, :w]]
    oid = np.zeros((h, w, 4))
    oid[..., 3] = q(np.repeat(np.repeat(rng.uniform(0, 0.3, (bh, bw)), 32, 0), 32, 1)[:h, :w])
    color = q(rng.uniform(0, 1, (h, w, 4)))
    ip = q(np.where(rng.uniform(size=(h, w, 4)) < 0.2,
                    rng.uniform(0, 0.2, (h, w, 4)), 0))
    ocolor = q(rng.uniform(0, 1, (h, w, 4)))
    if key_mode == "uniform":
        ocolor[..., 3] = 0.2  # one blur radius everywhere
    else:
        # per-block radius keys incl. many no-blur blocks (realistic)
        keyv = np.where(rng.uniform(size=(bh, bw)) < 0.5, 0.0,
                        rng.uniform(0, 0.6, (bh, bw)))
        ocolor[..., 3] = q(np.repeat(np.repeat(keyv, 32, 0), 32, 1)[:h, :w])
    to = lambda x: jnp.asarray(x, jnp.float32)
    return to(color), to(ip), to(ocolor), to(ids), to(oid)


def sweep():
    """Tile-shape sweep for the dominant first filter: smaller ty
    tightens per-tile scale ranges (more offset skipping) vs halo cost."""
    import jax

    from flexlight_tpu.post import filter_kernel as K
    from flexlight_tpu.utils.devtime import report

    h, w = 1080, 1920
    interp = jax.default_backend() == "cpu"
    color, ip, ocolor, ids, oid = synth_inputs(h, w, "mixed")
    # small ty tightens per-tile scale ranges (fewer active offsets);
    # LARGE ty amortizes the per-ox-group window slice+prep, whose cost
    # scales as tiles x (ty + 2*ry) — opposing forces, hence the sweep
    def safe(label, fn, *args):
        # ty=16 blows the 1 MB SMEM budget (remap tables scale with tile
        # count); record and keep sweeping instead of dying
        try:
            report(label, fn, *args, iters=4)
        except Exception as exc:
            print(f"{label}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:120]}", flush=True)

    for ty, tx in ((128, 128), (256, 128), (64, 128), (32, 128), (48, 128),
                   (32, 256), (64, 256)):
        safe(f"first[ty={ty},tx={tx}]",
             lambda c, p, oc, i, o, ty=ty, tx=tx: K.first_filter_tpu(
                 c, p, oc, i, o, interpret=interp, ty=ty, tx=tx)[0],
             color, ip, ocolor, ids, oid)
    for ty in (128, 64, 32):
        safe(f"second[ty={ty},tx=128]",
             lambda c, p, oc, i, o, ty=ty: K.second_filter_tpu(
                 c, p, oc, i, o, interpret=interp, ty=ty, tx=128)[0],
             color, ip, ocolor, ids, oid)
        safe(f"final[ty={ty},tx=128]",
             lambda c, p, oc, i, o, ty=ty: K.final_filter_tpu(
                 c, p, oc, i, o, True, interpret=interp, ty=ty, tx=128),
             color, ip, ocolor, ids, oid)


def main():
    import jax

    from flexlight_tpu.post import filter_kernel as K
    from flexlight_tpu.utils.devtime import report

    if "sweep" in sys.argv[1:]:
        return sweep()

    h, w = 1080, 1920
    interp = jax.default_backend() == "cpu"
    for mode in ("mixed", "uniform"):
        color, ip, ocolor, ids, oid = synth_inputs(h, w, mode)
        print(f"--- {mode} keys, {h}x{w} ---", flush=True)
        report(f"first_filter[{mode}]",
               lambda c, p, oc, i, o: K.first_filter_tpu(c, p, oc, i, o,
                                                         interpret=interp)[0],
               color, ip, ocolor, ids, oid, iters=4)
        report(f"second_filter[{mode}]",
               lambda c, p, oc, i, o: K.second_filter_tpu(c, p, oc, i, o,
                                                          interpret=interp)[0],
               color, ip, ocolor, ids, oid, iters=4)
        report(f"final_filter[{mode}]",
               lambda c, p, oc, i, o: K.final_filter_tpu(c, p, oc, i, o, True,
                                                         interpret=interp),
               color, ip, ocolor, ids, oid, iters=4)


if __name__ == "__main__":
    main()
