#!/usr/bin/env python
"""Op-level device microbench of the wavefront shading path at 1080p.

The stage ablations (bench_ablate.py) interact through XLA fusion, so the
deltas over-attribute. This times each piece DIRECTLY on real-scene shapes:
the material one-hot fetch, one reservoir light step, the full 9-light
reservoir, noise4, a pure elementwise chain (speed-of-light check), one
traversal / shadow pass, and the composed bounce stages.

Usage: python scripts/bench_micro.py [scene] [W H]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import importlib

import jax
import jax.numpy as jnp

from flexlight_tpu import Config
import flexlight_tpu.ops.pathtrace as pt
from flexlight_tpu.ops import vec3 as v3
from flexlight_tpu.ops.brdf import forward_trace_soa
from flexlight_tpu.ops.geometry import world_geometry
from flexlight_tpu.ops.intersect import BIAS
from flexlight_tpu.ops.rng import noise4
from flexlight_tpu.utils.devtime import report


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "theater"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    use2d = os.environ.get("FLEXLIGHT_FORCE_2D", "") == "1"
    mod = importlib.import_module(scene)
    engine = mod.build_scene()
    if isinstance(engine, tuple):
        engine = engine[0]
    config = Config(samples_per_ray=1, max_reflections=5,
                    temporal=False, filter=False, antialiasing=None)
    engine.canvas = (w, h)
    engine.config = config
    engine.renderer = "pathtracer"
    renderer = engine.renderer
    renderer.render()
    buffers = renderer._buffers
    n = w * h
    rshape = (n // 1024, 1024) if use2d else (n,)
    print(f"scene={scene} {w}x{h} n={n} layout={rshape} "
          f"tris={buffers.id_buffer.shape[0]} lights={buffers.lights.shape[0]}")

    world_geom = world_geometry(buffers)
    mat = pt.build_material_table(buffers, world_geom)
    print(f"mat table: {mat.shape}")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    f = lambda k: jax.random.uniform(k, rshape, jnp.float32)
    o3 = (f(ks[0]) * 2 - 1, f(ks[1]) * 2 - 1, f(ks[2]) * 2 - 1)
    d3 = v3.normalize3((f(ks[3]) * 2 - 1, f(ks[4]) * 2 - 1, f(ks[5]) * 2 - 1))
    n3 = v3.normalize3((f(ks[6]) * 2 - 1, f(ks[7]) * 2 - 1, f(ks[8]) * 2 - 1))
    alb = (f(ks[9]), f(ks[10]), f(ks[11]))
    rough = f(ks[12])
    metal = f(ks[13])
    emis = f(ks[14])
    tri = jax.random.randint(ks[15], rshape, 0, mat.shape[0], jnp.int32)
    rv4 = noise4(o3[0], o3[1], BIAS, jnp.float32(0.0))

    # --- speed-of-light: a fused ~50-op elementwise chain over the batch
    def chain50(x, y):
        a, b = x, y
        for _ in range(10):
            a = a * b + 0.5
            b = jnp.maximum(a - b, 0.1) * 1.001
            a = jnp.where(b > a, a + b, a * 0.999)
            c = jax.lax.rsqrt(jnp.abs(a) + 1.0)
            b = b + c
        return a + b

    report("chain50 (elementwise SOL)", chain50, o3[0], o3[1])
    report("noise4", lambda x, y: jnp.stack(
        noise4(x, y, BIAS, jnp.float32(0.0))), o3[0], o3[1])

    # --- material one-hot / gather fetch
    report("fetch_rows_t (mat)", lambda t0, t: pt.fetch_rows_t(mat, t + (t0 < -2.0)),
           o3[0], tri)

    # --- one Cook-Torrance light eval
    def ft(o0):
        o = (o0, o3[1], o3[2])
        d = v3.sub3((1.0, 2.0, 3.0), o)
        return jnp.stack(forward_trace_soa(alb, rough, metal, emis, d,
                                           jnp.float32(100.0), n3,
                                           v3.neg3(d3)))

    report("forward_trace x1 light", ft, o3[0])

    # --- full reservoir selection (scene's light count)
    def resv(o0):
        o = (o0, o3[1], o3[2])
        pick = pt.reservoir_select(buffers, alb, rough, metal, emis, o, d3,
                                   rv4, n3, n3, rough, jnp.float32(0.0))
        return pick.max_len + pick.res_num + pick.local_color[0]

    report(f"reservoir_select x{buffers.lights.shape[0]} lights", resv, o3[0])

    # --- traversal / shadow pass (kernel scheme closures)
    from flexlight_tpu.ops.intersect_kernel import (
        RAY_TILE, build_w4, pick_tri_tile, shadow_kernel, traverse_kernel)

    tri_tile = pick_tri_tile(buffers.id_buffer.shape[0])
    w4, amin, amax, ids = build_w4(world_geom, buffers.id_buffer, tri_tile)
    sort = (ids.shape[0] // tri_tile) >= 8
    drt = int(os.environ.get("FLEXLIGHT_DENSE_RAY_TILE", "0")) or RAY_TILE

    def flat3(x3):
        return jnp.stack([c.reshape(-1) for c in x3], axis=-1)

    def trav(o0):
        o = flat3((o0, o3[1], o3[2]))
        d = flat3(d3)
        hit = traverse_kernel(w4, amin, amax, ids, o, d, interpret=False,
                              tri_tile=tri_tile, sort_rays=sort, ray_tile=drt)
        return hit.suv.sum() + hit.triangle.sum()

    def shad(o0):
        o = flat3((o0, o3[1], o3[2]))
        d = flat3(d3)
        s = shadow_kernel(w4, amin, amax, ids, o, d,
                          jnp.full((n,), 10.0, jnp.float32), interpret=False,
                          tri_tile=tri_tile, sort_rays=sort, ray_tile=drt)
        return s.sum()

    report("traverse_kernel pass", trav, o3[0])
    report("shadow_kernel pass", shad, o3[0])

    # --- composed bounce stages (as light_trace runs them)
    aux = ((o3[0] * 0,) * 4, (o3[0] * 0,) * 4, o3[0] * 0, o3[0] * 0,
           o3[0] * 0, o3[0] * 0 + 1.0)
    cam = jnp.asarray(engine.camera.position)

    def mk_carry(o0):
        parts = (jnp.abs(o0) + 0.1, jnp.abs(o3[1]) * 0.3,
                 jnp.abs(o3[2]) * 0.3, tri)
        return pt.bounce_carry_init(parts, cam, d3, aux)

    def pre(o0):
        carry, surface = pt.bounce_pre(mk_carry(o0), 0, mat, config)
        return surface.bary_u + surface.geometry_offset + surface.m

    report("bounce_pre (matfetch+interp)", pre, o3[0])

    def shade(o0):
        carry, surface = pt.bounce_pre(mk_carry(o0), 0, mat, config)
        tex = pt.bounce_tex(buffers, surface)
        carry, req = pt.bounce_shade(carry, surface, tex, 0, buffers, cam,
                                     (o3[0], o3[1]), jnp.float32(1.0),
                                     config, jnp.float32(0.0))
        out = req.roughness_brdf + req.m + carry.glass
        if req.pick is not None:
            out = out + req.pick.max_len + req.pick.res_num
        return out

    report("bounce_pre+tex+shade", shade, o3[0])


if __name__ == "__main__":
    main()
