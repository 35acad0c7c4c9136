"""Pallas fused traversal kernels (small scenes).

The reference's [DEVICE] traversal routines (rayTracer/shadowTest,
pathtracer_fragment.glsl:172-280) as hand-written TPU kernels: triangle
constants live in SMEM and broadcast to the whole ray tile per loop step,
rays stream through VMEM in (8, 128) register tiles, and the entire
closest-hit loop is fused — no [N, T] intermediate ever touches HBM
(the XLA mxu path materializes its epilogue there).

Scope: scenes whose triangle list fits SMEM (T <= ~600). Larger scenes use
ops.traverse_clustered. Results are bit-identical in ids to the scan
oracle away from fp ties (tests assert equality on the cornell scene).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import BIAS, POW32
from .traverse import Hit

LANES = 128
SUBLANES = 8
TILE = LANES * SUBLANES

PALLAS_MAX_TRIS = 512  # SMEM budget: 512 * 9 * 4B = 18 KB


def _traverse_kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     s_ref, u_ref, v_ref, t_ref, *, num_tris: int, cull: bool):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def body(t, carry):
        best_s, best_u, best_v, best_t = carry
        v0x, v0y, v0z = tri_ref[t, 0], tri_ref[t, 1], tri_ref[t, 2]
        v1x, v1y, v1z = tri_ref[t, 3], tri_ref[t, 4], tri_ref[t, 5]
        v2x, v2y, v2z = tri_ref[t, 6], tri_ref[t, 7], tri_ref[t, 8]
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        # pvec = cross(d, e2): scalar x vector mix keeps everything on VPU
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / det
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        s = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        valid = (det >= BIAS) if cull else (jnp.abs(det) >= BIAS)
        valid &= (u >= BIAS) & (u <= 1.0)
        valid &= (v >= BIAS) & (u + v <= 1.0)
        valid &= (s > BIAS) & (s <= best_s)
        best_u = jnp.where(valid, u, best_u)
        best_v = jnp.where(valid, v, best_v)
        best_t = jnp.where(valid, t, best_t)
        best_s = jnp.where(valid, s, best_s)
        return best_s, best_u, best_v, best_t

    init = (jnp.full((SUBLANES, LANES), POW32, dtype=jnp.float32),
            jnp.zeros((SUBLANES, LANES), dtype=jnp.float32),
            jnp.zeros((SUBLANES, LANES), dtype=jnp.float32),
            jnp.full((SUBLANES, LANES), -1, dtype=jnp.int32))
    best_s, best_u, best_v, best_t = jax.lax.fori_loop(0, num_tris, body, init)
    hit = best_s < POW32
    s_ref[:] = jnp.where(hit, best_s, 0.0)
    u_ref[:] = best_u
    v_ref[:] = best_v
    t_ref[:] = best_t


def _shadow_kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   ml_ref, out_ref, *, num_tris: int):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ml = ml_ref[:]

    def body(t, shadowed):
        v0x, v0y, v0z = tri_ref[t, 0], tri_ref[t, 1], tri_ref[t, 2]
        v1x, v1y, v1z = tri_ref[t, 3], tri_ref[t, 4], tri_ref[t, 5]
        v2x, v2y, v2z = tri_ref[t, 6], tri_ref[t, 7], tri_ref[t, 8]
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / det
        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        s = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        valid = (det >= BIAS)  # front-face cull (glsl:143-158)
        valid &= (u >= BIAS) & (u <= 1.0)
        valid &= (v >= BIAS) & (u + v <= 1.0)
        valid &= (s > BIAS) & (s <= ml)
        return shadowed | valid

    shadowed = jax.lax.fori_loop(
        0, num_tris, body, jnp.zeros((SUBLANES, LANES), dtype=jnp.bool_))
    out_ref[:] = shadowed.astype(jnp.int32)


def _prep_rays(origin, direction, *extra):
    n = origin.shape[0]
    pad = (-n) % TILE
    rows = (n + pad) // LANES

    def shape(x):
        return jnp.pad(x, (0, pad), constant_values=1.0).reshape(rows, LANES)

    comps = [shape(origin[:, i]) for i in range(3)]
    comps += [shape(direction[:, i]) for i in range(3)]
    comps += [shape(e) for e in extra]
    return comps, rows, n


def _tri_table(world_geometry, id_buffer):
    tris = world_geometry[id_buffer]
    return tris[:, 0:9]  # [T, 9]


@partial(jax.jit, static_argnames=("interpret",))
def traverse_pallas(world_geometry, id_buffer, origin, direction,
                    interpret: bool = False) -> Hit:
    """Closest hit via the fused Pallas kernel. T must be <= PALLAS_MAX_TRIS."""
    tri = _tri_table(world_geometry, id_buffer)
    num_tris = tri.shape[0]
    comps, rows, n = _prep_rays(origin, direction)
    grid = rows // SUBLANES
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    s, u, v, t = pl.pallas_call(
        partial(_traverse_kernel, num_tris=num_tris, cull=False),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(tri, *comps)
    s, u, v, t = (x.reshape(-1)[:n] for x in (s, u, v, t))
    hit_tri = jnp.where(t >= 0, id_buffer[jnp.maximum(t, 0)], -1)
    return Hit(suv=jnp.stack([s, u, v], axis=-1), triangle=hit_tri.astype(jnp.int32))


@partial(jax.jit, static_argnames=("interpret",))
def shadow_pallas(world_geometry, id_buffer, origin, direction, max_len,
                  interpret: bool = False) -> jnp.ndarray:
    tri = _tri_table(world_geometry, id_buffer)
    num_tris = tri.shape[0]
    comps, rows, n = _prep_rays(origin, direction, max_len)
    grid = rows // SUBLANES
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_shadow_kernel, num_tris=num_tris),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(tri, *comps)
    return out.reshape(-1)[:n].astype(bool)
