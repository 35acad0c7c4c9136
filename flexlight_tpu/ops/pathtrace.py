"""Wavefront path tracer core.

TPU-native re-design of the reference's fragment-shader megakernel
(`shaders/pathtracer_fragment.glsl:400-646`). One GLSL invocation per pixel
becomes one jitted pure function over the whole ray batch [N = H*W]:

- primary hits come from tracing camera rays through the same skip-pointer
  list the reference walks (the reference rasterizes primaries,
  pathtracer_vertex.glsl:40-73 — observable output is identical since the
  raster pass only produced first-hit distance/uv/id);
- the bounce loop is statically unrolled to `max_reflections` with per-ray
  kill masks (the reference's dynamic exit, glsl:475, becomes masking);
- next-event estimation is the same weighted reservoir sample over all
  lights with a single shadow ray (glsl:400-461);
- every output channel of the 6-target MRT contract (glsl:601-646) is
  reproduced, in fp32 (quantization to RGBA8 happens in the post layer's
  compat mode).

All math is elementwise over [N]-wide arrays — pure VPU work, fully fused
by XLA; traversal is delegated to ops.traverse.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax.numpy as jnp

from . import traverse as trv
from .brdf import SQRT3, forward_trace, fresnel, normalize
from .buffers import SceneBuffers, fetch_tex_val
from .geometry import world_geometry
from .intersect import BIAS
from .rng import noise

INV_255 = 1.0 / 255.0
INV_PI = 0.3183098861837907

# Perf-bisection switches (testing/profiling only): names added here skip
# parts of the bounce body. Empty in production.
DEBUG_DISABLE: set = set()


class MRT(NamedTuple):
    """Flat per-pixel render targets, fp32 (glsl:74-79)."""
    color: jnp.ndarray          # [N, 3] finalColor (originalColor NOT folded in)
    glass: jnp.ndarray          # [N] glassFilter -> colorIp.w in filter mode
    original_color: jnp.ndarray  # [N, 3] first-hit albedo product
    original_w: jnp.ndarray     # [N] min(originalRMEx, firstRayLength) + 1/255
    render_id: jnp.ndarray      # [N, 4] packed normal/rme + light/shadow in w
    original_id_w: jnp.ndarray  # [N] originalTPOx + 1/255 (glsl:639)
    location_id: jnp.ndarray    # [N, 4] mod of local position (glsl:641-642)
    alpha: jnp.ndarray          # [N] coverage (0 where no primary hit)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _mix(a, b, t):
    return a + (b - a) * t


def to_4bit_representation(a, b):
    """Pack two [0,1] floats into high/low nibbles of one byte (glsl:91-95)."""
    aui = (a * 255.0).astype(jnp.uint32) & jnp.uint32(240)
    bui = ((b * 255.0).astype(jnp.uint32) & jnp.uint32(240)) >> 4
    return (aui | bui).astype(jnp.float32) * INV_255


def combine_normal_rme(n, rme):
    """4-bit spherical normal + rme packing for the id channel (glsl:97-105)."""
    phi = jnp.arctan2(n[..., 2], n[..., 0]) * INV_PI * 0.5 + 0.5
    theta = jnp.arctan2(n[..., 0], n[..., 1]) * INV_PI * 0.5 + 0.5
    packed_n = to_4bit_representation(phi, theta)
    return jnp.stack([packed_n, rme[..., 0],
                      to_4bit_representation(rme[..., 1], rme[..., 2])], axis=-1)


def camera_rays(width: int, height: int, position, view_matrix,
                row0=0, rows: int | None = None):
    """Camera ray generation replacing the instanced raster pass.

    Pixel centers map to the NDC coordinates the reference's vertex shader
    produces (clipSpace.xy / clipSpace.z, pathtracer_vertex.glsl:66-68);
    directions invert the 3x3 view matrix so viewMatrix @ dir = (ndc, 1).

    `row0`/`rows` select a horizontal image strip — the unit of image-tile
    sharding across chips (row0 may be traced, e.g. axis_index * rows).
    Returns (origin [N,3], dir [N,3], ndc [N,2]) with N = rows*width.
    """
    rows = height if rows is None else rows
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    row_idx = jnp.arange(rows, dtype=jnp.float32) + jnp.float32(row0)
    py = 1.0 - (row_idx + 0.5) / height * 2.0
    ndc_x, ndc_y = jnp.meshgrid(px, py)  # [rows, W]
    ndc = jnp.stack([ndc_x.reshape(-1), ndc_y.reshape(-1)], axis=-1)
    inv_view = jnp.linalg.inv(view_matrix)
    clip = jnp.concatenate([ndc, jnp.ones_like(ndc[:, :1])], axis=-1)
    direction = normalize(clip @ inv_view.T)
    origin = jnp.broadcast_to(position, direction.shape)
    return origin, direction, ndc


def reservoir_sample(buffers: SceneBuffers, albedo, rme, tpo,
                     origin, unit_dir, random_vec, n_rough, n_smooth,
                     geometry_offset, random_seed, shadow_fn):
    """Weighted reservoir NEE over all lights + one shadow ray
    (glsl:400-461). Returns (color [N,3], id_w [N])."""
    n = origin.shape[0]
    num_lights = buffers.lights.shape[0]

    local_color = jnp.zeros((n, 3), dtype=jnp.float32)
    res_length = jnp.zeros((n,), dtype=jnp.float32)
    total_weight = jnp.zeros((n,), dtype=jnp.float32)
    res_num = jnp.zeros((n,), dtype=jnp.int32)
    res_weight = jnp.zeros((n,), dtype=jnp.float32)
    res_dir = jnp.zeros((n, 3), dtype=jnp.float32)
    last_random = noise(random_vec[:, 2:4], BIAS, random_seed)[:, 0:2]

    v = -unit_dir
    for j in range(num_lights):
        strength = buffers.lights[j, 1, 0]
        variation = buffers.lights[j, 1, 1]
        active = strength > 0.0  # skip dead lights (glsl:415)
        light = buffers.lights[j, 0] + random_vec[:, 0:3] * variation
        d = light - origin
        color_for_light = forward_trace(albedo, rme, d, strength, n_rough, v)
        weight = jnp.linalg.norm(color_for_light, axis=-1)
        local_color = jnp.where(active, local_color + color_for_light, local_color)
        res_length = jnp.where(active, res_length + 1.0, res_length)
        total_weight = jnp.where(active, total_weight + weight, total_weight)
        sel = active & (jnp.abs(last_random[:, 1]) * (total_weight) <= weight)
        res_num = jnp.where(sel, j, res_num)
        res_weight = jnp.where(sel, weight, res_weight)
        res_dir = jnp.where(sel[:, None], d, res_dir)
        last_random = jnp.where(active, noise(last_random, BIAS, random_seed)[:, 2:4], last_random)

    unit_light_dir = normalize(res_dir)
    show_color = (res_length == 0.0) | (res_weight == 0.0)
    show_shadow = _dot(n_smooth, unit_light_dir) <= BIAS
    base_luminance = jnp.broadcast_to(rme[:, 2:3], (n, 3))

    offset_target = origin + geometry_offset[:, None] * n_smooth
    if "shadow" in DEBUG_DISABLE:
        shadowed = jnp.zeros(n, dtype=bool)
    else:
        shadowed = shadow_fn(offset_target, unit_light_dir,
                             jnp.linalg.norm(res_dir, axis=-1))

    in_shadow = ~show_color & (show_shadow | shadowed)
    id_w = (jnp.mod(res_num, 128) * 2).astype(jnp.float32) * INV_255
    id_w = id_w + jnp.where(in_shadow, INV_255, 0.0)
    color = jnp.where((show_color | ~in_shadow)[:, None],
                      local_color + base_luminance, base_luminance)
    return color, id_w


def build_material_table(buffers: SceneBuffers, world_geom) -> jnp.ndarray:
    """Per-triangle shading row [T, 49]: world geometry (12), attributes
    (28), forward rotation (9) — one wide row gather per bounce instead of
    five (geometry/rotations/shifts/world_geom/attributes); TPU gathers
    move whole rows, so width is nearly free while row count is not."""
    t_idx = buffers.geometry[:, 9].astype(jnp.int32)
    rot_f = buffers.rotations[t_idx][:, 0].reshape(-1, 9)
    return jnp.concatenate([world_geom, buffers.attributes, rot_f], axis=1)


def light_trace(buffers: SceneBuffers, mat, hit: trv.Hit,
                camera_pos, direction, ndc, cos_sample_n, config,
                random_seed, traverse_fn, shadow_fn, aux):
    """The bounce loop (glsl:464-599), unrolled with kill masks.

    `aux` carries the shader's globals across samples (glsl:84-89):
    render_id [N,4], original_id_acc [N,4], glass [N], original_rme_x [N],
    original_tpo_x [N], first_ray_length [N].
    """
    n = direction.shape[0]
    render_id, original_id_acc, glass, original_rme_x, original_tpo_x, first_ray_length = aux

    dont_filter = jnp.ones(n, dtype=bool)
    final_color = jnp.zeros((n, 3), dtype=jnp.float32)
    importancy = jnp.ones((n, 3), dtype=jnp.float32)
    original_color = jnp.ones((n, 3), dtype=jnp.float32)

    ray_origin = jnp.broadcast_to(camera_pos, (n, 3)).astype(jnp.float32)
    ray_dir = direction
    last_hit_point = ray_origin
    alive = hit.triangle != -1
    tri = jnp.maximum(hit.triangle, 0)
    suv = hit.suv

    for i in range(config.max_reflections):
        importance_len = jnp.linalg.norm(importancy * original_color, axis=-1)
        alive = alive & (importance_len >= config.min_importancy * SQRT3)
        m = alive
        mf = m[:, None]

        # NB: gather full rows then slice — a fused row+column-slice gather
        # (mat[tri, 9]) falls off TPU's vectorized gather path and XLA
        # serializes it into a 65k-iteration while loop.
        row = mat[tri]                          # [N, 49] one fused gather
        rot_f = row[:, 40:49].reshape(n, 3, 3)  # forward rotation

        new_origin = suv[:, 0:1] * ray_dir + ray_origin
        ray_origin = jnp.where(mf, new_origin, ray_origin)
        uvw = jnp.stack([1.0 - suv[:, 1] - suv[:, 2], suv[:, 1], suv[:, 2]], axis=-1)

        # World-space triangle (rTI * verts == world - shift; glsl:492)
        wverts = row[:, 0:9].reshape(n, 3, 3)
        geometry_normal = normalize(jnp.cross(wverts[:, 0] - wverts[:, 1],
                                              wverts[:, 0] - wverts[:, 2]))
        diffs = jnp.linalg.norm(ray_origin[:, None, :] - wverts, axis=-1)

        attr = row[:, 12:40]                     # attributes [N, 28]
        vertex_normals = attr[:, 0:9].reshape(n, 3, 3)
        world_normals = jnp.einsum("nij,nvj->nvi", rot_f, vertex_normals)
        smooth_normal = normalize(jnp.einsum("nvi,nv->ni", world_normals, uvw))
        # Geometry-offset against shadow acne (glsl:516-518)
        # tan(acos(x)) = sqrt(1-x^2)/x — same offset without arccos/tan
        cos_ang = jnp.abs(jnp.clip(
            jnp.einsum("ni,nvi->nv", geometry_normal, world_normals), -1.0, 1.0))
        angle_tan = jnp.clip(jnp.sqrt(1.0 - cos_ang * cos_ang) / cos_ang, 0.0, 1.0)
        geometry_offset = jnp.sum(diffs * angle_tan * uvw, axis=-1)

        uv_verts = attr[:, 9:15].reshape(n, 3, 2)
        barycentric = jnp.einsum("nvi,nv->ni", uv_verts, uvw)
        if "texfetch" in DEBUG_DISABLE:
            albedo, rme, tpo = attr[:, 18:21], attr[:, 21:24], attr[:, 24:27]
        else:
            albedo = fetch_tex_val(buffers.albedo_atlas, barycentric, attr[:, 15],
                                   attr[:, 18:21], buffers.texture_width)
            rme = fetch_tex_val(buffers.pbr_atlas, barycentric, attr[:, 16],
                                attr[:, 21:24], buffers.texture_width)
            tpo = fetch_tex_val(buffers.tpo_atlas, barycentric, attr[:, 17],
                                attr[:, 24:27], buffers.texture_width)

        ray_dir = jnp.where(mf, normalize(ray_origin - last_hit_point), ray_dir)
        sign_dir = jnp.sign(_dot(ray_dir, smooth_normal))
        smooth_normal = smooth_normal * -sign_dir[:, None]

        random_vec = noise(ndc, jnp.float32(i) + cos_sample_n, random_seed)
        random_sphere = normalize(smooth_normal + normalize(random_vec[:, 0:3]))
        brdf = _mix(1.0, jnp.abs(_dot(smooth_normal, ray_dir)), rme[:, 1])
        roughness_brdf = rme[:, 0] * brdf
        rough_normal = normalize(_mix(smooth_normal, random_sphere, roughness_brdf[:, None]))

        h = normalize(rough_normal - ray_dir)
        v_dot_h = jnp.maximum(_dot(-ray_dir, h), 0.0)
        f0 = albedo * brdf[:, None]
        f = fresnel(f0, v_dot_h[:, None])
        fresnel_reflect = jnp.max(f, axis=-1)
        # Fresnel-chance solid/translucent decision (glsl:550)
        is_solid = tpo[:, 0] * fresnel_reflect <= jnp.abs(random_vec[:, 3])

        # First-surface bookkeeping vs importancy accumulation (glsl:553-573)
        df = dont_filter & m
        original_tpo_x = jnp.where(df, tpo[:, 0], original_tpo_x)
        original_color = jnp.where(df[:, None], original_color * albedo, original_color)
        original_rme_x = jnp.where(df, original_rme_x + rme[:, 0], original_rme_x)
        if "idpack" in DEBUG_DISABLE:
            id_update = (2.0 ** -i) * jnp.concatenate([smooth_normal, rme[:, :0]], axis=-1)[:, 0:3]
        else:
            id_update = (2.0 ** -i) * combine_normal_rme(smooth_normal, rme)
        render_id = render_id.at[:, 0:3].add(jnp.where(df[:, None], id_update, 0.0))
        if i == 0:
            original_id_acc = original_id_acc.at[:, 0:3].add(
                jnp.where(df[:, None], id_update, 0.0))
        new_dont_filter = ((rme[:, 0] < 0.01) & is_solid) | ~is_solid
        is_glass = is_solid & (tpo[:, 0] > 0.01)
        glass = jnp.where(df & is_glass, glass + 1.0, glass)
        new_dont_filter = jnp.where(is_glass, False, new_dont_filter)
        importancy = jnp.where((~dont_filter & m)[:, None], importancy * albedo, importancy)
        dont_filter = jnp.where(df, new_dont_filter, dont_filter)

        if i == 1:
            ratio = (jnp.linalg.norm(ray_origin - last_hit_point, axis=-1)
                     / jnp.maximum(jnp.linalg.norm(last_hit_point - camera_pos, axis=-1), 1e-30))
            first_ray_length = jnp.where(m, jnp.minimum(ratio, first_ray_length), first_ray_length)

        if "reservoir" in DEBUG_DISABLE:
            local_color, id_w = jnp.broadcast_to(rme[:, 2:3], (n, 3)), jnp.zeros(n)
        else:
            local_color, id_w = reservoir_sample(
                buffers, albedo, rme, tpo, ray_origin, ray_dir,
                random_vec, -sign_dir[:, None] * rough_normal,
                -sign_dir[:, None] * smooth_normal, geometry_offset,
                random_seed, shadow_fn)
        write_id_w = (dont_filter | (i == 0)) & m
        render_id = render_id.at[:, 3].set(jnp.where(write_id_w, id_w, render_id[:, 3]))

        final_color = jnp.where(mf, final_color + local_color * importancy, final_color)

        # Next ray: reflect, or Fresnel-chance refract (glsl:582-589)
        reflected = ray_dir - 2.0 * _dot(ray_dir, smooth_normal)[:, None] * smooth_normal
        eta = _mix(1.0 / tpo[:, 2], tpo[:, 2], jnp.maximum(sign_dir, 0.0))
        n_dot_i = _dot(smooth_normal, ray_dir)
        k = 1.0 - eta * eta * (1.0 - n_dot_i * n_dot_i)
        refracted = jnp.where((k < 0.0)[:, None], 0.0,
                              eta[:, None] * ray_dir
                              - (eta * n_dot_i + jnp.sqrt(jnp.maximum(k, 0.0)))[:, None] * smooth_normal)
        bounce_base = jnp.where(is_solid[:, None], reflected, refracted)
        new_dir = normalize(_mix(bounce_base, random_sphere, roughness_brdf[:, None]))
        ray_dir = jnp.where(mf, new_dir, ray_dir)

        if i + 1 < config.max_reflections:
            nhit = traverse_fn(jnp.where(mf, ray_origin, 0.0),
                               jnp.where(mf, ray_dir, jnp.array([0.0, 0.0, 1.0])))
            suv = jnp.where(mf, nhit.suv, suv)
            new_tri = jnp.where(m, nhit.triangle, -1)
            alive = alive & (new_tri != -1)
            tri = jnp.maximum(jnp.where(m, new_tri, tri), 0)
            last_hit_point = jnp.where(mf, ray_origin, last_hit_point)

    final_color = final_color + importancy * buffers.ambient
    aux = (render_id, original_id_acc, glass, original_rme_x, original_tpo_x, first_ray_length)
    return final_color, original_color, original_tpo_x, aux


def render_mrt(buffers: SceneBuffers, width: int, height: int, camera_pos,
               view_matrix, config, random_seed, scheme: str = "scan",
               tile: int = 1024, row0=0, rows: int | None = None,
               sample_offset=0.0, local_samples: int | None = None) -> MRT:
    """Full primary+bounce render to the 6-channel MRT contract
    (glsl:601-646). Returns flat [N=rows*W] per-pixel outputs.

    `row0`/`rows` render an image strip (tile sharding); `sample_offset`/
    `local_samples` render a slice of the per-pixel sample loop (sample
    sharding): global sample index i uses cos(i) as its noise phase
    (glsl:611-612), so shards pass sample_offset = axis_index * local.
    """
    world_geom = world_geometry(buffers)

    if scheme == "mxu":
        from .traverse_mxu import build_tri_matrix, shadow_mxu, traverse_mxu

        w = build_tri_matrix(world_geom, buffers.id_buffer)

        def traverse_fn(o, d):
            return traverse_mxu(w, buffers.id_buffer, o, d)

        def shadow_fn(o, d, l):
            return shadow_mxu(w, o, d, l)
    elif scheme == "kernel":
        import jax

        from .intersect_kernel import (build_w4, pick_tri_tile, shadow_kernel,
                                       traverse_kernel)

        tri_tile = pick_tri_tile(buffers.id_buffer.shape[0])
        w4, amin, amax, ids = build_w4(world_geom, buffers.id_buffer, tri_tile)
        interp = jax.default_backend() == "cpu"  # Pallas TPU kernels: interpret on CPU
        # Octant sorting only pays for itself when there are many triangle
        # tiles to skip (argsort is not free on TPU)
        sort = (ids.shape[0] // tri_tile) >= 8

        def traverse_fn(o, d):
            return traverse_kernel(w4, amin, amax, ids, o, d, interpret=interp,
                                   tri_tile=tri_tile, sort_rays=sort)

        def shadow_fn(o, d, l):
            return shadow_kernel(w4, amin, amax, ids, o, d, l, interpret=interp,
                                 tri_tile=tri_tile, sort_rays=sort)
    elif scheme == "clustered":
        from .traverse_clustered import build_clusters, shadow_clustered, traverse_clustered

        clusters = build_clusters(world_geom, buffers.id_buffer)

        def traverse_fn(o, d):
            return traverse_clustered(clusters, o, d)

        def shadow_fn(o, d, l):
            return shadow_clustered(clusters, o, d, l)
    elif scheme == "packet":
        def traverse_fn(o, d):
            return trv.traverse_coherent(world_geom, o, d, tile=tile)

        def shadow_fn(o, d, l):
            return trv.shadow_coherent(world_geom, o, d, l, tile=tile)
    else:
        def traverse_fn(o, d):
            return trv.traverse_scan(world_geom, o, d)

        def shadow_fn(o, d, l):
            return trv.shadow_scan(world_geom, o, d, l)

    origin, direction, ndc = camera_rays(width, height, camera_pos, view_matrix,
                                         row0=row0, rows=rows)
    mat = build_material_table(buffers, world_geom)
    n = origin.shape[0]
    primary = traverse_fn(origin, direction)
    covered = primary.triangle != -1

    aux = (
        jnp.zeros((n, 4), dtype=jnp.float32),   # render_id
        jnp.zeros((n, 4), dtype=jnp.float32),   # original_id accumulation
        jnp.zeros((n,), dtype=jnp.float32),     # glassFilter
        jnp.zeros((n,), dtype=jnp.float32),     # originalRMEx
        jnp.zeros((n,), dtype=jnp.float32),     # originalTPOx
        jnp.ones((n,), dtype=jnp.float32),      # firstRayLength
    )
    total = jnp.zeros((n, 3), dtype=jnp.float32)
    original_color = jnp.ones((n, 3), dtype=jnp.float32)
    original_tpo_x = jnp.zeros((n,), dtype=jnp.float32)
    n_local = config.samples_per_ray if local_samples is None else local_samples
    for s in range(n_local):
        cos_sample_n = jnp.cos(jnp.float32(s) + sample_offset)
        color, original_color, original_tpo_x, aux = light_trace(
            buffers, mat, primary, camera_pos, direction, ndc,
            cos_sample_n, config, random_seed, traverse_fn, shadow_fn, aux)
        total = total + color
    final_color = total / config.samples_per_ray

    render_id, _original_id_acc, glass, original_rme_x, original_tpo_x, first_ray_length = aux
    render_id = render_id.at[:, 3].add(INV_255)  # glsl:637

    # Primary-hit local position for the location id channel (glsl:641-642)
    ptri = jnp.maximum(primary.triangle, 0)
    local_verts = buffers.geometry[ptri][:, 0:9].reshape(n, 3, 3)
    puvw = jnp.stack([1.0 - primary.suv[:, 1] - primary.suv[:, 2],
                      primary.suv[:, 1], primary.suv[:, 2]], axis=-1)
    rel_pos = jnp.einsum("nvi,nv->ni", local_verts, puvw)
    div = 2.0 * jnp.linalg.norm(rel_pos - camera_pos, axis=-1)
    location_id = jnp.concatenate(
        [jnp.mod(rel_pos, jnp.maximum(div, 1e-30)[:, None]) / jnp.maximum(div, 1e-30)[:, None],
         jnp.full((n, 1), INV_255)], axis=-1)

    cov = covered
    covf = cov[:, None]
    zero3 = jnp.zeros((n, 3), dtype=jnp.float32)
    return MRT(
        color=jnp.where(covf, final_color, zero3),
        glass=jnp.where(cov, glass, 0.0),
        original_color=jnp.where(covf, original_color, zero3),
        original_w=jnp.where(cov, jnp.minimum(original_rme_x, first_ray_length) + INV_255, 0.0),
        render_id=jnp.where(cov[:, None], render_id, jnp.zeros((n, 4))),
        original_id_w=jnp.where(cov, original_tpo_x + INV_255, 0.0),
        location_id=jnp.where(cov[:, None], location_id, jnp.zeros((n, 4))),
        alpha=cov.astype(jnp.float32),
    )
