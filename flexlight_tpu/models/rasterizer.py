"""Rasterizer-equivalent renderer: single-bounce direct lighting.

TPU-native counterpart of `modules/rasterizerWGL2.js` +
`shaders/rasterizer_fragment.glsl`: the same scene-buffer contract, primary
visibility (here by ray cast instead of instanced rasterization), per-light
Cook-Torrance with shadow rays through the same skip-pointer traversal,
translucency fade, Reinhard+gamma, optional FXAA/TAA.

Reference quirks reproduced: forwardTrace receives the light vector
relative to the *local* (untransformed) position and the view vector
`camera - localPosition` (rasterizer_fragment.glsl:269), while the shadow
ray starts from the world position (glsl:267-268).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import traverse as trv
from ..ops.brdf import forward_trace, normalize
from ..ops.buffers import build_scene_buffers, fetch_tex_val
from ..ops.geometry import world_geometry
from ..ops.pathtrace import camera_rays
from ..post.common import quantize_rgba8, reinhard_gamma
from ..post.fxaa import fxaa
from ..post.taa import Jitter, TAAState, taa_apply


@partial(jax.jit, static_argnames=("width", "height", "config", "scheme", "tile"))
def raster_frame(buffers, cam_pos, view, taa_state, width, height, config,
                 scheme="scan", tile=1024):
    world_geom = world_geometry(buffers)
    if scheme == "mxu":
        from ..ops.traverse_mxu import build_tri_matrix, shadow_mxu, traverse_mxu

        w = build_tri_matrix(world_geom, buffers.id_buffer)
        traverse_fn = lambda o, d: traverse_mxu(w, buffers.id_buffer, o, d)
        shadow_fn = lambda o, d, l: shadow_mxu(w, o, d, l)
    elif scheme == "kernel":
        import jax as _jax

        from ..ops.intersect_kernel import (build_w4, pick_tri_tile,
                                            shadow_kernel, traverse_kernel)

        tri_tile = pick_tri_tile(buffers.id_buffer.shape[0])
        w4, amin, amax, ids = build_w4(world_geom, buffers.id_buffer, tri_tile)
        interp = _jax.default_backend() == "cpu"
        sort = (ids.shape[0] // tri_tile) >= 8
        traverse_fn = lambda o, d: traverse_kernel(w4, amin, amax, ids, o, d,
                                                   interpret=interp, tri_tile=tri_tile,
                                                   sort_rays=sort)
        shadow_fn = lambda o, d, l: shadow_kernel(w4, amin, amax, ids, o, d, l,
                                                  interpret=interp, tri_tile=tri_tile,
                                                  sort_rays=sort)
    elif scheme == "packet":
        def shadow_fn(o, d, l):
            return trv.shadow_coherent(world_geom, o, d, l, tile=tile)
        traverse_fn = lambda o, d: trv.traverse_coherent(world_geom, o, d, tile=tile)
    else:
        def shadow_fn(o, d, l):
            return trv.shadow_scan(world_geom, o, d, l)
        traverse_fn = lambda o, d: trv.traverse_scan(world_geom, o, d)

    origin, direction, _ = camera_rays(width, height, cam_pos, view)
    n = origin.shape[0]
    hit = traverse_fn(origin, direction)
    covered = hit.triangle != -1
    tri = jnp.maximum(hit.triangle, 0)
    uvw = jnp.stack([1.0 - hit.suv[:, 1] - hit.suv[:, 2],
                     hit.suv[:, 1], hit.suv[:, 2]], axis=-1)

    # Full-row gathers (row+slice gathers serialize on TPU, see pathtrace.py)
    t_idx = buffers.geometry[tri][:, 9].astype(jnp.int32)
    rot_f = buffers.rotations[t_idx][:, 0]
    shift_f = buffers.shifts[t_idx][:, 0]

    # Local position: barycentric over untransformed vertices (the vertex
    # shader varying `position`), world = R p + shift (glsl:228).
    local_verts = buffers.geometry[tri][:, 0:9].reshape(n, 3, 3)
    local_pos = jnp.einsum("nvi,nv->ni", local_verts, uvw)
    world_pos = jnp.einsum("nij,nj->ni", rot_f, local_pos) + shift_f

    attr = buffers.attributes[tri]
    vertex_normals = attr[:, 0:9].reshape(n, 3, 3)
    smooth_normal = normalize(jnp.einsum(
        "nij,nj->ni", rot_f, jnp.einsum("nvi,nv->ni", vertex_normals, uvw)))
    uv_verts = attr[:, 9:15].reshape(n, 3, 2)
    barycentric = jnp.einsum("nvi,nv->ni", uv_verts, uvw)
    albedo = fetch_tex_val(buffers.albedo_atlas, barycentric, attr[:, 15],
                           attr[:, 18:21], buffers.texture_width)
    rme = fetch_tex_val(buffers.pbr_atlas, barycentric, attr[:, 16],
                        attr[:, 21:24], buffers.texture_width)
    tpo = fetch_tex_val(buffers.tpo_atlas, barycentric, attr[:, 17],
                        attr[:, 24:27], buffers.texture_width)

    final = rme[:, 2:3] + buffers.ambient[None, :]
    v = normalize(cam_pos[None, :] - local_pos)
    for j in range(buffers.lights.shape[0]):
        light = buffers.lights[j, 0]
        strength = buffers.lights[j, 1, 0]
        active = strength > 0.0
        local_color = forward_trace(albedo, rme, light[None, :] - local_pos,
                                    strength, smooth_normal, v)
        show = jnp.linalg.norm(local_color, axis=-1) == 0.0
        d = light[None, :] - world_pos
        dist = jnp.linalg.norm(d, axis=-1)
        shadowed = shadow_fn(world_pos, d / jnp.maximum(dist, 1e-30)[:, None], dist)
        add = active & (show | ~shadowed)
        final = jnp.where(add[:, None], final + local_color, final)

    final = final * albedo
    peak = jnp.max(final, axis=-1)
    t_factor = jnp.minimum(1.0 + peak - tpo[:, 0], 1.0)[:, None]
    final = albedo * albedo + (final - albedo * albedo) * t_factor
    if config.hdr:
        final = reinhard_gamma(final)
    alpha = 1.0 - 0.5 * tpo[:, 0]

    rgb = jnp.where(covered[:, None], jnp.clip(final, 0.0, 1.0), 0.0)
    a = jnp.where(covered, alpha, 0.0)
    display = rgb.reshape(height, width, 3)
    alpha_img = a.reshape(height, width)

    if config.antialiasing in ("fxaa", "taa"):
        aa_in = jnp.concatenate([quantize_rgba8(display),
                                 quantize_rgba8(alpha_img)[..., None]], axis=-1)
        if config.antialiasing == "fxaa":
            display = fxaa(aa_in)[..., 0:3]
        else:
            out, taa_state = taa_apply(taa_state, aa_in)
            display = out[..., 0:3]
    return jnp.clip(display, 0.0, 1.0), taa_state


class Rasterizer:
    type = "rasterizer"

    MXU_MAX_TRIS = 8192

    def __init__(self, width, height, scene, camera, config,
                 scheme: str = "auto", tile: int = 1024):
        self.scene = scene
        self.camera = camera
        self.config = config
        self.canvas_width = int(width)
        self.canvas_height = int(height)
        self.fps = 0.0
        self.fps_limit = float("inf")
        self.scheme = scheme
        self.tile = tile
        self._halt = True
        self._buffers = None
        self._taa_state = None
        self._jitter = Jitter()
        self._prepared_shape = None
        self._fps_window_start = time.perf_counter()
        self._fps_frames = 0

    @property
    def width(self):
        return max(int(self.canvas_width * self.config.render_quality), 1)

    @property
    def height(self):
        return max(int(self.canvas_height * self.config.render_quality), 1)

    def halt(self):
        self._halt = True

    def update_scene(self):
        self._buffers = build_scene_buffers(self.scene)

    def update_primary_light_sources(self):
        if self._buffers is None:
            self.update_scene()
        else:
            self._buffers = self._buffers._replace(
                lights=jnp.asarray(self.scene.build_light_array()))

    updateScene = update_scene
    updatePrimaryLightSources = update_primary_light_sources

    @property
    def fpsLimit(self):
        return self.fps_limit

    @fpsLimit.setter
    def fpsLimit(self, value):
        self.fps_limit = value

    def render(self):
        self._halt = False
        self._prepare()

    def _prepare(self):
        if self._buffers is None:
            self.update_scene()
        shape = (self.height, self.width, self.config)
        if self._prepared_shape != shape:
            self._taa_state = TAAState.create(self.height, self.width)
            self._prepared_shape = shape

    def render_frame(self) -> np.ndarray:
        if self._halt:
            self.render()
        self._prepare()
        from ..scene.transform import global_registry

        rot, shift = global_registry().build_arrays()
        self._buffers = self._buffers._replace(
            rotations=jnp.asarray(rot), shifts=jnp.asarray(shift))
        jitter = (0.0, 0.0)
        if self.config.antialiasing == "taa":
            jitter = self._jitter.next(self.width, self.height)
        view = self.camera.view_matrix(self.width, self.height, jitter)
        scheme = self.scheme
        if scheme == "auto":
            scheme = ("mxu" if self._buffers.id_buffer.shape[0] <= self.MXU_MAX_TRIS
                      else "kernel")
        display, self._taa_state = raster_frame(
            self._buffers, jnp.asarray(self.camera.position), jnp.asarray(view),
            self._taa_state, width=self.width, height=self.height,
            config=self.config, scheme=scheme, tile=self.tile)
        self._fps_frames += 1
        now = time.perf_counter()
        if now - self._fps_window_start > 0.5:
            self.fps = self._fps_frames / (now - self._fps_window_start)
            self._fps_window_start = now
            self._fps_frames = 0
        return np.asarray(display)
