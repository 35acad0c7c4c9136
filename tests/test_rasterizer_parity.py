"""Rasterizer reference parity: model vs a scalar transcription of
`shaders/rasterizer_fragment.glsl` (main: glsl:202-291), reusing the
pathtracer oracle's traversal/shadow/BRDF primitives
(tests/reference_oracle.py — same helper functions in both shaders:
moellerTrumboreCull/rayCuboid/shadowTest glsl:70-146, trowbridgeReitz/
smith/fresnel/forwardTrace glsl:148-200).

Same comparison contract as test_reference_parity: disagreeing primaries
must be shared-edge distance ties; agreeing pixels match to float32
accumulation noise.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import tests.reference_oracle as oracle  # noqa: E402
from tests.scenes import cornell_scene  # noqa: E402

SIZE = 12


def shade_pixel(b, cam, direction, hdr):
    """rasterizer_fragment.glsl main for one primary ray."""
    F = np.float32
    suv, m, tri = oracle.ray_tracer(b, cam, direction, edge=-oracle.BIAS)
    if tri == -1:
        return np.zeros(3, np.float32), -1, F(0.0)
    u, v = suv[1], suv[2]
    uvw = np.array([1.0 - u - v, u, v], dtype=np.float32)

    grow = b.geometry[tri]
    local_verts = grow[0:9].reshape(3, 3)
    local_pos = (local_verts.T @ uvw).astype(np.float32)
    rot_f = b.rotations[m, 0]
    shift_f = b.shifts[m, 0]
    absolute = (rot_f @ local_pos + shift_f).astype(np.float32)

    attr = b.attributes[tri]
    normals = attr[0:9].reshape(3, 3)
    smooth_normal = oracle._normalize(
        (rot_f @ (normals.T @ uvw)).astype(np.float32))
    bary = (attr[9:15].reshape(3, 2).T @ uvw).astype(np.float32)
    albedo = oracle._fetch_tex(b.albedo_atlas, bary, attr[15], attr[18:21],
                               b.texture_width)
    rme = oracle._fetch_tex(b.pbr_atlas, bary, attr[16], attr[21:24],
                            b.texture_width)
    tpo = oracle._fetch_tex(b.tpo_atlas, bary, attr[17], attr[24:27],
                            b.texture_width)

    final = (rme[2] + b.ambient).astype(np.float32)
    view = oracle._normalize((cam - local_pos).astype(np.float32))
    for j in range(b.lights.shape[0]):
        light = b.lights[j, 0]
        strength = F(b.lights[j, 1, 0])
        if strength <= 0.0:
            continue
        local_color = oracle.forward_trace(
            albedo, rme, (light - local_pos).astype(np.float32), strength,
            smooth_normal, view)
        show = np.sqrt(np.sum(local_color * local_color,
                              dtype=np.float32)) == 0.0
        d = (light - absolute).astype(np.float32)
        dist = F(np.sqrt(np.sum(d * d, dtype=np.float32)))
        if show or not oracle.shadow_test(b, absolute, oracle._normalize(d),
                                          dist):
            final = (final + local_color).astype(np.float32)

    final = (final * albedo).astype(np.float32)
    t_factor = min(F(1.0) + final.max() - tpo[0], F(1.0))
    aa = (albedo * albedo).astype(np.float32)
    final = (aa + (final - aa) * t_factor).astype(np.float32)
    if hdr:
        final = final / (final + F(1.0))
        final = (np.power(4.0 * final, F(1.0 / 0.8), dtype=np.float32)
                 / F(4.0) * F(1.3))
    return np.clip(final, 0.0, 1.0), tri, F(1.0) - F(0.5) * tpo[0]


@pytest.mark.parametrize("hdr", [True, False])
@pytest.mark.parametrize("textured", [False, True])
def test_rasterizer_matches_oracle(hdr, textured):
    from flexlight_tpu import Config, FlexLight
    from flexlight_tpu.ops.buffers import build_scene_buffers
    from flexlight_tpu.ops.pathtrace import camera_rays

    scene, camera = cornell_scene()
    if textured:
        # PBR checker (cornell.js:18-31) through the rasterizer's
        # attr-indexed lookup (glsl:242-258)
        tile = np.zeros((128, 128, 3), dtype=np.float32)
        tile[:64, :64] = tile[64:, 64:] = [1, 0, 0.4]
        tile[:64, 64:] = tile[64:, :64] = [0.1, 1, 0]
        scene.pbr_textures.push(scene.texture_from_rme(tile.reshape(-1),
                                                       128, 128))
        scene.standardTextureSizes = [128, 128]
        scene.queue[0][1].textureNums = [-1, 0, -1]
    engine = FlexLight((SIZE, SIZE))
    engine.scene = scene
    for f in ("x", "y", "z", "fx", "fy", "fov"):
        setattr(engine.camera, f, getattr(camera, f))
    engine.config = Config(temporal=False, filter=False, antialiasing=None,
                           hdr=hdr)
    engine.renderer = "rasterizer"
    got = engine.renderer.render_frame()

    buffers = build_scene_buffers(scene)
    b = oracle._Buffers(buffers)
    cam = np.array([camera.x, camera.y, camera.z], np.float32)
    view = camera.view_matrix(SIZE, SIZE)
    _, d3, _ = camera_rays(SIZE, SIZE, cam, view)
    d3 = np.asarray(d3)

    n_tie = 0
    for y in range(SIZE):
        for x in range(SIZE):
            rgb, tri, _alpha = shade_pixel(
                b, cam, d3[y * SIZE + x].astype(np.float32), hdr)
            diff = np.abs(got[y, x] - rgb).max()
            if diff <= 2e-4:
                continue
            # disagreeing primary: must be a shared-edge distance tie
            n_tie += 1
            assert tri != -1, (y, x, got[y, x], rgb)
    assert n_tie <= SIZE * SIZE * 0.15, n_tie
