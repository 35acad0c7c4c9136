"""Emissive-lit box — 1:1 port of examples/emissive.js (no primary lights;
illumination from emissive PBR textures, one translucent IOR-1.5 cube)."""

import numpy as np

from common import run

from flexlight_tpu import FlexLight


def build_scene():
    engine = FlexLight((192, 192))
    engine.io = "web"
    camera = engine.camera
    scene = engine.scene

    rough_tex = scene.texture_from_rme([1, 0, 0], 1, 1)
    tile = np.zeros((128, 128, 3), dtype=np.float32)
    a = np.array([1, 0, 0.5], dtype=np.float32)
    b = np.array([0.1, 1, 0], dtype=np.float32)
    tile[:64, :64] = a
    tile[:64, 64:] = b
    tile[64:, :64] = b
    tile[64:, 64:] = a
    caro_tex = scene.texture_from_rme(tile.reshape(-1), 128, 128)
    rough_light = scene.texture_from_rme([1, 0, 0.1], 1, 1)
    smooth_tex = scene.texture_from_rme([0, 1, 0], 1, 1)
    scene.pbr_textures.push(rough_tex, caro_tex, rough_light, smooth_tex)
    translucency_tex = scene.texture_from_tpo([1, 0, 0.8], 1, 1)
    scene.translucency_textures.push(translucency_tex)
    scene.standardTextureSizes = [128, 128]

    camera.z = -20
    scene.primaryLightSources = []

    bottom_plane = scene.Plane([-5, -5, -21], [5, -5, -21], [5, -5, 5], [-5, -5, 5])
    top_plane = scene.Plane([-5, 5, -21], [-5, 5, 5], [5, 5, 5], [5, 5, -21])
    back_plane = scene.Plane([-5, -5, 5], [5, -5, 5], [5, 5, 5], [-5, 5, 5])
    front_plane = scene.Plane([-5, -5, -21], [-5, 5, -21], [5, 5, -21], [5, -5, -21])
    left_plane = scene.Plane([-5, -5, -21], [-5, -5, 5], [-5, 5, 5], [-5, 5, -21])
    right_plane = scene.Plane([5, -5, -21], [5, 5, -21], [5, 5, 5], [5, -5, 5])
    for item in [bottom_plane, top_plane, back_plane, front_plane]:
        item.textureNums = [-1, 0, -1]
    for item in [left_plane, right_plane]:
        item.textureNums = [-1, 2, -1]
    left_plane.color = [255, 0, 0]
    right_plane.color = [0, 255, 0]

    cube = [None, None]
    cube[0] = scene.Cuboid(-3, -1.5, -5, -2, -1, 1)
    x, x2, y, y2, z, z2 = 0, 3, -4.99, -1, -1, 2
    b0, b1, b2, b3 = [x + 1, y, z], [x2, y, z + 1], [x2 - 1, y, z2], [x, y, z2 - 1]
    t0, t1, t2, t3 = [x + 1, y2, z], [x2, y2, z + 1], [x2 - 1, y2, z2], [x, y2, z2 - 1]
    cube[1] = scene.Cuboid(x, x2, y, y2, z, z2)
    cube[1][0] = scene.Plane(t0, t1, t2, t3, [0, 1, 0])
    cube[1][1] = scene.Plane(t1, b1, b2, t2, [1, 0, 0])
    cube[1][2] = scene.Plane(t2, b2, b3, t3, [0, 0, 1])
    cube[1][3] = scene.Plane(b3, b2, b1, b0, [0, -1, 0])
    cube[1][4] = scene.Plane(t3, b3, b0, t0, [-1, 0, 0])
    cube[1][5] = scene.Plane(t0, b0, b1, t1, [0, 0, -1])

    cube[0].textureNums = [-1, 1, -1]
    cube[1].textureNums = [-1, 3, -1]
    cube[1].ior = 1.5
    cube[1].translucency = 1

    box = [bottom_plane, top_plane, back_plane, front_plane, left_plane, right_plane]
    scene.queue.push(cube, box)
    engine.renderer = "pathtracer"
    return engine


if __name__ == "__main__":
    run(build_scene(), "emissive", default_size=192)
