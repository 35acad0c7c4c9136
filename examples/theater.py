"""Theater stage — 1:1 port of examples/theater.js: 9 lights, wood-textured
floor, striped metallic back mirror, full denoise pipeline scene."""

import numpy as np

from common import asset, load_texture, run

from flexlight_tpu import FlexLight


def build_scene():
    engine = FlexLight((192, 192))
    engine.io = "web"
    camera = engine.camera
    scene = engine.scene

    scene.textures.push(load_texture(asset("textures/holz.jpg")))
    scene.standardTextureSizes = [512, 512]

    rough_tex = scene.texture_from_rme([1, 0.3, 0], 1, 1)
    smooth_tex = scene.texture_from_rme([0.4, 0.2, 0], 1, 1)
    stripes = ([[1, 0.1, 0]] * 11 + [[0, 0.5, 0]] * 10 + [[1, 0.1, 0]]
               + [[1, 0.1, 0]] * 11)
    back_mirror_tex = scene.texture_from_rme(np.array(stripes, dtype=np.float32).reshape(-1),
                                             11, 3)
    scene.pbr_textures.push(rough_tex, smooth_tex, back_mirror_tex)
    scene.translucency_textures.push(scene.texture_from_tpo([1, 0, 0.6], 1, 1))

    camera.x, camera.y, camera.z = 35, 35, -53
    camera.fx, camera.fy = 0.47, 0.44

    scene.primaryLightSources = [
        [-58.03, 26, 7.5], [-58.03, 26, -10.5],
        [43.03, 26, 0], [43.03, 26, -11.5],
        [-20, 26, -40], [-10, 26, -40], [0, 26, -40], [10, 26, -40], [20, 26, -40],
    ]
    scene.ambientLight = [0, 0, 0]
    for i in range(9):
        scene.primary_light_sources[i].intensity = 1000

    bottom_plane = scene.Plane([-43.03, 0, -28], [43.03, 0, -28],
                               [43.03, 0, 27.28], [-43.03, 0, 27.28])
    back_plane = scene.Plane([-24.5, 0, 27.28], [24.5, 0, 27.28],
                             [24.5, 22, 27.28], [-24.5, 22, 27.28])
    left_plane = scene.Plane([-43.03, 0, 0], [-24.5, 0, 27.28],
                             [-24.5, 22, 27.28], [-43.03, 22, 0])
    right_plane = scene.Plane([43.03, 0, 0], [43.03, 22, 0],
                              [24.5, 22, 27.28], [24.5, 0, 27.28])
    bottom_plane.textureNums = [0, 1, -1]
    back_plane.textureNums = [-1, 2, -1]
    left_plane.textureNums = [-1, 0, -1]
    right_plane.textureNums = [-1, 0, -1]

    cube = scene.Cuboid(-3, 3, 0, 17, 2, 8)
    cube.color = [255, 80, 120]

    scene.queue.push([bottom_plane, back_plane, left_plane, right_plane, cube])
    engine.renderer = "pathtracer"
    return engine


if __name__ == "__main__":
    run(build_scene(), "theater")
