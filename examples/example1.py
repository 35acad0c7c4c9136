"""Textured blocks scene — 1:1 port of examples/example1.js.

The reference references some texture files missing from its own tree
(redstone.png, redstone_pbr.png, normal.png -> broken Images in the
browser); those slots get black placeholder textures here.
"""

import numpy as np

from common import asset, load_texture, run

from flexlight_tpu import FlexLight
from flexlight_tpu.scene.scene import Texture


def build_scene():
    engine = FlexLight((192, 192))
    engine.io = "web"
    camera = engine.camera
    scene = engine.scene

    black = Texture(np.zeros((16, 16, 3), dtype=np.float32))
    for name in ["textures/dirt_side.jpg", "textures/grass.jpg", "textures/dirt.jpeg"]:
        scene.textures.push(load_texture(asset(name)))
    scene.textures.push(black)                      # redstone.png (missing)
    scene.textures.push(load_texture(asset("textures/lamp.jpg")))
    scene.pbr_textures.push(black, black)           # redstone_pbr/normal (missing)

    camera.x, camera.y, camera.z = 8, 7, -11
    camera.fx, camera.fy = 0.440, 0.55

    scene.primaryLightSources = [[0.5, 1.5, 0.5], [0, 15, 2]]
    scene.primary_light_sources[0].intensity = 400
    scene.primary_light_sources[0].variation = 0.2
    scene.primary_light_sources[1].intensity = 300
    scene.ambientLight = [0.1, 0.1, 0.1]
    scene.standardTextureSizes = [16, 16]

    ground = scene.Plane([-10, -1, -10], [10, -1, -10], [10, -1, 10], [-10, -1, 10], [0, 1, 0])
    ground.textureNums = [-1, 1, -1]
    scene.queue.push(ground)

    cuboids = [
        scene.Cuboid(-1.5, 4.5, -1, 2, 1.5, 2.5),
        scene.Cuboid(-1.5, 1.5, -1, 2, -2, -1),
        scene.Cuboid(0.5, 1.5, -1, 2, -1, 0),
        scene.Cuboid(-1.5, -0.5, -1, 2, -1, 0),
    ]
    colors = [[230, 170, 0], [0, 150, 150], [150, 0, 100], [0, 0, 200]]
    for cuboid, color in zip(cuboids, colors):
        cuboid.roughness = 0
        cuboid.metallicity = 0.5
        cuboid.translucency = 1
        cuboid.ior = 1.3
        cuboid.color = color
        scene.queue.push(cuboid)

    grass_cubes = [
        scene.Cuboid(5.5, 6.5, 1.5, 2.5, 5.8, 6.8),
        scene.Cuboid(-3, -2, -1, 0, -5.2, -4.2),
    ]
    for cube in grass_cubes:
        cube.textureNums = [0, -1, -1]
        cube.top.textureNums = [1, -1, -1]
        cube.bottom.textureNums = [2, -1, -1]
        scene.queue.push(cube)

    scene.queue.push(scene.Cuboid(2.5, 7.5, -1, 1.5, 5, 7))
    red_cube = scene.Cuboid(4, 5, 1.5, 2.5, 5.2, 6.2)
    red_cube.textureNums = [3, 0, -1]
    scene.queue.push(red_cube)
    lantern = scene.Cuboid(-2.5, -1.5, -1, 0, -3.8, -2.8)
    lantern.textureNums = [4, -1, -1]
    lantern.metallicity = 1
    lantern.emissiveness = 2
    scene.queue.push(lantern)

    scene.queue[:] = [scene.generate_bvh()]
    engine.renderer = "pathtracer"
    return engine


if __name__ == "__main__":
    run(build_scene(), "example1")
