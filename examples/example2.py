"""Many-lights stress scene — 1:1 port of examples/example2.js
(64 light sources incl. a sparse slot + animated orbit light + moving cube)."""

import math
import random

from common import run

from flexlight_tpu import FlexLight


def build_scene():
    engine = FlexLight((192, 192))
    engine.io = "web"
    camera = engine.camera
    scene = engine.scene

    normal_tex = scene.texture_from_rme([0.3, 1, 0], 1, 1)
    scene.pbr_textures.push(normal_tex)
    scene.standardTextureSizes = [1, 1]

    camera.x, camera.y, camera.z = -12, 5, -18
    camera.fx, camera.fy = -0.440, 0.235

    this_plane = scene.Plane([-100, -1, -100], [100, -1, -100],
                             [100, -1, 100], [-100, -1, 100], [0, 1, 0])
    this_plane.textureNums = [-1, -1, -1]
    r = [
        scene.Cuboid(-1.5, 4.5, -1, 2, 1.5, 2.5),
        scene.Cuboid(-1.5, 1.5, -1, 2, -2, -1),
        scene.Cuboid(0.5, 1.5, -1, 2, -1, 0),
        scene.Cuboid(-1.5, -0.5, -1, 2, -1, 0),
    ]
    random.seed(0)
    for cuboid in r:
        cuboid.color = [random.random() * 255, random.random() * 255, random.random() * 255]
        cuboid.textureNums = [-1, 0, -1]
    cube = scene.Cuboid(5.5, 6.5, 1.5, 2.5, 5.5, 6.5)
    objects = [r, cube]

    lights = [None] * 64
    lights[0] = [0, 10, 0]
    lights[2] = [10, 30, 10]
    lights[3] = [-10, 30, 10]
    lights[4] = [10, 30, -10]
    lights[5] = [-10, 30, -10]
    lights[6] = [30, 30, 30]
    lights[7] = [-30, 30, -30]
    for i in range(8, 64):
        lights[i] = [-300 + i * 10, 300, -300]
    scene.primaryLightSources = lights
    scene.primary_light_sources[0].intensity = 50
    for i in range(2, 8):
        scene.primary_light_sources[i].intensity = 200
    for i in range(8, 64):
        scene.primary_light_sources[i].intensity = 50

    scene.queue.push(this_plane, objects)
    engine.renderer = "pathtracer"

    state = {"iterator": 0.0}

    def animate(_t):
        from flexlight_tpu.scene.scene import LightSource

        state["iterator"] += 0.01
        s, c = math.sin(state["iterator"]), math.cos(state["iterator"])
        scene.primary_light_sources[1] = LightSource([20 * s, 8, 20 * c], intensity=10)
        r[0].move(0.05 * s, 0, 0)
        engine.renderer.update_scene()  # vertices moved -> re-flatten

    return engine, animate


if __name__ == "__main__":
    engine, animate = build_scene()
    run(engine, "example2", animate=animate)
