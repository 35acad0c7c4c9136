"""Animated transform wave — 1:1 port of examples/wave.js: a grid of
pillars bobbing via per-pillar Transforms (no re-flattening per frame)."""

import math
import random

from common import run

from flexlight_tpu import FlexLight


def build_scene(side_length=2):
    engine = FlexLight((192, 192))
    engine.io = "web"
    camera = engine.camera
    scene = engine.scene

    normal_tex = scene.texture_from_rme([0.7, 1, 0], 1, 1)
    cuboid_tex = scene.texture_from_rme([0.1, 0, 0.02], 1, 1)
    scene.pbr_textures.push(normal_tex, cuboid_tex)
    scene.translucency_textures.push(scene.texture_from_tpo([0, 0, 1.3 / 4], 1, 1))
    scene.standardTextureSizes = [1, 1]

    scene.primaryLightSources = [[-1, 10, -1]]
    scene.primary_light_sources[0].intensity = 1000

    this_plane = scene.Plane([-100, -1, -100], [100, -1, -100], [100, -1, 100], [-100, -1, 100])
    this_plane.textureNums = [-1, 0, -1]
    scene.queue.push(this_plane)

    camera.x, camera.y, camera.z = 4 + side_length, side_length + 2, 4 + side_length
    camera.fx, camera.fy = 0.75 * math.pi, 0.6

    random.seed(0)
    transforms = []
    for i in range(side_length):
        row = []
        for j in range(side_length):
            transform = scene.Transform()
            cuboid = scene.Cuboid(i, i + 1, 0, 3.1, j, j + 1)
            cuboid.transform = transform
            cuboid.color = [random.random() * 255, random.random() * 255, random.random() * 255]
            cuboid.roughness = 0.5
            scene.queue.push(cuboid)
            row.append(transform)
        transforms.append(row)

    engine.renderer = "pathtracer"

    state = {"t": 0.0}

    def animate(_frame):
        state["t"] += 0.015
        for i in range(side_length):
            for j in range(side_length):
                transforms[i][j].move(0, 0.1 + math.sin(state["t"] + i * 0.5 + j), 0)

    return engine, animate


if __name__ == "__main__":
    engine, animate = build_scene()
    run(engine, "wave", animate=animate)
