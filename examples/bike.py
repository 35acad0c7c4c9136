"""Model-switch scene — port of examples/bike.js.

The reference calls scene.fetchObjFile, which doesn't exist at HEAD
(renamed importObj; SURVEY §2.4 'API drift') — this port uses import_obj.
bike.obj/erde.obj are also absent from the reference's objects/ dir, so
the default model falls back to 'monkey'.

Usage: python examples/bike.py [frames] [size] [out.png] [model]
models: bike | grass | monkey | prim | monkeys
"""

import os
import sys

from common import asset, load_texture, run

from flexlight_tpu import FlexLight, Scene
from flexlight_tpu.scene.primitives import Bounding


def build_scene(model="monkey"):
    engine = FlexLight((192, 192))
    engine.io = "web"
    camera = engine.camera
    scene = engine.scene

    scene.textures.push(load_texture(asset("textures/grass.jpg")))
    camera.x, camera.y, camera.z = 10, 5, -10
    camera.fx, camera.fy = -0.75, 0.3

    plane = scene.Plane([-100, -1, -100], [100, -1, -100], [100, -1, 100], [-100, -1, 100])
    plane.textureNums = [-1, 0, -1]
    scene.primaryLightSources = [[40, 50, 40]]
    scene.primary_light_sources[0].intensity = 20000
    scene.ambientLight = [0.1, 0.1, 0.1]
    scene.queue.push(plane)

    if model == "bike":
        obj = scene.import_obj(asset("objects/bike.obj"))
        obj.move(20, 0, -20)
        obj.static_permanent = True
        scene.queue.push(obj)
    elif model == "grass":
        grass = scene.import_obj(asset("objects/grass.obj"))
        grass.move(8, -2, -8)
        grass.scale(2)
        grass.textureNums = [0, -1, -1]
        grass.static_permanent = True
        scene.queue.push(grass)
    elif model == "monkey":
        obj = scene.import_obj(asset("objects/monke.obj"))
        obj.move(3, 2.1, -3)
        obj.static = True
        scene.queue.push(obj)
    elif model == "prim":
        obj = scene.import_obj(asset("objects/uv_sphere_tri.obj"))
        obj.move(3, 2.1, -3)
        obj.static = True
        scene.queue.push(obj)
    elif model == "monkeys":
        scene.primary_light_sources[0].intensity = 10000
        monkey_bound = []
        for i in range(3):
            obj = scene.import_obj(asset("objects/monke.obj"))
            obj.scale(i * 0.2 + 1)
            obj.move(10 + 2.5 * i, 0.5, -11 - 1.3 * i)
            color = [150, 150, 150]
            color[i] += 100
            obj.color = color
            monkey_bound.append(obj)
        scene.queue.push(Bounding(monkey_bound))
    else:
        raise SystemExit(f"model {model!r} does not exist")

    engine.renderer = "pathtracer"
    engine.renderer.update_scene()
    return engine


if __name__ == "__main__":
    model = sys.argv[4] if len(sys.argv) > 4 else "monkey"
    if model == "bike" and not os.path.exists(asset("objects/bike.obj")):
        model = "monkey"
    run(build_scene(model), "bike")
