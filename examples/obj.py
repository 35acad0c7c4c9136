"""OBJ model viewer — 1:1 port of examples/obj.js.

Usage: python examples/obj.py [frames] [size] [out.png] [model]
model defaults to 'sphere' like the reference's ?model= URL param.
"""

import os
import sys

from common import asset, load_texture, run

from flexlight_tpu import FlexLight


def build_scene(model="sphere"):
    engine = FlexLight((192, 192))
    engine.io = "web"
    camera = engine.camera
    scene = engine.scene

    scene.textures.push(load_texture(asset("textures/grass.jpg")))

    camera.x, camera.y, camera.z = 0, 1, 0
    camera.fx, camera.fy = -2.38, 0.2

    scene.primaryLightSources = [[50, 50.9, -10]]
    scene.primary_light_sources[0].intensity = 50000
    scene.primary_light_sources[0].variation = 0
    scene.ambientLight = [0.01, 0.01, 0.01]

    mtl_path = asset(f"objects/{model}.mtl")
    materials = scene.import_mtl(mtl_path) if os.path.exists(mtl_path) else {}
    obj = scene.import_obj(asset(f"objects/{model}.obj"), materials)
    obj.move(5, 0, -5)
    scene.queue.push(obj)
    engine.renderer = "pathtracer"
    engine.renderer.update_scene()
    return engine


if __name__ == "__main__":
    model = sys.argv[4] if len(sys.argv) > 4 else "sphere"
    run(build_scene(model), "obj")
