"""High-poly stress scene — 1:1 port of examples/dragon.js:
43.6k-tri dragon + monke + sphere on a metallic plane, animated
look-at-camera transform on the monke."""

import math

from common import asset, run

from flexlight_tpu import FlexLight
from flexlight_tpu.utils import mathlib


def build_scene():
    engine = FlexLight((192, 192))
    engine.io = "web"
    camera = engine.camera
    scene = engine.scene

    camera.x, camera.y, camera.z = -10, 14, -10
    camera.fx, camera.fy = -0.9, 0.45

    scene.primaryLightSources = [[50, 70, 50]]
    scene.primary_light_sources[0].intensity = 50000
    scene.primary_light_sources[0].variation = 10
    scene.ambientLight = [0.1, 0.1, 0.1]

    plane = scene.Plane([-500, -1, -500], [500, -1, -500], [500, -1, 500], [-500, -1, 500])
    plane.roughness = 1
    plane.metallicity = 0.8
    scene.queue.push(plane)

    dragon_transform = scene.Transform()
    dragon_transform.move(15, 0, 15)
    dragon_transform.scale(0.5)
    obj = scene.import_obj(asset("objects/dragon_lp.obj"))
    obj.transform = dragon_transform
    obj.roughness = 0
    obj.metallicity = 1
    obj.translucency = 1
    obj.ior = 1.5
    obj.color = [255, 100, 100]
    scene.queue.push(obj)

    monke_transform = scene.Transform()
    monke_transform.move(5, 1, 12)
    monke_transform.scale(2)
    monke = scene.import_obj(asset("objects/monke_smooth.obj"))
    monke.transform = monke_transform
    monke.roughness = 0.1
    monke.metallicity = 1
    monke.color = [255, 200, 100]
    scene.queue.push(monke)

    sphere = scene.import_obj(asset("objects/sphere.obj"))
    sphere.scale(4)
    sphere.move(15, 3, 0)
    sphere.metallicity = 1
    sphere.roughness = 0
    sphere.translucency = 1
    sphere.ior = 1.5
    scene.queue.push(sphere)

    scene.queue[:] = [scene.generate_bvh()]
    engine.renderer = "pathtracer"
    engine.renderer.update_scene()

    def animate(_t):
        # Look-at-camera spherical rotation (dragon.js:97-119)
        diff = mathlib.diff([camera.x, camera.y, camera.z], monke_transform.position)
        r = mathlib.length(diff)
        theta = (math.copysign(1, diff[2])
                 * math.acos(diff[0] / math.sqrt(diff[0] ** 2 + diff[2] ** 2))
                 - math.pi * 0.5)
        psi = math.acos(diff[1] / r) - math.pi * 0.5
        monke_transform.rotate_spherical(theta, psi)

    return engine, animate


if __name__ == "__main__":
    engine, animate = build_scene()
    run(engine, "dragon", animate=animate)
