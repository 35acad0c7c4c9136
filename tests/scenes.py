"""Shared test scenes (ports of reference examples)."""

import numpy as np

from flexlight_tpu import Camera, Config, Scene


def cornell_scene(light_variation=None):
    """Port of examples/cornell.js:32-71 (without the PBR checker texture)."""
    scene = Scene()
    scene.primaryLightSources = [[0, 4, 0]]
    scene.primary_light_sources[0].intensity = 160
    if light_variation is not None:
        scene.primary_light_sources[0].variation = light_variation

    bottom = scene.Plane([-5, -5, -21], [5, -5, -21], [5, -5, 5], [-5, -5, 5])
    top = scene.Plane([-5, 5, -21], [-5, 5, 5], [5, 5, 5], [5, 5, -21])
    back = scene.Plane([-5, -5, 5], [5, -5, 5], [5, 5, 5], [-5, 5, 5])
    front = scene.Plane([-5, -5, -21], [-5, 5, -21], [5, 5, -21], [5, -5, -21])
    left = scene.Plane([-5, -5, -21], [-5, -5, 5], [-5, 5, 5], [-5, 5, -21])
    right = scene.Plane([5, -5, -21], [5, 5, -21], [5, 5, 5], [5, -5, 5])
    for plane in [bottom, top, back, front, left, right]:
        plane.color = [230, 230, 230]
    left.color = [220, 0, 0]
    right.color = [0, 150, 0]

    cube0 = scene.Cuboid(-3, -1.5, -5, -2, -1, 1)
    cube1 = scene.Cuboid(0, 3, -5, -1, -1, 2)
    scene.queue.push([cube0, cube1], [bottom, top, back, front, left, right])

    camera = Camera()
    camera.z = -20
    return scene, camera


def cornell_config(**overrides):
    base = dict(temporal=False, filter=False, antialiasing=None, samples_per_ray=1)
    base.update(overrides)
    return Config(**base)
