import numpy as np
import pytest

from flexlight_tpu import Bounding, Cuboid, Plane, Scene, Transform, Triangle
from flexlight_tpu.scene.flatten import flatten_graph
from flexlight_tpu.scene.primitives import KIND_BVH_NODE, KIND_SENTINEL, KIND_TRIANGLE


def test_triangle_records():
    t = Triangle([0, 0, 0], [1, 0, 0], [0, 1, 0])
    assert t.length == 1
    g = t.geometry_buffer.reshape(1, 12)
    np.testing.assert_array_equal(g[0, 0:9], [0, 0, 0, 1, 0, 0, 0, 1, 0])
    assert g[0, 9] == 0 and g[0, 10] == KIND_TRIANGLE
    s = t.attribute_buffer.reshape(1, 28)
    np.testing.assert_array_equal(s[0, 15:18], [-1, -1, -1])  # inline material
    np.testing.assert_array_equal(s[0, 18:21], [1, 1, 1])
    np.testing.assert_array_equal(s[0, 21:24], [1, 0, 0])
    np.testing.assert_array_equal(s[0, 24:27], [0, 0, 1])


def test_plane_winding_and_normal():
    # Floor facing +y (cornell bottom plane layout)
    p = Plane([-5, -5, -21], [5, -5, -21], [5, -5, 5], [-5, -5, 5])
    assert p.length == 2
    np.testing.assert_allclose(p.normal, [0, 1, 0], atol=1e-6)
    # 5th arg is accepted and ignored (example1.js:52 / scene.js:748)
    p2 = Plane([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0, 0, 1])
    assert p2.length == 2


def test_color_setter_normalizes():
    t = Triangle([0, 0, 0], [1, 0, 0], [0, 1, 0])
    t.color = [230, 0, 115]
    np.testing.assert_allclose(t.albedo, [230 / 255, 0, 115 / 255], rtol=1e-6)
    s = t.attribute_buffer.reshape(1, 28)
    np.testing.assert_allclose(s[0, 18:21], [230 / 255, 0, 115 / 255], rtol=1e-6)


def test_material_setters_serialize():
    t = Triangle([0, 0, 0], [1, 0, 0], [0, 1, 0])
    t.roughness = 0.3
    t.metallicity = 0.7
    t.emissiveness = 2.0
    t.translucency = 0.5
    t.ior = 1.5
    s = t.attribute_buffer.reshape(1, 28)
    np.testing.assert_allclose(s[0, 21:24], [0.3, 0.7, 2.0], rtol=1e-6)
    np.testing.assert_allclose(s[0, 24:27], [0.5, 0, 1.5], rtol=1e-6)


def test_cuboid_has_six_faces_with_bias():
    c = Cuboid(-1, 1, -1, 1, -1, 1)
    assert len(c) == 6
    assert c.top is c[0] and c.back is c[5]
    # All 12 triangles serialize
    total = sum(f.length for f in c)
    assert total == 12
    # Inset bias applied
    assert c.top.vertices.reshape(-1, 3)[:, 1].max() < 1.0


def test_transform_registry_identity_slot():
    from flexlight_tpu.scene.transform import global_registry

    reg = global_registry()
    assert reg.count == 1  # identity at slot 0
    t = Transform()
    assert t.number == 1
    t.rotate_axis([0, 1, 0], np.pi / 2)
    t.scale(2.0)
    t.move(1, 2, 3)
    rotations, shifts = reg.build_arrays()
    assert rotations.shape == (2, 2, 3, 3)
    np.testing.assert_allclose(rotations[0, 0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(rotations[1, 0] @ rotations[1, 1], np.eye(3) * 1.0, atol=1e-5)
    np.testing.assert_allclose(shifts[1, 0], [1, 2, 3])
    np.testing.assert_allclose(shifts[1, 1], [-1, -2, -3])


def test_flatten_counts_and_skip_pointers():
    scene = Scene()
    tris = [Triangle([i, 0, 0], [i + 1, 0, 0], [i, 1, 0]) for i in range(3)]
    scene.queue.push(tris)  # queue = [ [t0, t1, t2] ]
    built = flatten_graph(scene.queue)
    # root node + inner node + 3 triangles = 5 slots
    assert built.texture_length == 5
    assert built.buffer_length == 3
    g = built.geometry
    assert g[0, 10] == KIND_BVH_NODE and g[0, 6] == 4  # root skips 4 slots
    assert g[1, 10] == KIND_BVH_NODE and g[1, 6] == 3
    assert all(g[i, 10] == KIND_TRIANGLE for i in range(2, 5))
    assert g[5, 10] == KIND_SENTINEL
    np.testing.assert_array_equal(built.id_buffer, [2, 3, 4])
    # Root AABB covers all triangles
    np.testing.assert_allclose(g[0, 0:3], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(g[0, 3:6], [3, 1, 0], atol=1e-6)
    # Padded to a full 256-slot row
    assert g.shape[0] == 256


def test_flatten_static_baking():
    scene = Scene()
    from flexlight_tpu import Object3D

    obj = Bounding([Triangle([0, 0, 0], [1, 0, 0], [0, 1, 0]),
                    Triangle([2, 0, 0], [3, 0, 0], [2, 1, 0])])
    scene.queue.push(obj)
    fresh = flatten_graph(scene.queue)
    obj.static = True
    baked = flatten_graph(scene.queue)
    np.testing.assert_array_equal(fresh.geometry, baked.geometry)
    np.testing.assert_array_equal(fresh.id_buffer, baked.id_buffer)
    assert obj.static


def test_bvh_build_small():
    scene = Scene()
    rng = np.random.default_rng(0)
    tris = []
    for _ in range(40):
        a = rng.uniform(-10, 10, 3)
        tris.append(Triangle(a, a + [0.1, 0, 0], a + [0, 0.1, 0]))
    root = scene.generate_bvh(tris)
    # Every leaf reachable; count triangles in tree
    count = [0]

    def walk(node):
        if getattr(node, "indexable", False):
            for child in node:
                walk(child)
        else:
            count[0] += node.length

    walk(root)
    assert count[0] == 40
    built = flatten_graph(root)
    assert built.buffer_length == 40
    # BVH should produce interior nodes (not a flat list)
    assert built.texture_length > 41


def test_light_array_defaults():
    scene = Scene()
    scene.primaryLightSources = [[1, 2, 3]]
    arr = scene.build_light_array()
    assert arr.shape == (1, 2, 3)
    np.testing.assert_allclose(arr[0, 0], [1, 2, 3])
    np.testing.assert_allclose(arr[0, 1], [200, 0.4, 0])
    scene.primary_light_sources[0].intensity = 160
    arr = scene.build_light_array()
    np.testing.assert_allclose(arr[0, 1, 0], 160)


def test_obj_import(tmp_path):
    obj_file = tmp_path / "tri.obj"
    obj_file.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
f 1 2 3
f 1 2 4 3
""")
    scene = Scene()
    root = scene.import_obj(str(obj_file))
    built = flatten_graph(root)
    assert built.buffer_length == 3  # 1 tri + 1 quad(2 tris)


def test_mtl_import(tmp_path):
    mtl = tmp_path / "m.mtl"
    mtl.write_text("""
newmtl glow
Ka 0.5 0.25 0.125
Ke 2.0 1.0 0.5
Ns 500
Ni 1.45
""")
    scene = Scene()
    mats = scene.import_mtl(str(mtl))
    assert mats["glow"]["emissiveness"] == 8.0
    np.testing.assert_allclose(mats["glow"]["color"], [255, 127.5, 63.75])
    assert mats["glow"]["metallicity"] == 0.5
    assert mats["glow"]["ior"] == 1.45
