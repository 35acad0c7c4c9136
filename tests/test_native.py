"""Native C++ loader vs pure-Python importer equivalence."""

import os

import numpy as np
import pytest

from flexlight_tpu import Scene
from flexlight_tpu import native
from flexlight_tpu.scene.flatten import flatten_graph

MONKE = "/root/reference/objects/monke.obj"

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _write_obj(tmp_path, text):
    p = tmp_path / "m.obj"
    p.write_text(text)
    return str(p)


def test_native_simple_tri_matches_python(tmp_path):
    path = _write_obj(tmp_path, """
v 0 0 0
v 1 0 0
v 0 1 0
f 1 2 3
""")
    scene = Scene()
    py = scene.import_obj(path, fast=False)
    nat = scene.import_obj(path, fast=True)
    py_built = flatten_graph([py])
    nat_built = flatten_graph([nat])
    assert py_built.buffer_length == nat_built.buffer_length == 1
    # Triangle row contents identical (vertices, normals, uvs, material)
    py_tri = py_built.geometry[py_built.id_buffer[0]]
    nat_tri = nat_built.geometry[nat_built.id_buffer[0]]
    np.testing.assert_allclose(py_tri[0:9], nat_tri[0:9], atol=1e-6)
    py_attr = py_built.attributes[py_built.id_buffer[0]]
    nat_attr = nat_built.attributes[nat_built.id_buffer[0]]
    np.testing.assert_allclose(py_attr, nat_attr, atol=1e-6)


def test_native_quad_matches_python(tmp_path):
    path = _write_obj(tmp_path, """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
""")
    scene = Scene()
    py = scene.import_obj(path, fast=False)
    nat = scene.import_obj(path, fast=True)
    py_built = flatten_graph([py])
    nat_built = flatten_graph([nat])
    assert py_built.buffer_length == nat_built.buffer_length == 2
    for i in range(2):
        pt = py_built.geometry[py_built.id_buffer[i]]
        nt = nat_built.geometry[nat_built.id_buffer[i]]
        np.testing.assert_allclose(pt[0:9], nt[0:9], atol=1e-6)
        pa = py_built.attributes[py_built.id_buffer[i]]
        na = nat_built.attributes[nat_built.id_buffer[i]]
        np.testing.assert_allclose(pa, na, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(MONKE), reason="assets not mounted")
def test_native_monke_renders_like_python():
    import jax.numpy as jnp

    from flexlight_tpu import Camera
    from flexlight_tpu.ops.buffers import build_scene_buffers
    from flexlight_tpu.ops.pathtrace import render_mrt
    from tests.scenes import cornell_config

    def render(fast):
        scene = Scene()
        obj = scene.import_obj(MONKE, fast=fast)
        scene.queue.push(obj)
        buffers = build_scene_buffers(scene)
        camera = Camera()
        camera.z = -4.0
        cfg = cornell_config(max_reflections=2)
        view = jnp.asarray(camera.view_matrix(24, 24))
        return np.asarray(render_mrt(buffers, 24, 24,
                                     jnp.asarray(camera.position), view,
                                     cfg, 0.0).color)

    a = render(False)
    b = render(True)
    # Trees differ (per-triangle vs per-primitive BVH) but closest hits and
    # shading must agree except at fp decision boundaries.
    diff = np.abs(a - b).max(axis=-1)
    assert (diff > 0.05).mean() < 0.03, f"{(diff > 0.05).mean():.3f} diverge"


@pytest.mark.skipif(not os.path.exists(MONKE), reason="assets not mounted")
def test_native_loader_counts():
    data = native.load_obj(MONKE)
    assert data is not None
    # monke.obj has ~500 quad faces -> ~968 triangles after quad split
    assert 400 <= data.verts.shape[0] <= 1100
    assert (data.kind == 2).sum() == data.verts.shape[0]
    # Skip pointers consistent: node skip spans stay in range
    nodes = np.where(data.kind == 1)[0]
    for i in nodes[:50]:
        assert i + data.skip[i] < len(data.kind) + 1
