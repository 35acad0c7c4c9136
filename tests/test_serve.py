"""Interactive frame server (flexlight_tpu.serve) — the canvas analogue.

Drives the HTTP surface end-to-end on a tiny CPU engine: viewer page,
PNG frames, key/mouse input routed into the WebIo fly camera, stats.
"""

import json
import struct
import urllib.request

import pytest

from flexlight_tpu import FlexLight
from flexlight_tpu.serve import FrameServer


def _tiny_engine():
    engine = FlexLight((24, 24))
    scene, camera = engine.scene, engine.camera
    scene.primaryLightSources = [[0, 4, 0]]
    scene.primary_light_sources[0].intensity = 100
    plane = scene.Plane([-5, -1, -5], [5, -1, -5], [5, -1, 5], [-5, -1, 5])
    scene.queue.push(plane)
    camera.y, camera.z = 2, -6
    engine.config = engine.config.replace(
        temporal=False, filter=False, antialiasing=None, max_reflections=2,
        samples_per_ray=1)
    engine.renderer = "pathtracer"
    return engine


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status


@pytest.fixture(scope="module")
def server():
    srv = FrameServer(_tiny_engine())
    url = srv.start()
    assert srv.wait_for_frame(1, timeout=600.0)  # first compile is slow
    yield srv, url
    srv.stop()


def test_viewer_page(server):
    _, url = server
    status, ctype, body = _get(url)
    assert status == 200 and ctype.startswith("text/html")
    assert b"/frame.png" in body and b"keydown" in body


def test_frame_png(server):
    _, url = server
    status, ctype, body = _get(url + "frame.png")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", body[16:24])
    assert (w, h) == (24, 24)


def test_key_input_moves_camera(server):
    srv, url = server
    cam = srv.engine.camera
    z0 = cam.z
    assert _post(url + "input", {"type": "keydown", "code": "KeyW"}) == 200
    seq = srv._seq
    assert srv.wait_for_frame(seq + 3)   # a few frames of integration
    assert _post(url + "input", {"type": "keyup", "code": "KeyW"}) == 200
    assert cam.z > z0   # moved forward (camera faces +z at fx=0)


def test_mouse_look(server):
    srv, url = server
    cam = srv.engine.camera
    fx0 = cam.fx
    assert _post(url + "input", {"type": "mouse", "dx": 40, "dy": 0}) == 200
    assert cam.fx != fx0


def test_stats(server):
    srv, url = server
    status, _, body = _get(url + "stats")
    assert status == 200
    stats = json.loads(body)
    assert stats["frames"] >= 1
    assert "fps" in stats


def test_config_endpoint_reads_knobs(server):
    _, url = server
    status, ctype, body = _get(url + "config")
    assert status == 200 and ctype == "application/json"
    cfg = json.loads(body)
    assert cfg["renderer"] == "pathtracer"
    assert cfg["filter"] is False and cfg["max_reflections"] == 2
    assert cfg["filter_mode"] in ("fast", "compat")


def test_config_mutation_applies_live(server):
    """POST /config mutates quality knobs mid-run and the renderer
    recompiles — the reference's parameterForm flow (loader.js:65-93)."""
    srv, url = server
    assert _post(url + "config", {"max_reflections": 1,
                                  "min_importancy": 0.5}) == 200
    seq = srv._seq
    assert srv.wait_for_frame(seq + 2, timeout=600.0)  # recompile + frame
    assert srv.engine.config.max_reflections == 1
    assert srv.engine.config.min_importancy == 0.5
    status, _, body = _get(url + "config")
    assert json.loads(body)["max_reflections"] == 1
    # restore (module-scoped engine)
    assert _post(url + "config", {"max_reflections": 2,
                                  "min_importancy": 0.3}) == 200
    seq = srv._seq
    assert srv.wait_for_frame(seq + 2, timeout=600.0)


@pytest.mark.slow
def test_config_renderer_hot_swap(server):
    srv, url = server
    assert _post(url + "config", {"renderer": "rasterizer"}) == 200
    seq = srv._seq
    assert srv.wait_for_frame(seq + 2, timeout=600.0)
    assert srv.engine.renderer.type == "rasterizer"
    status, _, body = _get(url + "frame.png")
    assert status == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
    assert _post(url + "config", {"renderer": "pathtracer"}) == 200
    seq = srv._seq
    assert srv.wait_for_frame(seq + 2, timeout=600.0)
    assert srv.engine.renderer.type == "pathtracer"


def test_bad_input_rejected(server):
    _, url = server
    try:
        _post(url + "input", {"type": "nope"})
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised
