"""Structured per-frame metrics (utils/metrics.py, SURVEY §5
"metrics/observability"): every renderer appends one flat record per
frame and can stream them as JSON lines."""

import json

import pytest

jax = pytest.importorskip("jax")

from tests.scenes import cornell_config, cornell_scene  # noqa: E402

REQUIRED = {"ts", "renderer", "frame", "frame_ms", "fps", "width", "height",
            "samples_per_ray", "max_reflections", "temporal", "filter",
            "antialiasing", "scheme"}


def _engine(renderer: str):
    from flexlight_tpu import FlexLight

    scene, camera = cornell_scene()
    engine = FlexLight((16, 16))
    engine.scene = scene
    engine.config = cornell_config(max_reflections=1)
    if renderer == "simple":
        engine.api = "webgpu"
        renderer = "pathtracer"
    engine.renderer = renderer
    return engine


@pytest.mark.parametrize("renderer", ["pathtracer", "rasterizer", "simple"])
def test_frame_metrics_recorded(renderer):
    engine = _engine(renderer)
    r = engine.renderer
    r.render_frame()
    r.render_frame()
    assert len(r.metrics.records) == 2
    rec = r.metrics.last
    assert REQUIRED <= set(rec), REQUIRED - set(rec)
    assert rec["width"] == rec["height"] == 16
    assert rec["frame_ms"] > 0


def test_metrics_jsonl_sink(tmp_path):
    engine = _engine("pathtracer")
    r = engine.renderer
    path = tmp_path / "frames.jsonl"
    r.metrics.attach(path)
    r.render_frame()
    r.render_frame()
    r.metrics.detach()
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 2
    recs = [json.loads(ln) for ln in lines]
    assert recs[0]["frame"] == 0 or recs[0]["frame"] == 1  # counter offset per model
    assert all(REQUIRED <= set(rec) for rec in recs)
    assert recs[0]["ts"] <= recs[1]["ts"]


def test_metrics_ring_bounded():
    from flexlight_tpu.utils.metrics import FrameMetrics

    m = FrameMetrics(capacity=3)
    for i in range(5):
        m.record(i=i)
    assert [r["i"] for r in m.records] == [2, 3, 4]
    assert m.last["i"] == 4
