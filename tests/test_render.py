"""End-to-end render tests on the Cornell scene (small resolutions, CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from flexlight_tpu import FlexLight
from tests.scenes import cornell_config, cornell_scene


def _engine(config, size=(32, 32)):
    engine = FlexLight(size)
    scene, camera = cornell_scene()
    engine.scene = scene
    engine.camera = camera
    engine.config = config
    return engine


@pytest.mark.slow
def test_pathtracer_direct_mode_renders():
    engine = _engine(cornell_config())
    engine.renderer = "pathtracer"
    img = engine.renderer.render_frame()
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.02  # something lit
    assert img.min() >= 0.0 and img.max() <= 1.0
    # Left wall red-ish, right wall green-ish: check hue split
    left = img[:, :4].mean(axis=(0, 1))
    right = img[:, -4:].mean(axis=(0, 1))
    assert left[0] > left[1]   # red dominant on left
    assert right[1] > right[0]  # green dominant on right


def test_pathtracer_deterministic():
    engine = _engine(cornell_config())
    engine.renderer = "pathtracer"
    a = engine.renderer.render_frame()
    b = engine.renderer.render_frame()
    np.testing.assert_array_equal(a, b)  # temporal off -> same seed -> identical


def test_pathtracer_temporal_mode():
    engine = _engine(cornell_config(temporal=True, temporal_samples=2))
    engine.renderer = "pathtracer"
    imgs = [engine.renderer.render_frame() for _ in range(3)]
    for img in imgs:
        assert np.isfinite(img).all()
    # Different random seeds -> frames differ before accumulation converges
    assert not np.array_equal(imgs[0], imgs[1])


@pytest.mark.slow
def test_pathtracer_filter_mode():
    engine = _engine(cornell_config(filter=True, temporal=False,
                                    first_passes=2, second_passes=2))
    engine.renderer = "pathtracer"
    img = engine.renderer.render_frame()
    assert np.isfinite(img).all()
    assert img.max() > 0.02


@pytest.mark.slow
def test_pathtracer_fxaa():
    engine = _engine(cornell_config(antialiasing="fxaa"))
    engine.renderer = "pathtracer"
    img = engine.renderer.render_frame()
    assert np.isfinite(img).all()
    assert img.max() > 0.02


def test_pathtracer_taa():
    engine = _engine(cornell_config(antialiasing="taa"))
    engine.renderer = "pathtracer"
    img = engine.renderer.render_frame()
    assert np.isfinite(img).all()


def test_rasterizer_renders():
    engine = _engine(cornell_config(hdr=True))
    engine.renderer = "rasterizer"
    img = engine.renderer.render_frame()
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.02


def test_simple_renderer():
    engine = _engine(cornell_config())
    engine.api = "webgpu"
    engine.renderer = "pathtracer"
    img = engine.renderer.render_frame()
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()


def test_render_quality_scales_resolution():
    engine = _engine(cornell_config(render_quality=0.5))
    engine.renderer = "pathtracer"
    img = engine.renderer.render_frame()
    assert img.shape == (16, 16, 3)


def test_emissive_surface_glows():
    engine = _engine(cornell_config())
    # Make the rear cube face emissive and check it shows up bright
    scene = engine.scene
    for item in scene.queue[0]:  # [cube0, cube1]
        item.emissiveness = 4.0
    engine.renderer = "pathtracer"
    img = engine.renderer.render_frame()
    assert img.max() > 0.5


def test_block_tile_roundtrip():
    import jax.numpy as jnp

    from flexlight_tpu.ops.pathtrace import block_tile, block_untile

    rows, width, bh, bw = 64, 128, 32, 32
    x = jnp.arange(rows * width, dtype=jnp.float32)
    t = block_tile(x, rows, width, bh, bw)
    np.testing.assert_array_equal(np.asarray(block_untile(t, rows, width, bh, bw)),
                                  np.asarray(x))
    xc = jnp.stack([x, x * 2], axis=-1)
    tc = block_tile(xc, rows, width, bh, bw)
    np.testing.assert_array_equal(np.asarray(block_untile(tc, rows, width, bh, bw)),
                                  np.asarray(xc))
    # first block really is the top-left 32x32 pixel block
    img = np.asarray(x).reshape(rows, width)
    np.testing.assert_array_equal(np.asarray(t)[:bh * bw].reshape(bh, bw),
                                  img[:bh, :bw])


def test_block_tiled_render_matches_unblocked():
    """Forcing block tiling on (threshold lowered) must not change the MRT."""
    import flexlight_tpu.ops.pathtrace as pt
    import jax.numpy as jnp
    from flexlight_tpu.ops.buffers import build_scene_buffers

    from scenes import cornell_config, cornell_scene

    scene, camera = cornell_scene()
    buffers = build_scene_buffers(scene)
    cfg = cornell_config(max_reflections=2)
    size = 32
    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)
    ref = pt.render_mrt(buffers, size, size, pos, view, cfg, 0.0, scheme="kernel")
    old = pt.BLOCK_TILE_MIN_TRIS
    try:
        pt.BLOCK_TILE_MIN_TRIS = 1
        got = pt.render_mrt(buffers, size, size, pos, view, cfg, 0.0, scheme="kernel")
    finally:
        pt.BLOCK_TILE_MIN_TRIS = old
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_force_2d_layout_matches_flat():
    """FLEXLIGHT_FORCE_2D (2-D shading layout on small material tables)
    must be a pure layout change: bit-identical MRT output."""
    import os

    import flexlight_tpu.ops.pathtrace as pt
    import jax.numpy as jnp
    from flexlight_tpu.ops.buffers import build_scene_buffers

    from scenes import cornell_config, cornell_scene

    scene, camera = cornell_scene()
    buffers = build_scene_buffers(scene)
    cfg = cornell_config(max_reflections=3)
    size = 32
    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)
    ref = pt.render_mrt(buffers, size, size, pos, view, cfg, 0.0)
    os.environ["FLEXLIGHT_FORCE_2D"] = "1"
    try:
        got = pt.render_mrt(buffers, size, size, pos, view, cfg, 0.0)
    finally:
        del os.environ["FLEXLIGHT_FORCE_2D"]
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_pair_cast_matches_separate_casts_end_to_end():
    """FLEXLIGHT_PAIR_CAST merges each bounce's NEE shadow cast with the
    next closest hit into one sparse pair cast. It must be a pure
    scheduling change: bit-identical MRT output vs separate casts.
    (Integration-level pin — the function-level test in test_traverse
    feeds both paths the same rays, so it cannot catch the pair cast
    tracing the wrong ray, e.g. the pre-bounce_apply incoming direction
    instead of the sampled next direction.)"""
    import os

    import flexlight_tpu.ops.pathtrace as pt
    import jax.numpy as jnp
    from flexlight_tpu.ops.buffers import build_scene_buffers

    from scenes import cornell_config, cornell_scene

    scene, camera = cornell_scene()
    buffers = build_scene_buffers(scene)
    cfg = cornell_config(max_reflections=3)
    size = 32
    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)
    ref = pt.render_mrt(buffers, size, size, pos, view, cfg, 0.0,
                        scheme="sparse")
    os.environ["FLEXLIGHT_PAIR_CAST"] = "1"
    try:
        got = pt.render_mrt(buffers, size, size, pos, view, cfg, 0.0,
                            scheme="sparse")
    finally:
        del os.environ["FLEXLIGHT_PAIR_CAST"]
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_tail_skip_matches_unskipped(monkeypatch):
    """Dead-tail bounce skipping (lax.cond on any-alive) is semantically
    exact: a bounce over an all-dead wavefront is a no-op by
    construction, and live bounces run the same arithmetic. Compared
    under jit on BOTH sides (the cond is a fusion boundary, so the
    compiled graphs differ by last-ulp fma grouping in color — measured
    2.4e-7 max on cornell 24^2 mr=5; every discrete/gated channel is
    bit-identical). Eager-vs-jit comparison is meaningless here: eager
    lax.cond compiles its branch while the inline path runs op-by-op.
    CPU-tier only: on TPU the branch's sin codegen can differ in the
    last ulp, which flips the sin-hash RNG chaotically (counter RNG and
    discrete channels stay exact) — see the note in light_trace."""
    import jax
    import jax.numpy as jnp

    from flexlight_tpu.ops.buffers import build_scene_buffers
    from flexlight_tpu.ops.pathtrace import render_mrt
    from tests.scenes import cornell_config, cornell_scene

    scene, camera = cornell_scene()
    buffers = build_scene_buffers(scene)
    size = 24
    view = jnp.asarray(camera.view_matrix(size, size))
    cam = jnp.asarray(camera.position)
    cfg = cornell_config(max_reflections=5)

    def run(skip):
        monkeypatch.setenv("FLEXLIGHT_TAIL_SKIP", skip)
        fn = jax.jit(lambda b, c, v: render_mrt(b, size, size, c, v, cfg,
                                                0.0, scheme="scan"))
        return jax.tree.map(np.asarray, fn(buffers, cam, view))

    base = run("0")
    for variant in ("1", "2"):
        got = run(variant)
        for name in base._fields:
            a, b = getattr(base, name), getattr(got, name)
            if name == "color":
                np.testing.assert_allclose(
                    a, b, atol=2e-6,
                    err_msg=f"tail_skip={variant} changed color")
            else:
                np.testing.assert_array_equal(
                    a, b, err_msg=f"tail_skip={variant} changed {name}")
