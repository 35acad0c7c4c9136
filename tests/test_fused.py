"""Fused whole-frame kernel (ops.fused) vs the wavefront mxu scheme.

Two-level pin, because interpret-mode Pallas evaluates per-op and that
changes sin codegen — which the hash RNG amplifies by 4.4e4 into
fract-jumps (verified: noise4 alone differs by O(1) between contexts):

1. `pallas=False` runs the SAME kernel function under plain XLA (whole
   image as one tile): every MRT channel must match scheme="mxu" to
   ~1e-5 with no outliers — this pins all the injected logic
   (MT-closure layout, one-hot material fetch, deferred id packing,
   record ordering); a logic bug shows up as O(0.1-1) diffs on many
   pixels. Exact bit-equality is unattainable even here: the fused W
   matrix is padded to a different width than the mxu scheme's, which
   moves XLA:CPU's dot blocking by ~1 ulp, amplified along bounce chains.
2. The real (interpret) kernel is then compared statistically: channels
   with no RNG upstream are exact; RNG-downstream channels get aggregate
   + outlier-budget pins.
"""

import numpy as np
import pytest

import flexlight_tpu.ops.pathtrace as pt
from flexlight_tpu.ops.buffers import build_scene_buffers
from flexlight_tpu.ops.fused import fused_eligible, render_mrt_fused
from tests.scenes import cornell_config, cornell_scene


def _setup(n_lights=1, size=24):
    import jax.numpy as jnp

    scene, camera = cornell_scene()
    if n_lights > 1:
        scene.primaryLightSources = [
            [i % 4 - 1.5, 4, (i // 4) - 2.0] for i in range(n_lights)]
        for i, light in enumerate(scene.primary_light_sources):
            light.intensity = 30 + i
            light.variation = 0.2
    buffers = build_scene_buffers(scene)
    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)
    return buffers, pos, view


@pytest.mark.parametrize("n_lights,spp,bounces", [
    pytest.param(1, 1, 3, marks=pytest.mark.slow),  # depth covered by 8-1-2 + slow tier
    (8, 1, 2),    # multi-light reservoir incl. jitter (variation) path
    (1, 2, 2),    # sample loop + carried aux
])
def test_fused_xla_mode_bit_equals_mxu(n_lights, spp, bounces):
    import jax.numpy as jnp

    buffers, pos, view = _setup(n_lights)
    config = cornell_config(max_reflections=bounces, samples_per_ray=spp)
    size = 24
    ref = pt.render_mrt(buffers, size, size, pos, view, config,
                        jnp.float32(0.0), scheme="mxu")
    got = render_mrt_fused(buffers, size, size, pos, view, config,
                           jnp.float32(0.0), pallas=False)
    for name in ref._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            atol=5e-5, rtol=0, err_msg=name)


def test_fused_xla_mode_raw_aux_bit_equals_mxu():
    import jax.numpy as jnp

    buffers, pos, view = _setup()
    config = cornell_config(max_reflections=2)
    size = 16
    ref, raw_ref = pt.render_mrt(buffers, size, size, pos, view, config,
                                 jnp.float32(0.0), scheme="mxu",
                                 with_raw_aux=True)
    got, raw_got = render_mrt_fused(buffers, size, size, pos, view, config,
                                    jnp.float32(0.0), pallas=False,
                                    with_raw_aux=True)
    for a, b in zip(raw_ref, raw_got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   rtol=0)


def test_fused_kernel_statistics_vs_xla_mode():
    """The interpret kernel: RNG-free channels exact, the rest budgeted
    (sin-codegen chaos, same class as the golden harness)."""
    import jax.numpy as jnp

    buffers, pos, view = _setup()
    config = cornell_config(max_reflections=3)
    size = 24
    xla = render_mrt_fused(buffers, size, size, pos, view, config,
                           jnp.float32(0.0), pallas=False)
    ker = render_mrt_fused(buffers, size, size, pos, view, config,
                           jnp.float32(0.0), pallas=True, interpret=True)
    # no RNG upstream of the primary hit: exact
    np.testing.assert_array_equal(np.asarray(xla.alpha), np.asarray(ker.alpha))
    np.testing.assert_allclose(np.asarray(xla.location_id),
                               np.asarray(ker.location_id), atol=1e-6)
    # RNG-downstream: aggregates match, isolated pixels may flip (at
    # 24^2 the flip ensemble moves the mean by up to a few percent)
    a, b = np.asarray(xla.color), np.asarray(ker.color)
    assert abs(a.mean() - b.mean()) <= 0.05 * max(a.mean(), 1e-6)
    close = np.isclose(a, b, atol=1e-3).all(axis=-1)
    assert close.mean() >= 0.85, close.mean()


def test_fused_kernel_tiling_matches_single_tile():
    """Multiple ray tiles (grid > 1) must tile/unpad exactly: compare the
    interpret kernel at rt=256 vs rt covering the whole image."""
    import jax.numpy as jnp

    buffers, pos, view = _setup(size=32)
    config = cornell_config(max_reflections=2)
    size = 32
    one_tile = render_mrt_fused(buffers, size, size, pos, view, config,
                                jnp.float32(0.0), interpret=True,
                                ray_tile=1024)
    tiled = render_mrt_fused(buffers, size, size, pos, view, config,
                             jnp.float32(0.0), interpret=True, ray_tile=256)
    for name in one_tile._fields:
        a = np.asarray(getattr(one_tile, name))
        b = np.asarray(getattr(tiled, name))
        # tiling changes nothing upstream of the RNG; the RNG inputs
        # (ndc) are identical per pixel, so outputs match to fp noise on
        # the same compilation class — budget isolated sin-context flips
        bad = (np.abs(a - b) > 1e-3).mean()
        assert bad <= 0.05, (name, bad)


def test_fused_scheme_dispatch_and_eligibility():
    import jax.numpy as jnp

    buffers, pos, view = _setup()
    assert fused_eligible(buffers)
    config = cornell_config(max_reflections=2)
    mrt = pt.render_mrt(buffers, 16, 16, pos, view, config, jnp.float32(0.0),
                        scheme="fused")
    assert np.asarray(mrt.alpha).max() == 1.0
    # a big-scene buffer is rejected
    big = buffers._replace(id_buffer=jnp.zeros(5000, jnp.int32))
    assert not fused_eligible(big)
    with pytest.raises(AssertionError):
        render_mrt_fused(big, 8, 8, pos, view, config, 0.0, pallas=False)


@pytest.mark.slow
def test_fused_textured_small_atlas_matches_mxu():
    """Tiny-texture scenes (eth/example2 class: 1x1 textures padded into
    2048-wide atlas rows) run through the in-kernel one-hot sampler."""
    import jax.numpy as jnp

    scene, camera = cornell_scene()
    rme = scene.texture_from_rme([0.8, 0.3, 0.1], 1, 1)
    scene.pbr_textures.push(rme)
    scene.standardTextureSizes = [1, 1]
    cubes = scene.queue[0]
    cubes[0].textureNums = [-1, 0, -1]
    buffers = build_scene_buffers(scene)
    assert buffers.pbr_atlas.shape[0] * buffers.pbr_atlas.shape[1] > 1
    assert fused_eligible(buffers)

    size = 24
    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)
    config = cornell_config(max_reflections=3)
    ref = pt.render_mrt(buffers, size, size, pos, view, config,
                        jnp.float32(0.0), scheme="mxu")
    got = render_mrt_fused(buffers, size, size, pos, view, config,
                           jnp.float32(0.0), pallas=False)
    for name in ref._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            atol=5e-5, rtol=0, err_msg=name)
    # and the interpret kernel runs the one-hot path (budgeted chaos)
    ker = render_mrt_fused(buffers, size, size, pos, view, config,
                           jnp.float32(0.0), interpret=True)
    a, b = np.asarray(got.color), np.asarray(ker.color)
    assert np.isclose(a, b, atol=1e-3).all(axis=-1).mean() >= 0.85


def test_fused_kernel_lowers_for_tpu():
    """Cross-platform export runs the full Pallas->Mosaic lowering on a
    CPU host: catches any op in the fused kernel (or future edits to
    light_trace it traces) that Mosaic cannot lower — e.g. arctan2, which
    is why id packing is deferred — without needing a chip."""
    import jax
    import jax.numpy as jnp
    from jax import export

    buffers, pos, view = _setup()
    config = cornell_config(max_reflections=2)

    def f(buffers, pos, view, seed):
        return render_mrt_fused(buffers, 16, 16, pos, view, config, seed,
                                interpret=False)

    exp = export.export(jax.jit(f), platforms=["tpu"])(
        buffers, pos, view, jnp.float32(0.0))
    assert len(exp.mlir_module_serialized) > 0


# ---------------------------------------------------------------------------
# Split per-bounce pipeline (render_mrt_fused_split) — big-atlas scenes
# ---------------------------------------------------------------------------

def _setup_big_atlas(size=24):
    """Cornell + a 128x128 RME texture (16k texels): over the whole-frame
    kernel's MAX_TEXELS, so only the split pipeline is eligible. The
    texture is load-bearing: removing it moves color by O(1)."""
    import jax.numpy as jnp

    scene, camera = cornell_scene()
    rng = np.random.default_rng(0)
    tex = scene.texture_from_rme(
        rng.uniform(0.1, 0.9, 128 * 128 * 3).astype(np.float32), 128, 128)
    scene.pbr_textures.push(tex)
    scene.standardTextureSizes = [128, 128]
    scene.queue[0][0].textureNums = [-1, 0, -1]
    buffers = build_scene_buffers(scene)
    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)
    return buffers, pos, view


@pytest.mark.parametrize("big_atlas,n_lights,spp,bounces", [
    (False, 1, 1, 3),
    (False, 8, 1, 2),   # multi-light reservoir incl. jitter path
    (False, 1, 2, 2),   # sample loop + carried aux
    (True, 1, 1, 3),    # atlas too big for the whole-frame kernel
])
def test_fused_split_xla_mode_matches_mxu(big_atlas, n_lights, spp, bounces):
    import jax.numpy as jnp

    from flexlight_tpu.ops.fused import render_mrt_fused_split

    if big_atlas:
        buffers, pos, view = _setup_big_atlas()
        assert not fused_eligible(buffers)
    else:
        buffers, pos, view = _setup(n_lights)
    config = cornell_config(max_reflections=bounces, samples_per_ray=spp)
    size = 24
    ref = pt.render_mrt(buffers, size, size, pos, view, config,
                        jnp.float32(0.0), scheme="mxu")
    got = render_mrt_fused_split(buffers, size, size, pos, view, config,
                                 jnp.float32(0.0), pallas=False)
    for name in ref._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            atol=5e-5, rtol=0, err_msg=name)


@pytest.mark.parametrize("big_atlas", [False, True])
def test_fused_split_inkernel_tex_matches_mxu(monkeypatch, big_atlas):
    """Flavor 3 (FLEXLIGHT_SPLIT_TEX=inkernel, default-off negative
    result): the in-kernel fetch arithmetic — f32-emulated // and %,
    one-hot slot/texel contractions, xla-deferred big-table gather —
    must be value-exact vs scheme=mxu."""
    import jax.numpy as jnp

    from flexlight_tpu.ops.fused import render_mrt_fused_split

    monkeypatch.setenv("FLEXLIGHT_SPLIT_TEX", "inkernel")
    if big_atlas:
        buffers, pos, view = _setup_big_atlas()
    else:
        buffers, pos, view = _setup()
    config = cornell_config(max_reflections=2)
    size = 24
    ref = pt.render_mrt(buffers, size, size, pos, view, config,
                        jnp.float32(0.0), scheme="mxu")
    got = render_mrt_fused_split(buffers, size, size, pos, view, config,
                                 jnp.float32(0.0), pallas=False)
    for name in ref._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            atol=5e-5, rtol=0, err_msg=name)


def test_fused_split_dead_subtile_skip(monkeypatch):
    """The round-5 dead-subtile skip (@pl.when copy branch when no ray in
    the slice has surface.m) must be RESULT-EXACT vs the unskipped
    kernel: interpret mode, a camera far enough back that whole
    128-ray subtiles are sky from the primary cast on."""
    import jax.numpy as jnp

    from flexlight_tpu.ops.fused import render_mrt_fused_split
    from tests.scenes import cornell_scene

    scene, camera = cornell_scene()
    camera.z = -60.0          # box subtends a narrow band: edge tiles die
    buffers = build_scene_buffers(scene)
    size = 32
    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)
    config = cornell_config(max_reflections=3)
    kw = dict(ray_tile=128, subtile=2, interpret=True)

    monkeypatch.setenv("FLEXLIGHT_SPLIT_SKIP", "0")
    off = render_mrt_fused_split(buffers, size, size, pos, view, config,
                                 jnp.float32(0.0), **kw)
    monkeypatch.setenv("FLEXLIGHT_SPLIT_SKIP", "1")
    on = render_mrt_fused_split(buffers, size, size, pos, view, config,
                                jnp.float32(0.0), **kw)
    # the setup must actually produce >= 1 fully-dead 128-ray subtile
    # (4 consecutive image rows with no primary hit), or the skip branch
    # was never exercised
    alpha = np.asarray(off.alpha).reshape(size, size)
    row_dead = (alpha.sum(axis=1) == 0.0).reshape(-1, 4).all(axis=1)
    assert row_dead.any(), "no dead subtile — camera setup regressed"
    for name in off._fields:
        np.testing.assert_array_equal(np.asarray(getattr(off, name)),
                                      np.asarray(getattr(on, name)),
                                      err_msg=name)


@pytest.mark.slow
def test_fused_split_kernel_statistics_vs_xla_mode():
    """The interpret kernels: coverage exact, RNG-downstream budgeted
    (same sin-codegen chaos class as the whole-frame kernel)."""
    import jax.numpy as jnp

    from flexlight_tpu.ops.fused import render_mrt_fused_split

    buffers, pos, view = _setup()
    config = cornell_config(max_reflections=3)
    size = 24
    xla = render_mrt_fused_split(buffers, size, size, pos, view, config,
                                 jnp.float32(0.0), pallas=False)
    ker = render_mrt_fused_split(buffers, size, size, pos, view, config,
                                 jnp.float32(0.0), interpret=True)
    np.testing.assert_array_equal(np.asarray(xla.alpha), np.asarray(ker.alpha))
    np.testing.assert_allclose(np.asarray(xla.location_id),
                               np.asarray(ker.location_id), atol=1e-6)
    a, b = np.asarray(xla.color), np.asarray(ker.color)
    assert abs(a.mean() - b.mean()) <= 0.05 * max(a.mean(), 1e-6)
    close = np.isclose(a, b, atol=1e-3).all(axis=-1)
    assert close.mean() >= 0.85, close.mean()


@pytest.mark.slow
def test_fused_split_tiling_matches_single_tile():
    import jax.numpy as jnp

    from flexlight_tpu.ops.fused import render_mrt_fused_split

    buffers, pos, view = _setup(size=32)
    config = cornell_config(max_reflections=2)
    size = 32
    one_tile = render_mrt_fused_split(buffers, size, size, pos, view, config,
                                      jnp.float32(0.0), interpret=True,
                                      ray_tile=1024)
    tiled = render_mrt_fused_split(buffers, size, size, pos, view, config,
                                   jnp.float32(0.0), interpret=True,
                                   ray_tile=256)
    for name in one_tile._fields:
        a = np.asarray(getattr(one_tile, name))
        b = np.asarray(getattr(tiled, name))
        bad = (np.abs(a - b) > 1e-3).mean()
        assert bad <= 0.05, (name, bad)


def test_fused_split_scheme_dispatch_and_eligibility():
    import jax.numpy as jnp

    from flexlight_tpu.ops.fused import (fused_split_eligible,
                                         render_mrt_fused_split)

    buffers, pos, view = _setup()
    assert fused_split_eligible(buffers)
    config = cornell_config(max_reflections=2)
    mrt = pt.render_mrt(buffers, 16, 16, pos, view, config, jnp.float32(0.0),
                        scheme="fused_split")
    assert np.asarray(mrt.alpha).max() == 1.0
    big = buffers._replace(id_buffer=jnp.zeros(5000, jnp.int32))
    assert not fused_split_eligible(big)
    with pytest.raises(AssertionError):
        render_mrt_fused_split(big, 8, 8, pos, view, config, 0.0,
                               pallas=False)


def test_fused_split_lowers_for_tpu():
    """Pallas->Mosaic lowering of both split kernels (i0, post) on a
    big-atlas scene — the configuration the split pipeline exists for."""
    import jax
    import jax.numpy as jnp
    from jax import export

    from flexlight_tpu.ops.fused import render_mrt_fused_split

    buffers, pos, view = _setup_big_atlas()
    config = cornell_config(max_reflections=2)

    def f(buffers, pos, view, seed):
        return render_mrt_fused_split(buffers, 16, 16, pos, view, config,
                                      seed, interpret=False)

    exp = export.export(jax.jit(f), platforms=["tpu"])(
        buffers, pos, view, jnp.float32(0.0))
    assert len(exp.mlir_module_serialized) > 0


def test_fused_split_subtiled_lowers_for_tpu():
    """The in-program subtile loop (fori_loop over dynamic leading-index
    ref slices, grid = G/subtile) must lower to Mosaic — incl. the
    resample (spp=2) kernel variant."""
    import jax
    import jax.numpy as jnp
    from jax import export

    from flexlight_tpu.ops.fused import render_mrt_fused_split

    buffers, pos, view = _setup_big_atlas()
    config = cornell_config(max_reflections=2, samples_per_ray=2)

    def f(buffers, pos, view, seed):
        return render_mrt_fused_split(buffers, 24, 24, pos, view, config,
                                      seed, interpret=False, ray_tile=256,
                                      subtile=2)

    exp = export.export(jax.jit(f), platforms=["tpu"])(
        buffers, pos, view, jnp.float32(0.0))
    assert len(exp.mlir_module_serialized) > 0


@pytest.mark.slow
def test_fused_split_subtile_matches_subtile1():
    """subtile grouping is pure batching: interpret-mode results are
    identical to one program per ray tile."""
    import jax.numpy as jnp

    from flexlight_tpu.ops.fused import render_mrt_fused_split

    buffers, pos, view = _setup(size=32)
    config = cornell_config(max_reflections=2)
    size = 32
    one = render_mrt_fused_split(buffers, size, size, pos, view, config,
                                 jnp.float32(0.0), interpret=True,
                                 ray_tile=256, subtile=1)
    grouped = render_mrt_fused_split(buffers, size, size, pos, view, config,
                                     jnp.float32(0.0), interpret=True,
                                     ray_tile=256, subtile=4)
    for name in one._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(one, name)),
            np.asarray(getattr(grouped, name)), err_msg=name)


# ---------------------------------------------------------------------------
# Shade kernel (make_shade_bounce_post) — sparse-scheme shading in Pallas
# ---------------------------------------------------------------------------

def _run_shade_kernel(monkeypatch, mode, scheme="mxu", size=32, bounces=3):
    import jax.numpy as jnp

    buffers, pos, view = _setup(size=size)
    config = cornell_config(max_reflections=bounces)
    view = jnp.asarray(view)
    if mode is None:
        monkeypatch.delenv("FLEXLIGHT_SHADE_KERNEL", raising=False)
        monkeypatch.delenv("FLEXLIGHT_FORCE_2D", raising=False)
    else:
        monkeypatch.setenv("FLEXLIGHT_SHADE_KERNEL", mode)
        monkeypatch.setenv("FLEXLIGHT_FORCE_2D", "1")
    return pt.render_mrt(buffers, size, size, pos, view, config,
                         jnp.float32(0.0), scheme=scheme)


def test_shade_kernel_xla_mode_bit_equals_plain(monkeypatch):
    """ValRef trace of the shade kernel == plain bounce_post composition,
    bit-for-bit (same stage functions, value-preserving pack/unpack, id
    packing re-applied outside with identical arithmetic)."""
    ref = _run_shade_kernel(monkeypatch, None)
    got = _run_shade_kernel(monkeypatch, "xla")
    for name in ref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=name)


def test_shade_kernel_statistics_vs_plain(monkeypatch):
    """Interpret-mode kernel: RNG-free channels exact, color budgeted
    (in-kernel sin codegen chaos — same class as the fused kernels)."""
    ref = _run_shade_kernel(monkeypatch, None)
    got = _run_shade_kernel(monkeypatch, "1")
    for ch in ("alpha", "location_id", "original_color", "glass",
               "original_id_w"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, ch)), np.asarray(getattr(got, ch)),
            atol=1e-6, err_msg=ch)
    a, b = np.asarray(ref.color), np.asarray(got.color)
    close = np.isclose(a, b, atol=1e-3).all(axis=-1)
    assert close.mean() >= 0.85, close.mean()


@pytest.mark.slow
def test_shade_kernel_with_sparse_scheme(monkeypatch):
    """The intended pairing: sparse worklist traversal + Pallas shading.
    Compared against plain sparse on RNG-free channels."""
    ref = _run_shade_kernel(monkeypatch, None, scheme="sparse", bounces=2)
    got = _run_shade_kernel(monkeypatch, "1", scheme="sparse", bounces=2)
    np.testing.assert_array_equal(np.asarray(ref.alpha),
                                  np.asarray(got.alpha))
    a, b = np.asarray(ref.color), np.asarray(got.color)
    close = np.isclose(a, b, atol=1e-3).all(axis=-1)
    assert close.mean() >= 0.85, close.mean()


def test_shade_kernel_lowers_for_tpu(monkeypatch):
    import jax
    import jax.numpy as jnp
    from jax import export

    buffers, pos, view = _setup()
    config = cornell_config(max_reflections=2)
    monkeypatch.setenv("FLEXLIGHT_SHADE_KERNEL", "mosaic")
    monkeypatch.setenv("FLEXLIGHT_FORCE_2D", "1")

    def f(buffers, pos, view, seed):
        return pt.render_mrt(buffers, 16, 16, pos, view, config, seed,
                             scheme="mxu")

    exp = export.export(jax.jit(f), platforms=["tpu"])(
        buffers, pos, jnp.asarray(view), jnp.float32(0.0))
    assert len(exp.mlir_module_serialized) > 0


def test_step_kernel_routing_and_big_atlas_shade_path(monkeypatch):
    """Routing: trivial atlases pick the combined step kernel; a big
    atlas falls back to the shade-only kernel. Both are bit-exact vs the
    plain composition in XLA trace mode."""
    import jax.numpy as jnp

    from flexlight_tpu.ops.fused import fused_step_eligible

    # tests-cornell has no textures -> 1x1 placeholder atlases
    buffers, pos, view = _setup(size=32)
    assert fused_step_eligible(buffers)
    # big-atlas cornell: shade-only path
    buffers_big, pos_b, view_b = _setup_big_atlas(size=32)
    assert not fused_step_eligible(buffers_big)

    config = cornell_config(max_reflections=3)
    monkeypatch.setenv("FLEXLIGHT_FORCE_2D", "1")
    monkeypatch.setenv("FLEXLIGHT_SHADE_KERNEL", "xla")
    got = pt.render_mrt(buffers_big, 32, 32, pos_b, view_b, config,
                        jnp.float32(0.0), scheme="mxu")
    monkeypatch.delenv("FLEXLIGHT_SHADE_KERNEL")
    monkeypatch.delenv("FLEXLIGHT_FORCE_2D")
    ref = pt.render_mrt(buffers_big, 32, 32, pos_b, view_b, config,
                        jnp.float32(0.0), scheme="mxu")
    for name in ref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=name)


def test_fused_many_lights_fori_reservoir():
    """64 lights (example2 class): the in-kernel reservoir switches to a
    Mosaic-lowerable fori_loop with an exact one-hot row fetch — both
    fused paths stay eligible, match mxu, and lower for TPU."""
    import jax
    import jax.numpy as jnp
    from jax import export

    from flexlight_tpu.ops.fused import render_mrt_fused_split

    buffers, pos, view = _setup(n_lights=64, size=16)
    assert fused_eligible(buffers)
    config = cornell_config(max_reflections=2)
    ref = pt.render_mrt(buffers, 16, 16, pos, view, config, jnp.float32(0.0),
                        scheme="mxu")
    got = render_mrt_fused(buffers, 16, 16, pos, view, config,
                           jnp.float32(0.0), pallas=False)
    for name in ref._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            atol=5e-5, rtol=0, err_msg=name)

    def f(buffers, pos, view, seed):
        return render_mrt_fused_split(buffers, 16, 16, pos, view, config,
                                      seed, interpret=False)

    exp = export.export(jax.jit(f), platforms=["tpu"])(
        buffers, pos, view, jnp.float32(0.0))
    assert len(exp.mlir_module_serialized) > 0
