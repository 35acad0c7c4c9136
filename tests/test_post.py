import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flexlight_tpu.post.common import quantize_rgba8, split_hdr
from flexlight_tpu.post.filters import final_filter, first_filter, second_filter
from flexlight_tpu.post.fxaa import fxaa
from flexlight_tpu.post.taa import FRAMES, Jitter, TAAState, gen_zero_sum_jitter, taa_apply
from flexlight_tpu.post.temporal import TemporalState, push_frame, temporal_average


def test_quantize_rgba8():
    v = jnp.array([0.0, 1.0, 0.5, 2.0, -1.0, 1.0 / 255.0])
    q = np.asarray(quantize_rgba8(v))
    np.testing.assert_allclose(q, [0.0, 1.0, 128 / 255, 1.0, 0.0, 1 / 255], atol=1e-7)


def test_split_hdr_roundtrip():
    c = jnp.array([[[0.25, 1.5, 3.75]]])
    frac, high = split_hdr(c)
    recon = np.asarray(frac + high * 256.0)
    # RGBA8 storage quantizes the floor/256 channel to 1/255 steps; the
    # reconstruction error bound is 256/255/2 ~ 0.5*(1/255)*256 ~ 0.5*0.004*256
    np.testing.assert_allclose(recon[0, 0], [0.25, 1.5, 3.75], atol=0.03)


def test_temporal_average_gates_on_id():
    state = TemporalState.create(3, 2, 2)
    idq = jnp.ones((2, 2, 4)) * 0.5
    oid = jnp.zeros((2, 2, 4))
    c1 = jnp.concatenate([jnp.full((2, 2, 3), 0.2), jnp.ones((2, 2, 1))], axis=-1)
    c2 = jnp.concatenate([jnp.full((2, 2, 3), 0.4), jnp.ones((2, 2, 1))], axis=-1)
    ip = jnp.zeros((2, 2, 4))
    state = push_frame(state, c1, ip, idq, oid)
    state = push_frame(state, c2, ip, idq, oid)
    color, glass, center_w = temporal_average(state)
    # Two matching frames average; third (empty, id=0) excluded
    np.testing.assert_allclose(np.asarray(color[0, 0]), [0.3, 0.3, 0.3], atol=1e-6)
    # Now a frame with different id resets the gate
    id2 = jnp.ones((2, 2, 4)) * 0.7
    c3 = jnp.concatenate([jnp.full((2, 2, 3), 0.9), jnp.ones((2, 2, 1))], axis=-1)
    state = push_frame(state, c3, ip, id2, oid)
    color, _, _ = temporal_average(state)
    np.testing.assert_allclose(np.asarray(color[0, 0]), [0.9, 0.9, 0.9], atol=1e-6)


def test_first_filter_passthrough_when_no_blur_key():
    # NB: a channel of exactly 1.0 would wrap to 0 through the shader's
    # mod(color, 1.0) (first_filter.glsl:121) — faithful reference quirk.
    h = w = 8
    color = jnp.zeros((h, w, 4)).at[:, :, 3].set(1.0).at[4, 4, 0].set(0.9)
    ip = jnp.zeros((h, w, 4))
    # originalColor.w == 0 -> no blur branch (first_filter.glsl:96-98)
    ocolor = jnp.zeros((h, w, 4))
    ids = jnp.zeros((h, w, 4))
    oid = jnp.zeros((h, w, 4))
    out_c, out_ip, out_id = first_filter(color, ip, ocolor, ids, oid)
    np.testing.assert_allclose(np.asarray(out_c[4, 4, 0]), 0.9, atol=1e-2)
    np.testing.assert_allclose(np.asarray(out_c[..., 0:3]), np.asarray(color[..., 0:3]), atol=1e-2)


def test_first_filter_blurs_uniform_region():
    h = w = 16
    rng = np.random.default_rng(0)
    noise = rng.uniform(0.2, 0.4, (h, w, 3)).astype(np.float32)
    color = jnp.concatenate([jnp.asarray(noise), jnp.ones((h, w, 1))], axis=-1)
    ip = jnp.zeros((h, w, 4))
    ocolor = jnp.zeros((h, w, 4)).at[:, :, 3].set(0.2)  # blur key on
    ids = jnp.full((h, w, 4), 0.5)
    oid = jnp.full((h, w, 4), 0.25)
    out_c, _, _ = first_filter(color, ip, ocolor, ids, oid)
    # Uniform ids -> blur averages: variance must drop
    assert np.asarray(out_c[3:-3, 3:-3, 0]).std() < noise[3:-3, 3:-3, 0].std() * 0.6


def test_second_and_final_filter_smoke():
    h = w = 12
    color = jnp.concatenate([jnp.full((h, w, 3), 0.5), jnp.ones((h, w, 1))], axis=-1)
    ip = jnp.zeros((h, w, 4))
    ocolor = jnp.concatenate([jnp.full((h, w, 3), 0.8), jnp.full((h, w, 1), 0.1)], axis=-1)
    ids = jnp.full((h, w, 4), 0.5)
    oid = jnp.zeros((h, w, 4)).at[:, :, 3].set(0.05)
    c, p, oc = second_filter(color, ip, ocolor, ids, oid)
    assert np.isfinite(np.asarray(c)).all()
    out = final_filter(c, p, oc, ids, oid, hdr=True)
    assert np.isfinite(np.asarray(out)).all()
    # Uniform input -> roughly uniform tone-mapped output, scaled by oColor
    assert 0.05 < float(out[6, 6, 0]) < 1.0


@pytest.mark.slow
def test_fxaa_flat_image_unchanged():
    # Interior only: texelFetch out of bounds returns 0 (both here and in
    # WebGL2), so border pixels see artificial contrast — reference-faithful.
    img = jnp.full((16, 16, 4), 0.5)
    out = np.asarray(fxaa(img))
    np.testing.assert_allclose(out[2:-2, 2:-2], 0.5, atol=1e-5)


@pytest.mark.slow
def test_fxaa_softens_edge():
    img = jnp.zeros((16, 16, 4)).at[:, 8:, :].set(1.0).at[:, :, 3].set(1.0)
    out = np.asarray(fxaa(img))
    assert np.isfinite(out).all()
    # Edge column should be blended (neither 0 nor 1 everywhere)
    edge = out[8, 7:9, 0]
    assert 0.0 < edge.mean() < 1.0


def test_taa_history_average():
    state = TAAState.create(8, 8)
    frame = jnp.full((8, 8, 4), 0.9)
    out, state = taa_apply(state, frame)
    # First frame: history zeros clamp to min of 3x3 = 0.9 ... min_rgb<=history
    assert np.isfinite(np.asarray(out)).all()
    for _ in range(FRAMES):
        out, state = taa_apply(state, frame)
    np.testing.assert_allclose(np.asarray(out), 0.9, atol=1e-5)


def test_zero_sum_jitter():
    vecs = gen_zero_sum_jitter()
    np.testing.assert_allclose(vecs.sum(axis=0), [0, 0], atol=1e-9)
    j = Jitter()
    dx, dy = j.next(512, 512)
    assert abs(dx) <= 0.3 / 512 + 1e-9 and abs(dy) <= 0.3 / 512 + 1e-9
