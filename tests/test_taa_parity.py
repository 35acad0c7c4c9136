"""TAA parity: post/taa.py vs a scalar transcription of the TAA shader
(modules/taa.js:19-48): 3x3 min/max clip-clamp of the newest frame
(minRGB seeded at 1.0, maxRGB at 0.0; the corner-skip `length > 2.0`
condition never fires for a 3x3 window), 9-frame clamped average,
out-of-frame texelFetch = zeros."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402

from flexlight_tpu.post.taa import TAAState, taa_apply  # noqa: E402


def taa_pixel(history, x, y):
    """history: [9, H, W, 4] with newest at 0."""
    h, w = history.shape[1:3]
    min_rgb = np.ones(4, np.float32)
    max_rgb = np.zeros(4, np.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy, xx = y + dy, x + dx
            p = (history[0, yy, xx] if 0 <= yy < h and 0 <= xx < w
                 else np.zeros(4, np.float32))
            min_rgb = np.minimum(min_rgb, p)
            max_rgb = np.maximum(max_rgb, p)
    out = history[0, y, x].astype(np.float32)
    for i in range(1, 9):
        out = out + np.minimum(np.maximum(history[i, y, x], min_rgb), max_rgb)
    return out / np.float32(9.0)


def test_taa_matches_oracle():
    rng = np.random.default_rng(41)
    h, w = 12, 16
    frames = np.round(rng.uniform(0, 1, (9, h, w, 4)) * 255) / 255.0
    frames = frames.astype(np.float32)

    state = TAAState(history=jnp.asarray(frames[1:9]).reshape(8, h, w, 4))
    # state.history must be [9,...]: create then fill
    state = TAAState.create(h, w)
    for i in range(8, 0, -1):            # oldest first
        _, state = taa_apply(state, jnp.asarray(frames[i]))
    got, state = taa_apply(state, jnp.asarray(frames[0]))
    got = np.asarray(got)
    np.testing.assert_array_equal(np.asarray(state.history), frames)

    for y in range(h):
        for x in range(w):
            want = taa_pixel(frames, x, y)
            assert np.allclose(got[y, x], want, atol=2e-6), (y, x)
