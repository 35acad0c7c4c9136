"""Scan-path reservoir NEE (many lights) vs the unrolled path.

Above SCAN_LIGHTS_MIN lights, reservoir_sample runs as a lax.scan over
the light axis (bounded compile time for example2.js's 64-light stress
scene) with arithmetic identical per step. The outputs are NOT bit-equal:
the hash RNG (glsl noise(), fract(sin(x) * 43758.5453)) amplifies the
~1-ulp sin codegen difference between loop contexts by ~4.4e4, and the
light-selection RNG chain applies noise4 once per light — so per-pixel
selections flip on a visible minority of pixels while the estimator's
aggregate radiance is unchanged (the same instability the reference has
across GPU sin implementations). The pins are therefore (a) aggregate
radiance equality, (b) pointwise equality on the large majority, and
(c) a structural guarantee that scenes below the gate trace exactly as
before (bit-stability of all existing scenes/goldens).
"""

import numpy as np
import pytest

import flexlight_tpu.ops.pathtrace as pt
from flexlight_tpu.ops.buffers import build_scene_buffers
from tests.scenes import cornell_config, cornell_scene


def _many_light_scene(n=20):
    scene, camera = cornell_scene()
    scene.primaryLightSources = [
        [i % 5 - 2.0, 4, (i // 5) - 2.0] for i in range(n)]
    for i, light in enumerate(scene.primary_light_sources):
        light.intensity = 20 + i
        light.variation = 0.1
    return scene, camera


@pytest.mark.slow
def test_scan_reservoir_statistically_matches_unroll():
    import jax.numpy as jnp

    scene, camera = _many_light_scene()
    buffers = build_scene_buffers(scene)
    config = cornell_config(max_reflections=2)
    size = 48
    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)

    assert 20 >= pt.SCAN_LIGHTS_MIN  # scene takes the scan path
    scan = pt.render_mrt(buffers, size, size, pos, view, config, 0.0)
    old = pt.SCAN_LIGHTS_MIN
    try:
        pt.SCAN_LIGHTS_MIN = 10_000
        unroll = pt.render_mrt(buffers, size, size, pos, view, config, 0.0)
    finally:
        pt.SCAN_LIGHTS_MIN = old

    a = np.asarray(scan.color)
    b = np.asarray(unroll.color)
    # aggregate radiance matches tightly (unbiased estimator both ways)
    assert abs(a.mean() - b.mean()) <= 5e-3 * max(b.mean(), 1e-6)
    assert abs(a.std() - b.std()) <= 2e-2 * max(b.std(), 1e-6)
    # pointwise: the large majority of pixels identical to fp tolerance
    # (color sums ALL lights; selection flips only move the shadow gate,
    # measured ~8% of pixels at 20 lights x 2 bounces)
    close = np.isclose(a, b, atol=1e-3).all(axis=-1)
    assert close.mean() >= 0.85, close.mean()
    # per-pixel light SELECTIONS decorrelate (each light step's compare
    # sits on a diverged hash value), but the reservoir's selection
    # FREQUENCIES — the weights that make the estimator unbiased — must
    # match: compare the two index histograms by total-variation distance.
    ids_a = np.asarray(scan.render_id)[:, 3]
    ids_b = np.asarray(unroll.render_id)[:, 3]
    va, ca = np.unique(ids_a, return_counts=True)
    vb, cb = np.unique(ids_b, return_counts=True)
    hist_a = dict(zip(va.tolist(), ca / ids_a.size))
    hist_b = dict(zip(vb.tolist(), cb / ids_b.size))
    tv = 0.5 * sum(abs(hist_a.get(k, 0.0) - hist_b.get(k, 0.0))
                   for k in set(hist_a) | set(hist_b))
    # sampling noise alone gives TV ~= 0.05 at 48^2 pixels x ~20
    # categories (measured 0.067); a broken reservoir (collapsed or
    # shifted selection) gives TV > 0.3
    assert tv <= 0.15, tv


def _count_scans(buffers, camera, size=8):
    import jax
    import jax.numpy as jnp

    view = jnp.asarray(camera.view_matrix(size, size))
    pos = jnp.asarray(camera.position)
    config = cornell_config(max_reflections=2)
    jaxpr = jax.make_jaxpr(
        lambda s: pt.render_mrt(buffers, size, size, pos, view, config, s)
    )(jnp.float32(0.0))
    return sum(1 for eqn in jaxpr.jaxpr.eqns if eqn.primitive.name == "scan")


def test_gate_only_changes_many_light_traces():
    """Below SCAN_LIGHTS_MIN the trace is unchanged by the gate (the
    traversal scheme contributes its own scans; the reservoir must add
    none), so every existing scene/golden stays bit-stable."""
    few_scene, camera = cornell_scene()  # 1 light
    few = build_scene_buffers(few_scene)
    many_scene, mcamera = _many_light_scene()
    many = build_scene_buffers(many_scene)

    old = pt.SCAN_LIGHTS_MIN
    try:
        pt.SCAN_LIGHTS_MIN = 16
        few_gated = _count_scans(few, camera)
        many_gated = _count_scans(many, mcamera)
        pt.SCAN_LIGHTS_MIN = 10_000
        few_unrolled = _count_scans(few, camera)
        many_unrolled = _count_scans(many, mcamera)
    finally:
        pt.SCAN_LIGHTS_MIN = old

    assert few_gated == few_unrolled          # small scenes: no new scans
    assert many_gated > many_unrolled          # gate really engages
