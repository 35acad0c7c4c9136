"""Config persistence (loader.js localStorage analogue) + NaN guards."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flexlight_tpu import Config
from flexlight_tpu.utils.debug import assert_finite, nan_guard, set_debug
from flexlight_tpu.utils.settings import (apply_settings, load_settings,
                                          save_settings)


def test_settings_roundtrip(tmp_path):
    path = str(tmp_path / "settings.json")
    cfg = Config(samples_per_ray=2, filter=True, antialiasing="taa",
                 render_quality=0.5)
    save_settings(cfg, renderer="pathtracer", api="webgl2", path=path)
    loaded, renderer, api = load_settings(path)
    assert loaded == cfg
    assert renderer == "pathtracer" and api == "webgl2"


def test_settings_missing_file_defaults(tmp_path):
    loaded, renderer, api = load_settings(str(tmp_path / "nope.json"))
    assert loaded == Config()
    assert renderer is None and api is None


def test_settings_unknown_fields_ignored(tmp_path):
    path = str(tmp_path / "settings.json")
    path_obj = tmp_path / "settings.json"
    path_obj.write_text(
        '{"config": {"filter": true, "bogus_knob": 9}, "renderer": "rasterizer"}')
    loaded, renderer, _ = load_settings(path)
    assert loaded.filter is True
    assert renderer == "rasterizer"


def test_apply_settings_on_engine(tmp_path):
    from flexlight_tpu import FlexLight

    path = str(tmp_path / "settings.json")
    save_settings(Config(filter=True, temporal=False), renderer="rasterizer",
                  path=path)
    engine = FlexLight((8, 8))
    apply_settings(engine, path)
    assert engine.config.filter is True and engine.config.temporal is False
    assert engine.renderer.type == "rasterizer"


def test_nan_guard_raises():
    with nan_guard():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()
    # outside the guard: silent NaN as usual
    assert np.isnan(float(jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0))))


def test_assert_finite_debug_mode():
    set_debug(True)
    try:
        assert_finite(jnp.ones((4,)), "ok")  # no raise
        with pytest.raises(FloatingPointError):
            assert_finite(jnp.array([1.0, np.inf]), "bad")
        # traced context: callback fires when the jitted fn runs
        def f(x):
            assert_finite(x, "traced")
            return x * 2

        with pytest.raises(Exception):
            jax.jit(f)(jnp.array([np.nan])).block_until_ready()
    finally:
        set_debug(False)
    # debug off: no-op even on NaN
    assert_finite(jnp.array([np.nan]), "ignored")
