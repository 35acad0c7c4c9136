"""Pallas disc-filter kernels vs the jnp gather oracle (interpret mode).

Both paths quantize to rgba8 between passes, so agreement is exact up to
summation-order sensitivity: the HDR fract/floor split (mod(x, 1) of a
~100-magnitude accumulator, first_filter.glsl:121) amplifies 1-ulp
reduction-order differences into isolated single-step (1/255) flips.
The bound is therefore an outlier budget at exactly one quantization
step, not an atol."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flexlight_tpu.post import filter_kernel as K
from flexlight_tpu.post import filters as F


def _q(x):
    return np.round(np.clip(x, 0, 1) * 255) / 255.0


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(7)
    h, w = 40, 64
    ids = jnp.asarray(_q(rng.uniform(0, 1, (6, 4)))[rng.integers(0, 6, (h, w))],
                      jnp.float32)
    oid = jnp.asarray(_q(rng.uniform(0, 1, (4, 4)))[rng.integers(0, 4, (h, w))],
                      jnp.float32)
    color = jnp.asarray(_q(rng.uniform(0, 1, (h, w, 4))), jnp.float32)
    ip = jnp.asarray(_q(np.where(rng.uniform(size=(h, w, 4)) < 0.3,
                                 rng.uniform(0, 0.3, (h, w, 4)), 0)), jnp.float32)
    ocw = _q(np.where(rng.uniform(size=(h, w)) < 0.5,
                      rng.uniform(0, 1, (h, w)), 0))
    ocolor = jnp.asarray(
        np.concatenate([_q(rng.uniform(0, 1, (h, w, 3))), ocw[..., None]], -1),
        jnp.float32)
    return color, ip, ocolor, ids, oid


def _check(ref_outs, got_outs, budget=0.02):
    if not isinstance(ref_outs, tuple):
        ref_outs, got_outs = (ref_outs,), (got_outs,)
    for i, (a, b) in enumerate(zip(ref_outs, got_outs)):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert float(d.max()) <= 1.5 / 255.0, (i, d.max())
        # count only quantization-step flips: the final filter's output is
        # unquantized, so summation-order noise (~1e-6) may touch many
        # pixels without being a real deviation
        assert float((d > 1e-4).mean()) <= budget, (i, (d > 1e-4).mean())


def test_vote_repair_packed_matches_float(imgs):
    """vote_repair_packed (masked-int32 compares) must reproduce the
    float-path vote_repair bit-exactly on quantized inputs."""
    color, ip, ocolor, ids, oid = imgs
    ref_id, ref_ipw = F.vote_repair(color, ip, ocolor, ids, oid)
    got_id_p, got_ipw = K.vote_repair_packed(
        K.pack_rgba8(ids), K.pack_rgba8(oid), ip[..., 3])
    got_id = jnp.transpose(K._rgba_f(got_id_p), (1, 2, 0))
    np.testing.assert_array_equal(np.asarray(K.pack_rgba8(ref_id)),
                                  np.asarray(got_id_p))
    np.testing.assert_allclose(np.asarray(ref_id), np.asarray(got_id),
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(ref_ipw), np.asarray(got_ipw))


@pytest.mark.slow
def test_first_filter_kernel_matches_gather(imgs):
    color, ip, ocolor, ids, oid = imgs
    _check(F.first_filter(color, ip, ocolor, ids, oid),
           K.first_filter_tpu(color, ip, ocolor, ids, oid, interpret=True))


@pytest.mark.slow
def test_second_filter_kernel_matches_gather(imgs):
    color, ip, ocolor, ids, oid = imgs
    _check(F.second_filter(color, ip, ocolor, ids, oid),
           K.second_filter_tpu(color, ip, ocolor, ids, oid, interpret=True))


@pytest.mark.slow
def test_final_filter_kernel_matches_gather(imgs):
    color, ip, ocolor, ids, oid = imgs
    _check(F.final_filter(color, ip, ocolor, ids, oid, hdr=True),
           K.final_filter_tpu(color, ip, ocolor, ids, oid, True,
                              interpret=True))


def test_offset_table_covers_all_taps():
    """Every (tap, scale) combination must map to exactly one table offset
    whose tap list contains it — checked densely over the scale range."""
    for key, (lo, hi) in [("disc37", K.FIRST_BOUNDS),
                          ("disc36", K.SECOND_BOUNDS),
                          ("disc37", K.FINAL_BOUNDS)]:
        entries, max_r, _ = K._offset_table(key, lo, hi)
        table = {}
        for oy, ox, _, _, taps in entries:
            for sy, sx, tlo, thi in taps:
                table.setdefault((oy, ox), set()).add((sy, sx))
        from flexlight_tpu.post.filters import STENCIL3, STENCIL3_NO_CENTER

        stencil = STENCIL3 if key == "disc37" else STENCIL3_NO_CENTER
        for s in np.linspace(lo, hi, 997, dtype=np.float32):
            for sy, sx in stencil.astype(np.float32):
                o = (int(np.trunc(sy * s)), int(np.trunc(sx * s)))
                assert (int(sy), int(sx)) in table.get(o, set()), (key, s, o)


def test_banded_entries_partition_taps():
    """Band membership masks make each (pixel, tap) fire exactly once:
    every tap interval must be covered by the union of its bands."""
    bands = K._banded_entries("disc37", *K.FIRST_BOUNDS, K.FIRST_BAND_EDGES)
    per_tap = {}
    for blo, bhi, entries in bands:
        for oy, ox, _, _, taps in entries:
            for sy, sx, tlo, thi in taps:
                per_tap.setdefault((oy, ox, sy, sx), []).append((blo, bhi))
    full, _, _ = K._offset_table("disc37", *K.FIRST_BOUNDS)
    for oy, ox, _, _, taps in full:
        for sy, sx, tlo, thi in taps:
            spans = per_tap[(oy, ox, sy, sx)]
            lo = min(b[0] for b in spans)
            hi = max(b[1] for b in spans)
            assert lo <= tlo and hi >= thi, (oy, ox, sy, sx)


@pytest.fixture(scope="module")
def tiled_imgs():
    """Multi-tile image with BLOCK-structured blur keys: whole tiles sit
    at scale extremes, so the banded active-tile compaction has inactive
    (band, tile) pairs to skip — the single-tile `imgs` fixture never
    exercises the remap/zero-fill/parked-window machinery."""
    rng = np.random.default_rng(11)
    h, w = 64, 128
    ids = jnp.asarray(_q(rng.uniform(0, 1, (6, 4)))[rng.integers(0, 6, (h, w))],
                      jnp.float32)
    oid = jnp.asarray(_q(rng.uniform(0, 1, (4, 4)))[rng.integers(0, 4, (h, w))],
                      jnp.float32)
    color = jnp.asarray(_q(rng.uniform(0, 1, (h, w, 4))), jnp.float32)
    ip = jnp.asarray(_q(np.where(rng.uniform(size=(h, w, 4)) < 0.3,
                                 rng.uniform(0, 0.3, (h, w, 4)), 0)),
                     jnp.float32)
    # per-16-row bands of constant key: rows 0-15 no key (low band only),
    # 16-31 mid, 32-47 high, 48-63 no key again
    ocw = np.zeros((h, w), np.float32)
    ocw[16:32] = 0.35
    ocw[32:48] = 0.9
    ocolor = jnp.asarray(
        np.concatenate([_q(rng.uniform(0, 1, (h, w, 3))),
                        _q(ocw)[..., None]], -1), jnp.float32)
    return color, ip, ocolor, ids, oid


@pytest.mark.parametrize("which", ["second", "final"])
def test_offset_when_off_matches_on(tiled_imgs, which, monkeypatch):
    """FLEXLIGHT_FILTER_OFFSET_WHEN=0 replaces the per-offset pl.when
    skip with unconditional masked updates — results must be BIT-exact
    (the tap masks are exact; the when is a pure skip optimization)."""
    color, ip, ocolor, ids, oid = tiled_imgs

    def run():
        if which == "second":
            return K.second_filter_tpu(color, ip, ocolor, ids, oid,
                                       interpret=True, ty=16)
        return (K.final_filter_tpu(color, ip, ocolor, ids, oid, True,
                                   interpret=True, ty=16),)

    monkeypatch.setattr(K, "_OFFSET_WHEN", True)
    on = run()
    monkeypatch.setattr(K, "_OFFSET_WHEN", False)
    off = run()
    for a, b in zip(on, off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
@pytest.mark.parametrize("which", ["first", "second", "final"])
def test_compact_matches_uncompacted_tiles(tiled_imgs, which, monkeypatch):
    """Active-tile compaction is pure dispatch: per-band partials are
    identical arrays summed in the same order, so compact on/off must be
    BIT-exact — checked on a 4-tile-row image (ty=16) whose tiles are
    inactive in different bands. Also cross-checked vs the gather oracle."""
    color, ip, ocolor, ids, oid = tiled_imgs

    def run(compact):
        monkeypatch.setenv("FLEXLIGHT_FILTER_COMPACT", compact)
        if which == "first":
            return K.first_filter_tpu(color, ip, ocolor, ids, oid,
                                      interpret=True, ty=16)
        if which == "second":
            return K.second_filter_tpu(color, ip, ocolor, ids, oid,
                                       interpret=True, ty=16)
        return (K.final_filter_tpu(color, ip, ocolor, ids, oid, True,
                                   interpret=True, ty=16),)

    on = run("1")
    off = run("0")
    for a, b in zip(on, off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    oracle = {"first": lambda: F.first_filter(color, ip, ocolor, ids, oid),
              "second": lambda: F.second_filter(color, ip, ocolor, ids, oid),
              "final": lambda: (F.final_filter(color, ip, ocolor, ids, oid,
                                               hdr=True),)}[which]()
    if which == "second":
        # The banded accumulator reorders summation by scale band; the
        # fract/floor HDR split (mod of a ~100-magnitude sum) amplifies
        # 1-ulp reorder noise into full-scale flips on the SPLIT color/ip
        # channels that cancel in the recombined HDR value — so compare
        # color + ip*256 (what the next pass consumes), one ip
        # quantization step (256/255) of slack, plus ocolor directly.
        o_c, o_i, o_o = oracle
        k_c, k_i, k_o = on
        o_hdr = np.asarray(o_c)[..., :3] + np.asarray(o_i)[..., :3] * 256.0
        k_hdr = np.asarray(k_c)[..., :3] + np.asarray(k_i)[..., :3] * 256.0
        d = np.abs(o_hdr - k_hdr)
        assert float(d.max()) <= 1.5 * 256.0 / 255.0, d.max()
        assert float((d > 1e-3).mean()) <= 0.02, (d > 1e-3).mean()
        _check((o_c[..., 3:], o_o), (k_c[..., 3:], k_o))
    else:
        _check(tuple(oracle), tuple(on))
