import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flexlight_tpu.ops import buffers as bufmod
from flexlight_tpu.ops.geometry import world_geometry
from flexlight_tpu.ops.intersect import BIAS, POW32, moeller_trumbore, ray_cuboid
from flexlight_tpu.ops.traverse import shadow_coherent, shadow_scan, traverse_coherent, traverse_scan
from tests.scenes import cornell_scene


def brute_force_reference(geometry, origin, direction):
    """Python closest-hit over triangle rows: the independent oracle."""
    n = origin.shape[0]
    best_s = np.full(n, POW32, dtype=np.float64)
    best_tri = np.full(n, -1, dtype=np.int64)
    best_uv = np.zeros((n, 2))
    geometry = np.asarray(geometry)
    kinds = geometry[:, 10]
    end = np.argmax(kinds == 0.0) if (kinds == 0.0).any() else len(kinds)
    for idx, row in enumerate(geometry[:end]):
        if row[10] != 2.0:
            continue
        v0, v1, v2 = row[0:3], row[3:6], row[6:9]
        e1, e2 = v1 - v0, v2 - v0
        for r in range(n):
            d = direction[r]
            pvec = np.cross(d, e2)
            det = np.dot(e1, pvec)
            if abs(det) < BIAS:
                continue
            inv = 1.0 / det
            tvec = origin[r] - v0
            u = np.dot(tvec, pvec) * inv
            if u < BIAS or u > 1.0:
                continue
            qvec = np.cross(tvec, e1)
            v = np.dot(d, qvec) * inv
            if v < BIAS or u + v > 1.0:
                continue
            s = np.dot(e2, qvec) * inv
            if s > best_s[r] or s <= BIAS:
                continue
            best_s[r] = s
            best_tri[r] = idx
            best_uv[r] = [u, v]
    return best_s, best_tri, best_uv


def _random_rays(rng, n, spread=1.0):
    origin = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    return origin, direction


def _cornell_geometry():
    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    return np.asarray(world_geometry(buffers)), camera


def test_moeller_trumbore_basic():
    v0 = jnp.array([0.0, 0.0, 5.0])
    v1 = jnp.array([2.0, 0.0, 5.0])
    v2 = jnp.array([0.0, 2.0, 5.0])
    suv = moeller_trumbore(v0, v1, v2, jnp.array([0.5, 0.5, 0.0]),
                           jnp.array([0.0, 0.0, 1.0]), POW32)
    assert abs(float(suv[0]) - 5.0) < 1e-5
    assert abs(float(suv[1]) - 0.25) < 1e-5
    assert abs(float(suv[2]) - 0.25) < 1e-5
    miss = moeller_trumbore(v0, v1, v2, jnp.array([5.0, 5.0, 0.0]),
                            jnp.array([0.0, 0.0, 1.0]), POW32)
    assert float(miss[0]) == 0.0


def test_ray_cuboid():
    hit = ray_cuboid(POW32, jnp.array([0.0, 0.0, -5.0]),
                     1.0 / jnp.array([1e-9, 1e-9, 1.0]),
                     jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]))
    assert bool(hit)
    miss = ray_cuboid(POW32, jnp.array([5.0, 0.0, -5.0]),
                      1.0 / jnp.array([1e-9, 1e-9, 1.0]),
                      jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]))
    assert not bool(miss)


@pytest.mark.parametrize("scheme", ["scan", "packet"])
def test_traversal_matches_bruteforce_cornell(scheme):
    geometry, camera = _cornell_geometry()
    rng = np.random.default_rng(3)
    n = 64
    origin = np.tile(camera.position, (n, 1)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction[:, 2] = np.abs(direction[:, 2]) + 0.2  # look into the box
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)

    ref_s, ref_tri, ref_uv = brute_force_reference(geometry, origin.astype(np.float64),
                                                   direction.astype(np.float64))
    g = jnp.asarray(geometry)
    if scheme == "scan":
        hit = traverse_scan(g, jnp.asarray(origin), jnp.asarray(direction))
    else:
        hit = traverse_coherent(g, jnp.asarray(origin), jnp.asarray(direction), tile=16)
    got_tri = np.asarray(hit.triangle)
    got_s = np.asarray(hit.suv[:, 0])
    # All rays starting inside the closed box must hit something
    assert (ref_tri != -1).all()
    np.testing.assert_array_equal(got_tri, ref_tri)
    np.testing.assert_allclose(got_s, ref_s, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("scheme", ["scan", "packet"])
def test_shadow_matches_expectation(scheme):
    geometry, camera = _cornell_geometry()
    g = jnp.asarray(geometry)
    # Point 1: high in the box, clear path. Point 2: below cube 0
    # (x in [-3,-1.5], y in [-5,-2], z in [-1,1]) -> occluded upward.
    origin = jnp.array([[-4.0, 4.0, 0.0], [-2.25, -4.8, 0.0]], dtype=jnp.float32)
    light = jnp.array([0.0, 4.0, 0.0], dtype=jnp.float32)
    d = light - origin
    max_len = jnp.linalg.norm(d, axis=-1)
    unit = d / max_len[:, None]
    if scheme == "scan":
        shadowed = shadow_scan(g, origin, unit, max_len)
    else:
        shadowed = shadow_coherent(g, origin, unit, max_len, tile=2)
    # First point: unobstructed. Second point: inside/behind cube 0 -> shadowed.
    assert not bool(shadowed[0])
    assert bool(shadowed[1])


def test_world_geometry_transforms_triangles():
    from flexlight_tpu import Scene, Transform, Triangle
    from flexlight_tpu.scene.transform import global_registry

    scene = Scene()
    t = Triangle([1, 0, 0], [2, 0, 0], [1, 1, 0])
    tr = Transform()
    tr.rotate_axis([0, 1, 0], np.pi)  # 180 deg about y
    tr.move(0, 0, 5)
    t.transform = tr
    scene.queue.push([t])
    buffers = bufmod.build_scene_buffers(scene)
    wg = np.asarray(world_geometry(buffers))
    # Triangle slot is index 2 (root node, inner node, tri)
    v0 = wg[2, 0:3]
    np.testing.assert_allclose(v0, [-1, 0, 5], atol=1e-5)


@pytest.mark.parametrize("sort_rays", [False, True])
def test_sparse_traversal_matches_scan_cornell(sort_rays):
    """Worklist kernel (interpret) vs the scan oracle on incoherent rays:
    exercises entry-distance worklist ordering, the early-exit loop and
    the lowest-drawable tie-break (ops/intersect_sparse.py)."""
    from flexlight_tpu.ops.intersect_sparse import (build_w4_tiled,
                                                    traverse_sparse)
    from flexlight_tpu.ops.traverse import traverse_scan
    from tests.scenes import cornell_scene

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    w4t, amin, amax, w4f = build_w4_tiled(geometry, buffers.id_buffer,
                                          x6=False)

    rng = np.random.default_rng(11)
    n = 2048
    origin = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)

    ref = traverse_scan(jnp.asarray(geometry), jnp.asarray(origin),
                        jnp.asarray(direction))
    got = traverse_sparse(w4t, w4f, amin, amax, jnp.asarray(origin),
                          jnp.asarray(direction), interpret=True,
                          sort_rays=sort_rays)
    # sparse returns drawable indices; map to geometry slots
    got_tri = np.asarray(buffers.id_buffer)[np.asarray(got.triangle)]
    got_tri = np.where(np.asarray(got.triangle) < 0, -1, got_tri)
    ref_tri = np.asarray(ref.triangle)
    got_s = np.asarray(got.suv)[:, 0]
    ref_s = np.asarray(ref.suv)[:, 0]
    # rays through shared edges tie in s; which triangle wins then depends
    # on sub-ulp differences between the matmul and elementwise MT
    # formulations — accept a different triangle at the same distance
    agree = got_tri == ref_tri
    tied = ((got_tri >= 0) & (ref_tri >= 0)
            & (np.abs(got_s - ref_s) <= 1e-3 + 1e-3 * np.abs(ref_s)))
    assert np.all(agree | tied), np.flatnonzero(~(agree | tied))[:10]
    assert (~agree).mean() <= 0.005
    hit = agree & (ref_tri >= 0)
    np.testing.assert_allclose(got_s[hit], ref_s[hit], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("sort_rays", [False, True])
def test_sparse_shadow_matches_scan_cornell(sort_rays):
    from flexlight_tpu.ops.intersect_sparse import (build_w4_tiled,
                                                    shadow_sparse)
    from flexlight_tpu.ops.traverse import shadow_scan
    from tests.scenes import cornell_scene

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    w4t, amin, amax, _ = build_w4_tiled(geometry, buffers.id_buffer,
                                        x6=False)

    rng = np.random.default_rng(12)
    n = 2048
    origin = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    target = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = target - origin
    max_len = np.linalg.norm(d, axis=-1)
    unit = (d / max_len[:, None]).astype(np.float32)

    ref = shadow_scan(jnp.asarray(geometry), jnp.asarray(origin),
                      jnp.asarray(unit), jnp.asarray(max_len))
    got = shadow_sparse(w4t, amin, amax, jnp.asarray(origin),
                        jnp.asarray(unit), jnp.asarray(max_len),
                        interpret=True, sort_rays=sort_rays)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
def test_sparse_sort_hint_matches_unhinted():
    """The prev-tile locality sort (sort_spatial prev_tri path) is a pure
    permutation: hinted and unhinted traversals must return identical
    hits for every ray."""
    from flexlight_tpu.ops.intersect_sparse import (build_w4_tiled,
                                                    shadow_sparse,
                                                    traverse_sparse)
    from tests.scenes import cornell_scene

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    w4t, amin, amax, w4f = build_w4_tiled(geometry, buffers.id_buffer,
                                          x6=False)

    rng = np.random.default_rng(13)
    n = 2048
    origin = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    hint = jnp.asarray(rng.integers(0, buffers.id_buffer.shape[0], n),
                       dtype=jnp.int32)
    alive = jnp.asarray(rng.uniform(size=n) < 0.7)

    base = traverse_sparse(w4t, w4f, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), interpret=True,
                           sort_rays=True, alive=alive)
    hinted = traverse_sparse(w4t, w4f, amin, amax, jnp.asarray(origin),
                             jnp.asarray(direction), interpret=True,
                             sort_rays=True, alive=alive, sort_hint=hint)
    np.testing.assert_array_equal(np.asarray(hinted.triangle),
                                  np.asarray(base.triangle))
    np.testing.assert_array_equal(np.asarray(hinted.suv),
                                  np.asarray(base.suv))

    max_len = jnp.asarray(rng.uniform(0.5, 8.0, n).astype(np.float32))
    s_base = shadow_sparse(w4t, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), max_len, interpret=True,
                           sort_rays=True, alive=alive)
    s_hint = shadow_sparse(w4t, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), max_len, interpret=True,
                           sort_rays=True, alive=alive, sort_hint=hint)
    np.testing.assert_array_equal(np.asarray(s_hint), np.asarray(s_base))


def test_nearest2_key_kernel_matches_xla():
    """The Pallas nearest2 sort-key kernel (interpret mode) must agree
    bit-exactly with the jnp formulation callers use on CPU — including
    dead rays, no-candidate rays, and padded supertile boxes."""
    from flexlight_tpu.ops.intersect_sparse import (_nearest2_key_xla,
                                                    nearest2_key)

    rng = np.random.default_rng(21)
    k = 41                                    # pads to 48 clusters, 6 boxes
    centers = rng.uniform(-10, 10, (k, 3)).astype(np.float32)
    half = rng.uniform(0.2, 3.0, (k, 3)).astype(np.float32)
    amin = jnp.asarray(centers - half)
    amax = jnp.asarray(centers + half)

    n = 3000                                  # pads to 3 ray tiles of 1024
    origin = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    direction[::17] = np.array([0.0, 1.0, 0.0])     # axis-aligned zeros
    max_len = np.full(n, POW32, dtype=np.float32)
    max_len[rng.uniform(size=n) < 0.3] = 0.0        # dead rays
    max_len[2048:] = 0.0    # a FULLY dead ray tile (all-dead fast path)

    ref = _nearest2_key_xla(amin, amax, jnp.asarray(origin),
                            jnp.asarray(direction), jnp.asarray(max_len))
    got = nearest2_key(amin, amax, jnp.asarray(origin),
                       jnp.asarray(direction), jnp.asarray(max_len),
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_flags_sparse_dead_tile_matches_oracle():
    """The flags kernel's all-dead-tile fast path (round 5) must be
    value-exact vs the jnp oracle: POW32 everywhere for the dead tile,
    untouched elsewhere."""
    from flexlight_tpu.ops.geometry import world_geometry
    from flexlight_tpu.ops.intersect_sparse import (_tmins_xla,
                                                    build_w4_tiled,
                                                    flags_sparse)
    from flexlight_tpu.ops.buffers import build_scene_buffers
    from tests.scenes import cornell_scene

    scene, camera = cornell_scene()
    buffers = build_scene_buffers(scene)
    wg = world_geometry(buffers)
    _, amin, amax, _ = build_w4_tiled(wg, buffers.id_buffer, tri_tile=8)
    rng = np.random.default_rng(3)
    n = 512                                    # 4 ray tiles of 128
    origin = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    max_len = np.full(n, POW32, dtype=np.float32)
    max_len[128:256] = 0.0                     # tile 1 fully dead
    got = flags_sparse(amin, amax, jnp.asarray(origin),
                       jnp.asarray(direction), jnp.asarray(max_len),
                       tri_tile=8, ray_tile=128, interpret=True)
    wt = got.shape[1]
    ref = _tmins_xla(amin, amax, jnp.asarray(origin),
                     jnp.asarray(direction), jnp.asarray(max_len),
                     4, wt, 128)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("ray_tile", [1024, 256])
def test_sparse_nearest2_sort_matches_prevtile(ray_tile):
    """sort_mode='nearest2' is a pure reordering: traversal and shadow
    results must be identical to the prevtile sort for every ray —
    also at the smaller bounce ray tile (BOUNCE_RT sweep values)."""
    from flexlight_tpu.ops.intersect_sparse import (build_w4_tiled,
                                                    shadow_sparse,
                                                    traverse_sparse)

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    w4t, amin, amax, w4f = build_w4_tiled(geometry, buffers.id_buffer,
                                          x6=False)

    rng = np.random.default_rng(22)
    n = 2048
    origin = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    hint = jnp.asarray(rng.integers(0, buffers.id_buffer.shape[0], n),
                       dtype=jnp.int32)
    alive = jnp.asarray(rng.uniform(size=n) < 0.7)

    base = traverse_sparse(w4t, w4f, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), interpret=True,
                           sort_rays=True, alive=alive, sort_hint=hint,
                           ray_tile=ray_tile)
    near = traverse_sparse(w4t, w4f, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), interpret=True,
                           sort_rays=True, alive=alive, sort_hint=hint,
                           sort_mode="nearest2", ray_tile=ray_tile)
    np.testing.assert_array_equal(np.asarray(near.triangle),
                                  np.asarray(base.triangle))
    np.testing.assert_array_equal(np.asarray(near.suv),
                                  np.asarray(base.suv))

    max_len = jnp.asarray(rng.uniform(0.5, 8.0, n).astype(np.float32))
    s_base = shadow_sparse(w4t, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), max_len, interpret=True,
                           sort_rays=True, alive=alive, sort_hint=hint,
                           ray_tile=ray_tile)
    s_near = shadow_sparse(w4t, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), max_len, interpret=True,
                           sort_rays=True, alive=alive, sort_hint=hint,
                           sort_mode="nearest2", ray_tile=ray_tile)
    np.testing.assert_array_equal(np.asarray(s_near), np.asarray(s_base))


def test_sparse_history_sort_matches_prevtile():
    """sort_mode='history' (frame-coherent hint with -1 = unknown) is a
    pure reordering too: identical results to prevtile, including rays
    whose prediction is unknown (-1) or stale (random hints here)."""
    from flexlight_tpu.ops.intersect_sparse import (build_w4_tiled,
                                                    traverse_sparse)

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    w4t, amin, amax, w4f = build_w4_tiled(geometry, buffers.id_buffer,
                                          x6=False)

    rng = np.random.default_rng(37)
    n = 2048
    origin = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    # history predictions: -1 (unknown) for a third of rays, random
    # (stale) triangles otherwise — keys must never change results
    hint = rng.integers(-1, buffers.id_buffer.shape[0], n).astype(np.int32)
    alive = jnp.asarray(rng.uniform(size=n) < 0.7)

    base = traverse_sparse(w4t, w4f, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), interpret=True,
                           sort_rays=True, alive=alive,
                           sort_hint=jnp.maximum(jnp.asarray(hint), 0))
    hist = traverse_sparse(w4t, w4f, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), interpret=True,
                           sort_rays=True, alive=alive,
                           sort_hint=jnp.asarray(hint),
                           sort_mode="history")
    np.testing.assert_array_equal(np.asarray(hist.triangle),
                                  np.asarray(base.triangle))
    np.testing.assert_array_equal(np.asarray(hist.suv),
                                  np.asarray(base.suv))


@pytest.mark.parametrize("sort_mode", ["prevtile", "nearest2"])
def test_pair_sparse_matches_separate_casts(sort_mode):
    """The merged shadow+bounce cast (pair_sparse — one shared wavefront
    permutation) must be bit-identical to separate shadow_sparse +
    traverse_sparse casts: sort keys only group work."""
    from flexlight_tpu.ops.intersect_sparse import (build_w4_tiled,
                                                    pair_sparse,
                                                    shadow_sparse,
                                                    traverse_sparse)

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    w4t, amin, amax, w4f = build_w4_tiled(geometry, buffers.id_buffer,
                                          x6=False)

    rng = np.random.default_rng(31)
    n = 2048
    so = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    bo = (so + rng.normal(scale=1e-3, size=(n, 3))).astype(np.float32)
    sd = rng.normal(size=(n, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=-1, keepdims=True)
    bd = rng.normal(size=(n, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    sml = jnp.asarray(rng.uniform(0.5, 8.0, n).astype(np.float32))
    hint = jnp.asarray(rng.integers(0, buffers.id_buffer.shape[0], n),
                       dtype=jnp.int32)
    alive = jnp.asarray(rng.uniform(size=n) < 0.7)
    so, sd, bo, bd = map(jnp.asarray, (so, sd, bo, bd))

    ref_shadow = shadow_sparse(w4t, amin, amax, so, sd, sml,
                               interpret=True, sort_rays=True, alive=alive,
                               sort_hint=hint, sort_mode=sort_mode)
    ref_hit = traverse_sparse(w4t, w4f, amin, amax, bo, bd, interpret=True,
                              sort_rays=True, alive=alive, sort_hint=hint,
                              sort_mode=sort_mode)
    got_hit, got_shadow = pair_sparse(
        w4t, w4f, amin, amax, so, sd, sml, bo, bd, interpret=True,
        sort_rays=True, shadow_alive=alive, bounce_alive=alive,
        sort_hint=hint, sort_mode=sort_mode)
    np.testing.assert_array_equal(np.asarray(got_shadow),
                                  np.asarray(ref_shadow))
    np.testing.assert_array_equal(np.asarray(got_hit.triangle),
                                  np.asarray(ref_hit.triangle))
    np.testing.assert_array_equal(np.asarray(got_hit.suv),
                                  np.asarray(ref_hit.suv))


def test_nearest2_key_lowers_for_tpu():
    """Cross-platform export runs the nearest2 key kernel through the
    full Pallas->Mosaic lowering on a CPU host (no chip needed)."""
    from jax import export

    from flexlight_tpu.ops.intersect_sparse import nearest2_key

    rng = np.random.default_rng(23)
    k = 96
    centers = rng.uniform(-10, 10, (k, 3)).astype(np.float32)
    half = rng.uniform(0.2, 3.0, (k, 3)).astype(np.float32)

    def f(amin, amax, o, d, ml):
        return nearest2_key(amin, amax, o, d, ml)

    n = 2048
    exp = export.export(jax.jit(f), platforms=["tpu"])(
        jnp.asarray(centers - half), jnp.asarray(centers + half),
        jnp.zeros((n, 3), jnp.float32), jnp.ones((n, 3), jnp.float32),
        jnp.full((n,), POW32, jnp.float32))
    assert len(exp.mlir_module_serialized) > 0


@pytest.mark.slow
def test_sparse_sort_env_knob_render(monkeypatch):
    """FLEXLIGHT_SPARSE_SORT=nearest2 routes through render_mrt's sparse
    scheme unchanged (bit-exact vs the default sort)."""
    from flexlight_tpu import Config
    import flexlight_tpu.ops.pathtrace as pt

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    config = Config(samples_per_ray=1, max_reflections=2, temporal=False,
                    filter=False, antialiasing=None)
    view = jnp.asarray(camera.view_matrix(16, 16))
    pos = jnp.asarray(camera.position)

    base = pt.render_mrt(buffers, 16, 16, pos, view, config,
                         jnp.float32(0.0), scheme="sparse")
    monkeypatch.setenv("FLEXLIGHT_SPARSE_SORT", "nearest2")
    got = pt.render_mrt(buffers, 16, 16, pos, view, config,
                        jnp.float32(0.0), scheme="sparse")
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    monkeypatch.setenv("FLEXLIGHT_SPARSE_SUBTILE", "4")
    got2 = pt.render_mrt(buffers, 16, 16, pos, view, config,
                         jnp.float32(0.0), scheme="sparse")
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(got2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("subtile,ray_tile", [
    (4, 256),
    # one representative in the fast tier; the rest re-prove the same
    # scheduling-only equivalence at other shapes
    pytest.param(2, 256, marks=pytest.mark.slow),
    pytest.param(8, 128, marks=pytest.mark.slow),
    pytest.param(16, 128, marks=pytest.mark.slow),
])
def test_sparse_subtile_matches_single(subtile, ray_tile):
    """Subtiling (several ray tiles per Mosaic program) is a pure
    scheduling change: results must be bit-identical to subtile=1 at the
    same ray_tile, for closest-hit and any-hit, including padding tails
    (n not a multiple of ray_tile*subtile)."""
    from flexlight_tpu.ops.intersect_sparse import (build_w4_tiled,
                                                    shadow_sparse,
                                                    traverse_sparse)

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    w4t, amin, amax, w4f = build_w4_tiled(geometry, buffers.id_buffer,
                                          x6=False)

    rng = np.random.default_rng(31)
    n = 2048 + 300                         # forces a ragged padding tail
    origin = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    hint = jnp.asarray(rng.integers(0, buffers.id_buffer.shape[0], n),
                       dtype=jnp.int32)
    alive = jnp.asarray(rng.uniform(size=n) < 0.7)

    base = traverse_sparse(w4t, w4f, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), interpret=True,
                           sort_rays=True, alive=alive, sort_hint=hint,
                           ray_tile=ray_tile)
    got = traverse_sparse(w4t, w4f, amin, amax, jnp.asarray(origin),
                          jnp.asarray(direction), interpret=True,
                          sort_rays=True, alive=alive, sort_hint=hint,
                          ray_tile=ray_tile, subtile=subtile)
    np.testing.assert_array_equal(np.asarray(got.triangle),
                                  np.asarray(base.triangle))
    np.testing.assert_array_equal(np.asarray(got.suv),
                                  np.asarray(base.suv))

    max_len = jnp.asarray(rng.uniform(0.5, 8.0, n).astype(np.float32))
    s_base = shadow_sparse(w4t, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), max_len, interpret=True,
                           sort_rays=True, alive=alive, sort_hint=hint,
                           ray_tile=ray_tile)
    s_got = shadow_sparse(w4t, amin, amax, jnp.asarray(origin),
                          jnp.asarray(direction), max_len, interpret=True,
                          sort_rays=True, alive=alive, sort_hint=hint,
                          ray_tile=ray_tile, subtile=subtile)
    np.testing.assert_array_equal(np.asarray(s_got), np.asarray(s_base))


def test_sparse_subtile_lowers_for_tpu():
    """Subtiled closest-hit + any-hit kernels lower through Mosaic."""
    from jax import export

    from flexlight_tpu.ops.intersect_sparse import (build_w4_tiled,
                                                    shadow_sparse,
                                                    traverse_sparse)

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    w4t, amin, amax, w4f = build_w4_tiled(geometry, buffers.id_buffer)

    n = 4096

    def f(o, d, ml):
        hit = traverse_sparse(w4t, w4f, amin, amax, o, d, sort_rays=True,
                              sort_hint=jnp.zeros(n, jnp.int32),
                              ray_tile=256, subtile=4)
        sh = shadow_sparse(w4t, amin, amax, o, d, ml, sort_rays=True,
                           sort_hint=jnp.zeros(n, jnp.int32),
                           ray_tile=256, subtile=4)
        return hit.suv, hit.triangle, sh

    exp = export.export(jax.jit(f), platforms=["tpu"])(
        jnp.zeros((n, 3), jnp.float32), jnp.ones((n, 3), jnp.float32),
        jnp.full((n,), 8.0, jnp.float32))
    assert len(exp.mlir_module_serialized) > 0


def test_nearest2_key_multichunk_merge():
    """Force a small k_chunk so the cross-chunk two-min merge runs (the
    path production only hits above 512 supertiles) and compare against
    the single-chunk kernel result. Box entries are randomized so ties
    are absent and the merge order is fully determined."""
    from flexlight_tpu.ops.intersect_sparse import nearest2_key

    rng = np.random.default_rng(33)
    k = 255                                # 32 supertiles of 8 clusters
    centers = rng.uniform(-10, 10, (k, 3)).astype(np.float32)
    half = rng.uniform(0.2, 2.0, (k, 3)).astype(np.float32)
    amin = jnp.asarray(centers - half)
    amax = jnp.asarray(centers + half)

    n = 2048
    origin = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    max_len = np.full(n, POW32, dtype=np.float32)
    max_len[rng.uniform(size=n) < 0.2] = 0.0

    one = nearest2_key(amin, amax, jnp.asarray(origin),
                       jnp.asarray(direction), jnp.asarray(max_len),
                       interpret=True)
    multi = nearest2_key(amin, amax, jnp.asarray(origin),
                         jnp.asarray(direction), jnp.asarray(max_len),
                         interpret=True, k_chunk=8)
    np.testing.assert_array_equal(np.asarray(multi), np.asarray(one))


@pytest.mark.parametrize("sort_rays,sort_mode,hinted", [
    (False, "prevtile", False),
    # unhinted-sort x row-path is the costliest variant and adds no
    # distinct code path over the hinted one: slow tier
    pytest.param(True, "prevtile", False, marks=pytest.mark.slow),
    (True, "prevtile", True),
    (True, "nearest2", True),
])
def test_sparse_soa_matches_row_path(sort_rays, sort_mode, hinted):
    """SoA entry points (carry-sorted wavefront + channel-major features,
    ops/intersect_sparse.py traverse_sparse_soa/shadow_sparse_soa) must
    match the row-layout path exactly: the sort only groups work and the
    exact-suv tail evaluates the same expressions."""
    from flexlight_tpu.ops.intersect_sparse import (build_w4_tiled,
                                                    shadow_sparse,
                                                    shadow_sparse_soa,
                                                    traverse_sparse,
                                                    traverse_sparse_soa)
    from tests.scenes import cornell_scene

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    w4t, amin, amax, w4f = build_w4_tiled(geometry, buffers.id_buffer,
                                          x6=False)

    rng = np.random.default_rng(17)
    n = 2048
    origin = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    direction = rng.normal(size=(n, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    alive = jnp.asarray(rng.uniform(size=n) < 0.7)
    hint = (jnp.asarray(rng.integers(0, buffers.id_buffer.shape[0], n),
                        dtype=jnp.int32) if hinted else None)
    o3 = tuple(jnp.asarray(origin[:, c]) for c in range(3))
    d3 = tuple(jnp.asarray(direction[:, c]) for c in range(3))

    base = traverse_sparse(w4t, w4f, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), interpret=True,
                           sort_rays=sort_rays, alive=alive,
                           sort_hint=hint, sort_mode=sort_mode)
    s, u, v, tri = traverse_sparse_soa(w4t, w4f, amin, amax, o3, d3,
                                       interpret=True, sort_rays=sort_rays,
                                       alive=alive, sort_hint=hint,
                                       sort_mode=sort_mode)
    np.testing.assert_array_equal(np.asarray(tri),
                                  np.asarray(base.triangle))
    got_suv = np.stack([np.asarray(s), np.asarray(u), np.asarray(v)],
                       axis=-1)
    np.testing.assert_allclose(got_suv, np.asarray(base.suv),
                               rtol=1e-6, atol=1e-6)

    max_len = jnp.asarray(rng.uniform(0.5, 8.0, n).astype(np.float32))
    s_base = shadow_sparse(w4t, amin, amax, jnp.asarray(origin),
                           jnp.asarray(direction), max_len, interpret=True,
                           sort_rays=sort_rays, alive=alive,
                           sort_hint=hint, sort_mode=sort_mode)
    s_soa = shadow_sparse_soa(w4t, amin, amax, o3, d3, max_len,
                              interpret=True, sort_rays=sort_rays,
                              alive=alive, sort_hint=hint,
                              sort_mode=sort_mode)
    np.testing.assert_array_equal(np.asarray(s_soa), np.asarray(s_base))


def test_sparse_soa_lowers_for_tpu():
    """SoA sparse casts (carry sort + channel-major features) lower
    through Mosaic."""
    from jax import export

    from flexlight_tpu.ops.intersect_sparse import (build_w4_tiled,
                                                    shadow_sparse_soa,
                                                    traverse_sparse_soa)

    scene, camera = cornell_scene()
    buffers = bufmod.build_scene_buffers(scene)
    geometry = world_geometry(buffers)
    w4t, amin, amax, w4f = build_w4_tiled(geometry, buffers.id_buffer)

    n = 4096

    def f(o3, d3, ml):
        s, u, v, tri = traverse_sparse_soa(
            w4t, w4f, amin, amax, o3, d3, sort_rays=True,
            sort_hint=jnp.zeros(n, jnp.int32), sort_mode="nearest2",
            ray_tile=256, subtile=4)
        sh = shadow_sparse_soa(
            w4t, amin, amax, o3, d3, ml, sort_rays=True,
            sort_hint=jnp.zeros(n, jnp.int32), sort_mode="nearest2",
            ray_tile=256, subtile=4)
        return s, u, v, tri, sh

    zeros = tuple(jnp.zeros(n, jnp.float32) for _ in range(3))
    ones = tuple(jnp.ones(n, jnp.float32) for _ in range(3))
    exp = export.export(jax.jit(f), platforms=["tpu"])(
        zeros, ones, jnp.full((n,), 8.0, jnp.float32))
    assert len(exp.mlir_module_serialized) > 0
