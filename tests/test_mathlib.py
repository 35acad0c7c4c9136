import numpy as np

from flexlight_tpu.utils import mathlib


def test_moore_penrose_inverts_rotation_scale():
    m = 2.5 * mathlib.rotation_axis([0, 1, 0], 0.7)
    inv = mathlib.moore_penrose(m)
    np.testing.assert_allclose(inv @ m, np.eye(3), atol=1e-10)


def test_rotation_axis_orthogonal():
    r = mathlib.rotation_axis(mathlib.normalize([1, 2, 3]), 1.1)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)


def test_rotation_spherical_matches_view_convention():
    r = mathlib.rotation_spherical(0.0, 0.0)
    np.testing.assert_allclose(r, np.eye(3), atol=1e-12)


def test_ray_triangle_hit_and_miss():
    a, b, c = [0, 0, 5], [2, 0, 5], [0, 2, 5]
    n = [0, 0, -1]
    d = mathlib.ray_triangle([0.5, 0.5, 0], [0, 0, 1], a, b, c, n)
    assert abs(d - 5.0) < 1e-9
    assert mathlib.ray_triangle([5, 5, 0], [0, 0, 1], a, b, c, n) == np.inf
    # Behind the origin
    assert mathlib.ray_triangle([0.5, 0.5, 10], [0, 0, 1], a, b, c, n) == np.inf


def test_normalize_zero_vector():
    np.testing.assert_array_equal(mathlib.normalize([0, 0, 0]), np.zeros(3))
