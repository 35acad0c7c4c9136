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


def test_qr_reconstructs():
    from flexlight_tpu.utils import mathlib as m

    a = np.array([[2.0, 1.0, 0.5], [0.3, 3.0, 1.0], [0.1, -1.0, 2.0]])
    q, r = m.qr(a)
    np.testing.assert_allclose(q @ r, a, atol=1e-10)
    np.testing.assert_allclose(q.T @ q, np.eye(3), atol=1e-10)
    # R upper triangular
    assert abs(r[1, 0]) < 1e-10 and abs(r[2, 0]) < 1e-10 and abs(r[2, 1]) < 1e-10


def test_regression_recovers_polynomial():
    from flexlight_tpu.utils import mathlib as m

    xs = np.linspace(-2, 2, 9)
    ys = 0.5 - 1.5 * xs + 2.0 * xs ** 2
    coef = m.regression(np.stack([xs, ys], axis=1), 2)
    np.testing.assert_allclose(coef, [0.5, -1.5, 2.0], atol=1e-8)


def test_sigmoid_and_mod():
    from flexlight_tpu.utils import mathlib as m

    assert abs(m.sigmoid(0.0) - 0.5) < 1e-12
    np.testing.assert_allclose(m.sigmoid_prime(0.0), 0.25, atol=1e-12)
    assert m.mod(-1.0, 3.0) == 2.0  # floored, not truncated
