"""Unit tests for core math (mirrors reference utils.cu / matrix.cu behaviour)."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.utils import matrix as hm
from raytracer_tpu.utils import vec


def test_dot_cross_magnitude():
    a = jnp.array([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.array([[4.0, -5.0, 6.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(vec.dot(a, b), [12.0, 0.0])
    np.testing.assert_allclose(vec.cross(a, b)[1], [1.0, 0.0, 0.0])
    np.testing.assert_allclose(vec.magnitude(a)[1], 1.0)


def test_normalize_and_set_mag():
    a = jnp.array([[3.0, 4.0, 0.0]])
    n = vec.normalize(a)
    np.testing.assert_allclose(np.asarray(n), [[0.6, 0.8, 0.0]], rtol=1e-6)
    m = vec.set_mag(a, 10.0)
    np.testing.assert_allclose(vec.magnitude(m), [10.0], rtol=1e-6)


def test_lerp():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([2.0, 4.0, 6.0])
    np.testing.assert_allclose(vec.lerp(a, b, 0.5), [1.0, 2.0, 3.0])


def test_rotation_matrix_layout():
    """Reference layout check (src/matrix.cu:119-135): X/Y rotations are the
    transpose of the textbook convention, Z is textbook."""
    ang = 0.3
    s, c = np.sin(ang), np.cos(ang)
    rx = hm.rotation_matrix(hm.X_AXIS, ang)
    np.testing.assert_allclose(rx, [[1, 0, 0], [0, c, s], [0, -s, c]], rtol=1e-6)
    ry = hm.rotation_matrix(hm.Y_AXIS, ang)
    np.testing.assert_allclose(ry, [[c, 0, -s], [0, 1, 0], [s, 0, c]], rtol=1e-6)
    rz = hm.rotation_matrix(hm.Z_AXIS, ang)
    np.testing.assert_allclose(rz, [[c, -s, 0], [s, c, 0], [0, 0, 1]], rtol=1e-6)


def test_rotation_preserves_length_and_composes():
    p = np.array([[1.0, 2.0, 3.0]])
    out = hm.rotate_points(p, 0.2, -0.7, 1.1)
    np.testing.assert_allclose(np.linalg.norm(out), np.linalg.norm(p), rtol=1e-5)
    # composition order is Rx @ Ry @ Rz (src/obj_read.cu:72)
    manual = (hm.rotation_matrix(hm.X_AXIS, 0.2)
              @ hm.rotation_matrix(hm.Y_AXIS, -0.7)
              @ hm.rotation_matrix(hm.Z_AXIS, 1.1) @ p[0])
    np.testing.assert_allclose(out[0], manual, rtol=1e-5)


def test_enlargement():
    m = hm.enlargement_matrix(2.5)
    np.testing.assert_allclose(m @ np.array([1.0, -2.0, 4.0]),
                               [2.5, -5.0, 10.0])
