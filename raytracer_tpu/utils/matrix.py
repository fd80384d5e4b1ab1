"""Host-side transform matrices (numpy, float32).

TPU-native replacement for the reference's host-only ``Matrix`` /
``EnlargementMatrix`` / ``RotationMatrix`` classes (src/matrix.cu:6-150).
These run once at scene-build time on the host, so plain numpy is the right
tool; the arrays they produce are shipped to the device as part of the scene
pytree.

The rotation matrices reproduce the reference's element layout bit-for-bit
(src/matrix.cu:119-135) — note the X/Y rotations there are the *transpose* of
the usual convention (i.e. rotate by ``-angle``); we match them so scene
geometry and camera bases are identical.
"""

from __future__ import annotations

import numpy as np

X_AXIS = 0
Y_AXIS = 1
Z_AXIS = 2


def enlargement_matrix(scale: float, dims: int = 3) -> np.ndarray:
    """Uniform scale matrix (reference: src/matrix.cu:74-96)."""
    return np.eye(dims, dtype=np.float32) * np.float32(scale)


def rotation_matrix(axis: int, angle: float) -> np.ndarray:
    """Axis rotation with the reference's exact layout (src/matrix.cu:119-135)."""
    s = np.float32(np.sin(angle))
    c = np.float32(np.cos(angle))
    if axis == X_AXIS:
        m = [[1, 0, 0], [0, c, s], [0, -s, c]]
    elif axis == Y_AXIS:
        m = [[c, 0, -s], [0, 1, 0], [s, 0, c]]
    elif axis == Z_AXIS:
        m = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    else:
        raise ValueError(f"bad axis {axis}")
    return np.array(m, dtype=np.float32)


def rotate_xyz(x_angle: float, y_angle: float, z_angle: float) -> np.ndarray:
    """Rx @ Ry @ Rz, the composition order used for both mesh rotation
    (src/obj_read.cu:66-75) and the camera basis (src/camera.cu:63-69)."""
    return (
        rotation_matrix(X_AXIS, x_angle)
        @ rotation_matrix(Y_AXIS, y_angle)
        @ rotation_matrix(Z_AXIS, z_angle)
    ).astype(np.float32)


def rotate_points(points: np.ndarray, x_angle: float, y_angle: float, z_angle: float) -> np.ndarray:
    """Rotate ``(N, 3)`` points about the origin."""
    return points.astype(np.float32) @ rotate_xyz(x_angle, y_angle, z_angle).T
