"""Camera tests against the reference's viewport math (src/camera.cu)."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.config import CameraConfig
from raytracer_tpu.models.camera import build_camera, pixel_to_world, primary_rays


def test_default_camera_basis():
    """With no rotation: u = +x scaled, v = -y scaled, normal = +z
    (src/camera.cu:46-60, 71-108)."""
    cfg = CameraConfig(width=1000, height=800)
    cam = build_camera(cfg)

    vw = 2 * 0.1 * np.tan(np.deg2rad(60) / 2)
    vh = vw / (1000 / 800)
    np.testing.assert_allclose(cam.delta_u, [vw / 1000, 0, 0], atol=1e-7)
    np.testing.assert_allclose(cam.delta_v, [0, -vh / 800, 0], atol=1e-7)
    np.testing.assert_allclose(
        cam.tl_pixel, [-vw / 2, vh / 2, 0.1], atol=1e-6)


def test_pixel_to_world_center():
    cfg = CameraConfig(width=100, height=80)
    cam = build_camera(cfg)
    centre = pixel_to_world(cam, jnp.array(50), jnp.array(40))
    np.testing.assert_allclose(centre, [0, 0, 0.1], atol=1e-6)


def test_primary_rays_normalised_and_ordered():
    cfg = CameraConfig(width=16, height=8)
    cam = build_camera(cfg)
    o, d = primary_rays(cam, 16, 8)
    assert o.shape == (128, 3) and d.shape == (128, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0,
                               rtol=1e-6)
    # row-major: pixel (x, y) at index y*W + x (src/raytracer.cu:123)
    px = pixel_to_world(cam, jnp.array(3), jnp.array(2))
    expect = np.asarray(px) / np.linalg.norm(np.asarray(px))
    np.testing.assert_allclose(np.asarray(d[2 * 16 + 3]), expect, rtol=1e-5)


def test_rotated_camera_still_orthogonal():
    cfg = CameraConfig(width=64, height=64, x_rot=0.3, y_rot=-0.5, z_rot=0.1)
    cam = build_camera(cfg)
    u, v = np.asarray(cam.delta_u), np.asarray(cam.delta_v)
    assert abs(u @ v) < 1e-8
