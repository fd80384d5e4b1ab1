"""Camera model: pixel grid -> world-space primary rays.

TPU-native replacement for the reference camera (src/camera.cu). The host
computes the viewport basis once (``delta_u``/``delta_v``/top-left pixel
position, mirroring src/camera.cu:46-60) and ships it as a tiny pytree — the
analog of the ``__constant__ const_cam_data`` upload (src/camera.cu:21,59).
Primary-ray generation is then one fused tensor expression over the whole
pixel grid instead of a per-thread function (src/camera.cu:24-29,
src/ray.cu:147-155).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig
from ..utils import matrix as hm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraArrays:
    """Device-resident camera basis (analog of DeviceCamData, src/camera.cu:12-18)."""

    position: jax.Array  # (3,)
    tl_pixel: jax.Array  # (3,) world position of pixel (0, 0)
    delta_u: jax.Array   # (3,) world step per pixel in +x (screen right-ish)
    delta_v: jax.Array   # (3,) world step per pixel in +y (screen down)


def build_camera(cfg: CameraConfig) -> CameraArrays:
    """Compute the viewport basis (mirrors src/camera.cu:46-108)."""
    viewport_width = 2.0 * cfg.focal_len * np.tan(cfg.fov_rad / 2.0)
    viewport_height = viewport_width / cfg.aspect

    rot = hm.rotate_xyz(cfg.x_rot, cfg.y_rot, cfg.z_rot)

    # u points along the top of the screen, v down its left edge
    # (src/camera.cu:71-97).
    u = rot @ np.array([1.0, 0.0, 0.0], dtype=np.float32)
    v = rot @ np.array([0.0, -1.0, 0.0], dtype=np.float32)

    u = u / np.linalg.norm(u) * (viewport_width / cfg.width)
    v = v / np.linalg.norm(v) * (viewport_height / cfg.height)

    # Plane normal points away from the camera (right-hand rule,
    # src/camera.cu:53).
    normal = np.cross(v, u)
    normal = normal / np.linalg.norm(normal)

    pos = np.array(cfg.position, dtype=np.float32)
    tl = (
        u * (-cfg.width / 2.0)
        + v * (-cfg.height / 2.0)
        + normal * cfg.focal_len
        + pos
    ).astype(np.float32)

    return CameraArrays(
        position=jnp.asarray(pos),
        tl_pixel=jnp.asarray(tl),
        delta_u=jnp.asarray(u.astype(np.float32)),
        delta_v=jnp.asarray(v.astype(np.float32)),
    )


def pixel_to_world(cam: CameraArrays, x: jax.Array, y: jax.Array) -> jax.Array:
    """Pixel coords -> point on the screen plane (src/camera.cu:24-29).

    ``x``/``y`` may be any broadcastable integer/float arrays; returns
    ``(..., 3)``.
    """
    xf = x.astype(jnp.float32)[..., None]
    yf = y.astype(jnp.float32)[..., None]
    return cam.tl_pixel + cam.delta_u * xf + cam.delta_v * yf


def primary_rays(cam: CameraArrays, width: int, height: int,
                 pixel_order: Optional[np.ndarray] = None):
    """Generate primary rays for every pixel.

    Returns ``(origins, directions)`` each of shape ``(H*W, 3)``. Matches the
    reference's per-pixel ray setup (src/ray.cu:147-155): direction from
    camera position to the pixel's world point, normalised; no sub-pixel
    jitter (the reference antialiases by jittering direction per bounce
    instead).

    ``pixel_order`` optionally permutes the flattened row-major pixel index
    (e.g. Morton order, so consecutive rays — and therefore kernel ray
    tiles — are spatially compact, which makes BVH cluster culling far more
    effective on primary rays).
    """
    idx = jnp.arange(width * height, dtype=jnp.int32)
    if pixel_order is not None:
        idx = jnp.asarray(pixel_order, jnp.int32)
    x = idx % width
    y = idx // width
    view = pixel_to_world(cam, x, y)
    d = view - cam.position
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam.position, d.shape)
    return o, d


def morton_order(width: int, height: int) -> np.ndarray:
    """Row-major pixel indices sorted by Morton (Z-curve) code.

    Any consecutive run of rays covers a compact screen region — the
    wavefront analog of the reference's 8x8 thread blocks
    (src/dispatch.cu:136).
    """
    x, y = np.meshgrid(np.arange(width, dtype=np.uint64),
                       np.arange(height, dtype=np.uint64))

    def spread(v):
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v

    code = spread(x) | (spread(y) << np.uint64(1))
    return np.argsort(code.reshape(-1), kind="stable").astype(np.int32)
