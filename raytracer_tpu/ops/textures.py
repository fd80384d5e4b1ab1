"""Texture sampling.

TPU-native replacement for the device texture switch
(``Texture::get_texture_colour``, src/material.cu:53-124). All four texture
types are evaluated as masked math over the whole ray batch and selected per
ray — no divergence, one gather for the image case from a shared texel atlas
(replacing per-texture ``cudaMalloc`` blobs, src/material.cu:107-117).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.materials import TEX_CHECKERBOARD, TEX_COLOUR, TEX_GRADIENT, TEX_IMAGE
from ..models.scene import SceneArrays


def sample_texture(scene: SceneArrays, mat_id: jax.Array, uv: jax.Array) -> jax.Array:
    """Texture colour per ray: (N,) material ids + (N, 2) uv -> (N, 3)."""
    ttype = scene.tex_type[mat_id]
    u = uv[:, 0]
    v = uv[:, 1]

    const_col = scene.tex_colour[mat_id]

    # Gradient (src/material.cu:80-82): colour = (u, v, 0).
    gradient = jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)

    # Checkerboard (src/material.cu:90-99): truncating int casts, parity test.
    nsq = scene.tex_nsq[mat_id]
    u_c = (u * nsq).astype(jnp.int32)
    v_c = (v * nsq).astype(jnp.int32)
    is_light = ((u_c + v_c) % 2) == 0
    checker = jnp.where(
        is_light[:, None], scene.tex_light[mat_id], scene.tex_dark[mat_id]
    )

    # Image: nearest-neighbour from the atlas (src/material.cu:119-124):
    # u_coord = (w-1)*u, v_coord = (h-1)*v, texel = img[v_coord*w + u_coord].
    w = scene.tex_width[mat_id]
    h = scene.tex_height[mat_id]
    u_i = jnp.clip(((w - 1).astype(jnp.float32) * u).astype(jnp.int32), 0, w - 1)
    v_i = jnp.clip(((h - 1).astype(jnp.float32) * v).astype(jnp.int32), 0, h - 1)
    flat = scene.tex_offset[mat_id] + v_i * w + u_i
    flat = jnp.clip(flat, 0, scene.atlas.shape[0] - 1)
    image = scene.atlas[flat]

    out = jnp.where((ttype == TEX_COLOUR)[:, None], const_col, 0.0)
    out = jnp.where((ttype == TEX_GRADIENT)[:, None], gradient, out)
    out = jnp.where((ttype == TEX_CHECKERBOARD)[:, None], checker, out)
    out = jnp.where((ttype == TEX_IMAGE)[:, None], image, out)
    return out
