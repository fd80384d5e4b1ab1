"""Texture sampling (SoA layout, gather-free except the image atlas).

TPU-native replacement for the device texture switch
(``Texture::get_texture_colour``, src/material.cu:53-124). All four texture
types are evaluated as masked math over the whole ray batch and selected per
ray — no divergence. Per-material parameters arrive pre-fetched in
``MatCols`` (one one-hot matmul, see ops.tables); the only remaining gather
is the image-atlas texel fetch, skipped entirely when the scene has no image
textures (static: atlas length == 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.materials import TEX_CHECKERBOARD, TEX_COLOUR, TEX_GRADIENT, TEX_IMAGE
from ..models.scene import SceneArrays
from .tables import MatCols


def sample_texture(scene: SceneArrays, cols: MatCols,
                   u: jax.Array, v: jax.Array,
                   base_colour: jax.Array) -> jax.Array:
    """Texture colour per ray -> (3, N).

    ``base_colour`` is the winning primitive's denormalised const colour
    (materials are interned by behaviour; per-primitive colour lives on the
    primitive, like the reference's per-object Material copies).
    """
    ttype = cols.tex_type

    # Checkerboard (src/material.cu:90-99): truncating int casts, parity.
    u_c = (u * cols.tex_nsq).astype(jnp.int32)
    v_c = (v * cols.tex_nsq).astype(jnp.int32)
    is_light = ((u_c + v_c) % 2) == 0
    checker = jnp.where(is_light[None, :], cols.tex_light, cols.tex_dark)

    # Gradient (src/material.cu:80-82): colour = (u, v, 0).
    gradient = jnp.stack([u, v, jnp.zeros_like(u)])

    out = jnp.where((ttype == TEX_COLOUR)[None, :], base_colour, 0.0)
    out = jnp.where((ttype == TEX_GRADIENT)[None, :], gradient, out)
    out = jnp.where((ttype == TEX_CHECKERBOARD)[None, :], checker, out)

    # Image: nearest-neighbour atlas fetch (src/material.cu:119-124):
    # u_coord = (w-1)*u, v_coord = (h-1)*v, texel = img[v_coord*w + u_coord].
    # atlas length 1 <=> no image textures in the scene: skip the gather.
    if scene.atlas.shape[0] > 1:
        w = cols.tex_w
        h = cols.tex_h
        u_i = jnp.clip(((w - 1).astype(jnp.float32) * u).astype(jnp.int32),
                       0, w - 1)
        v_i = jnp.clip(((h - 1).astype(jnp.float32) * v).astype(jnp.int32),
                       0, h - 1)
        flat = jnp.clip(cols.tex_off + v_i * w + u_i,
                        0, scene.atlas.shape[0] - 1)
        atlas_t = scene.atlas.T          # (3, P)
        image = jnp.stack([atlas_t[c][flat] for c in range(3)])
        out = jnp.where((ttype == TEX_IMAGE)[None, :], image, out)
    return out
