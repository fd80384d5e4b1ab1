"""Material-table lookup as a one-hot matmul.

XLA's per-element gather costs ~7 ms per 800k rays on v5e; the material
table is tiny (one row per distinct material), so fetching all ~18 columns
for every ray is one (K, M) x (M, N) matmul on the MXU instead of 18
gathers — the TPU-native analog of the reference reading ``Material`` fields
through a pointer (src/raytracer.cu:41,82-90).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.scene import SceneArrays


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MatCols:
    """Per-ray material *behaviour* parameters (SoA, lanes = rays).

    Colour / smoothness are NOT here: they are denormalised onto the
    primitives (ShadeData carries the winner's values). The refractive
    index IS here — it is a property of the medium shared by every
    primitive of the material."""

    mat_type: jax.Array    # (N,) i32
    ior: jax.Array         # (N,) f32
    emit: jax.Array        # (3, N) f32
    tex_type: jax.Array    # (N,) i32
    tex_light: jax.Array   # (3, N) f32
    tex_dark: jax.Array    # (3, N) f32
    tex_nsq: jax.Array     # (N,) f32
    tex_off: jax.Array     # (N,) i32
    tex_w: jax.Array       # (N,) i32
    tex_h: jax.Array       # (N,) i32


def lookup_material(scene: SceneArrays, mat_id: jax.Array) -> MatCols:
    """Fetch all material columns for (N,) material ids via one matmul."""
    m = scene.mat_type.shape[0]
    n = mat_id.shape[0]

    # Integer-valued columns ride the same f32 matmul; all values are
    # exactly representable (< 2^24).
    table = jnp.concatenate([
        scene.mat_type.astype(jnp.float32)[None, :],
        scene.mat_ior[None, :],
        scene.mat_emit.T,
        scene.tex_type.astype(jnp.float32)[None, :],
        scene.tex_light.T,
        scene.tex_dark.T,
        scene.tex_nsq[None, :],
        scene.tex_offset.astype(jnp.float32)[None, :],
        scene.tex_width.astype(jnp.float32)[None, :],
        scene.tex_height.astype(jnp.float32)[None, :],
    ], axis=0)                                             # (16, M)

    onehot = (jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
              == mat_id[None, :]).astype(jnp.float32)      # (M, N)
    cols = jax.lax.dot_general(
        table, onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                      # (16, N)

    def as_int(row):
        return (row + 0.5).astype(jnp.int32)

    return MatCols(
        mat_type=as_int(cols[0]),
        ior=cols[1],
        emit=cols[2:5],
        tex_type=as_int(cols[5]),
        tex_light=cols[6:9],
        tex_dark=cols[9:12],
        tex_nsq=cols[12],
        tex_off=as_int(cols[13]),
        tex_w=as_int(cols[14]),
        tex_h=as_int(cols[15]),
    )
