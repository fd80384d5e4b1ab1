"""Vector math on ``(..., 3)`` arrays.

TPU-native replacement for the reference's ``Vec3``/``Vec2`` classes
(reference: src/utils.cu:13-185). Instead of a scalar vector class, every
helper here operates on batched ``(..., 3)`` jnp arrays so the whole image's
worth of rays is one VPU-friendly tensor op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Sentinel distance for "no hit". The reference uses ``1 << 30`` by accident
# (src/objects.cu:6, see SURVEY.md quirk #1); we use a large finite float so
# that masked arithmetic never produces inf*0 NaNs. Host-side numpy scalars
# (NOT jnp): a jnp scalar here would run a device computation at import
# time, initialising the XLA backend before multi-process users can call
# jax.distributed.initialize (tests/test_distributed.py). Both are
# strongly-typed float32 in jnp arithmetic.
INF = np.float32(1e30)

# Self-intersection guard threshold (reference: src/objects.cu:7).
EPS = np.float32(1e-6)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis -> (...,)."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3D cross product (reference: src/utils.cu:146-153)."""
    return jnp.cross(a, b)


def magnitude(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Normalise over the trailing axis (reference: src/utils.cu:123-128).

    Mirrors the reference exactly: no epsilon guard, a zero vector yields
    inf/NaN which downstream validity masks swallow.
    """
    inv = 1.0 / magnitude(a)
    return a * inv[..., None]


def set_mag(a: jnp.ndarray, mag) -> jnp.ndarray:
    """Rescale to the requested magnitude (reference: src/utils.cu:155-162)."""
    scale = mag / magnitude(a)
    return a * scale[..., None]


def lerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """a + (b - a) * t (reference: src/ray.cu:32-34)."""
    return a + (b - a) * t


def vec3(x, y, z, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([x, y, z], dtype=dtype)
