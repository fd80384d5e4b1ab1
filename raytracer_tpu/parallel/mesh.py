"""Device mesh construction for multi-chip rendering.

The reference is single-GPU with zero collectives (SURVEY.md §2.3); the
TPU-native scaling story is: shard the pixel dimension over a 1D mesh (each
chip owns its pixel tile end-to-end, no steady-state communication) and
replicate the scene, which is at most a few MB.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIXEL_AXIS = "px"
SPP_AXIS = "spp"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1D mesh over all (or the given) devices, axis name 'px'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (PIXEL_AXIS,))


def make_mesh_2d(px: int, spp: int,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2D (px, spp) mesh for the hybrid mode: pixel tiles sharded over the
    'px' rows, the sample budget over the 'spp' columns. Lay the spp axis
    minor so its per-frame psum rides the fastest links."""
    if devices is None:
        devices = jax.devices()
    if len(devices) != px * spp:
        raise ValueError(
            f"make_mesh_2d({px}, {spp}) needs {px * spp} devices, "
            f"got {len(devices)}")
    return Mesh(np.asarray(devices).reshape(px, spp),
                (PIXEL_AXIS, SPP_AXIS))


def pixel_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (pixel/ray) dimension across the mesh."""
    return NamedSharding(mesh, P(PIXEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
