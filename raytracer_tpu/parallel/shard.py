"""shard_map'd multi-chip render steps.

Three sharding strategies (SURVEY.md §2.3):

- ``pixel_sharded_render_frame``: pixel tiles sharded over the mesh, scene
  replicated. Zero collectives in the steady state — each chip traces and
  accumulates its own tile; the only cross-chip op is a scalar ``psum`` of
  the segment counter (stats only). This is the default, matching the
  reference's embarrassingly-parallel pixel grid (src/raytracer.cu:118-119)
  scaled across chips.
- ``spp_sharded_render_frame``: every chip traces *all* pixels with a
  distinct slice of the sample budget, and one ``psum`` over ICI averages the
  frame. Useful when the image is too small to shard but the sample budget is
  large.
- ``make_hybrid_sharded_step``: 2D (px, spp) mesh — pixel tiles over the
  'px' axis AND sample slices over the 'spp' axis, one psum-mean over the
  spp axis per frame. The dp x sp analog for pod slices where neither the
  image nor the per-chip sample budget alone fills the mesh.

Because RNG streams are keyed by global pixel index (ops.rng), the
pixel-sharded result is bitwise identical to the single-device render.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RenderSettings
from ..ops import rng
from ..ops.integrator import render_frame, render_sample_mean
from .mesh import PIXEL_AXIS, SPP_AXIS


def make_pixel_sharded_step(mesh: Mesh, settings: RenderSettings,
                            backend: str = "woop"):
    """Build a jitted sharded frame step.

    Signature of the returned function:
    ``(scene, ray_idx, o, d, accum, frame_num, base_key) -> (accum', segs)``
    where ray_idx/o/d/accum are sharded along their leading axis and the
    scene pytree is replicated.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(PIXEL_AXIS), P(PIXEL_AXIS), P(PIXEL_AXIS),
                  P(PIXEL_AXIS), P(), P()),
        out_specs=(P(PIXEL_AXIS), P()),
        # vma tracking mis-propagates through the megakernel's in-kernel
        # while_loop (pltpu.prng_random_bits values come out unvarying and
        # poison the carry fixpoint under JAX 0.9). The static check is
        # redundant here anyway: the sharded step is held to *bitwise*
        # equality with the unsharded render (tests/test_parallel.py on the
        # CPU mesh, tests/test_megakernel.py::test_mega_under_shard_map_on_tpu
        # on hardware), and this mode has no collectives to misplace.
        check_vma=False,
    )
    def step(scene, ray_idx, o, d, accum, frame_num, base_key):
        # Globalise megakernel RNG tile ids across shards: each device owns
        # a contiguous block of ray tiles. The tile size is scene-adaptive,
        # so it must come from the same helper the kernel uses or per-shard
        # tile ids drift from single-device numbering.
        from ..ops.megakernel import mega_tile_for
        local_tiles = -(-o.shape[0] // mega_tile_for(scene))
        tile_offset = jax.lax.axis_index(PIXEL_AXIS) * local_tiles
        new_accum, segs = render_frame(
            scene, settings, ray_idx, o, d, accum, frame_num, base_key,
            backend=backend, tile_offset=tile_offset)
        return new_accum, jax.lax.psum(segs, PIXEL_AXIS)

    return jax.jit(step, donate_argnums=(4,))


def make_hybrid_sharded_step(mesh: Mesh, settings: RenderSettings,
                             backend: str = "woop"):
    """2D hybrid mode over a (px, spp) mesh (mesh.make_mesh_2d).

    Each device owns one (pixel tile, sample slice) pair: ray/accum inputs
    are sharded along the leading axis over 'px' (replicated over 'spp'),
    every device traces its tile with a sample-slice-specific key, and one
    ``psum`` over the spp axis averages the slices — the collective stays
    on the minor mesh axis. A (P, S) mesh renders S * rays_per_pixel
    samples per pixel per frame at P-way pixel parallelism; per spp slice
    the pixel split is bitwise identical to that slice rendered unsharded
    (the same property test_parallel.py pins for the 1D modes).
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(PIXEL_AXIS), P(PIXEL_AXIS), P(PIXEL_AXIS),
                  P(PIXEL_AXIS), P(), P()),
        out_specs=(P(PIXEL_AXIS), P()),
        # same vma caveat as the pixel mode (megakernel while_loop); the
        # mode is held to the manual two-slice mean in test_parallel.py
        check_vma=False,
    )
    def step(scene, ray_idx, o, d, accum, frame_num, base_key):
        from ..ops.megakernel import mega_tile_for
        local_tiles = -(-o.shape[0] // mega_tile_for(scene))
        tile_offset = jax.lax.axis_index(PIXEL_AXIS) * local_tiles
        spp_i = jax.lax.axis_index(SPP_AXIS)
        n_spp = jax.lax.axis_size(SPP_AXIS)
        fkey = rng.frame_key(
            jax.random.fold_in(base_key, spp_i), frame_num)
        mean, segs = render_sample_mean(
            scene, settings, ray_idx, o, d, fkey, backend=backend,
            tile_offset=tile_offset)
        mean = jax.lax.psum(mean, SPP_AXIS) / jnp.float32(n_spp)
        segs = jax.lax.psum(segs, (PIXEL_AXIS, SPP_AXIS))
        fn = frame_num.astype(jnp.float32)
        return (mean + accum * fn) / (fn + 1.0), segs

    return jax.jit(step, donate_argnums=(4,))


def make_spp_sharded_step(mesh: Mesh, settings: RenderSettings,
                          backend: str = "woop"):
    """Sample-parallel mode: shard spp over chips, one psum-mean per frame.

    Each chip runs ``rays_per_pixel`` samples with a chip-specific key, so a
    mesh of D chips renders D * rays_per_pixel samples per frame.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
    )
    def step(scene, ray_idx, o, d, accum, frame_num, base_key):
        shard_i = jax.lax.axis_index(PIXEL_AXIS)
        n_shards = jax.lax.axis_size(PIXEL_AXIS)
        # Inputs are replicated in this mode but the per-shard key makes the
        # computation varying; mark the ray inputs varying up front.
        ray_idx, o, d = jax.lax.pcast((ray_idx, o, d), (PIXEL_AXIS,),
                                      to="varying")
        fkey = rng.frame_key(
            jax.random.fold_in(base_key, shard_i), frame_num)
        mean, segs = render_sample_mean(
            scene, settings, ray_idx, o, d, fkey, backend=backend)
        mean = jax.lax.psum(mean, PIXEL_AXIS) / jnp.float32(n_shards)
        segs = jax.lax.psum(segs, PIXEL_AXIS)
        fn = frame_num.astype(jnp.float32)
        return (mean + accum * fn) / (fn + 1.0), segs

    return jax.jit(step, donate_argnums=(4,))
