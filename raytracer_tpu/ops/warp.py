"""Banded gather for temporal reprojection (Pallas, TPU).

The temporal fly-through's inverse warp needs ``packed_history[flat]`` —
one (N,) random-index gather per frame. XLA lowers that to a scalar-unit
gather costing ~12 ms per million elements on v5e, which at 4K (8.3M
pixels) is ~98 ms — by far the largest line in the frame breakdown
(benchmarks/flythrough_profile.py; the megakernel itself is 43 ms).

Reprojection indices are not random: under a small camera move, the
pixels an output tile fetches live in a narrow band of the history
plane. This kernel exploits that the way the megakernel's HBM-paged
texture fetch does (ops/megakernel._fetch_image): per output tile it
reduces the tile's [min, max] source-row range (masked by validity),
DMAs that band through a VMEM page scratch, and resolves each lane's
value with a row-select sweep — per-row cost is one lane-dimension
dynamic gather plus a select, all VPU.

Cost model: a tile pays ``(band rows) * ~4`` vector ops instead of 4096
scalar-gather round trips. For scanline-ordered frames a plane row is
128 adjacent pixels of one screen row, so a v-pixel vertical camera
motion puts the band at ``~(tile rows + v * width/128)`` rows — a few
hundred for interactive moves. Large jumps degrade gracefully (the band
grows toward the whole plane, never past it); the production fallback
for teleports is the Renderer's plain restart.

Bitwise contract: for valid lanes the result equals ``values[idx]``
exactly (integer selects); invalid lanes return 0 (their history weight
is already forced to 0 downstream). Tested against the XLA gather in
tests/test_temporal.py.

No reference counterpart: the reference re-renders from scratch on
camera moves (src/main.cu:401-432); this serves the framework's temporal
mode only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_pallas import _interpret

LANES = 128
TROWS = 32          # output tile rows (matches the megakernel tile)
PAGE = 512          # history rows per DMA (512 x 128 x 4 B = 256 KiB)


def _kernel(idx_ref, val_ref, vals_hbm, out_ref, *scratch,
            n_rows: int, pad_rows: int, in_vmem: bool):
    page_ref, sem = scratch if scratch else (None, None)
    idx = idx_ref[:]
    valid = val_ref[:] != 0
    rows_t = idx >> 7
    lane_t = idx & (LANES - 1)
    shape = idx.shape
    acc = idx * 0

    if in_vmem:
        # small planes (tests, low resolutions): no paging, sweep the
        # masked [lo, hi] row band straight out of VMEM
        lo = jnp.min(jnp.where(valid, rows_t, jnp.int32(n_rows - 1)))
        hi = jnp.max(jnp.where(valid, rows_t, jnp.int32(0)))

        def frow(i, acc):
            row = vals_hbm[pl.ds(i, 1), :]
            g = jnp.take_along_axis(jnp.broadcast_to(row, shape), lane_t,
                                    axis=1)
            return jnp.where(rows_t == i, g, acc)

        acc = jax.lax.fori_loop(lo, hi + 1, frow, acc)
        out_ref[:] = jnp.where(valid, acc, 0)
        return

    lo = jnp.min(jnp.where(valid, rows_t, jnp.int32(n_rows - 1)))
    hi = jnp.max(jnp.where(valid, rows_t, jnp.int32(0)))
    base = (lo >> 3) << 3                     # 8-row aligned page starts
    n_pages = (hi - base + PAGE) // PAGE      # 0 when no lane is valid

    def fpage(p, acc):
        start = jnp.minimum(base + p * PAGE, pad_rows - PAGE)
        cp = pltpu.make_async_copy(
            vals_hbm.at[pl.ds(start, PAGE), :], page_ref, sem)
        cp.start()
        cp.wait()

        def frow(i, acc):
            row = page_ref[pl.ds(i, 1), :]
            g = jnp.take_along_axis(jnp.broadcast_to(row, shape), lane_t,
                                    axis=1)
            return jnp.where(rows_t == start + i, g, acc)

        rlo = jnp.maximum(lo - start, 0)
        rhi = jnp.minimum(hi - start + 1, PAGE)
        return jax.lax.fori_loop(rlo, rhi, frow, acc)

    acc = jax.lax.fori_loop(0, n_pages, fpage, acc)
    out_ref[:] = jnp.where(valid, acc, 0)


def banded_gather(values: jax.Array, idx: jax.Array,
                  valid: jax.Array) -> jax.Array:
    """``where(valid, values[idx], 0)`` for (M,) int32 ``values`` and (N,)
    int32 ``idx`` (0 <= idx < M where valid), tile-banded as above."""
    m = values.shape[0]
    n = idx.shape[0]
    n_rows = -(-m // LANES)
    # pad the plane so both the row-select bound and a full trailing DMA
    # page stay in range
    pad_rows = max(-(-n_rows // 8) * 8, PAGE)
    vals2d = jnp.pad(values, (0, pad_rows * LANES - m)).reshape(
        pad_rows, LANES)
    tile = TROWS * LANES
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        idx = jnp.pad(idx, (0, n_pad - n))
        valid = jnp.pad(valid, (0, n_pad - n))
    idx2d = idx.reshape(-1, LANES)
    val2d = valid.astype(jnp.int32).reshape(-1, LANES)

    # planes that fit VMEM comfortably skip the paging machinery
    in_vmem = pad_rows * LANES * 4 <= 4 * 1024 * 1024

    tile_spec = pl.BlockSpec((TROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_rows=n_rows, pad_rows=pad_rows,
                          in_vmem=in_vmem),
        grid=(n_pad // tile,),
        in_specs=[tile_spec, tile_spec,
                  pl.BlockSpec(memory_space=(pltpu.VMEM if in_vmem
                                             else pl.ANY))],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.int32),
        scratch_shapes=([] if in_vmem
                        else [pltpu.VMEM((PAGE, LANES), jnp.int32),
                              pltpu.SemaphoreType.DMA]),
        interpret=_interpret(),
    )(idx2d, val2d, vals2d)
    return out.reshape(-1)[:n]
