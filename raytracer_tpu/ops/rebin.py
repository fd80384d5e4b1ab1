"""Ray re-binning between bounces (row-granular, sort-free).

After a diffuse bounce the rays of a Morton pixel tile point everywhere, so
the tile-granular BVH gates of the Pallas sweep (ops/sweep.py) stop pruning
— every cluster has *some* lane that might enter it, and the sweep degrades
to a full primitive scan. The reference's per-thread stack DFS
(src/objects.cu:487-532) absorbs this divergence natively; the TPU-native
answer is to restore coherence by physically regrouping rays between
bounces.

Design constraints (measured on v5e):

- ``lax.sort``/``argsort`` cost ~10 s per 1M keys — unusable. The
  permutation must be built from matmul/cumsum-shaped primitives.
- Per-element gathers cost ~7 ms per 800k elements — the permutation must
  move *rows* (128-lane blocks, 512 B each), not individual rays.

So re-binning is row-granular: each 128-lane row is assigned one bucket from
its mean origin (coarse spatial cell) and mean direction (octant), and rows
are regrouped by a counting sort over ≤ GRID³x8 buckets built from one-hot
comparisons and cumulative sums — O(R·B) elementwise work, no sorting
network. Rays within a row came from adjacent pixels (Morton order) and
scattered off the same surface region, so they stay directionally coherent
as a group; regrouping rows by (cell, octant) makes each (32, 128) sweep
tile see a compact frustum again and the BVH gates close.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

LANES = 128
GRID = 4                      # spatial cells per axis
NUM_BUCKETS = GRID ** 3 * 8   # cells x direction octants


def row_buckets(o: jax.Array, d: jax.Array, done: jax.Array) -> jax.Array:
    """Bucket id per 128-lane row. ``o``/``d`` are (3, N); ``done`` (N,).

    Fully-done (parked) rows share whatever bucket their parked state maps
    to — they are spatially clustered at the park origin, so they regroup
    together and their tiles retire with every gate closed.
    """
    rows = o.shape[1] // LANES
    o_r = o.reshape(3, rows, LANES)
    d_r = d.reshape(3, rows, LANES)
    dm = jnp.mean(d_r, axis=2)                        # (3, R)
    om = jnp.mean(o_r, axis=2)                        # (3, R)
    octant = ((dm[0] < 0).astype(jnp.int32) * 4
              + (dm[1] < 0).astype(jnp.int32) * 2
              + (dm[2] < 0).astype(jnp.int32))
    # Normalise positions by the live rows' bounding box; parked rows sit at
    # a far sentinel origin and would stretch it to uselessness.
    live_row = ~jnp.all(done.reshape(rows, LANES), axis=1)    # (R,)
    big = jnp.float32(3e37)
    lo = jnp.min(jnp.where(live_row[None, :], om, big), axis=1,
                 keepdims=True)                       # (3, 1)
    hi = jnp.max(jnp.where(live_row[None, :], om, -big), axis=1,
                 keepdims=True)
    extent = jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip(((om - lo) / extent * GRID).astype(jnp.int32),
                    0, GRID - 1)                      # (3, R)
    cid = (cell[0] * GRID + cell[1]) * GRID + cell[2]
    return cid * 8 + octant                           # (R,)


def bucket_permutation(bucket: jax.Array) -> jax.Array:
    """Stable counting-sort permutation of rows by bucket, sort-free.

    Returns ``perm`` with ``perm[new_row] = old_row`` (use with
    ``jnp.take(..., axis=row)``). Built entirely from one-hot compares,
    cumulative sums, and one small scatter — no sorting network.
    """
    r = bucket.shape[0]
    onehot = (bucket[:, None]
              == jnp.arange(NUM_BUCKETS, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)                   # (R, B)
    below = jnp.cumsum(onehot, axis=0) - onehot       # same-bucket rows above
    rank = jnp.sum(below * onehot, axis=1)            # (R,)
    counts = jnp.sum(onehot, axis=0)                  # (B,)
    offsets = jnp.cumsum(counts) - counts             # exclusive prefix
    dest = (jnp.sum(onehot * offsets[None, :], axis=1) + rank
            ).astype(jnp.int32)                       # old_row -> new_row
    # invert: row counts are all-distinct so the scatter is a permutation
    return jnp.zeros((r,), jnp.int32).at[dest].set(
        jnp.arange(r, dtype=jnp.int32))


def permute_rows(perm: jax.Array, arr: jax.Array) -> jax.Array:
    """Apply a row permutation to an array whose last axis is N = R*128.

    Moves whole 128-lane rows (512 B f32 blocks) — the granularity at which
    TPU gathers are cheap.
    """
    r = perm.shape[0]
    shaped = arr.reshape(arr.shape[:-1] + (r, LANES))
    return jnp.take(shaped, perm, axis=-2).reshape(arr.shape)


def permute_all(perm: jax.Array, arrays: Sequence) -> list:
    return [permute_rows(perm, a) for a in arrays]
