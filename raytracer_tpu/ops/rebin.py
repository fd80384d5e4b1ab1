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


# --- lane-granular re-binning (per-ray, sort-free) ---------------------------
# Row-granular regrouping (above) is measured neutral on divergent scenes:
# after a diffuse bounce the divergence is *within* each 128-lane row, so
# moving whole rows cannot tighten a tile's union footprint. Regrouping
# individual rays needs a per-ray permutation — argsort is ~10 s/1M keys on
# v5e, so the permutation is built as a counting sort whose only O(N·B) step
# is an MXU matmul: ranks-within-chunk come from a strictly-lower-triangular
# (128, 128) ones matrix applied per 128-ray chunk (bf16 — counts <= 128 are
# exact in 8 mantissa bits), and all per-ray bucket lookups are one-hot
# multiply-reduces, never gathers. The one data movement is a single packed
# scatter/gather of the ray state (see apply_lane_permutation).

import os

# Spatial cells per axis of the lane-bin lattice. The counting sort's
# one-hot work is O(N * LANE_BUCKETS): grid 2 -> 64 buckets (102 MB of
# bf16 one-hots per 800k-ray rebin), grid 3 -> 216 (finer re-cohesion,
# ~3.4x the build traffic). Tune on hardware against the sweep time saved.
LANE_GRID = int(os.environ.get("RAYTRACER_LANE_GRID", "2"))
LANE_BUCKETS = LANE_GRID ** 3 * 8       # cells x direction octants


def lane_buckets(o: jax.Array, d: jax.Array, done: jax.Array) -> jax.Array:
    """Bucket id per RAY in [0, LANE_BUCKETS). ``o``/``d`` (3, N), ``done`` (N,).

    Key = (coarse origin cell, direction octant): rays that start near each
    other and head the same way sweep the same clusters. Done/parked rays
    all map to one bucket (their park origin clips to a corner cell), so
    they pack into tiles that retire with every gate closed."""
    octant = ((d[0] < 0).astype(jnp.int32) * 4
              + (d[1] < 0).astype(jnp.int32) * 2
              + (d[2] < 0).astype(jnp.int32))
    big = jnp.float32(3e37)
    live = ~done
    lo = jnp.min(jnp.where(live[None, :], o, big), axis=1, keepdims=True)
    hi = jnp.max(jnp.where(live[None, :], o, -big), axis=1, keepdims=True)
    extent = jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip(((o - lo) / extent * LANE_GRID).astype(jnp.int32),
                    0, LANE_GRID - 1)
    cid = (cell[0] * LANE_GRID + cell[1]) * LANE_GRID + cell[2]
    return cid * 8 + octant


def lane_destinations(key: jax.Array,
                      num_buckets: int = LANE_BUCKETS) -> jax.Array:
    """Stable counting-sort destination per ray, argsort-free.

    ``dest[i]`` is ray i's slot in bucket-sorted order (equal keys keep
    their relative order, matching ``np.argsort(key, kind='stable')``).
    All O(N·B) work is MXU matmuls / elementwise one-hot reduces.
    """
    n = key.shape[0]
    if n > (1 << 24):
        # destinations accumulate through f32 sums (exact integers only up
        # to 2^24); past that two rays could silently share a slot and the
        # unique-indices scatter would drop state
        raise ValueError(
            f"lane_destinations supports at most 2^24 rays per shard "
            f"(got {n}): f32 rank accumulation would lose exactness")
    c = n // LANES
    kc = key.reshape(c, LANES)
    oh = (kc[:, :, None]
          == jnp.arange(num_buckets, dtype=jnp.int32)[None, None, :]
          ).astype(jnp.bfloat16)                       # (C, 128, B)
    # rank within the 128-ray chunk: strictly-lower-triangular ones matmul
    tri = jnp.tril(jnp.ones((LANES, LANES), jnp.bfloat16), -1)
    before = jax.lax.dot_general(
        tri, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (128, C, B)
    before = before.transpose(1, 0, 2)                 # (C, 128, B)
    ohf = oh.astype(jnp.float32)
    rank_in_chunk = jnp.sum(before * ohf, axis=2)      # (C, 128)
    counts = jnp.sum(ohf, axis=1)                      # (C, B)
    chunk_off = jnp.cumsum(counts, axis=0) - counts    # rows above, same bkt
    totals = jnp.sum(counts, axis=0)                   # (B,)
    base = jnp.cumsum(totals) - totals                 # bucket starts
    dest = (jnp.sum((base[None, None, :] + chunk_off[:, None, :]) * ohf,
                    axis=2)
            + rank_in_chunk)
    return dest.reshape(n).astype(jnp.int32)


def apply_lane_permutation(dest: jax.Array, arrays: Sequence,
                           mode: str = "scatter") -> list:
    """Move per-ray state to bucket-sorted order in ONE packed data movement
    per 4-byte dtype class.

    ``arrays`` are (N,) or (k, N) of f32/i32/u32; each 4-byte class is
    stacked into a single (N, K) payload so the scatter/gather pays its
    per-index overhead once for all K channels instead of once per plane
    (integers ride as an i32 pack — bit-preserving, no float reinterpret).
    ``mode='scatter'`` writes ``out[dest] = packed`` directly;
    ``mode='gather'`` inverts ``dest`` first (one extra small scatter) and
    reads ``packed[perm]`` — the two are bitwise identical, kept separate
    because their measured costs differ on TPU."""
    perm = None
    if mode == "gather":
        n = dest.shape[0]
        perm = jnp.zeros((n,), jnp.int32).at[dest].set(
            jnp.arange(n, dtype=jnp.int32), unique_indices=True,
            mode="promise_in_bounds")

    def move_pack(flats):
        packed = jnp.concatenate(flats, axis=0).T      # (N, K)
        if mode == "scatter":
            return jnp.zeros_like(packed).at[dest].set(
                packed, unique_indices=True, mode="promise_in_bounds").T
        return jnp.take(packed, perm, axis=0).T

    groups: dict = {}
    metas = []
    for a in arrays:
        flat = a[None, :] if a.ndim == 1 else a
        cls = "f" if jnp.issubdtype(flat.dtype, jnp.floating) else "i"
        if cls == "i":
            flat = flat.astype(jnp.int32) if flat.dtype != jnp.int32 else flat
        lst = groups.setdefault(cls, [])
        metas.append((cls, len(lst), a.ndim, a.dtype, flat.shape[0]))
        for r in flat:
            lst.append(r[None, :])
    moved = {cls: move_pack(lst) for cls, lst in groups.items()}
    out = []
    for cls, row, ndim, dtype, k in metas:
        piece = moved[cls][row:row + k]
        if cls == "i" and dtype != jnp.int32:
            piece = piece.astype(dtype)
        out.append(piece[0] if ndim == 1 else piece)
    return out


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
