"""Cost model for lane-granular ray re-binning (run on one TPU chip).

Measures the two halves of a per-ray counting-sort rebin at frame scale
(N = 800k rays, the 1000x800 reference workload):

  1. permutation build (ops/rebin.lane_destinations — MXU matmul ranks)
  2. applying it: ONE packed (N, K) scatter or gather for all K state
     channels, vs K separate per-plane gathers (the ~7 ms/800k floor that
     killed earlier designs), vs the row-granular permute (the cheap but
     divergence-neutral baseline).

The decision these numbers feed: a bounce-synchronous wavefront sampler
re-bins rays once per secondary bounce; with B bounces, S spp and the
divergent-scene sweep going from ~12 Mrays/s (union-footprint-bound) to
coherent-tile rates (>~300), the rebin pays iff
(build + apply) * S * (B-1) stays well under the sweep time saved.

Usage: python benchmarks/rebin_cost.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.ops.rebin import (LANE_BUCKETS, apply_lane_permutation,
                                     lane_destinations, permute_rows)


def timed(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))   # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3   # ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    n = (n // 128) * 128
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, LANE_BUCKETS, n), jnp.int32)
    dest = jax.jit(lane_destinations)(key)
    print(f"N = {n}, buckets = {LANE_BUCKETS}, "
          f"device = {jax.devices()[0].platform}")

    t_build = timed(jax.jit(lane_destinations), key)
    print(f"build lane_destinations        : {t_build:8.3f} ms")

    for k in (1, 4, 11, 16):
        arrs = [jnp.asarray(rng.normal(size=(k, n)), jnp.float32)]
        t_s = timed(jax.jit(lambda d_, a: apply_lane_permutation(
            d_, [a], mode="scatter")), dest, arrs[0])
        t_g = timed(jax.jit(lambda d_, a: apply_lane_permutation(
            d_, [a], mode="gather")), dest, arrs[0])
        print(f"apply K={k:2d} packed scatter     : {t_s:8.3f} ms   "
              f"gather: {t_g:8.3f} ms")

    # the old per-plane floor: K separate 1-channel gathers
    one = jnp.asarray(rng.normal(size=n), jnp.float32)
    perm = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32))
    t_pp = timed(jax.jit(lambda p, a: jnp.take(a, p)), perm, one)
    print(f"per-plane 1-channel gather     : {t_pp:8.3f} ms  (x K planes)")

    # row-granular baseline (moves (R,128) rows)
    rows = n // 128
    rperm = jnp.asarray(rng.permutation(rows), jnp.int32)
    t_row = timed(jax.jit(permute_rows), rperm, one)
    print(f"row-granular permute (1 plane) : {t_row:8.3f} ms")

    # scatter-add of radiance back to home pixels (wave end)
    home = jnp.asarray(rng.permutation(n), jnp.int32)
    rad = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    t_sc = timed(jax.jit(lambda h, r: jnp.zeros((n, 3), jnp.float32)
                         .at[h].add(r)), home, rad)
    print(f"home scatter-add (N,3)         : {t_sc:8.3f} ms")


if __name__ == "__main__":
    main()
