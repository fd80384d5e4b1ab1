"""Counter-based RNG for the renderer.

TPU-native replacement for the reference's stateful PCG hash + Box-Muller
(src/utils.cu:220-239). The reference seeds each pixel thread from wall-clock
milliseconds (src/raytracer.cu:127), making renders non-reproducible; here
every random draw is derived from a threefry key folded with
``(frame, sample, pixel, bounce)``. Renders are therefore bitwise
reproducible AND shard/chunk-invariant: a ray's random stream depends only on
its *global* pixel index, not on which device or ray-chunk processes it —
which is what lets the multi-chip tests assert sharded == single-device
exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def frame_key(base_key: jax.Array, frame_num) -> jax.Array:
    """Key for one progressive frame."""
    return jax.random.fold_in(base_key, frame_num)


def sample_key(fkey: jax.Array, sample_idx) -> jax.Array:
    """Key for one of the spp samples inside a frame."""
    return jax.random.fold_in(fkey, sample_idx)


def per_ray_keys(key: jax.Array, ray_idx: jax.Array) -> jax.Array:
    """One key per ray, folded with the ray's global pixel index: (N,) keys.

    The analog of the reference's per-pixel seed
    ``array_index*3145739 + time*6291469`` (src/raytracer.cu:127), but
    collision-free and deterministic.
    """
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(ray_idx)


def bounce_randoms(ray_keys: jax.Array, bounce_idx, with_rr: bool = False):
    """All randoms one bounce needs, drawn per-ray (SoA).

    Returns (jitter_u3 (3, N) uniform [0,1), gauss (3, N) standard normal,
    fresnel_u (N,) uniform [0,1)) — consumed by the antialias jitter
    (src/ray.cu:130-142), the Lambertian sample (src/ray.cu:157-170), and the
    Schlick reflection test (src/ray.cu:108). Component-scalar draws keep
    every array lane-major (no (N, 3) layouts).

    ``with_rr=True`` appends an independent (N,) uniform for the russian-
    roulette survival test as a fourth element — drawn from an 8th split so
    the first seven streams are bitwise unchanged whether or not RR is on.
    """
    def draw(k):
        kb = jax.random.fold_in(k, bounce_idx)
        ks = jax.random.split(kb, 8 if with_rr else 7)
        out = (jax.random.uniform(ks[0], (), jnp.float32),
               jax.random.uniform(ks[1], (), jnp.float32),
               jax.random.uniform(ks[2], (), jnp.float32),
               jax.random.normal(ks[3], (), jnp.float32),
               jax.random.normal(ks[4], (), jnp.float32),
               jax.random.normal(ks[5], (), jnp.float32),
               jax.random.uniform(ks[6], (), jnp.float32))
        if with_rr:
            out = out + (jax.random.uniform(ks[7], (), jnp.float32),)
        return out

    drawn = jax.vmap(draw)(ray_keys)
    ux, uy, uz, gx, gy, gz, fres = drawn[:7]
    out = (jnp.stack([ux, uy, uz]), jnp.stack([gx, gy, gz]), fres)
    return out + (drawn[7],) if with_rr else out


def lane_randoms(base_keys: jax.Array, sample_i: jax.Array,
                 bounce_i: jax.Array, with_rr: bool = False):
    """Per-lane randoms for the regeneration sampler.

    Like ``bounce_randoms`` but the sample and bounce indices vary per lane
    (each lane may be on a different sample of its pixel). Streams stay
    functions of (pixel, sample, bounce) only — deterministic and
    shard-invariant.
    """
    def draw(k, s, b):
        kb = jax.random.fold_in(jax.random.fold_in(k, s), b)
        ks = jax.random.split(kb, 8 if with_rr else 7)
        out = (jax.random.uniform(ks[0], (), jnp.float32),
               jax.random.uniform(ks[1], (), jnp.float32),
               jax.random.uniform(ks[2], (), jnp.float32),
               jax.random.normal(ks[3], (), jnp.float32),
               jax.random.normal(ks[4], (), jnp.float32),
               jax.random.normal(ks[5], (), jnp.float32),
               jax.random.uniform(ks[6], (), jnp.float32))
        if with_rr:
            out = out + (jax.random.uniform(ks[7], (), jnp.float32),)
        return out

    drawn = jax.vmap(draw)(base_keys, sample_i, bounce_i)
    ux, uy, uz, gx, gy, gz, fres = drawn[:7]
    out = (jnp.stack([ux, uy, uz]), jnp.stack([gx, gy, gz]), fres)
    return out + (drawn[7],) if with_rr else out


def tile_randoms(it_key: jax.Array, n: int,
                 tile: int = 1024, with_rr: bool = False):
    """Coherent sampling: ONE random bundle per ``tile`` consecutive lanes.

    Same return contract as ``bounce_randoms`` but every lane in a
    1024-lane group (= one Pallas sweep tile) reads the same values, keyed
    by the caller's per-iteration key. Each pixel's marginal distribution
    is unchanged — its successive draws come from distinct iteration keys —
    only cross-pixel covariance within a tile changes; post-diffuse
    directions then cluster by surface normal, keeping the tile-sweep's
    union gate footprints tight (structured/coherent path sampling, the
    wavefront analog of the megakernel's RAYTRACER_COHERENT mode).
    Trades bitwise shard-invariance (streams are tile-keyed, not
    pixel-keyed) for divergent-scene throughput; opt-in only.
    """
    nt = -(-n // tile)
    ks = jax.random.split(it_key, 4 if with_rr else 3)
    rep = lambda a: jnp.repeat(a, tile, axis=-1)[..., :n]
    out = (rep(jax.random.uniform(ks[0], (3, nt), jnp.float32)),
           rep(jax.random.normal(ks[1], (3, nt), jnp.float32)),
           rep(jax.random.uniform(ks[2], (nt,), jnp.float32)))
    if with_rr:
        out = out + (rep(jax.random.uniform(ks[3], (nt,), jnp.float32)),)
    return out


def uniform3(key: jax.Array, shape) -> jax.Array:
    """Uniform [0, 1) triples, shape ``shape + (3,)``."""
    return jax.random.uniform(key, tuple(shape) + (3,), dtype=jnp.float32)


def normal3(key: jax.Array, shape) -> jax.Array:
    """Standard normal triples (replaces Box-Muller, src/utils.cu:234-239)."""
    return jax.random.normal(key, tuple(shape) + (3,), dtype=jnp.float32)


def uniform1(key: jax.Array, shape) -> jax.Array:
    return jax.random.uniform(key, tuple(shape), dtype=jnp.float32)
