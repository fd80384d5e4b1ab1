"""Ray-scene intersection ops.

TPU-native replacement for the reference's per-thread ``hit()`` dispatch
(``get_ray_collision`` src/raytracer.cu:24-46, ``Object::hit``
src/objects.cu:827-842). Two implementations share one contract:

- ``backend="xla"``: direct Möller–Trumbore / quadratic sphere tests as
  broadcast tensor expressions (src/objects.cu:135-163, 40-79). Always
  correct, runs on any JAX backend — this is the oracle path.
- ``backend="woop"``: ray×primitive work expressed as small matmuls using a
  precomputed world->barycentric affine transform per triangle, chunked over
  ray blocks and primitive tiles so intermediates stay cache-sized. This is
  the XLA fast path; the Pallas kernels in ``intersect_pallas.py`` implement
  the same contract tiled for VMEM.

The inner loops return only ``(t, index)`` per ray; normals/UVs are resolved
once per ray afterwards (``resolve_hit``) instead of per ray-primitive pair
— the wavefront analog of the reference computing full ``RayHitData`` for
every tested primitive.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..models.scene import SceneArrays
from ..utils.vec import EPS, INF, dot, normalize

# Chunking knobs: rays are processed RAY_CHUNK at a time; primitives are
# swept in tiles so the (chunk, tile) intermediates stay small.
RAY_CHUNK = 8192
PRIM_TILE = 512


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ b.T at full f32 precision.

    JAX's default matmul precision is bf16-grade on TPU (and can be on other
    backends too) — catastrophic for intersection geometry, where 1e-3
    relative error visibly warps surfaces. Every geometric contraction in
    this module goes through here with Precision.HIGHEST; the K dimension is
    3-4 so the extra MXU passes are nearly free.
    """
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HitRecord:
    """Nearest-hit result per ray (analog of RayCollision, src/raytracer.cu:18-21)."""

    t: jax.Array       # (N,) f32 distance (INF when no hit)
    hit: jax.Array     # (N,) bool
    is_tri: jax.Array  # (N,) bool (False => sphere)
    idx: jax.Array     # (N,) i32 primitive index within its pool


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShadeData:
    """Per-ray shading inputs resolved from the nearest hit."""

    point: jax.Array    # (N, 3) hit position
    normal: jax.Array   # (N, 3) normal with reference orientation semantics
    uv: jax.Array       # (N, 2) texture coordinates
    mat_id: jax.Array   # (N,) i32


# ---------------------------------------------------------------------------
# Sphere intersection
# ---------------------------------------------------------------------------

def sphere_hit_ts(o: jax.Array, d: jax.Array, centers: jax.Array,
                  radii: jax.Array) -> jax.Array:
    """Distances for every (ray, sphere) pair; INF where no hit.

    Quadratic solve keeping the nearer root (src/objects.cu:40-79). The
    d·center and o·center terms are (N,3)@(3,S) matmuls, so XLA can put the
    contraction on the MXU.
    """
    d_dot_c = _mm(d, centers)                              # (N, S)
    o_dot_c = _mm(o, centers)                              # (N, S)
    d_dot_o = jnp.sum(d * o, axis=-1, keepdims=True)       # (N, 1)
    o_sq = jnp.sum(o * o, axis=-1, keepdims=True)          # (N, 1)
    a = jnp.sum(d * d, axis=-1, keepdims=True)             # (N, 1)
    c_sq = jnp.sum(centers * centers, axis=-1)             # (S,)

    b = -2.0 * (d_dot_c - d_dot_o)
    c = c_sq - 2.0 * o_dot_c + o_sq - radii * radii

    disc = b * b - 4.0 * a * c
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sqrt_disc) / (2.0 * a)

    valid = (disc >= 0.0) & (t > EPS) & (radii > 0.0)
    return jnp.where(valid, t, INF)


# ---------------------------------------------------------------------------
# Triangle intersection
# ---------------------------------------------------------------------------

def triangle_hit_ts_mt(o: jax.Array, d: jax.Array, scene: SceneArrays) -> jax.Array:
    """Möller–Trumbore distances for every (ray, triangle) pair; INF on miss.

    Direct translation of the math (src/objects.cu:135-163) as a broadcast
    expression — the oracle path. O(N*T*3) memory; use only on small inputs.
    """
    v0 = scene.tri_v0[None, :, :]     # (1, T, 3)
    e1 = scene.tri_e1[None, :, :]
    e2 = scene.tri_e2[None, :, :]
    dn = d[:, None, :]                # (N, 1, 3)
    on = o[:, None, :]

    p_vec = jnp.cross(dn, e2)                       # (N, T, 3)
    det = jnp.sum(e1 * p_vec, axis=-1)              # (N, T)
    inv_det = 1.0 / det
    t_vec = on - v0
    u = jnp.sum(t_vec * p_vec, axis=-1) * inv_det
    q_vec = jnp.cross(t_vec, e1)
    v = jnp.sum(dn * q_vec, axis=-1) * inv_det
    w = 1.0 - u - v
    t = jnp.sum(e2 * q_vec, axis=-1) * inv_det

    cull_ok = _mm(d, scene.tri_cull) >= 0.0         # (N, T); 0-vector => 0 >= 0
    valid = (t > EPS) & (u >= 0.0) & (v >= 0.0) & (w >= 0.0)
    valid &= scene.tri_valid[None, :] & cull_ok
    return jnp.where(valid, t, INF)


def _woop_tile_ts(o_h: jax.Array, d_h: jax.Array, d: jax.Array,
                  wu: jax.Array, wv: jax.Array, ww: jax.Array,
                  cull: jax.Array, tri_ok: jax.Array) -> jax.Array:
    """Distances for a (ray chunk) x (triangle tile) block via matmuls.

    ``o_h``/``d_h`` are homogeneous rays (C, 4); ``wu/wv/ww`` are the tile's
    Woop rows (T, 4). Each barycentric component for all pairs is one
    (C,4)@(4,T) matmul — MXU-shaped with a tiny contraction dim.
    """
    ou = _mm(o_h, wu)
    ov = _mm(o_h, wv)
    ow = _mm(o_h, ww)
    du = _mm(d_h, wu)
    dv = _mm(d_h, wv)
    dw = _mm(d_h, ww)

    t = -ow / dw
    u = ou + t * du
    v = ov + t * dv

    cull_ok = _mm(d, cull) >= 0.0
    valid = (t > EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    valid &= tri_ok[None, :] & cull_ok
    return jnp.where(valid, t, INF)


# ---------------------------------------------------------------------------
# Nearest hit over the whole scene
# ---------------------------------------------------------------------------

def _pad_axis0(x: jax.Array, n: int) -> jax.Array:
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


def _best_over_pool(ts: jax.Array):
    """(N, P) pairwise distances -> (best_t, best_idx) per ray."""
    idx = jnp.argmin(ts, axis=-1).astype(jnp.int32)
    t = jnp.take_along_axis(ts, idx[:, None], axis=-1)[:, 0]
    return t, idx


def _nearest_hit_chunk(o: jax.Array, d: jax.Array, scene: SceneArrays,
                       backend: str) -> HitRecord:
    """Nearest hit for one chunk of rays."""
    n = o.shape[0]

    # Spheres: tile sweep with a running best.
    s = scene.sph_center.shape[0]
    s_pad = ((s + PRIM_TILE - 1) // PRIM_TILE) * PRIM_TILE
    if s <= PRIM_TILE:
        ts = sphere_hit_ts(o, d, scene.sph_center, scene.sph_radius)
        sph_t, sph_idx = _best_over_pool(ts)
    else:
        centers = _pad_axis0(scene.sph_center, s_pad).reshape(-1, PRIM_TILE, 3)
        radii = _pad_axis0(scene.sph_radius, s_pad).reshape(-1, PRIM_TILE)

        def sph_step(carry, tile):
            best_t, best_i, base = carry
            c, r = tile
            ts = sphere_hit_ts(o, d, c, r)
            t, i = _best_over_pool(ts)
            better = t < best_t
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, i + base, best_i)
            return (best_t, best_i, base + PRIM_TILE), None

        (sph_t, sph_idx, _), _ = jax.lax.scan(
            sph_step,
            (jnp.full((n,), INF), jnp.zeros((n,), jnp.int32), jnp.int32(0)),
            (centers, radii),
        )

    # Triangles.
    t_count = scene.tri_v0.shape[0]
    t_pad = ((t_count + PRIM_TILE - 1) // PRIM_TILE) * PRIM_TILE

    if backend == "xla" and t_count <= PRIM_TILE:
        ts = triangle_hit_ts_mt(o, d, scene)
        tri_t, tri_idx = _best_over_pool(ts)
    elif t_count <= PRIM_TILE:
        o_h = jnp.concatenate([o, jnp.ones((n, 1), o.dtype)], axis=-1)
        d_h = jnp.concatenate([d, jnp.zeros((n, 1), d.dtype)], axis=-1)
        ts = _woop_tile_ts(o_h, d_h, d, scene.tri_wu, scene.tri_wv,
                           scene.tri_ww, scene.tri_cull, scene.tri_valid)
        tri_t, tri_idx = _best_over_pool(ts)
    else:
        o_h = jnp.concatenate([o, jnp.ones((n, 1), o.dtype)], axis=-1)
        d_h = jnp.concatenate([d, jnp.zeros((n, 1), d.dtype)], axis=-1)
        wu = _pad_axis0(scene.tri_wu, t_pad).reshape(-1, PRIM_TILE, 4)
        wv = _pad_axis0(scene.tri_wv, t_pad).reshape(-1, PRIM_TILE, 4)
        ww = _pad_axis0(scene.tri_ww, t_pad).reshape(-1, PRIM_TILE, 4)
        cull = _pad_axis0(scene.tri_cull, t_pad).reshape(-1, PRIM_TILE, 3)
        ok = _pad_axis0(scene.tri_valid, t_pad).reshape(-1, PRIM_TILE)

        def tri_step(carry, tile):
            best_t, best_i, base = carry
            ts = _woop_tile_ts(o_h, d_h, d, *tile)
            t, i = _best_over_pool(ts)
            better = t < best_t
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, i + base, best_i)
            return (best_t, best_i, base + PRIM_TILE), None

        (tri_t, tri_idx, _), _ = jax.lax.scan(
            tri_step,
            (jnp.full((n,), INF), jnp.zeros((n,), jnp.int32), jnp.int32(0)),
            (wu, wv, ww, cull, ok),
        )

    # Merge the two pools. The reference keeps `<=` so a later-listed object
    # wins ties (src/raytracer.cu:36); ties are measure-zero, we take spheres
    # first to match their typical scene ordering.
    is_tri = tri_t < sph_t
    t = jnp.where(is_tri, tri_t, sph_t)
    idx = jnp.where(is_tri, tri_idx, sph_idx)
    return HitRecord(t=t, hit=t < INF, is_tri=is_tri, idx=idx)


def nearest_hit(o: jax.Array, d: jax.Array, scene: SceneArrays,
                backend: str = "woop") -> HitRecord:
    """Nearest hit over all scene primitives for rays ``o``/``d`` (N, 3)."""
    n = o.shape[0]
    if n <= RAY_CHUNK:
        return _nearest_hit_chunk(o, d, scene, backend)

    chunk = RAY_CHUNK
    n_pad = ((n + chunk - 1) // chunk) * chunk
    o_p = _pad_axis0(o, n_pad).reshape(-1, chunk, 3)
    # Pad directions with a unit vector so normalisation math stays finite.
    d_p = jnp.concatenate(
        [d, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], d.dtype), (n_pad - n, 3))],
        axis=0,
    ).reshape(-1, chunk, 3) if n_pad != n else d.reshape(-1, chunk, 3)

    rec = jax.lax.map(
        lambda args: _nearest_hit_chunk(args[0], args[1], scene, backend),
        (o_p, d_p),
    )
    flat = jax.tree_util.tree_map(lambda x: x.reshape(-1, *x.shape[2:])[:n], rec)
    return flat


# ---------------------------------------------------------------------------
# Shading-data resolution (once per ray, post argmin)
# ---------------------------------------------------------------------------

def resolve_hit(o: jax.Array, d: jax.Array, scene: SceneArrays,
                rec: HitRecord) -> ShadeData:
    """Gather normals/UVs/material for each ray's nearest primitive.

    Normal orientation matches the reference exactly: spheres keep the
    outward normal (src/objects.cu:66) — even when hit from inside — while
    triangles flip theirs to face against the ray (src/objects.cu:158).
    ``Ray::refract`` depends on this asymmetry (src/ray.cu:84-96).
    """
    safe_t = jnp.where(rec.hit, rec.t, 0.0)
    point = o + d * safe_t[:, None]
    tri_i = jnp.where(rec.is_tri, rec.idx, 0)
    sph_i = jnp.where(rec.is_tri, 0, rec.idx)

    # Sphere shading data.
    center = scene.sph_center[sph_i]
    radius = jnp.maximum(scene.sph_radius[sph_i], 1e-12)
    sph_normal = normalize(point - center)
    # Lat/long UV with branchless longitude wrap (src/objects.cu:82-97).
    rel = (point - center) / radius[:, None]
    theta = jnp.arcsin(jnp.clip(rel[:, 1], -1.0, 1.0))
    phi = jnp.arccos(jnp.clip(rel[:, 0], -1.0, 1.0))
    u_s = (theta + jnp.pi / 2.0) / jnp.pi
    v_ratio = (1.0 - phi / jnp.pi) / 2.0
    behind = (point[:, 2] > center[:, 2]).astype(jnp.float32)
    v_s = behind + (1.0 - 2.0 * behind) * v_ratio
    sph_uv = jnp.stack([u_s, v_s], axis=-1)

    # Triangle shading data: re-evaluate barycentrics for the single best
    # triangle via its Woop rows (two 4-dots per ray).
    wu = scene.tri_wu[tri_i]
    wv = scene.tri_wv[tri_i]
    o_h = jnp.concatenate([o, jnp.ones((o.shape[0], 1), o.dtype)], axis=-1)
    d_h = jnp.concatenate([d, jnp.zeros((d.shape[0], 1), d.dtype)], axis=-1)
    u_b = dot(o_h, wu) + safe_t * dot(d_h, wu)
    v_b = dot(o_h, wv) + safe_t * dot(d_h, wv)
    w_b = 1.0 - u_b - v_b
    # Barycentric interpolation with the reference's argument order
    # (src/objects.cu:160,196-199): uv = uv0*w + uv1*u + uv2*v.
    tri_uv = (
        scene.tri_uv0[tri_i] * w_b[:, None]
        + scene.tri_uv1[tri_i] * u_b[:, None]
        + scene.tri_uv2[tri_i] * v_b[:, None]
    )
    n_geom = scene.tri_normal[tri_i]
    flip = 1.0 - 2.0 * (dot(n_geom, d) > 0.0).astype(jnp.float32)
    tri_normal = n_geom * flip[:, None]

    is_tri = rec.is_tri[:, None]
    normal = jnp.where(is_tri, tri_normal, sph_normal)
    uv = jnp.where(is_tri, tri_uv, sph_uv)
    mat_id = jnp.where(rec.is_tri, scene.tri_mat[tri_i], scene.sph_mat[sph_i])
    return ShadeData(point=point, normal=normal, uv=uv, mat_id=mat_id)
