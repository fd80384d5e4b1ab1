"""Ray-scene intersection ops (SoA layout).

TPU-native replacement for the reference's per-thread ``hit()`` dispatch
(``get_ray_collision`` src/raytracer.cu:24-46, ``Object::hit``
src/objects.cu:827-842).

**Layout**: all per-ray vectors are structure-of-arrays ``(3, N)`` — N rides
the TPU lane dimension. An ``(N, 3)`` array would pad its trailing dim 3 to
128 lanes, wasting ~40x bandwidth on every op; this layout choice is worth
more than any kernel micro-optimisation.

Three backends share one contract:

- ``backend="xla"``: direct Möller–Trumbore / quadratic sphere tests as
  broadcast tensor expressions (src/objects.cu:135-163, 40-79). Always
  correct, runs anywhere — the oracle path.
- ``backend="woop"``: ray x primitive work as (N,4)x(4,T) matmuls using a
  precomputed world->barycentric affine transform per triangle, swept over
  primitive tiles with a running best so intermediates stay bounded.
- ``backend="pallas"``: the sweep kernel in ``intersect_pallas.py`` —
  fastest on real TPUs.

The inner loops return only ``(t, index)`` per ray; normals/UVs are resolved
once per ray afterwards (``resolve_hit``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.scene import SceneArrays
from ..utils.vec import EPS, INF

# Primitive pools are swept in tiles of this size (bounds the (N, TILE)
# intermediates and matches the eventual Pallas tiling).
PRIM_TILE = 512

# Rays are processed in chunks of this size so the (chunk, PRIM_TILE)
# pairwise intermediates stay tens of MB instead of GBs.
RAY_CHUNK = 32768


def _mm_t(a: jax.Array, b: jax.Array) -> jax.Array:
    """(K, N) x (K, T) -> (N, T), contracting K, at full f32 precision.

    JAX's default matmul precision is bf16-grade on TPU — catastrophic for
    intersection geometry (1e-3 relative error visibly warps surfaces).
    Every geometric contraction goes through here with Precision.HIGHEST;
    K is 3-4 so the extra passes are nearly free.
    """
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((0,), (0,)), ((), ())),
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
    """Per-ray shading inputs resolved from the nearest hit (SoA).

    colour/smooth are the winning primitive's denormalised material
    parameters (the reference keeps a full Material per object,
    src/objects.cu:813-820); the refractive index is a per-material property
    and rides the behaviour table (ops.tables.MatCols.ior)."""

    point: jax.Array    # (3, N) hit position
    normal: jax.Array   # (3, N) normal with reference orientation semantics
    u: jax.Array        # (N,) texture coordinate u
    v: jax.Array        # (N,) texture coordinate v
    mat_id: jax.Array   # (N,) i32
    colour: jax.Array   # (3, N) const-texture colour
    smooth: jax.Array   # (N,) smoothness


# ---------------------------------------------------------------------------
# Sphere intersection
# ---------------------------------------------------------------------------

def sphere_hit_ts(o: jax.Array, d: jax.Array, centers: jax.Array,
                  radii: jax.Array) -> jax.Array:
    """Distances for every (ray, sphere) pair; INF where no hit.

    ``o``/``d`` are (3, N); ``centers`` (S, 3). Quadratic solve keeping the
    nearer root (src/objects.cu:40-79). The d.c and o.c terms are
    (3,N)x(3,S) contractions -> MXU.
    """
    c_t = centers.T  # (3, S)
    d_dot_c = _mm_t(d, c_t)                            # (N, S)
    o_dot_c = _mm_t(o, c_t)                            # (N, S)
    d_dot_o = jnp.sum(d * o, axis=0)[:, None]          # (N, 1)
    o_sq = jnp.sum(o * o, axis=0)[:, None]             # (N, 1)
    a = jnp.sum(d * d, axis=0)[:, None]                # (N, 1)
    c_sq_min_r2 = jnp.sum(centers * centers, axis=-1) - radii * radii  # (S,)

    b = -2.0 * (d_dot_c - d_dot_o)
    c = c_sq_min_r2 - 2.0 * o_dot_c + o_sq

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
    expression over (N, T, 3) — the oracle path for small inputs only.
    ``o``/``d`` are (3, N).
    """
    v0 = scene.tri_v0[None, :, :]     # (1, T, 3)
    e1 = scene.tri_e1[None, :, :]
    e2 = scene.tri_e2[None, :, :]
    dn = d.T[:, None, :]              # (N, 1, 3)
    on = o.T[:, None, :]

    p_vec = jnp.cross(dn, e2)                       # (N, T, 3)
    det = jnp.sum(e1 * p_vec, axis=-1)              # (N, T)
    inv_det = 1.0 / det
    t_vec = on - v0
    u = jnp.sum(t_vec * p_vec, axis=-1) * inv_det
    q_vec = jnp.cross(t_vec, e1)
    v = jnp.sum(dn * q_vec, axis=-1) * inv_det
    w = 1.0 - u - v
    t = jnp.sum(e2 * q_vec, axis=-1) * inv_det

    cull_ok = _mm_t(d, scene.tri_cull.T) >= 0.0     # (N, T); 0-vector passes
    valid = (t > EPS) & (u >= 0.0) & (v >= 0.0) & (w >= 0.0)
    valid &= scene.tri_valid[None, :] & cull_ok
    return jnp.where(valid, t, INF)


def _woop_tile_ts(o_h: jax.Array, d_h: jax.Array,
                  wu: jax.Array, wv: jax.Array, ww: jax.Array,
                  cull: jax.Array, tri_ok: jax.Array) -> jax.Array:
    """Distances for (all rays) x (triangle tile) via matmuls.

    ``o_h``/``d_h`` are homogeneous rays (4, N) ([x,y,z,1] / [x,y,z,0]);
    ``wu/wv/ww`` are the tile's Woop rows (T, 4). Each barycentric component
    for all pairs is one (4,N)x(4,T) contraction — MXU-shaped.
    """
    ou = _mm_t(o_h, wu.T)
    ov = _mm_t(o_h, wv.T)
    ow = _mm_t(o_h, ww.T)
    du = _mm_t(d_h, wu.T)
    dv = _mm_t(d_h, wv.T)
    dw = _mm_t(d_h, ww.T)

    t = -ow / dw
    u = ou + t * du
    v = ov + t * dv

    cull_ok = _mm_t(d_h[:3], cull.T) >= 0.0
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
    t = jnp.min(ts, axis=-1)
    return t, idx


def nearest_hit(o: jax.Array, d: jax.Array, scene: SceneArrays,
                backend: str = "woop") -> HitRecord:
    """Nearest hit over all scene primitives. ``o``/``d`` are (3, N).

    Backends: "pallas" (TPU sweep kernel — fastest), "woop" (XLA matmul
    formulation), "xla" (direct Möller–Trumbore oracle).
    """
    if backend == "pallas":
        from .intersect_pallas import nearest_hit_pallas
        return nearest_hit_pallas(o, d, scene)
    n = o.shape[1]
    if n > RAY_CHUNK:
        n_pad = ((n + RAY_CHUNK - 1) // RAY_CHUNK) * RAY_CHUNK
        if n_pad != n:
            # pad with unit-x rays so all math stays finite
            pad_o = jnp.zeros((3, n_pad - n), o.dtype)
            pad_d = jnp.zeros((3, n_pad - n), d.dtype).at[0].set(1.0)
            o = jnp.concatenate([o, pad_o], axis=1)
            d = jnp.concatenate([d, pad_d], axis=1)
        o_c = o.reshape(3, -1, RAY_CHUNK).swapaxes(0, 1)   # (C, 3, chunk)
        d_c = d.reshape(3, -1, RAY_CHUNK).swapaxes(0, 1)
        rec = jax.lax.map(
            lambda args: _nearest_hit_all(args[0], args[1], scene, backend),
            (o_c, d_c),
        )
        return jax.tree_util.tree_map(
            lambda x: x.reshape(-1, *x.shape[2:])[:n], rec)
    return _nearest_hit_all(o, d, scene, backend)


def _nearest_hit_all(o: jax.Array, d: jax.Array, scene: SceneArrays,
                     backend: str) -> HitRecord:
    n = o.shape[1]

    # Spheres: tile sweep with a running best.
    s = scene.sph_center.shape[0]
    if s <= PRIM_TILE:
        ts = sphere_hit_ts(o, d, scene.sph_center, scene.sph_radius)
        sph_t, sph_idx = _best_over_pool(ts)
    else:
        s_pad = ((s + PRIM_TILE - 1) // PRIM_TILE) * PRIM_TILE
        centers = _pad_axis0(scene.sph_center, s_pad).reshape(-1, PRIM_TILE, 3)
        radii = _pad_axis0(scene.sph_radius, s_pad).reshape(-1, PRIM_TILE)

        def sph_step(carry, tile):
            best_t, best_i, base = carry
            c, r = tile
            t, i = _best_over_pool(sphere_hit_ts(o, d, c, r))
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
    ones = jnp.ones((1, n), o.dtype)
    zeros = jnp.zeros((1, n), d.dtype)
    o_h = jnp.concatenate([o, ones], axis=0)   # (4, N)
    d_h = jnp.concatenate([d, zeros], axis=0)  # (4, N)

    if backend == "xla" and t_count <= PRIM_TILE:
        ts = triangle_hit_ts_mt(o, d, scene)
        tri_t, tri_idx = _best_over_pool(ts)
    elif t_count <= PRIM_TILE:
        ts = _woop_tile_ts(o_h, d_h, scene.tri_wu, scene.tri_wv,
                           scene.tri_ww, scene.tri_cull, scene.tri_valid)
        tri_t, tri_idx = _best_over_pool(ts)
    else:
        t_pad = ((t_count + PRIM_TILE - 1) // PRIM_TILE) * PRIM_TILE
        wu = _pad_axis0(scene.tri_wu, t_pad).reshape(-1, PRIM_TILE, 4)
        wv = _pad_axis0(scene.tri_wv, t_pad).reshape(-1, PRIM_TILE, 4)
        ww = _pad_axis0(scene.tri_ww, t_pad).reshape(-1, PRIM_TILE, 4)
        cull = _pad_axis0(scene.tri_cull, t_pad).reshape(-1, PRIM_TILE, 3)
        ok = _pad_axis0(scene.tri_valid, t_pad).reshape(-1, PRIM_TILE)

        def tri_step(carry, tile):
            best_t, best_i, base = carry
            t, i = _best_over_pool(_woop_tile_ts(o_h, d_h, *tile))
            better = t < best_t
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, i + base, best_i)
            return (best_t, best_i, base + PRIM_TILE), None

        (tri_t, tri_idx, _), _ = jax.lax.scan(
            tri_step,
            (jnp.full((n,), INF), jnp.zeros((n,), jnp.int32), jnp.int32(0)),
            (wu, wv, ww, cull, ok),
        )

    # Merge the two pools (ties are measure-zero; spheres win, matching the
    # reference's typical listing order under its `<=` rule,
    # src/raytracer.cu:36).
    is_tri = tri_t < sph_t
    t = jnp.where(is_tri, tri_t, sph_t)
    idx = jnp.where(is_tri, tri_idx, sph_idx)
    return HitRecord(t=t, hit=t < INF, is_tri=is_tri, idx=idx)


# ---------------------------------------------------------------------------
# Shading-data resolution (once per ray, post argmin)
# ---------------------------------------------------------------------------

def resolve_hit(o: jax.Array, d: jax.Array, scene: SceneArrays,
                rec: HitRecord) -> ShadeData:
    """Gather normals/UVs/material for each ray's nearest primitive.

    ``o``/``d`` are (3, N). Normal orientation matches the reference
    exactly: spheres keep the outward normal (src/objects.cu:66) — even when
    hit from inside — while triangles flip theirs to face against the ray
    (src/objects.cu:158). ``Ray::refract`` depends on this asymmetry
    (src/ray.cu:84-96).

    All gathers are per-component from (pool,) tables so nothing touches a
    lane-padded (N, 3) layout.
    """
    safe_t = jnp.where(rec.hit, rec.t, 0.0)
    point = o + d * safe_t[None, :]                    # (3, N)
    tri_i = jnp.where(rec.is_tri, rec.idx, 0)
    sph_i = jnp.where(rec.is_tri, 0, rec.idx)

    # --- sphere shading data (component-wise gathers) ---
    sc = scene.sph_center.T                            # (3, S) small
    cx, cy, cz = sc[0][sph_i], sc[1][sph_i], sc[2][sph_i]
    radius = jnp.maximum(scene.sph_radius[sph_i], 1e-12)
    inv_r = 1.0 / radius
    relx = (point[0] - cx) * inv_r
    rely = (point[1] - cy) * inv_r
    relz = (point[2] - cz) * inv_r
    # outward normal = (p - c)/|p - c| (src/objects.cu:66); rel is already
    # ~unit, normalise to match the reference's explicit normalisation.
    rmag = jnp.sqrt(relx * relx + rely * rely + relz * relz)
    sph_nx, sph_ny, sph_nz = relx / rmag, rely / rmag, relz / rmag
    # Lat/long UV with branchless longitude wrap (src/objects.cu:82-97).
    theta = jnp.arcsin(jnp.clip(rely, -1.0, 1.0))
    phi = jnp.arccos(jnp.clip(relx, -1.0, 1.0))
    sph_u = (theta + jnp.pi / 2.0) / jnp.pi
    v_ratio = (1.0 - phi / jnp.pi) / 2.0
    behind = (point[2] > cz).astype(jnp.float32)
    sph_v = behind + (1.0 - 2.0 * behind) * v_ratio

    # --- triangle shading data ---
    # Re-evaluate barycentrics for the single best triangle via its Woop
    # rows (two 4-dots per ray).
    wu = scene.tri_wu.T                                # (4, T) small
    wv = scene.tri_wv.T
    wu0, wu1, wu2, wu3 = (wu[k][tri_i] for k in range(4))
    wv0, wv1, wv2, wv3 = (wv[k][tri_i] for k in range(4))
    ou = wu0 * o[0] + wu1 * o[1] + wu2 * o[2] + wu3
    ov = wv0 * o[0] + wv1 * o[1] + wv2 * o[2] + wv3
    du = wu0 * d[0] + wu1 * d[1] + wu2 * d[2]
    dv = wv0 * d[0] + wv1 * d[1] + wv2 * d[2]
    u_b = ou + safe_t * du
    v_b = ov + safe_t * dv
    w_b = 1.0 - u_b - v_b
    # Barycentric interpolation with the reference's argument order
    # (src/objects.cu:160,196-199): uv = uv0*w + uv1*u + uv2*v.
    uv0 = scene.tri_uv0.T                              # (2, T)
    uv1 = scene.tri_uv1.T
    uv2 = scene.tri_uv2.T
    tri_u = uv0[0][tri_i] * w_b + uv1[0][tri_i] * u_b + uv2[0][tri_i] * v_b
    tri_v = uv0[1][tri_i] * w_b + uv1[1][tri_i] * u_b + uv2[1][tri_i] * v_b
    tn = scene.tri_normal.T                            # (3, T)
    nx, ny, nz = tn[0][tri_i], tn[1][tri_i], tn[2][tri_i]
    # Branchless flip to face against the ray (src/objects.cu:158).
    n_dot_d = nx * d[0] + ny * d[1] + nz * d[2]
    flip = 1.0 - 2.0 * (n_dot_d > 0.0).astype(jnp.float32)
    tri_nx, tri_ny, tri_nz = nx * flip, ny * flip, nz * flip

    it = rec.is_tri
    normal = jnp.stack([
        jnp.where(it, tri_nx, sph_nx),
        jnp.where(it, tri_ny, sph_ny),
        jnp.where(it, tri_nz, sph_nz),
    ])
    u = jnp.where(it, tri_u, sph_u)
    v = jnp.where(it, tri_v, sph_v)
    mat_id = jnp.where(it, scene.tri_mat[tri_i], scene.sph_mat[sph_i])
    # denormalised per-primitive material params (component-wise gathers)
    tcol = scene.tri_colour.T
    scol = scene.sph_colour.T
    colour = jnp.stack([
        jnp.where(it, tcol[c][tri_i], scol[c][sph_i]) for c in range(3)])
    smooth = jnp.where(it, scene.tri_smooth[tri_i], scene.sph_smooth[sph_i])
    return ShadeData(point=point, normal=normal, u=u, v=v, mat_id=mat_id,
                     colour=colour, smooth=smooth)
