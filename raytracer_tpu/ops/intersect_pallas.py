"""Pallas TPU kernels for nearest-hit intersection + shading resolution.

TPU-native replacement for the hot half of the reference megakernel: the
per-thread linear scan over scene primitives (``get_ray_collision``,
src/raytracer.cu:24-46). One grid step owns a tile of rays resident in
vector registers; the kernel sweeps every primitive with broadcast scalars
from SMEM, keeping a running best — the full N x P pair matrix never touches
HBM, and the winner's *shading parameters* (UV, normal/center, material id)
are selected during the sweep, so the wavefront needs no per-ray gathers
afterwards (XLA gathers cost ~7 ms per 800k rays on v5e — they were the
dominant cost of the pure-XLA path).

Ray layout: component planes (R, 128) where R = N/128 — each block is a
(ROWS, 128) vreg tile.

Contract matches ops.intersect.nearest_hit / resolve_hit: same validity
semantics (t > EPS, one-way culling, sphere nearer-root only), same normal
orientation conventions (sphere outward, triangle flipped against the ray).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import SceneArrays
from ..utils.vec import INF
from .intersect import HitRecord, ShadeData

# Python-float constants: jnp scalars would be captured as kernel consts.
_EPS = 1e-6
_INF = 1e30

LANES = 128
ROWS = 32          # rays per tile = ROWS * LANES = 4096 (measured best)
RAY_TILE = ROWS * LANES

# sphere pack rows (incl. denormalised per-primitive material params)
(_S_CX, _S_CY, _S_CZ, _S_R, _S_CR2, _S_OK, _S_MAT,
 _S_COLR, _S_COLG, _S_COLB, _S_SMOOTH, _S_IOR) = range(12)
_S_ROWS = 12
# triangle pack rows
_T_WU = 0            # 4 rows
_T_WV = 4            # 4 rows
_T_WW = 8            # 4 rows
_T_CULL = 12         # 3 rows
_T_OK = 15
_T_UV = 16           # 6 rows: uv0.x uv0.y uv1.x uv1.y uv2.x uv2.y
_T_NRM = 22          # 3 rows
_T_MAT = 25
_T_COLR, _T_COLG, _T_COLB, _T_SMOOTH, _T_IOR = range(26, 31)
_T_ROWS = 31


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (tests on CPU backend)."""
    return jax.default_backend() != "tpu"


def safe_inv_dir(dx, dy, dz):
    """Robust slab-test reciprocals: a zero direction component maps to a
    large finite value instead of inf, so (box_bound - origin) * inv never
    produces 0 * inf = NaN (which would make every comparison false and
    wrongly cull a cluster a boundary ray actually enters)."""
    def inv(c):
        return jnp.where(c == 0.0, _INF, 1.0 / c)
    return inv(dx), inv(dy), inv(dz)


def pack_scene(scene: SceneArrays):
    """Pack primitive SoA into kernel-friendly row matrices (SMEM-resident).

    Per-primitive material params (colour / smoothness / IOR) ride along,
    mirroring the reference's per-object Material copies
    (src/objects.cu:813-820)."""
    sph = jnp.stack([
        scene.sph_center[:, 0],
        scene.sph_center[:, 1],
        scene.sph_center[:, 2],
        scene.sph_radius,
        jnp.sum(scene.sph_center * scene.sph_center, axis=-1)
        - scene.sph_radius * scene.sph_radius,
        (scene.sph_radius > 0).astype(jnp.float32),
        scene.sph_mat.astype(jnp.float32),
        scene.sph_colour[:, 0],
        scene.sph_colour[:, 1],
        scene.sph_colour[:, 2],
        scene.sph_smooth,
        scene.sph_ior,
    ])
    tri = jnp.concatenate([
        scene.tri_wu.T,                                    # 0-3
        scene.tri_wv.T,                                    # 4-7
        scene.tri_ww.T,                                    # 8-11
        scene.tri_cull.T,                                  # 12-14
        scene.tri_valid.astype(jnp.float32)[None, :],      # 15
        scene.tri_uv0.T,                                   # 16-17
        scene.tri_uv1.T,                                   # 18-19
        scene.tri_uv2.T,                                   # 20-21
        scene.tri_normal.T,                                # 22-24
        scene.tri_mat.astype(jnp.float32)[None, :],        # 25
        scene.tri_colour.T,                                # 26-28
        scene.tri_smooth[None, :],                         # 29
        scene.tri_ior[None, :],                            # 30
    ], axis=0)

    def clusters_or_dummy(c):
        return c if c.shape[0] > 0 else jnp.zeros((1, 8), jnp.float32)

    return (sph, tri, clusters_or_dummy(scene.sph_clusters),
            clusters_or_dummy(scene.tri_clusters),
            clusters_or_dummy(scene.sph_supers),
            clusters_or_dummy(scene.tri_supers))


def _kernel(sph_ref, tri_ref, sphc_ref, tric_ref, sphs_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            t_ref, code_ref, u_ref, v_ref, n0_ref, n1_ref, n2_ref, aux_ref,
            mat_ref, colr_ref, colg_ref, colb_ref, smooth_ref, ior_ref,
            *extra_refs, num_spheres: int, num_tris: int,
            num_sph_clusters: int, num_tri_clusters: int,
            num_sph_supers: int, num_tri_supers: int,
            has_one_way: bool = True, needs_tri_uv: bool = True,
            with_stats: bool = False):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # per-ray invariants
    ddo = dx * ox + dy * oy + dz * oz
    osq = ox * ox + oy * oy + oz * oz
    a = dx * dx + dy * dy + dz * dz
    inv_2a = 0.5 / a
    if num_sph_clusters > 0 or num_tri_clusters > 0:
        inv_dx, inv_dy, inv_dz = safe_inv_dir(dx, dy, dz)

    # Per-ray primitive-test counter (the BVH::debug_stats analog,
    # src/objects.cu:534-584) — accumulated directly in the stats output ref
    # when with_stats is set.
    if with_stats:
        extra_refs[0][:] = jnp.zeros((ROWS, LANES), jnp.float32)

    def cluster_gate(cl_ref, c, carry, inner):
        """Slab-test cluster c's AABB (branchless slab method, as
        src/objects.cu:404-434); run ``inner`` over its primitive range only
        if some ray in the tile can beat its current best inside the box."""
        bt = carry[0]
        t1 = (cl_ref[c, 0] - ox) * inv_dx
        t2 = (cl_ref[c, 3] - ox) * inv_dx
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        t1 = (cl_ref[c, 1] - oy) * inv_dy
        t2 = (cl_ref[c, 4] - oy) * inv_dy
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        t1 = (cl_ref[c, 2] - oz) * inv_dz
        t2 = (cl_ref[c, 5] - oz) * inv_dz
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        tmin = jnp.maximum(tmin, 0.0)
        hit_box = (tmin <= tmax) & (tmax > 0.0) & (tmin < bt)
        enter = jnp.any(hit_box)
        start = cl_ref[c, 6].astype(jnp.int32)
        count = cl_ref[c, 7].astype(jnp.int32)
        if with_stats:
            extra_refs[0][:] = extra_refs[0][:] + jnp.where(
                hit_box, cl_ref[c, 7], 0.0)
        return jax.lax.cond(
            enter,
            lambda cr: jax.lax.fori_loop(start, start + count, inner, cr),
            lambda cr: cr,
            carry)

    def super_gate(sup_ref, cl_ref, g, carry, inner):
        """Second BVH level: slab-test a super-cluster, then sweep its
        cluster range (each cluster gated again)."""
        bt = carry[0]
        t1 = (sup_ref[g, 0] - ox) * inv_dx
        t2 = (sup_ref[g, 3] - ox) * inv_dx
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        t1 = (sup_ref[g, 1] - oy) * inv_dy
        t2 = (sup_ref[g, 4] - oy) * inv_dy
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        t1 = (sup_ref[g, 2] - oz) * inv_dz
        t2 = (sup_ref[g, 5] - oz) * inv_dz
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        tmin = jnp.maximum(tmin, 0.0)
        enter = jnp.any((tmin <= tmax) & (tmax > 0.0) & (tmin < bt))
        start = sup_ref[g, 6].astype(jnp.int32)
        count = sup_ref[g, 7].astype(jnp.int32)
        return jax.lax.cond(
            enter,
            lambda cr: jax.lax.fori_loop(
                start, start + count,
                lambda c, cr2: cluster_gate(cl_ref, c, cr2, inner), cr),
            lambda cr: cr,
            carry)

    shape = (ROWS, LANES)
    zero = jnp.zeros(shape, jnp.float32)
    init = (
        jnp.full(shape, _INF, jnp.float32),   # best t
        jnp.zeros(shape, jnp.int32),          # code (idx*2 + is_tri)
        zero, zero,                           # u, v
        zero, zero, zero,                     # normal (tri) / center (sph)
        zero,                                 # aux: sphere radius
        jnp.zeros(shape, jnp.int32),          # material id
        zero + 1.0, zero + 1.0, zero + 1.0,   # per-prim colour
        zero,                                 # per-prim smoothness
        zero + 1.0,                           # per-prim IOR
    )

    def sph_body(s, carry):
        bt, bc, bu, bv, b0, b1, b2, br, bm, bcr, bcg, bcb, bsm, bio = carry
        cx = sph_ref[_S_CX, s]
        cy = sph_ref[_S_CY, s]
        cz = sph_ref[_S_CZ, s]
        cr2 = sph_ref[_S_CR2, s]
        ok = sph_ref[_S_OK, s]
        mat = sph_ref[_S_MAT, s]
        # quadratic solve, nearer root only (src/objects.cu:40-79)
        dc = dx * cx + dy * cy + dz * cz
        oc = ox * cx + oy * cy + oz * cz
        b = -2.0 * (dc - ddo)
        c = cr2 - 2.0 * oc + osq
        disc = b * b - 4.0 * a * c
        t = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) * inv_2a
        valid = (disc >= 0.0) & (t > _EPS) & (ok > 0.0)
        t = jnp.where(valid, t, _INF)
        better = t < bt
        bt = jnp.where(better, t, bt)
        bc = jnp.where(better, s * 2, bc)       # even code = sphere
        b0 = jnp.where(better, cx, b0)
        b1 = jnp.where(better, cy, b1)
        b2 = jnp.where(better, cz, b2)
        br = jnp.where(better, sph_ref[_S_R, s], br)
        bm = jnp.where(better, mat.astype(jnp.int32), bm)
        bcr = jnp.where(better, sph_ref[_S_COLR, s], bcr)
        bcg = jnp.where(better, sph_ref[_S_COLG, s], bcg)
        bcb = jnp.where(better, sph_ref[_S_COLB, s], bcb)
        bsm = jnp.where(better, sph_ref[_S_SMOOTH, s], bsm)
        bio = jnp.where(better, sph_ref[_S_IOR, s], bio)
        return bt, bc, bu, bv, b0, b1, b2, br, bm, bcr, bcg, bcb, bsm, bio

    if num_sph_supers > 0:
        init = jax.lax.fori_loop(
            0, num_sph_supers,
            lambda g, cr: super_gate(sphs_ref, sphc_ref, g, cr, sph_body),
            init)
    elif num_sph_clusters > 0:
        init = jax.lax.fori_loop(
            0, num_sph_clusters,
            lambda c, cr: cluster_gate(sphc_ref, c, cr, sph_body), init)
    elif num_spheres > 0:
        init = jax.lax.fori_loop(0, num_spheres, sph_body, init)

    def tri_body(k, carry):
        bt, bc, bu, bv, b0, b1, b2, br, bm, bcr, bcg, bcb, bsm, bio = carry
        wu0, wu1, wu2, wu3 = (tri_ref[_T_WU + r, k] for r in range(4))
        wv0, wv1, wv2, wv3 = (tri_ref[_T_WV + r, k] for r in range(4))
        ww0, ww1, ww2, ww3 = (tri_ref[_T_WW + r, k] for r in range(4))
        cu = tri_ref[_T_CULL, k]
        cv = tri_ref[_T_CULL + 1, k]
        cw = tri_ref[_T_CULL + 2, k]
        ok = tri_ref[_T_OK, k]
        # Woop world->barycentric: t = -o_w/d_w, u/v from affine rows
        # (equivalent to Möller–Trumbore, src/objects.cu:135-163).
        ow = ww0 * ox + ww1 * oy + ww2 * oz + ww3
        dw = ww0 * dx + ww1 * dy + ww2 * dz
        t = -ow / dw
        ou = wu0 * ox + wu1 * oy + wu2 * oz + wu3
        du = wu0 * dx + wu1 * dy + wu2 * dz
        u = ou + t * du
        ov = wv0 * ox + wv1 * oy + wv2 * oz + wv3
        dv = wv0 * dx + wv1 * dy + wv2 * dz
        v = ov + t * dv
        valid = (t > _EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
            & (ok > 0.0)
        if has_one_way:
            # one-way culling (src/objects.cu:273-280); zero vector passes
            cull = cu * dx + cv * dy + cw * dz
            valid &= cull >= 0.0
        t = jnp.where(valid, t, _INF)
        better = t < bt
        bt = jnp.where(better, t, bt)
        bc = jnp.where(better, k * 2 + 1, bc)   # odd code = triangle
        if needs_tri_uv:
            # texture UV via barycentric interpolation with the reference's
            # argument order (src/objects.cu:160,196-199):
            # uv0*w + uv1*u + uv2*v
            w = 1.0 - u - v
            tex_u = (tri_ref[_T_UV, k] * w + tri_ref[_T_UV + 2, k] * u
                     + tri_ref[_T_UV + 4, k] * v)
            tex_v = (tri_ref[_T_UV + 1, k] * w + tri_ref[_T_UV + 3, k] * u
                     + tri_ref[_T_UV + 5, k] * v)
            bu = jnp.where(better, tex_u, bu)
            bv = jnp.where(better, tex_v, bv)
        b0 = jnp.where(better, tri_ref[_T_NRM, k], b0)
        b1 = jnp.where(better, tri_ref[_T_NRM + 1, k], b1)
        b2 = jnp.where(better, tri_ref[_T_NRM + 2, k], b2)
        bm = jnp.where(better, tri_ref[_T_MAT, k].astype(jnp.int32), bm)
        bcr = jnp.where(better, tri_ref[_T_COLR, k], bcr)
        bcg = jnp.where(better, tri_ref[_T_COLG, k], bcg)
        bcb = jnp.where(better, tri_ref[_T_COLB, k], bcb)
        bsm = jnp.where(better, tri_ref[_T_SMOOTH, k], bsm)
        bio = jnp.where(better, tri_ref[_T_IOR, k], bio)
        return bt, bc, bu, bv, b0, b1, b2, br, bm, bcr, bcg, bcb, bsm, bio

    if num_tri_supers > 0:
        init = jax.lax.fori_loop(
            0, num_tri_supers,
            lambda g, cr: super_gate(tris_ref, tric_ref, g, cr, tri_body),
            init)
    elif num_tri_clusters > 0:
        init = jax.lax.fori_loop(
            0, num_tri_clusters,
            lambda c, cr: cluster_gate(tric_ref, c, cr, tri_body), init)
    elif num_tris > 0:
        init = jax.lax.fori_loop(0, num_tris, tri_body, init)

    (bt, bc, bu, bv, b0, b1, b2, br, bm, bcr, bcg, bcb, bsm, bio) = init
    if with_stats:
        flat_adjust = 0.0
        if num_sph_clusters == 0:
            flat_adjust += float(num_spheres)
        if num_tri_clusters == 0:
            flat_adjust += float(num_tris)
        extra_refs[0][:] = extra_refs[0][:] + flat_adjust
    t_ref[:] = bt
    code_ref[:] = bc
    u_ref[:] = bu
    v_ref[:] = bv
    n0_ref[:] = b0
    n1_ref[:] = b1
    n2_ref[:] = b2
    aux_ref[:] = br
    mat_ref[:] = bm
    colr_ref[:] = bcr
    colg_ref[:] = bcg
    colb_ref[:] = bcb
    smooth_ref[:] = bsm
    ior_ref[:] = bio


def _run_kernel(o: jax.Array, d: jax.Array, scene: SceneArrays,
                with_stats: bool = False):
    n = o.shape[1]
    n_pad = max(RAY_TILE, ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE)
    if n_pad != n:
        pad_o = jnp.zeros((3, n_pad - n), o.dtype)
        pad_d = jnp.zeros((3, n_pad - n), d.dtype).at[0].set(1.0)
        o = jnp.concatenate([o, pad_o], axis=1)
        d = jnp.concatenate([d, pad_d], axis=1)

    rows = n_pad // LANES
    planes = [p.reshape(rows, LANES)
              for p in (o[0], o[1], o[2], d[0], d[1], d[2])]

    sph, tri, sphc, tric, sphs, tris = pack_scene(scene)
    num_spheres = int(scene.sph_center.shape[0])
    num_tris = int(scene.tri_v0.shape[0])
    num_sph_clusters = int(scene.sph_clusters.shape[0])
    num_tri_clusters = int(scene.tri_clusters.shape[0])
    num_sph_supers = int(scene.sph_supers.shape[0])
    num_tri_supers = int(scene.tri_supers.shape[0])

    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # Primitive parameters are broadcast scalars -> SMEM, where dynamic
    # per-primitive indexing is natural (VMEM lane indexing must be
    # 128-aligned).
    scene_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    f32 = jnp.float32
    out_dts = [f32, jnp.int32, f32, f32, f32, f32, f32, f32, jnp.int32,
               f32, f32, f32, f32, f32]
    if with_stats:
        out_dts.append(f32)
    outs = pl.pallas_call(
        functools.partial(_kernel, num_spheres=num_spheres,
                          num_tris=num_tris,
                          num_sph_clusters=num_sph_clusters,
                          num_tri_clusters=num_tri_clusters,
                          num_sph_supers=num_sph_supers,
                          num_tri_supers=num_tri_supers,
                          has_one_way=bool(scene.has_one_way),
                          needs_tri_uv=bool(scene.needs_tri_uv),
                          with_stats=with_stats),
        grid=(rows // ROWS,),
        in_specs=[scene_spec] * 6 + [ray_spec] * 6,
        out_specs=(ray_spec,) * len(out_dts),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), dt) for dt in out_dts),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * (num_spheres * 28 + num_tris * 54),
            bytes_accessed=n_pad * 4 * 15,
            transcendentals=n_pad * num_spheres,
        ),
        interpret=_interpret(),
    )(sph, tri, sphc, tric, sphs, tris, *planes)

    return [x.reshape(-1)[:n] for x in outs]


def nearest_hit_pallas(o: jax.Array, d: jax.Array,
                       scene: SceneArrays) -> HitRecord:
    """Nearest hit via the Pallas sweep kernel. ``o``/``d`` are (3, N)."""
    t, code, *_ = _run_kernel(o, d, scene)
    return HitRecord(
        t=t, hit=t < INF,
        is_tri=(code & 1) == 1,
        idx=(code >> 1).astype(jnp.int32),
    )


def hit_and_resolve_pallas(o: jax.Array, d: jax.Array, scene: SceneArrays,
                           need_sphere_uv: bool = True
                           ) -> Tuple[HitRecord, ShadeData]:
    """Fused nearest-hit + shading resolution (gather-free).

    Returns (HitRecord, ShadeData) matching intersect.nearest_hit +
    resolve_hit. ``need_sphere_uv`` skips the lat/long transcendentals when
    no sphere in the scene has a UV-dependent texture (the TPU analog of the
    reference's ``need_uv`` flag, src/material.cu:142,162,180).
    """
    (t, code, u, v, n0, n1, n2, aux, mat_id,
     colr, colg, colb, smooth, ior) = _run_kernel(o, d, scene)
    hit = t < INF
    is_tri = (code & 1) == 1
    rec = HitRecord(t=t, hit=hit, is_tri=is_tri,
                    idx=(code >> 1).astype(jnp.int32))

    safe_t = jnp.where(hit, t, 0.0)
    point = o + d * safe_t[None, :]

    # Sphere: n0..n2 hold the centre, aux the radius. Outward normal
    # (src/objects.cu:66), lat/long UV (src/objects.cu:82-97).
    inv_r = 1.0 / jnp.maximum(aux, 1e-12)
    relx = (point[0] - n0) * inv_r
    rely = (point[1] - n1) * inv_r
    relz = (point[2] - n2) * inv_r
    rmag = jax.lax.rsqrt(relx * relx + rely * rely + relz * relz)
    sph_n = (relx * rmag, rely * rmag, relz * rmag)
    if need_sphere_uv:
        theta = jnp.arcsin(jnp.clip(rely, -1.0, 1.0))
        phi = jnp.arccos(jnp.clip(relx, -1.0, 1.0))
        sph_u = (theta + jnp.pi / 2.0) / jnp.pi
        v_ratio = (1.0 - phi / jnp.pi) / 2.0
        behind = (point[2] > n2).astype(jnp.float32)
        sph_v = behind + (1.0 - 2.0 * behind) * v_ratio
    else:
        sph_u = jnp.zeros_like(u)
        sph_v = jnp.zeros_like(v)

    # Triangle: n0..n2 hold the geometric normal; flip to face against the
    # ray (src/objects.cu:158).
    n_dot_d = n0 * d[0] + n1 * d[1] + n2 * d[2]
    flip = 1.0 - 2.0 * (n_dot_d > 0.0).astype(jnp.float32)

    normal = jnp.stack([
        jnp.where(is_tri, n0 * flip, sph_n[0]),
        jnp.where(is_tri, n1 * flip, sph_n[1]),
        jnp.where(is_tri, n2 * flip, sph_n[2]),
    ])
    out_u = jnp.where(is_tri, u, sph_u)
    out_v = jnp.where(is_tri, v, sph_v)
    shade = ShadeData(point=point, normal=normal, u=out_u, v=out_v,
                      mat_id=mat_id, colour=jnp.stack([colr, colg, colb]),
                      smooth=smooth, ior=ior)
    return rec, shade


def intersection_stats(o: jax.Array, d: jax.Array, scene: SceneArrays):
    """Per-ray primitive-test counts (the BVH::debug_stats analog,
    src/objects.cu:534-584). Returns (tests (N,), box_tests_per_ray scalar).

    ``tests`` counts primitives actually swept after cluster culling;
    box tests are the (constant) number of cluster AABB evaluations.
    """
    outs = _run_kernel(o, d, scene, with_stats=True)
    boxes = (max(int(scene.sph_clusters.shape[0]), 0)
             + max(int(scene.tri_clusters.shape[0]), 0))
    return outs[14], boxes
