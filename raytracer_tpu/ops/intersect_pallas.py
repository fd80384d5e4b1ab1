"""Pallas TPU kernel for nearest-hit intersection + shading resolution.

TPU-native replacement for the hot half of the reference megakernel: the
per-thread linear scan over scene primitives (``get_ray_collision``,
src/raytracer.cu:24-46). One grid step owns a tile of rays resident in
vector registers; the kernel sweeps every primitive with broadcast scalars
from SMEM, keeping a running best — the full N x P pair matrix never touches
HBM, and the winner's *shading parameters* (UV, normal/center, material id)
are selected during the sweep, so the wavefront needs no per-ray gathers
afterwards (XLA gathers cost ~7 ms per 800k rays on v5e — they were the
dominant cost of the pure-XLA path).

The sweep itself (intersection math, BVH gates, carry layout) lives in
``ops/sweep.py``, shared bit-for-bit with the full megakernel
(ops/megakernel.py).

Ray layout: component planes (R, 128) where R = N/128 — each block is a
(ROWS, 128) vreg tile. Directions are normalised on entry (the sweep
assumes unit directions); returned distances are rescaled back to the
caller's direction parameterisation.

Contract matches ops.intersect.nearest_hit / resolve_hit: same validity
semantics (t > EPS, one-way culling, sphere nearer-root only), same normal
orientation conventions (sphere outward, triangle flipped against the ray).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import SceneArrays
from ..utils.vec import INF
from .intersect import HitRecord, ShadeData
from .sweep import (LANES, decode_colour30, decode_smooth_mat,
                    pack_scene, sweep_tile)

_INF = 1e30

ROWS = 32          # rays per tile = ROWS * LANES = 4096 (measured best)
RAY_TILE = ROWS * LANES


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (tests on CPU backend)."""
    return jax.default_backend() != "tpu"


def _kernel(sphf, sphi, trif, trii, sphc_ref, tric_ref, sphs_ref, tris_ref,
            sph_order_ref, tri_order_ref, grid_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            t_ref, code_ref, u_ref, v_ref, n0_ref, n1_ref, n2_ref,
            mat_ref, colr_ref, colg_ref, colb_ref, smooth_ref,
            *extra_refs, num_spheres: int, num_tris: int,
            num_sph_clusters: int, num_tri_clusters: int,
            num_sph_supers: int, num_tri_supers: int,
            has_one_way: bool = True, needs_tri_uv: bool = True,
            sph_ordered: bool = False, tri_ordered: bool = False,
            sph_leaf: int = 32, tri_leaf: int = 32,
            with_stats: bool = False):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # Per-ray primitive-test counter (the BVH::debug_stats analog,
    # src/objects.cu:534-584) — accumulated directly in the stats output ref
    # when with_stats is set.
    stats_ref = None
    if with_stats:
        extra_refs[0][:] = jnp.zeros((ROWS, LANES), jnp.float32)
        stats_ref = extra_refs[0]

    zero_f = jnp.zeros((ROWS, LANES), jnp.float32)
    zero_i = jnp.zeros((ROWS, LANES), jnp.int32)
    (bt, bc, bu, bv, g0, g1, g2, pa, pb) = sweep_tile(
        sphf, sphi, trif, trii, sphc_ref, tric_ref, sphs_ref, tris_ref,
        sph_order_ref, tri_order_ref, grid_ref,
        ox, oy, oz, dx, dy, dz, zero_f, zero_i,
        num_spheres=num_spheres, num_tris=num_tris,
        num_sph_clusters=num_sph_clusters,
        num_tri_clusters=num_tri_clusters,
        num_sph_supers=num_sph_supers, num_tri_supers=num_tri_supers,
        has_one_way=has_one_way, needs_tri_uv=needs_tri_uv,
        sph_ordered=sph_ordered, tri_ordered=tri_ordered,
        sph_leaf=sph_leaf, tri_leaf=tri_leaf,
        stats_ref=stats_ref)

    colr, colg, colb = decode_colour30(pa)
    bs, mat_id = decode_smooth_mat(pb)
    t_ref[:] = bt
    code_ref[:] = bc
    u_ref[:] = bu
    v_ref[:] = bv
    n0_ref[:] = g0
    n1_ref[:] = g1
    n2_ref[:] = g2
    mat_ref[:] = mat_id
    colr_ref[:] = colr
    colg_ref[:] = colg
    colb_ref[:] = colb
    smooth_ref[:] = bs


# Primitive-block sizes for the HBM-streamed variant (scenes whose resident
# SMEM layout would exceed sweep.SMEM_BUDGET): per grid step one block per
# pool is pipelined HBM -> SMEM by Pallas while the previous block sweeps.
SPH_BLOCK = 4096
TRI_BLOCK = 1024
_FORCE_BLOCKED = bool(os.environ.get("RAYTRACER_FORCE_BLOCKED", ""))


def _kernel_blocked(sphf, sphi, trif, trii, sphc_ref, tric_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    t_ref, code_ref, u_ref, v_ref,
                    n0_ref, n1_ref, n2_ref, pa_ref, pb_ref,
                    *, sph_blocks: int, tri_blocks: int,
                    has_one_way: bool, needs_tri_uv: bool,
                    sph_leaf: int, tri_leaf: int):
    """Beyond-SMEM scenes: grid = (ray tiles, primitive blocks).

    The scene lives in HBM; Pallas double-buffers one primitive block per
    pool into SMEM per grid step (index_map on the j axis) while the
    previous block sweeps — the analog of the reference holding geometry
    in global memory (src/objects.cu:741-770), with the streaming the TPU
    way. The running best rides the *output* refs across the j steps of a
    ray tile (grid iterates j fastest, so the output block stays
    VMEM-resident) — the standard accumulator pattern, carrying the
    sweep's packed 9-tuple. Winner codes are re-based by the block offset
    so the final code indexes the full pool. Per-leaf cluster gates prune
    within each block.
    """
    j = pl.program_id(1)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full((ROWS, LANES), _INF, jnp.float32)
        code_ref[:] = jnp.zeros((ROWS, LANES), jnp.int32)
        u_ref[:] = jnp.zeros((ROWS, LANES), jnp.float32)
        v_ref[:] = jnp.zeros((ROWS, LANES), jnp.float32)
        n0_ref[:] = jnp.zeros((ROWS, LANES), jnp.float32)
        n1_ref[:] = jnp.zeros((ROWS, LANES), jnp.float32)
        n2_ref[:] = jnp.zeros((ROWS, LANES), jnp.float32)
        pa_ref[:] = jnp.zeros((ROWS, LANES), jnp.int32)
        pb_ref[:] = jnp.zeros((ROWS, LANES), jnp.int32)

    carry = (t_ref[:], code_ref[:], u_ref[:], v_ref[:],
             n0_ref[:], n1_ref[:], n2_ref[:], pa_ref[:], pb_ref[:])

    zero_f = jnp.zeros((ROWS, LANES), jnp.float32)
    zero_i = jnp.zeros((ROWS, LANES), jnp.int32)

    # Relativise the carried winner code to this block, sweep, re-globalise.
    sph_base = j * SPH_BLOCK
    tri_base = j * TRI_BLOCK

    def localise(code):
        is_tri = (code & 1) == 1
        idx = code >> 1
        return jnp.where(is_tri, (idx - tri_base) * 2 + 1,
                         (idx - sph_base) * 2)

    def globalise(code):
        is_tri = (code & 1) == 1
        idx = code >> 1
        return jnp.where(is_tri, (idx + tri_base) * 2 + 1,
                         (idx + sph_base) * 2)

    carry = (carry[0], localise(carry[1])) + carry[2:]
    carry = sweep_tile(
        sphf, sphi, trif, trii, sphc_ref, tric_ref,
        # supers/order/grid slots are statically disabled; any ref works
        sphc_ref, tric_ref, sphc_ref, tric_ref, sphc_ref,
        ox, oy, oz, dx, dy, dz, zero_f, zero_i,
        num_spheres=SPH_BLOCK if sph_blocks > 0 else 0,
        num_tris=TRI_BLOCK if tri_blocks > 0 else 0,
        num_sph_clusters=(SPH_BLOCK // sph_leaf) if sph_blocks > 0 else 0,
        num_tri_clusters=(TRI_BLOCK // tri_leaf) if tri_blocks > 0 else 0,
        num_sph_supers=0, num_tri_supers=0,
        has_one_way=has_one_way, needs_tri_uv=needs_tri_uv,
        sph_leaf=sph_leaf, tri_leaf=tri_leaf,
        carry=carry)
    carry = (carry[0], globalise(carry[1])) + carry[2:]

    t_ref[:], code_ref[:], u_ref[:], v_ref[:] = carry[0:4]
    n0_ref[:], n1_ref[:], n2_ref[:] = carry[4:7]
    pa_ref[:], pb_ref[:] = carry[7:9]


def _run_kernel_blocked(planes, scene: SceneArrays, rows: int):
    """Dispatch the HBM-streamed kernel; returns the sweep's raw 9 outputs."""
    (sphf, sphi, trif, trii, sphc, tric, _, _, _, _, _) = pack_scene(scene)

    def pad_pool(arr, block, fill=0.0):
        total = max(block, -(-arr.shape[1] // block) * block)
        pad = total - arr.shape[1]
        if pad:
            arr = jnp.pad(arr, ((0, 0), (0, pad)), constant_values=fill)
        return arr, total // block

    sphf, sb = pad_pool(sphf, SPH_BLOCK)
    s_real = int(scene.sph_center.shape[0])
    if sphf.shape[1] > s_real:
        # poison the padding spheres (discriminant always negative)
        from .sweep import S_CR2
        sphf = sphf.at[S_CR2, s_real:].set(_INF)
    sphi, _ = pad_pool(sphi, SPH_BLOCK)
    trif, tb = pad_pool(trif, TRI_BLOCK)
    trii, _ = pad_pool(trii, TRI_BLOCK)
    nblocks = max(sb, tb)

    def pad_clusters(cl, leaf, pool_slots, count):
        """One row per leaf over the padded pool; missing leaves get
        never-entered boxes (min=+INF > max=-INF fails the slab test)."""
        rows_needed = pool_slots // leaf
        out = jnp.tile(jnp.asarray(
            [[_INF, _INF, _INF, -_INF, -_INF, -_INF, 0.0, 0.0]],
            jnp.float32), (rows_needed, 1))
        if count > 0:
            out = out.at[:count].set(cl[:count])
        return out

    sphc = pad_clusters(sphc, int(scene.sph_leaf), sphf.shape[1],
                        int(scene.sph_clusters.shape[0]))
    tric = pad_clusters(tric, int(scene.tri_leaf), trif.shape[1],
                        int(scene.tri_clusters.shape[0]))
    # equalise the j axis across pools: every pool must provide a block
    # (a never-entered one where it has run out of primitives)
    def pad_j(arr, per_block):
        want = nblocks * per_block
        if arr.shape[0] < want:
            fill = jnp.tile(jnp.asarray(
                [[_INF, _INF, _INF, -_INF, -_INF, -_INF, 0.0, 0.0]],
                jnp.float32), (want - arr.shape[0], 1))
            arr = jnp.concatenate([arr, fill], axis=0)
        return arr

    sphc = pad_j(sphc, SPH_BLOCK // int(scene.sph_leaf))
    tric = pad_j(tric, TRI_BLOCK // int(scene.tri_leaf))

    from .sweep import S_CR2 as _S_CR2
    want_s = nblocks * SPH_BLOCK
    if sphf.shape[1] < want_s:
        padn = want_s - sphf.shape[1]
        sphf = jnp.pad(sphf, ((0, 0), (0, padn)))
        sphf = sphf.at[_S_CR2, -padn:].set(_INF)
        sphi = jnp.pad(sphi, ((0, 0), (0, padn)))
    want_t = nblocks * TRI_BLOCK
    if trif.shape[1] < want_t:
        trif = jnp.pad(trif, ((0, 0), (0, want_t - trif.shape[1])))
        trii = jnp.pad(trii, ((0, 0), (0, want_t - trii.shape[1])))

    smem = pltpu.SMEM
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_dts = [f32, jnp.int32, f32, f32, f32, f32, f32,
               jnp.int32, jnp.int32]
    sc_rows = SPH_BLOCK // int(scene.sph_leaf)
    tc_rows = TRI_BLOCK // int(scene.tri_leaf)
    outs = pl.pallas_call(
        functools.partial(
            _kernel_blocked,
            sph_blocks=sb, tri_blocks=tb,
            has_one_way=bool(scene.has_one_way),
            needs_tri_uv=bool(scene.needs_tri_uv),
            sph_leaf=int(scene.sph_leaf), tri_leaf=int(scene.tri_leaf)),
        grid=(rows // ROWS, nblocks),
        in_specs=[
            pl.BlockSpec((sphf.shape[0], SPH_BLOCK), lambda i, j: (0, j),
                         memory_space=smem),
            pl.BlockSpec((sphi.shape[0], SPH_BLOCK), lambda i, j: (0, j),
                         memory_space=smem),
            pl.BlockSpec((trif.shape[0], TRI_BLOCK), lambda i, j: (0, j),
                         memory_space=smem),
            pl.BlockSpec((trii.shape[0], TRI_BLOCK), lambda i, j: (0, j),
                         memory_space=smem),
            pl.BlockSpec((sc_rows, 8), lambda i, j: (j, 0),
                         memory_space=smem),
            pl.BlockSpec((tc_rows, 8), lambda i, j: (j, 0),
                         memory_space=smem),
        ] + [ray_spec] * 6,
        out_specs=tuple(
            pl.BlockSpec((ROWS, LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM) for _ in out_dts),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), dt) for dt in out_dts),
        interpret=_interpret(),
    )(sphf, sphi, trif, trii, sphc, tric, *planes)
    return outs


def _run_kernel(o: jax.Array, d: jax.Array, scene: SceneArrays,
                with_stats: bool = False):
    n = o.shape[1]
    n_pad = max(RAY_TILE, ((n + RAY_TILE - 1) // RAY_TILE) * RAY_TILE)
    if n_pad != n:
        pad_o = jnp.zeros((3, n_pad - n), o.dtype)
        pad_d = jnp.zeros((3, n_pad - n), d.dtype).at[0].set(1.0)
        o = jnp.concatenate([o, pad_o], axis=1)
        d = jnp.concatenate([d, pad_d], axis=1)

    # The sweep assumes unit directions (a = 1, half-b quadratic); rescale
    # the returned t back into the caller's direction parameterisation.
    inv_len = jax.lax.rsqrt(jnp.sum(d * d, axis=0))
    d = d * inv_len[None, :]

    rows = n_pad // LANES
    planes = [p.reshape(rows, LANES)
              for p in (o[0], o[1], o[2], d[0], d[1], d[2])]

    from .sweep import fits_smem
    if _FORCE_BLOCKED or not fits_smem(scene):
        if with_stats:
            raise ValueError(
                "intersection_stats is unavailable for beyond-SMEM scenes "
                "(the HBM-streamed kernel does not thread the counters).")
        t, code, u, v, n0, n1, n2, pa, pb = _run_kernel_blocked(
            planes, scene, rows)
        colr, colg, colb = decode_colour30(pa)
        bs, mat_id = decode_smooth_mat(pb)
        outs = [t, code, u, v, n0, n1, n2, mat_id, colr, colg, colb, bs]
        outs = [x.reshape(-1)[:n] for x in outs]
        tt = outs[0]
        outs[0] = jnp.where(tt < _INF, tt * inv_len[:n], INF)
        return outs

    (sphf, sphi, trif, trii, sphc, tric, sphs, tris,
     sph_order, tri_order, cell_grid) = pack_scene(scene)
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
    out_dts = [f32, jnp.int32, f32, f32, f32, f32, f32, jnp.int32,
               f32, f32, f32, f32]
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
                          sph_ordered=scene.sph_cell_order.shape[0] > 1,
                          tri_ordered=scene.tri_cell_order.shape[0] > 1,
                          sph_leaf=int(scene.sph_leaf),
                          tri_leaf=int(scene.tri_leaf),
                          with_stats=with_stats),
        grid=(rows // ROWS,),
        in_specs=[scene_spec] * 11 + [ray_spec] * 6,
        out_specs=(ray_spec,) * len(out_dts),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), dt) for dt in out_dts),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * (num_spheres * 30 + num_tris * 60),
            bytes_accessed=n_pad * 4 * 15,
            transcendentals=n_pad * num_spheres,
        ),
        interpret=_interpret(),
    )(sphf, sphi, trif, trii, sphc, tric, sphs, tris,
      sph_order, tri_order, cell_grid, *planes)

    outs = [x.reshape(-1)[:n] for x in outs]
    # rescale t (INF stays INF, not INF * inv_len)
    t = outs[0]
    outs[0] = jnp.where(t < _INF, t * inv_len[:n], INF)
    return outs


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
    (t, code, u, v, n0, n1, n2, mat_id,
     colr, colg, colb, smooth) = _run_kernel(o, d, scene)
    hit = t < INF
    is_tri = (code & 1) == 1
    rec = HitRecord(t=t, hit=hit, is_tri=is_tri,
                    idx=(code >> 1).astype(jnp.int32))

    safe_t = jnp.where(hit, t, 0.0)
    point = o + d * safe_t[None, :]

    # Sphere: n0..n2 hold the centre. Outward normal = normalised (p - c)
    # (src/objects.cu:66 divides by the radius then normalises — the radius
    # cancels, so it is never carried); lat/long UV (src/objects.cu:82-97).
    relx = point[0] - n0
    rely = point[1] - n1
    relz = point[2] - n2
    rmag = jax.lax.rsqrt(jnp.maximum(
        relx * relx + rely * rely + relz * relz, 1e-24))
    sph_n = (relx * rmag, rely * rmag, relz * rmag)
    if need_sphere_uv:
        theta = jnp.arcsin(jnp.clip(sph_n[1], -1.0, 1.0))
        phi = jnp.arccos(jnp.clip(sph_n[0], -1.0, 1.0))
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
                      smooth=smooth)
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
    return outs[12], boxes
