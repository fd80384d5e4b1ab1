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
from .sweep import (LANES, ORDER_GRID as _ORDER_GRID, decode_colour30,
                    decode_smooth_mat, pack_scene, safe_inv_dir, sweep_tile,
                    tile_cell)

_INF = 1e30

ROWS = 32          # rays per tile = ROWS * LANES = 4096 (measured best)
RAY_TILE = ROWS * LANES
# Blocked-kernel tile height: smaller tiles -> tighter ray unions (fewer
# blocks/supers entered per tile) at the cost of more DMA repeats; the
# resident kernel keeps ROWS.
BROWS = int(os.environ.get("RAYTRACER_BLOCKED_ROWS", str(ROWS)))


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (tests on CPU backend)."""
    return jax.default_backend() != "tpu"


def _kernel(sphf, sphi, trif, trii, sphc_ref, tric_ref, sphs_ref, tris_ref,
            sph_order_ref, tri_order_ref, grid_ref,
            slcl_ref, tlcl_ref, spf_ref, spi_ref, tpf_ref, tpi_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            t_ref, code_ref, u_ref, v_ref, n0_ref, n1_ref, n2_ref,
            mat_ref, colr_ref, colg_ref, colb_ref, smooth_ref,
            *extra_refs, num_spheres: int, num_tris: int,
            num_sph_clusters: int, num_tri_clusters: int,
            num_sph_supers: int, num_tri_supers: int,
            has_one_way: bool = True, needs_tri_uv: bool = True,
            sph_ordered: bool = False, tri_ordered: bool = False,
            sph_leaf: int = 32, tri_leaf: int = 32,
            num_sph_lane: int = 0, num_tri_lane: int = 0,
            sph_lane_leaf: int = 0, tri_lane_leaf: int = 0,
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
        sph_lane_cl_get=lambda i, k: slcl_ref[i, k],
        tri_lane_cl_get=lambda i, k: tlcl_ref[i, k],
        sph_lane_pf=spf_ref, sph_lane_pi=spi_ref,
        tri_lane_pf=tpf_ref, tri_lane_pi=tpi_ref,
        num_sph_lane=num_sph_lane, num_tri_lane=num_tri_lane,
        sph_lane_leaf=sph_lane_leaf, tri_lane_leaf=tri_lane_leaf,
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
# leaf clusters per in-block super (third gate level: block union ->
# supers -> clusters -> leaf sweep)
SUP_GROUP = int(os.environ.get("RAYTRACER_BLOCK_SUP_GROUP", "16"))
_FORCE_BLOCKED = bool(os.environ.get("RAYTRACER_FORCE_BLOCKED", ""))
# Tile-true near-first block visitation (vs the default per-cell static
# order): slab-test every block union against the tile up front (2*nblocks
# vectorised tests + nblocks min-reduces, paid once per tile), then pop
# blocks in ascending min-over-lanes entry distance, re-gating each pop
# against the evolving best-t. The static cell order is computed from the
# tile's mean ORIGIN only, so lanes bootstrap far blocks at best-t = INF;
# popping by actual entry distance makes the first swept block the one
# that collapses best-t, and the stop rule (min remaining tmin >= the
# tile's max best-t) retires the loop without testing the tail at all —
# benchmarks/block_bound.py measures the structural gap on stress100k.
# Same exact-tie caveat as RAYTRACER_MASKPOP: equal-t winners in
# *different blocks* resolve to the first-visited block's primitive, and
# the visit order differs from the cell order. Default ON: won both
# interleaved repeats of the 2026-08-19 v5e A/B (stress100k 6.86/6.85 vs
# 6.61/6.60 Mrays/s static, +3.8% — docs/TESTLOG.md session 5).
_BLOCK_NEARFIRST = os.environ.get("RAYTRACER_BLOCK_NEARFIRST", "1") == "1"


def _kernel_blocked(sphc_ref, tric_ref, sphs_ref, tris_ref, bbox_ref,
                    border_ref, bgrid_ref,
                    sphf_hbm, sphi_hbm, trif_hbm, trii_hbm,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    t_ref, code_ref, u_ref, v_ref,
                    n0_ref, n1_ref, n2_ref, pa_ref, pb_ref,
                    sphf_s, sphi_s, trif_s, trii_s, sems,
                    *, nblocks: int, sph_blocks: int, tri_blocks: int,
                    has_one_way: bool, needs_tri_uv: bool,
                    sph_leaf: int, tri_leaf: int,
                    ss_rows: int, ts_rows: int):
    """Beyond-SMEM scenes: the scene lives in HBM; only its *boxes* are
    SMEM-resident (per-block unions + every leaf-cluster box). Each ray
    tile loops over primitive blocks and DMAs a block into SMEM scratch
    only when some lane can beat its best inside the block's union box —
    the analog of the reference holding geometry in global memory
    (src/objects.cu:741-770), with demand-paged streaming instead of a
    fixed per-step prefetch (Pallas' automatic j-axis streaming cost
    ~106 us per (tile, block) step whether or not the block mattered).

    Primitive pools use a (word-chunk, 128) block layout (SMEM DMAs
    require a 128-wide minor dimension); the sweep addresses them through
    accessors (sweep_tile sget_f/...). Winner codes come back block-local
    and are re-based before merging into the running global best.
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_dx, inv_dy, inv_dz = safe_inv_dir(dx, dy, dz)

    zero_f = jnp.zeros((BROWS, LANES), jnp.float32)
    zero_i = jnp.zeros((BROWS, LANES), jnp.int32)

    sc_rows = SPH_BLOCK // sph_leaf
    tc_rows = TRI_BLOCK // tri_leaf
    s_chunks = SPH_BLOCK // LANES      # 32
    t_chunks = TRI_BLOCK // LANES      # 8

    # resident box tables ride a (word-row, 128) layout: an (N, 8) SMEM
    # array pads its minor dim to 128 (16x waste — a 100k-sphere cluster
    # table would alone blow the 1 MiB SMEM)
    n_cl_s = nblocks * sc_rows
    n_cl_t = nblocks * tc_rows
    cc_s = -(-n_cl_s // LANES)
    cc_t = -(-n_cl_t // LANES)
    cs_s = -(-(nblocks * ss_rows) // LANES)
    cs_t = -(-(nblocks * ts_rows) // LANES)
    bb = -(-(nblocks * 2) // LANES)
    scl_get = lambda i, k: sphc_ref[k * cc_s + (i >> 7), i & 127]
    tcl_get = lambda i, k: tric_ref[k * cc_t + (i >> 7), i & 127]
    ssup_get = lambda i, k: sphs_ref[k * cs_s + (i >> 7), i & 127]
    tsup_get = lambda i, k: tris_ref[k * cs_t + (i >> 7), i & 127]
    bget = lambda i, k: bbox_ref[k * bb + (i >> 7), i & 127]

    def box_enter(i, bt):
        t1 = (bget(i, 0) - ox) * inv_dx
        t2 = (bget(i, 3) - ox) * inv_dx
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        t1 = (bget(i, 1) - oy) * inv_dy
        t2 = (bget(i, 4) - oy) * inv_dy
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        t1 = (bget(i, 2) - oz) * inv_dz
        t2 = (bget(i, 5) - oz) * inv_dz
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        tmin = jnp.maximum(tmin, 0.0)
        return jnp.any((tmin <= tmax) & (tmax > 0.0) & (tmin < bt))

    t_ref[:] = zero_f + _INF
    code_ref[:] = zero_i
    u_ref[:] = zero_f
    v_ref[:] = zero_f
    n0_ref[:] = zero_f
    n1_ref[:] = zero_f
    n2_ref[:] = zero_f
    pa_ref[:] = zero_i
    pb_ref[:] = zero_i

    _abl = os.environ.get("RAYTRACER_BLOCKED_ABLATE", "")

    # Near-first block visitation: pick the host-precomputed block order
    # for the tile's coarse spatial cell (mean ray origin — the same
    # lattice trick as the resident kernel's cluster cell orders,
    # sweep.py). Early near hits set best_t, so far blocks fail their
    # union gate (tmin < bt) and skip both the DMA and the sweep — the
    # tile-level analog of the reference's front-to-back child ordering
    # (src/objects.cu:508-516) across its device-resident node arrays.
    cell = tile_cell(ox, oy, oz, bgrid_ref) * nblocks

    def visit_block(b):
        # Pool-filler guard (b < pool_blocks): a pool padded to the block
        # axis (pad_j) contributes an INVERTED [+INF, -INF] union box for
        # its filler blocks, and the min/max-swapped slab test turns any
        # inverted box into its swapped hull — ALWAYS entered at tmin = 0,
        # not never entered. Unguarded, one all-filler pool (stress100k:
        # tri blocks 1..24) opened every block's gate for every tile and
        # reduced the whole hierarchy to a brute-force scan (the measured
        # 1.18 Mrays/s); real blocks are index-contiguous, so one scalar
        # compare restores the gate.
        bt = t_ref[:]
        enter = None
        if sph_blocks > 0:
            enter = box_enter(b * 2 + 0, bt)
            if sph_blocks < nblocks:
                enter = jnp.logical_and(enter, b < sph_blocks)
        if tri_blocks > 0:
            e_t = box_enter(b * 2 + 1, bt)
            if tri_blocks < nblocks:
                e_t = jnp.logical_and(e_t, b < tri_blocks)
            enter = e_t if enter is None else jnp.logical_or(enter, e_t)
        if _abl == "neverenter":
            enter = jnp.logical_and(enter, b < 0)

        # The running best lives in the OUTPUT refs and is merged in place
        # under pl.when: a lax.cond carrying the nine (ROWS, 128) arrays
        # through its region boundaries cost ~100 us per (tile, block)
        # even when the branch was not taken.
        @pl.when(enter)
        def _():
            # Per-pool DMA guards mirror the gate guards above: a block
            # entered through one pool's box must not stream the OTHER
            # pool's filler slots (stress100k: 24 of 25 tri sub-blocks are
            # pure padding — 104 KiB of dead DMA per entered block). The
            # scratch then still holds a PREVIOUS block's primitives, but
            # the resident cluster boxes for this block's filler rows are
            # NaN (see _run_kernel_blocked), so no gate ever opens on the
            # stale data.
            def sph_copies():
                return [pltpu.make_async_copy(
                            sphf_hbm.at[pl.ds(b * 4 * s_chunks,
                                              4 * s_chunks), :],
                            sphf_s, sems.at[0]),
                        pltpu.make_async_copy(
                            sphi_hbm.at[pl.ds(b * 2 * s_chunks,
                                              2 * s_chunks), :],
                            sphi_s, sems.at[1])]

            def tri_copies():
                return [pltpu.make_async_copy(
                            trif_hbm.at[pl.ds(b * 24 * t_chunks,
                                              24 * t_chunks), :],
                            trif_s, sems.at[2]),
                        pltpu.make_async_copy(
                            trii_hbm.at[pl.ds(b * 2 * t_chunks,
                                              2 * t_chunks), :],
                            trii_s, sems.at[3])]

            # start BOTH pools' streams before waiting on either (the
            # descriptors are rebuilt in the wait region — the semaphore,
            # not the object, carries the completion), under the same
            # per-pool reality guards as the gates
            def pool_phase(fn):
                for pool_blocks, copies in ((sph_blocks, sph_copies),
                                            (tri_blocks, tri_copies)):
                    if pool_blocks <= 0:
                        continue

                    def run(cs=copies):
                        for c in cs():
                            fn(c)

                    if pool_blocks < nblocks:
                        pl.when(b < pool_blocks)(run)
                    else:
                        run()

            pool_phase(lambda c: c.start())
            pool_phase(lambda c: c.wait())
            if _abl == "dmaonly":
                t_ref[:] = jnp.minimum(t_ref[:], zero_f + sphf_s[0, 0])
                return

            local = sweep_tile(
                sphf_s, sphi_s, trif_s, trii_s, sphc_ref, tric_ref,
                # supers/order/grid slots statically disabled; any ref works
                sphc_ref, tric_ref, sphc_ref, tric_ref, sphc_ref,
                ox, oy, oz, dx, dy, dz, zero_f, zero_i,
                num_spheres=SPH_BLOCK if sph_blocks > 0 else 0,
                num_tris=TRI_BLOCK if tri_blocks > 0 else 0,
                num_sph_clusters=sc_rows if sph_blocks > 0 else 0,
                num_tri_clusters=tc_rows if tri_blocks > 0 else 0,
                # per-block super level over the block's leaf clusters:
                # an entered block costs ss_rows super gates up front, not
                # sc_rows cluster gates (measured 0.7 -> see ARCHITECTURE).
                # The "nosupers" ablation gates every cluster directly
                # (bitwise-identical results — gates are conservative), so
                # (default - nosupers) isolates the super level's worth in
                # the stress100k cost attribution (VERDICT round-4 item 9).
                num_sph_supers=(ss_rows if sph_blocks > 0
                                and _abl != "nosupers" else 0),
                num_tri_supers=(ts_rows if tri_blocks > 0
                                and _abl != "nosupers" else 0),
                has_one_way=has_one_way, needs_tri_uv=needs_tri_uv,
                sph_leaf=sph_leaf, tri_leaf=tri_leaf,
                sget_f=lambda r, s: sphf_s[r * s_chunks + (s >> 7), s & 127],
                sget_i=lambda r, s: sphi_s[r * s_chunks + (s >> 7), s & 127],
                tget_f=lambda r, k: trif_s[r * t_chunks + (k >> 7), k & 127],
                tget_i=lambda r, k: trii_s[r * t_chunks + (k >> 7), k & 127],
                scl_get=scl_get, tcl_get=tcl_get,
                sph_cl_base=b * sc_rows, tri_cl_base=b * tc_rows,
                ssup_get=ssup_get, tsup_get=tsup_get,
                sph_sup_base=b * ss_rows, tri_sup_base=b * ts_rows,
                # Seed the local best-t with the global running best so
                # this block's super/cluster gates prune against hits
                # found in nearer blocks (near-first order): without it
                # every block re-opens every gate at INF and the whole
                # hierarchy is gate-blind across blocks. Codes/params stay
                # neutral — the post-sweep merge is strictly `<`, so a
                # seeded (unbeaten) lane never overwrites the global
                # winner with the zero placeholders.
                carry=(bt, zero_i, zero_f, zero_f, zero_f, zero_f, zero_f,
                       zero_i, zero_i))

            lbt, lbc = local[0], local[1]
            is_tri = (lbc & 1) == 1
            gbc = jnp.where(is_tri, lbc + 2 * b * TRI_BLOCK,
                            lbc + 2 * b * SPH_BLOCK)
            better = lbt < t_ref[:]
            t_ref[:] = jnp.where(better, lbt, t_ref[:])
            code_ref[:] = jnp.where(better, gbc, code_ref[:])
            u_ref[:] = jnp.where(better, local[2], u_ref[:])
            v_ref[:] = jnp.where(better, local[3], v_ref[:])
            n0_ref[:] = jnp.where(better, local[4], n0_ref[:])
            n1_ref[:] = jnp.where(better, local[5], n1_ref[:])
            n2_ref[:] = jnp.where(better, local[6], n2_ref[:])
            pa_ref[:] = jnp.where(better, local[7], pa_ref[:])
            pb_ref[:] = jnp.where(better, local[8], pb_ref[:])

    _lim = int(os.environ.get("RAYTRACER_BLOCK_LIMIT", "0"))
    if _BLOCK_NEARFIRST and _lim:
        # refuse rather than silently run the static order: an ablation
        # combining the knobs would otherwise record mislabelled data
        raise ValueError(
            "RAYTRACER_BLOCK_LIMIT (a static-order prefix ablation) cannot "
            "be combined with RAYTRACER_BLOCK_NEARFIRST (dynamic pop order)")
    if _BLOCK_NEARFIRST and nblocks > 1:
        # Tile-true near-first pops (see _BLOCK_NEARFIRST): per-block
        # min-over-lanes entry distance up front, then pop ascending.
        def box_tmin(i):
            t1 = (bget(i, 0) - ox) * inv_dx
            t2 = (bget(i, 3) - ox) * inv_dx
            tmin = jnp.minimum(t1, t2)
            tmax = jnp.maximum(t1, t2)
            t1 = (bget(i, 1) - oy) * inv_dy
            t2 = (bget(i, 4) - oy) * inv_dy
            tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
            tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
            t1 = (bget(i, 2) - oz) * inv_dz
            t2 = (bget(i, 5) - oz) * inv_dz
            tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
            tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
            tmin = jnp.maximum(tmin, 0.0)
            return jnp.where((tmin <= tmax) & (tmax > 0.0), tmin, _INF)

        np_pad = -(-nblocks // LANES) * LANES
        bi = jax.lax.broadcasted_iota(jnp.int32, (1, np_pad), 1)
        tvec = jnp.full((1, np_pad), _INF, jnp.float32)
        for b in range(nblocks):
            # only fold pools with a REAL block at b: a pool-filler slot's
            # inverted box scores tmin = 0 under the swapped slab test and
            # would pin the block to the front of the pop order (b is a
            # Python int here, so the guard is free)
            tb = None
            if sph_blocks > b:
                tb = box_tmin(b * 2 + 0)
            if tri_blocks > b:
                tt = box_tmin(b * 2 + 1)
                tb = tt if tb is None else jnp.minimum(tb, tt)
            tvec = jnp.where(bi == b, jnp.min(tb), tvec)

        def pop_body(st):
            m = jnp.min(st)
            b = jnp.min(jnp.where(st == m, bi, np_pad))
            # visit_block re-gates against the evolving best-t (the exact
            # per-lane rule), so a stale pop only skips its sweep
            visit_block(b)
            return jnp.where(bi == b, _INF, st)

        jax.lax.while_loop(
            # min remaining entry distance >= every lane's best-t ⇒ no
            # remaining block can open any lane's gate: stop, untested
            lambda st: jnp.min(st) < jnp.max(t_ref[:]),
            pop_body, tvec)
    else:
        def block_body(i, _):
            visit_block(border_ref[cell + i])
            return 0

        jax.lax.fori_loop(0, min(_lim, nblocks) if _lim else nblocks,
                          block_body, 0)


def _run_kernel_blocked(planes, scene: SceneArrays, rows: int):
    """Dispatch the HBM-streamed kernel; returns the sweep's raw 9 outputs."""
    if rows % BROWS != 0:
        # grid=(rows // BROWS,) would silently truncate the tail rows,
        # leaving their output blocks as uninitialized garbage
        raise ValueError(
            f"RAYTRACER_BLOCKED_ROWS={BROWS} must divide the ray-plane row "
            f"count {rows} (a multiple of {ROWS}); pick a divisor of {ROWS} "
            f"or a tile height the render's row count is a multiple of")
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
        inverted [+INF, -INF] boxes so they VANISH in the block-union /
        super min-max reductions below. They must NOT reach any slab
        test: the min/max-swapped slab turns an inverted box into its
        swapped hull (always entered at tmin=0) — after the unions are
        computed, every pure-filler row is rewritten to NaN (fails every
        compare, so no gate ever opens)."""
        rows_needed = pool_slots // leaf
        out = jnp.tile(jnp.asarray(
            [[_INF, _INF, _INF, -_INF, -_INF, -_INF, 0.0, 0.0]],
            jnp.float32), (rows_needed, 1))
        if count > 0:
            out = out.at[:count].set(cl[:count])
        return out

    def leaf_boxes(pmin, pmax, leaf):
        """Per-leaf [lo, hi, 0, 0] cluster rows from per-primitive bounds
        (masked-out primitives arrive as inverted [+INF, -INF] and vanish
        in the min/max)."""
        n = pmin.shape[0]
        n_cl = -(-n // leaf)
        pad = n_cl * leaf - n
        if pad:
            pmin = jnp.concatenate(
                [pmin, jnp.full((pad, 3), _INF, jnp.float32)], axis=0)
            pmax = jnp.concatenate(
                [pmax, jnp.full((pad, 3), -_INF, jnp.float32)], axis=0)
        lo = pmin.reshape(n_cl, leaf, 3).min(axis=1)
        hi = pmax.reshape(n_cl, leaf, 3).max(axis=1)
        return jnp.concatenate(
            [lo, hi, jnp.zeros((n_cl, 2), jnp.float32)], axis=1)

    # Small pools carry no resident cluster table (scene.py builds one only
    # past its clustering threshold; the resident kernel sweeps them flat).
    # The blocked kernel's per-block hierarchy gates EVERYTHING through
    # cluster rows, so synthesise real per-leaf boxes from the primitives
    # themselves — before this existed, such pools rode all-filler rows
    # whose inverted boxes pass the swapped slab test (always open): the
    # stress100k floor quad opened every block's tri gate for every tile.
    if (int(scene.sph_clusters.shape[0]) == 0
            and int(scene.sph_center.shape[0]) > 0):
        ok = (scene.sph_radius > 0)[:, None]
        rad = scene.sph_radius[:, None]
        sphc = leaf_boxes(
            jnp.where(ok, scene.sph_center - rad, _INF),
            jnp.where(ok, scene.sph_center + rad, -_INF),
            int(scene.sph_leaf))
        s_n_cl = int(sphc.shape[0])
    else:
        s_n_cl = int(scene.sph_clusters.shape[0])
    if (int(scene.tri_clusters.shape[0]) == 0
            and int(scene.tri_v0.shape[0]) > 0):
        v0, v1 = scene.tri_v0, scene.tri_v0 + scene.tri_e1
        v2 = scene.tri_v0 + scene.tri_e2
        ok = scene.tri_valid[:, None]
        tric = leaf_boxes(
            jnp.where(ok, jnp.minimum(jnp.minimum(v0, v1), v2), _INF),
            jnp.where(ok, jnp.maximum(jnp.maximum(v0, v1), v2), -_INF),
            int(scene.tri_leaf))
        t_n_cl = int(tric.shape[0])
    else:
        t_n_cl = int(scene.tri_clusters.shape[0])

    sphc = pad_clusters(sphc, int(scene.sph_leaf), sphf.shape[1], s_n_cl)
    tric = pad_clusters(tric, int(scene.tri_leaf), trif.shape[1], t_n_cl)
    # equalise the block axis across pools: every pool must provide a block
    # (a never-entered one where it has run out of primitives)
    def pad_j(arr, per_block):
        # same inverted-filler convention as pad_clusters (union-neutral
        # now, NaN-ified before any slab test sees the rows)
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

    def block_layout(arr, block):
        """(words, nblocks*block) -> (nblocks * words * chunks, 128):
        per block, word-major chunk rows — the SMEM-DMA-compatible layout
        the kernel's accessors address as [w*chunks + (s>>7), s&127]."""
        w = arr.shape[0]
        chunks = block // LANES
        return arr.reshape(w, nblocks, chunks, LANES).transpose(
            1, 0, 2, 3).reshape(nblocks * w * chunks, LANES)

    sphf_b = block_layout(sphf, SPH_BLOCK)
    sphi_b = block_layout(sphi, SPH_BLOCK)
    trif_b = block_layout(trif, TRI_BLOCK)
    trii_b = block_layout(trii, TRI_BLOCK)

    smem = pltpu.SMEM
    f32 = jnp.float32
    sc_rows = SPH_BLOCK // int(scene.sph_leaf)
    tc_rows = TRI_BLOCK // int(scene.tri_leaf)

    # per-block union boxes (row 2j = sphere pool, 2j+1 = triangle pool):
    # the kernel skips a block when no lane can beat its best inside
    # either union. Filler boxes are [+INF..,-INF..] and vanish in min/max.
    def block_boxes(cl, rows_per_block):
        c = cl.reshape(nblocks, rows_per_block, 8)
        lo = jnp.min(c[:, :, 0:3], axis=1)
        hi = jnp.max(c[:, :, 3:6], axis=1)
        return jnp.concatenate(
            [lo, hi, jnp.zeros((nblocks, 2), f32)], axis=1)

    def layout8(arr):
        """(N, 8) box rows -> (8 * ceil(N/128), 128): word-major rows with
        a 128 minor dim (SMEM pads an 8-wide minor to 128 — 16x waste)."""
        n = arr.shape[0]
        cc = -(-n // LANES)
        pad = cc * LANES - n
        if pad:
            arr = jnp.concatenate(
                [arr, jnp.tile(jnp.asarray(
                    [[_INF, _INF, _INF, -_INF, -_INF, -_INF, 0.0, 0.0]],
                    f32), (pad, 1))], axis=0)
        return arr.reshape(cc, LANES, 8).transpose(2, 0, 1).reshape(
            8 * cc, LANES)

    def nan_inverted(arr8):
        """NaN every still-inverted box row (lo > hi — all-filler unions;
        real rows always have lo <= hi). NaN fails every slab compare, the
        only way to express "never enter" under the min/max-swapped test;
        an inverted box is its swapped hull there — always entered."""
        return jnp.where((arr8[:, 0] > arr8[:, 3])[:, None],
                         jnp.nan, arr8)

    sb_box = block_boxes(sphc, sc_rows)
    tb_box = block_boxes(tric, tc_rows)
    # nan_inverted also covers EMPTY pools (pad_pool always yields >= 1
    # block, so e.g. a tri-only scene still carries an all-filler sphere
    # block 0 the b < sph_blocks guards cannot catch)
    bbox = layout8(nan_inverted(jnp.stack([sb_box, tb_box], axis=1).reshape(
        nblocks * 2, 8)))

    # Per-cell near-first block visitation order (see _kernel_blocked):
    # distance from each lattice-cell centre to each block's combined
    # (sphere ∪ triangle) union box, argsorted. Tiny (grid^3 x nblocks)
    # device-side sort, recomputed per dispatch — nanoseconds next to one
    # block DMA. Filler-pool boxes are [+INF, -INF] and sort last.
    comb_lo = jnp.minimum(sb_box[:, 0:3], tb_box[:, 0:3])
    comb_hi = jnp.maximum(sb_box[:, 3:6], tb_box[:, 3:6])
    glo = jnp.min(comb_lo, axis=0)
    extent = jnp.maximum(jnp.max(comb_hi, axis=0) - glo, 1e-6)
    og = _ORDER_GRID
    cidx = (jnp.arange(og, dtype=f32) + 0.5) / og
    centers = glo + jnp.stack(
        jnp.meshgrid(cidx, cidx, cidx, indexing="ij"),
        axis=-1).reshape(-1, 3) * extent
    dvec = (jnp.maximum(comb_lo[None, :, :] - centers[:, None, :], 0.0)
            + jnp.maximum(centers[:, None, :] - comb_hi[None, :, :], 0.0))
    dist = jnp.sum(dvec * dvec, axis=-1)            # (grid^3, nblocks)
    border = jnp.argsort(dist, axis=1).astype(jnp.int32).reshape(-1)
    bgrid = jnp.concatenate([glo, og / extent]).astype(f32)

    # Per-block super level: group each block's leaf clusters (build order
    # = BVH DFS order, spatially contiguous) into boxes of SUP_GROUP with
    # block-local (start, count) — the in-block analog of the resident
    # kernel's super-cluster tables. Filler rows vanish in the union
    # reductions; pure-filler supers are NaN-ified below.
    def block_supers(cl, rows_per_block):
        grp = min(SUP_GROUP, rows_per_block)
        ns = rows_per_block // grp
        c = cl.reshape(nblocks, ns, grp, 8)
        lo = jnp.min(c[..., 0:3], axis=2)
        hi = jnp.max(c[..., 3:6], axis=2)
        start = jnp.broadcast_to(
            (jnp.arange(ns, dtype=f32) * grp)[None, :, None],
            (nblocks, ns, 1))
        cnt = jnp.full((nblocks, ns, 1), float(grp), f32)
        return (jnp.concatenate([lo, hi, start, cnt], axis=-1)
                .reshape(nblocks * ns, 8), ns)

    sphs, ss_rows = block_supers(sphc, sc_rows)
    tris, ts_rows = block_supers(tric, tc_rows)

    # Rewrite every still-inverted cluster row / super group to NaN (see
    # nan_inverted above) now that all union reductions are done: before
    # this, the last block's filler rows and every all-filler sub-block
    # swept thousands of dead primitives per entered block. A group
    # straddling real and filler rows keeps its real union; the only other
    # readers of these rows are the reductions above, which already ran.
    sphs = nan_inverted(sphs)
    tris = nan_inverted(tris)
    sphc = nan_inverted(sphc)
    tric = nan_inverted(tric)

    sphs = layout8(sphs)
    tris = layout8(tris)
    sphc = layout8(sphc)
    tric = layout8(tric)

    ray_spec = pl.BlockSpec((BROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_dts = [f32, jnp.int32, f32, f32, f32, f32, f32,
               jnp.int32, jnp.int32]
    s_chunks = SPH_BLOCK // LANES
    t_chunks = TRI_BLOCK // LANES
    outs = pl.pallas_call(
        functools.partial(
            _kernel_blocked,
            nblocks=nblocks, sph_blocks=sb, tri_blocks=tb,
            has_one_way=bool(scene.has_one_way),
            needs_tri_uv=bool(scene.needs_tri_uv),
            sph_leaf=int(scene.sph_leaf), tri_leaf=int(scene.tri_leaf),
            ss_rows=ss_rows, ts_rows=ts_rows),
        grid=(rows // BROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=smem),      # sphc (resident)
            pl.BlockSpec(memory_space=smem),      # tric (resident)
            pl.BlockSpec(memory_space=smem),      # sphs (resident supers)
            pl.BlockSpec(memory_space=smem),      # tris (resident supers)
            pl.BlockSpec(memory_space=smem),      # bbox (resident)
            pl.BlockSpec(memory_space=smem),      # border (near-first)
            pl.BlockSpec(memory_space=smem),      # bgrid (cell lattice)
            pl.BlockSpec(memory_space=pl.ANY),  # sphf blocks (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # sphi blocks
            pl.BlockSpec(memory_space=pl.ANY),  # trif blocks
            pl.BlockSpec(memory_space=pl.ANY),  # trii blocks
        ] + [ray_spec] * 6,
        out_specs=tuple(
            pl.BlockSpec((BROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in out_dts),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), dt) for dt in out_dts),
        scratch_shapes=[
            pltpu.SMEM((4 * s_chunks, LANES), jnp.float32),
            pltpu.SMEM((2 * s_chunks, LANES), jnp.int32),
            pltpu.SMEM((24 * t_chunks, LANES), jnp.float32),
            pltpu.SMEM((2 * t_chunks, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=_interpret(),
    )(sphc, tric, sphs, tris, bbox, border, bgrid,
      sphf_b, sphi_b, trif_b, trii_b, *planes)
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
    from .sweep import pack_lane_planes
    sph_pf, sph_pi, tri_pf, tri_pi = pack_lane_planes(scene)
    sph_lane = (scene.sph_lane_leaf > 0
                and scene.sph_lane_clusters.shape[0] > 0)
    tri_lane = (scene.tri_lane_leaf > 0
                and scene.tri_lane_clusters.shape[0] > 0)
    dummy_cl = jnp.zeros((1, 8), jnp.float32)
    slcl = scene.sph_lane_clusters if sph_lane else dummy_cl
    tlcl = scene.tri_lane_clusters if tri_lane else dummy_cl
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
                          num_sph_lane=int(scene.sph_lane_clusters.shape[0]),
                          num_tri_lane=int(scene.tri_lane_clusters.shape[0]),
                          sph_lane_leaf=int(scene.sph_lane_leaf),
                          tri_lane_leaf=int(scene.tri_lane_leaf),
                          with_stats=with_stats),
        grid=(rows // ROWS,),
        in_specs=([scene_spec] * 13
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
                  + [ray_spec] * 6),
        out_specs=(ray_spec,) * len(out_dts),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), dt) for dt in out_dts),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * (num_spheres * 30 + num_tris * 60),
            bytes_accessed=n_pad * 4 * 15,
            transcendentals=n_pad * num_spheres,
        ),
        # Lane traversal mask planes can exceed Mosaic's default 16 MiB
        # scoped-vmem stack on multi-chunk pools (see megakernel.py).
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
            if (sph_lane or tri_lane) else None),
        interpret=_interpret(),
    )(sphf, sphi, trif, trii, sphc, tric, sphs, tris,
      sph_order, tri_order, cell_grid, slcl, tlcl,
      sph_pf, sph_pi, tri_pf, tri_pi, *planes)

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
