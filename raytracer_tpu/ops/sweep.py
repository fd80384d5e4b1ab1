"""Shared tile-sweep intersection core for the Pallas TPU kernels.

One definition of the primitive sweep, consumed by both
``ops/intersect_pallas.py`` (the wavefront nearest-hit kernel) and
``ops/megakernel.py`` (the full spp x bounce kernel) — the math that must
stay bit-identical between them lives here once.

TPU-native redesign of the reference's per-thread ``hit()`` dispatch +
stack-DFS BVH traversal (src/raytracer.cu:24-46, src/objects.cu:487-532):
one grid step owns a (rows, 128) tile of rays in vector registers and sweeps
primitives with broadcast scalars from SMEM, keeping a running best per
lane. The BVH is two levels of tile-granular AABB gates (super-clusters over
leaf clusters) instead of divergent per-ray pointer-chasing.

Performance structure (why the sweep looks the way it does):

- **Unit directions (a = 1).** Callers normalise ``d`` once per bounce, so
  the sphere quadratic collapses to the half-b form ``t = h - sqrt(h² - c)``
  (src/objects.cu:40-79 computes the general form; normalising d is a pure
  reparameterisation of t).
- **Poisoned padding, no validity loads.** Padding spheres carry
  ``cr2 = 1e30`` so their discriminant is always negative; padding/degenerate
  triangles carry all-zero Woop rows so ``t = -0/0 = NaN`` fails every
  comparison. The per-primitive ``ok`` flag of the reference
  (src/objects.cu:55 analog) costs nothing at sweep time.
- **Exact-LEAF clusters, unrolled.** Scene build cuts BVH leaves to exactly
  ``LEAF`` primitives (tail poisoned), so a leaf sweep is a static-trip-count
  loop: ``leaf start = cluster_index * LEAF`` needs no SMEM loads, and the
  body is unrolled ``UNROLL``-wide to hide VPU latency behind independent
  primitive tests.
- **Packed shading params.** The winner's denormalised albedo rides one
  int32 (10 bits per channel, quantised at scene build so the XLA oracle
  sees identical values); material id rides another. The carry is 10 arrays
  instead of 14 — the selects after ``better`` are most of the per-primitive
  cost at (32, 128) tile shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6
_INF = 1e30

import os

LANES = 128
# target primitives per BVH leaf cluster (smaller = finer culling, more
# cluster gates; each gate costs a slab test + a cross-lane any + a scalar
# branch). 32 measured best on the reference workloads.
LEAF_TARGET = int(os.environ.get("RAYTRACER_LEAF", "32"))
ORDER_GRID = 4    # cells per axis of the near-first order lattice
UNROLL = int(os.environ.get("RAYTRACER_SWEEP_UNROLL", "4"))
# (RAYTRACER_KCARRY — K parallel best-hit chains merged at sweep end —
# was deleted after measuring negative both before and after the lean
# carry: the K-1 extra carry registers cost more than the shortened
# serial chain buys. docs/ROADMAP.md kept-negative list.)
# (RAYTRACER_PAIRMIN — a strict-< min TREE over each UNROLL group of
# probed (t, code[, u, v]) candidates with one carry commit per group,
# shortening the serial best-hit chain ~2x — was deleted after losing
# both interleaved hardware A/Bs on both its targets: headline
# 635.2/638.4 vs 662.5/666.7 default (-4.2%) and stress10k 11.37/11.37
# vs 11.43/11.43, v5e 2026-08-19 (docs/TESTLOG.md session 6). Same
# lesson as KCARRY from the other side: the sweep's cmp+select chain is
# already hidden under the slab/fetch pipeline, and restructuring it
# only adds ops. Do not re-try chain-shortening without new hardware
# facts.)


def leaf_size(n: int) -> int:
    """Static per-pool leaf size: primitives distributed evenly over
    ceil(n / LEAF_TARGET) leaves, rounded up to the unroll width.

    Keeps the sweep's inner loop a static, unrollable trip count while
    bounding padding waste to < UNROLL slots per leaf (a fixed 32 would
    waste up to 44% of the sweep on small pools, e.g. 104 -> 128 slots)."""
    leaves = -(-n // LEAF_TARGET)
    per = -(-n // leaves)
    return -(-per // UNROLL) * UNROLL

# sphere f32 rows (see pack_scene)
S_CX, S_CY, S_CZ, S_CR2 = range(4)
S_F32_ROWS = 4
# sphere i32 rows: [colour30, smooth8<<16 | mat_id]
S_PA, S_PB = range(2)
S_I32_ROWS = 2

# triangle f32 rows
T_WU = 0          # 4 rows: Woop u row [r | -r.p0]
T_WV = 4          # 4 rows
T_WW = 8          # 4 rows
T_NRM = 12        # 3 rows: unit geometric normal
T_CULL = 15       # 3 rows: one-way cull normal (zero = two-sided)
T_UV = 18         # 6 rows: uv0.x uv0.y uv1.x uv1.y uv2.x uv2.y
T_F32_ROWS = 24
T_I32_ROWS = 2    # [colour30, smooth8<<16 | mat_id]


def quantise_colour(c):
    """Host-side 10-bit albedo quantisation (clamped to [0, 1]).

    Per-primitive const colours are stored at 10 bits/channel so the sweep
    can carry all three in one int32 select. Quantisation happens once at
    scene build, so every backend (XLA oracle, Pallas kernels) computes from
    the same values. Reconstruction multiplies by float32(1/1023) exactly as
    the kernel does, making the round trip bitwise consistent.
    """
    import numpy as np
    q = np.round(np.clip(np.asarray(c, np.float32), 0.0, 1.0) * 1023.0)
    return q.astype(np.float32) * np.float32(1.0 / 1023.0)


def quantise_smooth(s):
    """Host-side 8-bit smoothness quantisation (clamped to [0, 1]).

    Smoothness is a lerp weight between the diffuse and specular directions
    (src/ray.cu:67-75); 8 bits (0.4% steps) is far below visible thresholds
    and lets the sweep pack it with the material id in one int32 select.
    Applied once at scene build so every backend sees identical values.
    """
    import numpy as np
    q = np.round(np.clip(np.asarray(s, np.float32), 0.0, 1.0) * 255.0)
    return q.astype(np.float32) * np.float32(1.0 / 255.0)


def encode_colour30(col):
    """(..., 3) f32 quantised colour -> int32 with 10 bits per channel."""
    q = jnp.round(jnp.clip(col, 0.0, 1.0) * 1023.0).astype(jnp.int32)
    return (q[..., 0] << 20) | (q[..., 1] << 10) | q[..., 2]


def decode_colour30(pa):
    """int32 packed colour -> (r, g, b) f32 planes."""
    s = jnp.float32(1.0 / 1023.0)
    r = ((pa >> 20) & 1023).astype(jnp.float32) * s
    g = ((pa >> 10) & 1023).astype(jnp.float32) * s
    b = (pa & 1023).astype(jnp.float32) * s
    return r, g, b


def encode_smooth_mat(smooth, mat_id):
    """(smoothness f32 quantised, mat id) -> int32 smooth8<<16 | mat."""
    q = jnp.round(jnp.clip(smooth, 0.0, 1.0) * 255.0).astype(jnp.int32)
    return (q << 16) | mat_id.astype(jnp.int32)


def decode_smooth_mat(pb):
    """int32 -> (smoothness f32, mat id i32)."""
    smooth = ((pb >> 16) & 255).astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    return smooth, pb & 0xFFFF


# --- per-lane traversal (divergent-ray path) --------------------------------
# The reference absorbs ray divergence with a per-thread stack DFS
# (src/objects.cu:487-532); the VPU has no per-lane random memory access
# beyond the 128-wide lane-dimension dynamic gather, so the TPU-native
# equivalent restructures the problem until that one gather suffices:
#
# - the BVH-ordered pool is cut into "lane clusters" (scene build) in
#   CHUNKS of 124 (so each chunk's cluster indices address one 128-lane
#   plane and pack into four 31-bit int32 mask words; pools up to
#   RAYTRACER_LANE_CHUNKS x 124 clusters keep the shared sweep's own leaf
#   granularity instead of coarsening — the round-4 fix for the coarse
#   84-prim lane leaves that erased stress10k's footprint saving);
# - primitive parameters are laid out param-major as (param * leaf + j,
#   chunk * 128 + cluster-in-chunk) planes, so ALL lanes fetch the j-th
#   primitive of *their own* cluster with one dynamic gather per parameter
#   per chunk (a chunk-id select chain combines multi-chunk fetches);
# - phase 1 slab-tests every lane cluster against the tile with shared SMEM
#   broadcasts (no reduces, no branches), building the per-lane masks and
#   the per-lane nearest entered cluster;
# - the nearest cluster is visited first, the masks are rebuilt pruned by
#   the established best-t, then a while_loop pops each lane's next mask
#   bit and sweeps that lane's own leaf until every mask is empty.
#
# A tile's cost becomes max-over-lanes(entered clusters) leaf sweeps instead
# of the union-over-lanes footprint that dominates post-diffuse bounces.

LANE_WORD_BITS = 31   # bits used per int32 mask word (sign bit unused)
# Clusters per lane chunk: each chunk owns one 128-lane fetch plane
# (columns 124-127 padded; 124 = 4 x 31 keeps chunk boundaries aligned to
# the 31-bit mask words, which remain one global ceil(n_cl/31)-word list).
# Pools of up to RAYTRACER_LANE_CHUNKS x 124 clusters traverse per-lane at
# the shared sweep's own leaf granularity — the round-5 fix for the
# coarse-leaf lane pools that erased stress10k's footprint saving
# (see models/scene.py).
LANE_CHUNK_CL = 124


def lane_chunks(n_cl: int) -> int:
    """Number of 124-cluster lane chunks a pool of n_cl clusters needs."""
    return max(1, -(-n_cl // LANE_CHUNK_CL))
LANE_NEAR_FIRST = os.environ.get("RAYTRACER_LANE_NEAR_FIRST", "1") == "1"
# Hybrid dispatch: tiles whose squared direction-resultant exceeds this take
# the shared gate sweep (coherent => tight union footprint); below it the
# per-lane traversal wins. LANE_FORCE pins the lane path on (ablations).
LANE_R2 = float(os.environ.get("RAYTRACER_LANE_R2", "0.25"))
LANE_FORCE = os.environ.get("RAYTRACER_LANE_FORCE") == "1"
# (RAYTRACER_TRI_FIRST — sweep triangles before spheres so the checker
# floor's best-t closes sphere gates — was deleted after losing its
# hardware A/B on the scene it targeted: 660.9 vs 666.1 Mrays/s default,
# v5e 2026-08-19 04:36/05:23, docs/TESTLOG.md session 4 extended.)
# Gate leaf clusters in PAIRS: one any+cond scalar sync per two clusters
# (DFS-adjacent clusters are spatially adjacent, so both usually agree).
# Bitwise identical to single gating: a gate only skips a cluster when no
# lane can beat its best-t inside the cluster's box, and the best-hit
# select is strictly `t < bt` — sweeping extra (gate-losing) clusters can
# never change a winner. The round-2 one-shot +3.3% headline did NOT
# reproduce under interleaved repeats (on 642.7/643.5/645.0 vs off
# 640.0/661.3 Mrays/s, v5e 2026-08-19 — a wash within tunnel drift;
# docs/TESTLOG.md session 5). Kept default-on: no measured loss, and half
# the gate syncs is the structurally safer side. RAYTRACER_GATE2=0
# restores per-cluster gates.
GATE2 = os.environ.get("RAYTRACER_GATE2", "1") == "1"
# NaN-poisoned sphere miss test (see sph_body_at): drops the explicit
# disc >= 0 guard. Bitwise identical; measurement knob.
SPH_NAN = os.environ.get("RAYTRACER_SPH_NAN", "1") == "1"
# (RAYTRACER_GATE2_ORDERED — gate pairing on the ordered/near-first
# paths — was deleted after losing on every scene it applies to: monkey
# 99.6 -> 94.5, monkey+coherent 199.7 -> 175.6, stress10k 11.8 -> 11.3,
# v5e 20 spp. Pairing trades halved gate syncs for sweeping the pair
# partner at the pre-pair best-t; on divergent ordered scenes the
# overshoot always won. docs/ROADMAP.md kept-negative list.)
# Mask-pop traversal for cluster-heavy pools: the gate scheme pays one
# any+cond scalar sync per cluster (plus one per super) whether or not the
# gate opens — 300+ per tile per bounce on the 10k-sphere field, where
# only ~10% of gates open. Mask-pop instead (1) bootstraps best-t through
# the existing near-first gates on a small prefix, (2) slab-tests EVERY
# remaining cluster vectorised into per-lane entry masks (lane_masks — no
# syncs), and (3) pops the tile's union one cluster at a time, each pop
# costing one min-reduce + one retest cond. Scalar syncs drop from
# O(clusters) to O(union). Bitwise identical: masks are built against a
# bootstrap best-t >= the final one, so every cluster a lane could still
# win is present, the retest is the same rule as cluster_gate, and extra
# sweeps are no-ops under the strict < select. One caveat shared with the
# lane traversal: the strict < makes EXACT-t ties between
# primitives in different clusters resolve to the first-swept one, and
# mask-pop visits clusters in index order rather than near-first — scenes
# with coincident duplicate geometry can pick the other twin. Opt-in
# until measured.
MASKPOP = os.environ.get("RAYTRACER_MASKPOP", "0") == "1"
# Each popped cluster is retested against the evolving best-t before
# sweeping (the cluster_gate rule) — unconditional. The retest-free
# variant (RAYTRACER_MASKPOP_RETEST=0: half the per-pop syncs, sweep
# every pop) was deleted after losing both hardware A/Bs decisively:
# stress10k 7.68 vs 11.42 default (-33%, 04:19) and 7.84 with SROWS=64
# (-31%, 04:59), v5e 2026-08-19, docs/TESTLOG.md sessions 4-5.
MASKPOP_MIN = int(os.environ.get("RAYTRACER_MASKPOP_MIN", "64"))
MASKPOP_BOOT = int(os.environ.get("RAYTRACER_MASKPOP_BOOT", "8"))
MASKPOP_BOOT_SUPERS = int(os.environ.get("RAYTRACER_MASKPOP_BOOT_SUPERS",
                                         "2"))


def lane_words(n_clusters: int) -> int:
    return -(-n_clusters // LANE_WORD_BITS)


def _pow2_log2(x):
    """floor(log2(x)) for x a power of two in [1, 2^30] (junk for x <= 0).

    Powers of two up to 2^30 convert to float32 exactly; the biased
    exponent field then reads the index off in 3 vector ops (validated on
    Mosaic and in interpret mode)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return ((bits >> 23) & 0xFF) - 127


def _pop_next(masks, zero_i):
    """Per-lane: pop the lowest set bit across the mask words.

    Returns (cluster_index, live, new_masks); ``live`` lanes had a bit,
    dead lanes return cluster 0 (their sweep results are masked off)."""
    sel = masks[0]
    woff = zero_i
    for w in range(1, len(masks)):
        empty = sel == 0
        sel = jnp.where(empty, masks[w], sel)
        woff = jnp.where(empty, w * LANE_WORD_BITS, woff)
    low = sel & -sel
    live = sel != 0
    c = jnp.where(live, woff + _pow2_log2(low), 0)
    new_masks = [
        jnp.where(woff == w * LANE_WORD_BITS, masks[w] & ~low, masks[w])
        for w in range(len(masks))]
    return c, live, new_masks


def _clear_bit(masks, c, live):
    """Clear per-lane bit ``c`` (where live) from the mask words."""
    out = []
    for w in range(len(masks)):
        rel = c - w * LANE_WORD_BITS
        in_w = live & (rel >= 0) & (rel < LANE_WORD_BITS)
        bit = jnp.where(in_w, 1 << jnp.clip(rel, 0, LANE_WORD_BITS - 1), 0)
        out.append(masks[w] & ~bit)
    return out


# Mosaic SMEM capacity on v5e is ~1 MiB; leave headroom for the compiler's
# own scalar spills (a 10k-sphere scene once compiled at 1.5M/1.0M and died
# with a raw Mosaic stack trace — the budget makes the limit a structured,
# testable property instead).
SMEM_BUDGET = 800_000


def smem_bytes(scene) -> int:
    """Bytes of SMEM the sweep's scene-resident layout needs.

    Mirrors pack_scene exactly: spheres 6 words each (4 f32 + 2 i32),
    triangles 26 words (24 f32 + 2 i32), cluster/super/lane-cluster rows
    8 f32 each, cell-order tables 1 i32 per entry, material table 16 f32
    rows. (Lane-mode primitive planes live in VMEM, not SMEM.)
    """
    s = int(scene.sph_center.shape[0])
    t = int(scene.tri_v0.shape[0])
    rows = (s * (S_F32_ROWS + S_I32_ROWS)
            + t * (T_F32_ROWS + T_I32_ROWS)
            + 8 * (max(int(scene.sph_clusters.shape[0]), 1)
                   + max(int(scene.tri_clusters.shape[0]), 1)
                   + max(int(scene.sph_supers.shape[0]), 1)
                   + max(int(scene.tri_supers.shape[0]), 1)
                   + max(int(scene.sph_lane_clusters.shape[0]), 1)
                   + max(int(scene.tri_lane_clusters.shape[0]), 1))
            + int(scene.sph_cell_order.shape[0])
            + int(scene.tri_cell_order.shape[0])
            + 16 * int(scene.mat_type.shape[0]) + 16)
    return rows * 4


def fits_smem(scene) -> bool:
    return smem_bytes(scene) <= SMEM_BUDGET


def tile_cell(ox, oy, oz, grid_ref):
    """Tile's coarse ORDER_GRID lattice cell from its mean ray origin.

    Selects the host-precomputed near-first visitation order (see
    scene._cell_order); shared by the resident sweep and the HBM-streamed
    blocked kernel so both always pick consistent cell conventions.
    ``grid_ref[0:3]`` is the lattice origin, ``grid_ref[3:6]`` the inverse
    cell extents."""
    inv_n = 1.0 / float(ox.size)
    mox = jnp.sum(ox) * inv_n
    moy = jnp.sum(oy) * inv_n
    moz = jnp.sum(oz) * inv_n
    g = ORDER_GRID
    cxi = jnp.clip(((mox - grid_ref[0]) * grid_ref[3]).astype(jnp.int32),
                   0, g - 1)
    cyi = jnp.clip(((moy - grid_ref[1]) * grid_ref[4]).astype(jnp.int32),
                   0, g - 1)
    czi = jnp.clip(((moz - grid_ref[2]) * grid_ref[5]).astype(jnp.int32),
                   0, g - 1)
    return (cxi * g + cyi) * g + czi


def safe_inv_dir(dx, dy, dz):
    """Robust slab-test reciprocals: a zero direction component maps to a
    large finite value instead of inf, so (box_bound - origin) * inv never
    produces 0 * inf = NaN (which would make every comparison false and
    wrongly cull a cluster a boundary ray actually enters)."""
    def inv(c):
        return jnp.where(c == 0.0, _INF, 1.0 / c)
    return inv(dx), inv(dy), inv(dz)


def _sph_rows(scene):
    """Sphere pool row matrices (shared by pack_scene / pack_lane_planes).

    Padding spheres (radius <= 0) are poisoned with ``cr2 = 1e30``
    (discriminant always negative — ``h² = (d·(c-o))² <= |c-o|²`` stays far
    below 1e30 for any ray the camera can produce)."""
    ok = scene.sph_radius > 0.0
    cr2 = jnp.where(
        ok,
        jnp.sum(scene.sph_center * scene.sph_center, axis=-1)
        - scene.sph_radius * scene.sph_radius,
        _INF)
    sph_f32 = jnp.stack([
        scene.sph_center[:, 0],
        scene.sph_center[:, 1],
        scene.sph_center[:, 2],
        cr2,
    ])
    sph_i32 = jnp.stack([
        encode_colour30(scene.sph_colour),
        encode_smooth_mat(scene.sph_smooth, scene.sph_mat),
    ])
    return sph_f32, sph_i32


def _tri_rows(scene):
    """Triangle pool row matrices; padding/degenerate triangles carry
    all-zero Woop rows (t = -0/0 = NaN fails every comparison)."""
    tri_f32 = jnp.concatenate([
        scene.tri_wu.T,                                # 0-3
        scene.tri_wv.T,                                # 4-7
        scene.tri_ww.T,                                # 8-11
        scene.tri_normal.T,                            # 12-14
        scene.tri_cull.T,                              # 15-17
        scene.tri_uv0.T,                               # 18-19
        scene.tri_uv1.T,                               # 20-21
        scene.tri_uv2.T,                               # 22-23
    ], axis=0)
    tri_i32 = jnp.stack([
        encode_colour30(scene.tri_colour),
        encode_smooth_mat(scene.tri_smooth, scene.tri_mat),
    ])
    return tri_f32, tri_i32


def pack_scene(scene):
    """SceneArrays -> SMEM-resident row matrices for the sweep.

    Returns (sph_f32, sph_i32, tri_f32, tri_i32, sph_clusters, tri_clusters,
    sph_supers, tri_supers, sph_cell_order, tri_cell_order, cell_grid).
    Padding primitives are poisoned (see _sph_rows/_tri_rows).
    """
    sph_f32, sph_i32 = _sph_rows(scene)
    tri_f32, tri_i32 = _tri_rows(scene)

    def clusters_or_dummy(c):
        return c if c.shape[0] > 0 else jnp.zeros((1, 8), jnp.float32)

    return (sph_f32, sph_i32, tri_f32, tri_i32,
            clusters_or_dummy(scene.sph_clusters),
            clusters_or_dummy(scene.tri_clusters),
            clusters_or_dummy(scene.sph_supers),
            clusters_or_dummy(scene.tri_supers),
            scene.sph_cell_order, scene.tri_cell_order, scene.cell_grid)


def pack_lane_planes(scene):
    """Param-major per-lane fetch planes for the lane traversal.

    Layout: row ``p * leaf + j``, column ``q * 128 + r`` holds parameter
    ``p`` of the j-th primitive of lane cluster ``q * LANE_CHUNK_CL + r``
    (r < 124; columns 124-127 of each chunk are padding) — so within a
    chunk all 128 lanes fetch their *own* cluster's j-th primitive with
    one lane-dimension dynamic gather per parameter, and pools bigger
    than one chunk loop chunks statically (lane_traverse). Values are the
    exact pack_scene pool values (same poisoning), so lane-path results
    are bitwise identical to the shared sweep's.

    Returns (sph_pf, sph_pi, tri_pf, tri_pi); (8, 128) zero dummies for
    pools with the lane path disabled.
    """
    def relayout(mat, leaf, n_cl, poison_row=None):
        p, n = mat.shape
        total = n_cl * leaf
        if total > n:
            pad = jnp.zeros((p, total - n), mat.dtype)
            mat = jnp.concatenate([mat, pad], axis=1)
            if poison_row is not None:
                mat = mat.at[poison_row, n:].set(_INF)
        mat = mat[:, :total].reshape(p, n_cl, leaf).transpose(0, 2, 1)
        pm = mat.reshape(p * leaf, n_cl)
        ch = lane_chunks(n_cl)
        out = jnp.zeros((p * leaf, ch * LANES), pm.dtype)
        if poison_row is not None:
            # chunk pad columns (124-127 and the last chunk's tail) are
            # only ever gathered by dead lanes (live=False masks their
            # results), but poison them anyway so a future caller bug
            # reads a guaranteed miss instead of garbage
            out = out.at[poison_row * leaf:(poison_row + 1) * leaf, :].set(
                _INF)
        for q in range(ch):
            c0 = q * LANE_CHUNK_CL
            w = min(LANE_CHUNK_CL, n_cl - c0)
            out = out.at[:, q * LANES:q * LANES + w].set(pm[:, c0:c0 + w])
        return out

    dummy_f = jnp.zeros((8, LANES), jnp.float32)
    dummy_i = jnp.zeros((8, LANES), jnp.int32)
    sph_pf, sph_pi = dummy_f, dummy_i
    tri_pf, tri_pi = dummy_f, dummy_i
    if scene.sph_lane_leaf > 0 and scene.sph_lane_clusters.shape[0] > 0:
        f32, i32 = _sph_rows(scene)
        n_cl = int(scene.sph_lane_clusters.shape[0])
        sph_pf = relayout(f32, scene.sph_lane_leaf, n_cl,
                          poison_row=S_CR2)
        sph_pi = relayout(i32, scene.sph_lane_leaf, n_cl)
    if scene.tri_lane_leaf > 0 and scene.tri_lane_clusters.shape[0] > 0:
        f32, i32 = _tri_rows(scene)
        n_cl = int(scene.tri_lane_clusters.shape[0])
        tri_pf = relayout(f32, scene.tri_lane_leaf, n_cl)
        tri_pi = relayout(i32, scene.tri_lane_leaf, n_cl)
    return sph_pf, sph_pi, tri_pf, tri_pi


def sweep_tile(sphf, sphi, trif, trii, sphc, tric, sphs, tris,
               sph_order, tri_order, grid_ref,
               ox, oy, oz, dx, dy, dz, zero_f, zero_i, *,
               num_spheres: int, num_tris: int,
               num_sph_clusters: int, num_tri_clusters: int,
               num_sph_supers: int, num_tri_supers: int,
               has_one_way: bool, needs_tri_uv: bool,
               sph_ordered: bool = False, tri_ordered: bool = False,
               sph_leaf: int = LEAF_TARGET, tri_leaf: int = LEAF_TARGET,
               stats_ref=None, carry=None, defer_params: bool = False,
               fast_div: bool = False,
               sget_f=None, sget_i=None, tget_f=None, tget_i=None,
               scl_get=None, tcl_get=None,
               sph_cl_base=0, tri_cl_base=0,
               ssup_get=None, tsup_get=None,
               sph_sup_base=0, tri_sup_base=0,
               sph_lane_cl_get=None, tri_lane_cl_get=None,
               sph_lane_pf=None, sph_lane_pi=None,
               tri_lane_pf=None, tri_lane_pi=None,
               num_sph_lane: int = 0, num_tri_lane: int = 0,
               sph_lane_leaf: int = 0, tri_lane_leaf: int = 0):
    """Nearest hit + winner shading params for one ray tile.

    ``ox..dz`` are (rows, 128) component planes with **unit** directions;
    ``zero_f``/``zero_i`` are all-zero f32/i32 arrays of the tile shape the
    caller derived from loaded data (Mosaic while_loop carries reject
    broadcast-constant "replicated" layouts, so the caller controls the
    provenance of the init).

    With ``defer_params=False`` returns a 9-tuple carry:
      (bt, bc, bu, bv, g0, g1, g2, pa, pb)
    - bt: best t (unit-direction parameterisation; _INF = miss)
    - bc: winner code = prim_index * 2 + is_triangle
    - bu, bv: interpolated texture UV (triangles; when needs_tri_uv)
    - g0..g2: sphere centre / triangle geometric normal
    - pa: winner colour30 (i32)
    - pb: winner smooth8<<16 | mat_id (i32) — see decode_smooth_mat

    With ``defer_params=True`` returns only (bt, bc, bu, bv) where bu/bv
    are the winner's *raw barycentrics* (when needs_tri_uv): the sweep is
    issue-bound and the per-primitive winner-param selects are most of its
    issue cost, so callers that can afford one post-sweep lane-gather per
    param (fetch_winner_param over pack_param_planes) drop from 7-9 selects
    per primitive to 2-4.
    """
    # Primitive accessors: default = direct (word, prim) indexing of the
    # SMEM-resident pools; the HBM-streamed kernel passes accessors that
    # address its (word-chunk, 128)-blocked scratch layout instead.
    # ``sph_cl_base``/``tri_cl_base`` offset cluster-box rows the same way
    # (cluster boxes stay resident; primitive indices are block-local).
    if sget_f is None:
        sget_f = lambda r, s: sphf[r, s]
    if sget_i is None:
        sget_i = lambda r, s: sphi[r, s]
    if tget_f is None:
        tget_f = lambda r, k: trif[r, k]
    if tget_i is None:
        tget_i = lambda r, k: trii[r, k]
    scl_get = (lambda i, k: sphc[i, k]) if scl_get is None else scl_get
    tcl_get = (lambda i, k: tric[i, k]) if tcl_get is None else tcl_get
    ssup_get = (lambda i, k: sphs[i, k]) if ssup_get is None else ssup_get
    tsup_get = (lambda i, k: tris[i, k]) if tsup_get is None else tsup_get

    # per-ray invariants (directions are unit: a = 1)
    ddo = dx * ox + dy * oy + dz * oz
    osq = ox * ox + oy * oy + oz * oz
    if (num_sph_clusters > 0 or num_tri_clusters > 0
            or num_sph_lane > 0 or num_tri_lane > 0):
        inv_dx, inv_dy, inv_dz = safe_inv_dir(dx, dy, dz)

    def slab_tmin(get, i, bt):
        """Branchless slab test of AABB row i against the whole tile
        (src/objects.cu:404-434); returns (enter mask, entry distance).
        ``get(i, k)`` reads word k of box row i (an accessor so callers
        can use SMEM-friendly layouts — an (N, 8) SMEM array pads its
        minor dim to 128 and wastes 16x)."""
        t1 = (get(i, 0) - ox) * inv_dx
        t2 = (get(i, 3) - ox) * inv_dx
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        t1 = (get(i, 1) - oy) * inv_dy
        t2 = (get(i, 4) - oy) * inv_dy
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        t1 = (get(i, 2) - oz) * inv_dz
        t2 = (get(i, 5) - oz) * inv_dz
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        tmin = jnp.maximum(tmin, 0.0)
        return (tmin <= tmax) & (tmax > 0.0) & (tmin < bt), tmin

    def slab(get, i, bt):
        return slab_tmin(get, i, bt)[0]

    def leaf_sweep(start, leaf, carry, body):
        """Sweep exactly ``leaf`` primitives from ``start`` (static trip
        count, UNROLL-wide so independent primitive tests overlap in the
        VPU pipeline)."""
        def step(j, cr):
            base = start + j * UNROLL
            for u in range(UNROLL):
                cr = body(base + u, cr)
            return cr
        return jax.lax.fori_loop(0, leaf // UNROLL, step, carry)

    def cluster_gate(cl_get, leaf, c, carry, body, cl_base=0):
        """Gate one leaf cluster: sweep its leaf-primitive block only if
        some lane in the tile can beat its current best inside the AABB
        (tile-granular analog of BVH pruning, src/objects.cu:508-516)."""
        hit_box = slab(cl_get, cl_base + c, carry[0])
        if stats_ref is not None:
            stats_ref[:] = stats_ref[:] + jnp.where(
                hit_box, cl_get(cl_base + c, 7), 0.0)
        return jax.lax.cond(
            jnp.any(hit_box),
            lambda cr: leaf_sweep(c * leaf, leaf, cr, body),
            lambda cr: cr, carry)

    def lane_masks(cl_get, n_cl, bt, want_near):
        """Phase 1 of the lane traversal: slab-test every lane cluster
        against the tile with shared SMEM broadcasts (no reduces, no
        branches), packing per-lane entry into 31-bit mask words and
        optionally tracking the per-lane nearest entered cluster."""
        masks = [zero_i] * lane_words(n_cl)
        near_c = zero_i
        near_t = zero_f + _INF
        for c in range(n_cl):
            enter, tmin = slab_tmin(cl_get, c, bt)
            w = c // LANE_WORD_BITS
            masks[w] = masks[w] | (
                enter.astype(jnp.int32) << (c % LANE_WORD_BITS))
            if want_near:
                closer = enter & (tmin < near_t)
                near_t = jnp.where(closer, tmin, near_t)
                near_c = jnp.where(closer, c, near_c)
        return masks, near_c, near_t

    def lane_traverse(cl_get, pf_ref, pi_ref, n_cl, leaf, body_at, cr,
                      code_bit):
        """Per-lane BVH traversal (see module comment): entry masks ->
        nearest-cluster bootstrap -> best-t-pruned mask rebuild -> pop-and-
        sweep while loop. Tile cost = max-over-lanes entered clusters, not
        the union footprint the shared gate sweep pays on divergent tiles
        (the TPU equivalent of the reference's per-thread stack DFS,
        src/objects.cu:487-532)."""
        shape = ox.shape
        ch = lane_chunks(n_cl)

        def gf(ref, p, c, j, sel):
            row = p * leaf + j
            if ch == 1:
                return jnp.take_along_axis(
                    jnp.broadcast_to(ref[row:row + 1, :], shape), c, axis=1)
            # Chunked pool (> LANE_CHUNK_CL lane clusters): the VPU's
            # dynamic gather reaches 128 lanes, so each chunk owns its own
            # 128-wide plane; fetch = one lane-gather per chunk + a select
            # chain on the lane's chunk id (sel, hoisted once per visit).
            hot, rloc = sel
            val = None
            for q in range(ch):
                v = jnp.take_along_axis(
                    jnp.broadcast_to(
                        ref[row:row + 1, q * LANES:(q + 1) * LANES], shape),
                    rloc, axis=1)
                val = v if val is None else jnp.where(hot[q], v, val)
            return val

        def visit(c, live, cr):
            if stats_ref is not None:
                stats_ref[:] = stats_ref[:] + jnp.where(
                    live, float(leaf), 0.0)
            sel = None
            if ch > 1:
                # per-lane chunk id without integer division: ch <= a few,
                # so a compare-accumulate chain is cheaper and Mosaic-safe
                q_lane = zero_i
                for q in range(1, ch):
                    q_lane = q_lane + (
                        c >= q * LANE_CHUNK_CL).astype(jnp.int32)
                rloc = c - q_lane * LANE_CHUNK_CL
                sel = ([q_lane == q for q in range(ch)], rloc)
            for j in range(leaf):
                cr = body_at(lambda p, j=j, c=c: gf(pf_ref, p, c, j, sel),
                             lambda p, j=j, c=c: gf(pi_ref, p, c, j, sel),
                             (c * leaf + j) * 2 + code_bit, cr, live)
            return cr

        masks, near_c, near_t = lane_masks(cl_get, n_cl, cr[0], True)
        if LANE_NEAR_FIRST:
            # Visit each lane's nearest entered cluster first, then rebuild
            # the masks against the established best-t: most far clusters'
            # bits vanish before the pop-and-sweep loop ever sees them.
            near_live = near_t < _INF
            cr = visit(near_c, near_live, cr)
            masks, _, _ = lane_masks(cl_get, n_cl, cr[0], False)
            masks = _clear_bit(masks, near_c, near_live)

        def cond(st):
            alive = st[0][0] != 0
            for m in st[0][1:]:
                alive = alive | (m != 0)
            return jnp.any(alive)

        def wbody(st):
            masks, cr = st
            c, live, masks = _pop_next(list(masks), zero_i)
            return tuple(masks), visit(c, live, cr)

        _, cr = jax.lax.while_loop(cond, wbody, (tuple(masks), cr))
        return cr

    def cluster_gate2(cl_get, leaf, p, carry, body, cl_base=0):
        """GATE2 mode: gate clusters 2p and 2p+1 together — one cross-lane
        reduce + scalar cond per pair; adjacent clusters are spatially
        adjacent (BVH DFS order) so the pair usually agrees, trading a
        halved sync count for occasional single-cluster overshoot.
        (A dynamic-index variant for the ordered near-first paths,
        GATE2_ORDERED, was deleted — it lost on every scene it applies
        to; see the note at the GATE2 flag.)"""
        bt = carry[0]
        c0 = p + p
        hit0 = slab(cl_get, cl_base + c0, bt)
        hit1 = slab(cl_get, cl_base + c0 + 1, bt)
        if stats_ref is not None:
            stats_ref[:] = stats_ref[:] + (
                jnp.where(hit0, cl_get(cl_base + c0, 7), 0.0)
                + jnp.where(hit1, cl_get(cl_base + c0 + 1, 7), 0.0))
        return jax.lax.cond(
            jnp.any(hit0 | hit1),
            lambda cr: leaf_sweep(c0 * leaf, 2 * leaf, cr, body),
            lambda cr: cr, carry)

    def ordered_cluster_loop(cl_get, leaf, order, base, n_cl, carry,
                             body):
        """Near-first visitation of ``n_cl`` clusters via the per-cell
        ``order`` table."""
        return jax.lax.fori_loop(
            0, n_cl,
            lambda i, cr: cluster_gate(cl_get, leaf, order[base + i], cr,
                                       body), carry)

    def cluster_loop(cl_get, leaf, n_cl, carry, body, cl_base=0):
        """Plain (super-free, order-free) cluster sweep; GATE2 pairs the
        gates when enabled."""
        if GATE2 and n_cl >= 2:
            carry = jax.lax.fori_loop(
                0, n_cl // 2,
                lambda p, cr: cluster_gate2(cl_get, leaf, p, cr, body,
                                            cl_base=cl_base), carry)
            if n_cl % 2:
                carry = cluster_gate(cl_get, leaf, n_cl - 1, carry,
                                     body, cl_base=cl_base)
            return carry
        return jax.lax.fori_loop(
            0, n_cl,
            lambda c, cr: cluster_gate(cl_get, leaf, c, cr, body,
                                       cl_base=cl_base), carry)

    def super_gate(sup_get, cl_get, leaf, g, carry, body, cl_base=0):
        """Second BVH level: slab-test a super-cluster, then its cluster
        range (each cluster gated again). ``g`` addresses the super box
        row directly (callers add any table base); start/count are
        cluster indices relative to ``cl_base``'s table."""
        enter = jnp.any(slab(sup_get, g, carry[0]))
        start = sup_get(g, 6).astype(jnp.int32)
        count = sup_get(g, 7).astype(jnp.int32)
        inner = lambda cr: jax.lax.fori_loop(
            start, start + count,
            lambda c, cr2: cluster_gate(cl_get, leaf, c, cr2, body,
                                        cl_base=cl_base), cr)
        return jax.lax.cond(enter, inner, lambda cr: cr, carry)

    def _min_set_index(masks):
        """Scalar index of the lowest set bit across all lanes' mask words
        (sentinel 2^20 when every lane's mask is empty) — one cross-lane
        min-reduce per call."""
        big = jnp.int32(1 << 20)
        best = None
        for w, m in enumerate(masks):
            low = m & -m
            idx = jnp.where(m != 0, w * LANE_WORD_BITS + _pow2_log2(low),
                            big)
            best = idx if best is None else jnp.minimum(best, idx)
        return jnp.min(best)

    def maskpop_loop(cl_get, leaf, n_cl, carry, body, boot, cl_base=0):
        """Mask-pop traversal (see MASKPOP): bootstrap best-t via ``boot``
        (the existing near-first gates over a small prefix), slab-test all
        ``n_cl`` clusters vectorised into per-lane entry masks, then pop
        the tile's union — one min-reduce + one retest cond per popped
        cluster instead of one any+cond per cluster tested."""
        carry = boot(carry)
        # cl_base may be a traced scalar (the blocked kernel's block-local
        # cluster rows), so always offset rather than branching on it
        get = lambda i, k: cl_get(cl_base + i, k)
        masks, _, _ = lane_masks(get, n_cl, carry[0], False)
        live_all = zero_i == 0

        def wbody(st):
            c, masks, carry = st
            # same pruning rule as cluster_gate, against the evolving
            # best-t (the mask was built at the looser bootstrap best-t)
            hit = slab(get, c, carry[0])
            carry = jax.lax.cond(
                jnp.any(hit),
                lambda cr: leaf_sweep(c * leaf, leaf, cr, body),
                lambda cr: cr, carry)
            masks = tuple(_clear_bit(list(masks), zero_i + c, live_all))
            return (_min_set_index(masks), masks, carry)

        c0 = _min_set_index(masks)
        _, _, carry = jax.lax.while_loop(
            lambda st: st[0] < jnp.int32(n_cl), wbody,
            (c0, tuple(masks), carry))
        return carry

    if defer_params:
        fresh = (zero_f + _INF, zero_i, zero_f, zero_f)
    else:
        fresh = (zero_f + _INF, zero_i, zero_f, zero_f,
                 zero_f, zero_f, zero_f, zero_i, zero_i)
    if carry is None:
        carry = fresh

    if sph_ordered or tri_ordered:
        # Tile's coarse spatial cell from its mean origin: selects the
        # host-precomputed near-first cluster order (see scene._cell_order)
        # so best-t pruning closes far clusters' gates.
        cell = tile_cell(ox, oy, oz, grid_ref)

    def sph_body_at(getf, geti, code, cr, live=None):
        """Sphere test against the tile; ``getf(param)``/``geti(param)``
        return broadcast scalars (shared sweep) or per-lane gathered
        arrays (lane traversal) — the math is identical either way."""
        cx = getf(S_CX)
        cy = getf(S_CY)
        cz = getf(S_CZ)
        cr2 = getf(S_CR2)
        # half-b quadratic, nearer root only (src/objects.cu:40-79)
        dc = dx * cx + dy * cy + dz * cz
        oc = ox * cx + oy * cy + oz * cz
        h = dc - ddo
        cq = (cr2 + osq) - (oc + oc)
        disc = h * h - cq
        if SPH_NAN:
            # Miss (disc < 0) -> sqrt yields NaN -> t is NaN -> every
            # compare below is false, exactly like the explicit
            # (disc >= 0) guard but three vector ops cheaper (no max, no
            # compare, no and). Poisoned padding (cr2 = 1e30) rides the
            # same path. Hits are bit-identical.
            t = h - jnp.sqrt(disc)
            valid = t > _EPS
        else:
            t = h - jnp.sqrt(jnp.maximum(disc, 0.0))
            valid = (disc >= 0.0) & (t > _EPS)
        if live is not None:
            valid = valid & live
        t = jnp.where(valid, t, _INF)
        bt = cr[0]
        better = t < bt
        bt = jnp.where(better, t, bt)
        bc = jnp.where(better, code, cr[1])        # even code = sphere
        if defer_params:
            return (bt, bc) + cr[2:]
        g0 = jnp.where(better, cx, cr[4])
        g1 = jnp.where(better, cy, cr[5])
        g2 = jnp.where(better, cz, cr[6])
        pa = jnp.where(better, geti(S_PA), cr[7])
        pb = jnp.where(better, geti(S_PB), cr[8])
        return bt, bc, cr[2], cr[3], g0, g1, g2, pa, pb

    def sph_body(s, cr):
        return sph_body_at(lambda p: sget_f(p, s), lambda p: sget_i(p, s),
                           s * 2, cr)

    sph_hybrid = sph_lane_leaf > 0 and num_sph_lane > 0 and num_spheres > 0
    tri_hybrid = tri_lane_leaf > 0 and num_tri_lane > 0 and num_tris > 0
    if sph_hybrid or tri_hybrid:
        # Tile coherence metric for the hybrid dispatch: squared resultant
        # length of the (unit) directions. ~1 for coherent (primary-ray)
        # tiles where the shared gate sweep's union footprint is tight;
        # small for post-diffuse tiles where the union covers the scene and
        # the per-lane traversal wins. One scalar branch per pool per sweep
        # — the same cost class as a single cluster gate.
        inv_nd = 1.0 / float(dx.size)
        rsx = jnp.sum(dx) * inv_nd
        rsy = jnp.sum(dy) * inv_nd
        rsz = jnp.sum(dz) * inv_nd
        tile_coherent = (rsx * rsx + rsy * rsy + rsz * rsz) > LANE_R2

    def sph_shared(carry):
        if (MASKPOP and stats_ref is None
                and num_sph_clusters >= MASKPOP_MIN):
            if sph_ordered and num_sph_supers > 0:
                base = cell * num_sph_supers
                nb = min(MASKPOP_BOOT_SUPERS, num_sph_supers)
                boot = lambda cr: jax.lax.fori_loop(
                    0, nb,
                    lambda i, cr2: super_gate(ssup_get, scl_get, sph_leaf,
                                              sph_order[base + i], cr2,
                                              sph_body), cr)
            elif num_sph_supers > 0:
                nb = min(MASKPOP_BOOT_SUPERS, num_sph_supers)
                boot = lambda cr: jax.lax.fori_loop(
                    0, nb,
                    lambda g, cr2: super_gate(ssup_get, scl_get, sph_leaf,
                                              sph_sup_base + g, cr2,
                                              sph_body, cl_base=sph_cl_base),
                    cr)
            elif sph_ordered:
                base = cell * num_sph_clusters
                nb = min(MASKPOP_BOOT, num_sph_clusters)
                boot = lambda cr: jax.lax.fori_loop(
                    0, nb,
                    lambda i, cr2: cluster_gate(scl_get, sph_leaf,
                                                sph_order[base + i], cr2,
                                                sph_body), cr)
            else:
                nb = min(MASKPOP_BOOT, num_sph_clusters)
                boot = lambda cr: jax.lax.fori_loop(
                    0, nb,
                    lambda c, cr2: cluster_gate(scl_get, sph_leaf, c, cr2,
                                                sph_body,
                                                cl_base=sph_cl_base), cr)
            return maskpop_loop(scl_get, sph_leaf, num_sph_clusters, carry,
                                sph_body, boot, cl_base=sph_cl_base)
        if sph_ordered and num_sph_supers > 0:
            base = cell * num_sph_supers
            return jax.lax.fori_loop(
                0, num_sph_supers,
                lambda i, cr: super_gate(ssup_get, scl_get, sph_leaf,
                                         sph_order[base + i], cr, sph_body),
                carry)
        if sph_ordered:
            base = cell * num_sph_clusters
            return ordered_cluster_loop(scl_get, sph_leaf, sph_order, base,
                                        num_sph_clusters, carry, sph_body)
        if num_sph_supers > 0:
            return jax.lax.fori_loop(
                0, num_sph_supers,
                lambda g, cr: super_gate(ssup_get, scl_get, sph_leaf,
                                         sph_sup_base + g, cr, sph_body,
                                         cl_base=sph_cl_base),
                carry)
        if num_sph_clusters > 0:
            return cluster_loop(scl_get, sph_leaf, num_sph_clusters, carry,
                                sph_body, cl_base=sph_cl_base)
        if num_spheres > 0:
            # flat pool: padded to a multiple of UNROLL, pads poisoned
            def sflat(j, cr):
                base = j * UNROLL
                for u in range(UNROLL):
                    cr = sph_body(base + u, cr)
                return cr
            return jax.lax.fori_loop(0, num_spheres // UNROLL, sflat, carry)
        return carry

    def sph_lane_fn(carry):
        return lane_traverse(sph_lane_cl_get, sph_lane_pf, sph_lane_pi,
                             num_sph_lane, sph_lane_leaf, sph_body_at,
                             carry, 0)

    def run_sph(carry):
        if sph_hybrid:
            if LANE_FORCE:
                return sph_lane_fn(carry)
            return jax.lax.cond(tile_coherent, sph_shared, sph_lane_fn,
                                carry)
        return sph_shared(carry)

    def tri_body_at(getf, geti, code, cr, live=None):
        """Triangle test against the tile; fetch-parameterised like
        sph_body_at (shared broadcast or per-lane gather)."""
        wu0, wu1, wu2, wu3 = (getf(T_WU + r) for r in range(4))
        wv0, wv1, wv2, wv3 = (getf(T_WV + r) for r in range(4))
        ww0, ww1, ww2, ww3 = (getf(T_WW + r) for r in range(4))
        # Woop world->barycentric: t = -o_w/d_w (equivalent to
        # Möller–Trumbore, src/objects.cu:135-163). Padding/degenerate
        # triangles have all-zero rows: t = -0/0 = NaN fails every check.
        ow = ww0 * ox + ww1 * oy + ww2 * oz + ww3
        dw = ww0 * dx + ww1 * dy + ww2 * dz
        if fast_div:
            # Approximate reciprocal + one Newton step (~2^-24 relative):
            # a full divide per triangle is the most expensive op of the
            # body. The raw ~2^-12 approximation was measured to leak
            # light through quad seams (t error above the intersection
            # epsilon at scene scale); one refinement restores f32-class
            # accuracy at a fraction of the divide's cost. Only the
            # megakernel opts in (it is held to statistical/PSNR tests);
            # the wavefront kernels keep the exact divide so they stay
            # bitwise equal to the XLA oracle. Padding rows still poison:
            # reciprocal(0) = inf -> NaN t fails every compare.
            import jax.experimental.pallas as _pl
            r0 = _pl.reciprocal(dw, approx=True)
            r0 = r0 * (2.0 - dw * r0)
            t = -ow * r0
        else:
            t = -ow / dw
        ou = wu0 * ox + wu1 * oy + wu2 * oz + wu3
        du = wu0 * dx + wu1 * dy + wu2 * dz
        u = ou + t * du
        ov = wv0 * ox + wv1 * oy + wv2 * oz + wv3
        dv = wv0 * dx + wv1 * dy + wv2 * dz
        v = ov + t * dv
        valid = (t > _EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        if has_one_way:
            # one-way culling (src/objects.cu:273-280); zero vector passes
            cull = (getf(T_CULL) * dx + getf(T_CULL + 1) * dy
                    + getf(T_CULL + 2) * dz)
            valid &= cull >= 0.0
        if live is not None:
            valid = valid & live
        t = jnp.where(valid, t, _INF)
        bt = cr[0]
        better = t < bt
        bt = jnp.where(better, t, bt)
        bc = jnp.where(better, code, cr[1])        # odd code = triangle
        if defer_params:
            if needs_tri_uv:
                # raw winner barycentrics; the caller interpolates after
                # fetching the winner's uv rows (fetch_winner_param)
                bu = jnp.where(better, u, cr[2])
                bv = jnp.where(better, v, cr[3])
                return bt, bc, bu, bv
            return (bt, bc) + cr[2:]
        bu, bv = cr[2], cr[3]
        if needs_tri_uv:
            # barycentric UV with the reference's argument order
            # (src/objects.cu:160,196-199): uv0*w + uv1*u + uv2*v
            w = 1.0 - u - v
            tex_u = (getf(T_UV) * w + getf(T_UV + 2) * u
                     + getf(T_UV + 4) * v)
            tex_v = (getf(T_UV + 1) * w + getf(T_UV + 3) * u
                     + getf(T_UV + 5) * v)
            bu = jnp.where(better, tex_u, bu)
            bv = jnp.where(better, tex_v, bv)
        g0 = jnp.where(better, getf(T_NRM), cr[4])
        g1 = jnp.where(better, getf(T_NRM + 1), cr[5])
        g2 = jnp.where(better, getf(T_NRM + 2), cr[6])
        pa = jnp.where(better, geti(0), cr[7])
        pb = jnp.where(better, geti(1), cr[8])
        return bt, bc, bu, bv, g0, g1, g2, pa, pb

    def tri_body(k, cr):
        return tri_body_at(lambda p: tget_f(p, k), lambda p: tget_i(p, k),
                           k * 2 + 1, cr)

    def tri_shared(carry):
        if (MASKPOP and stats_ref is None
                and num_tri_clusters >= MASKPOP_MIN):
            if tri_ordered and num_tri_supers > 0:
                base = cell * num_tri_supers
                nb = min(MASKPOP_BOOT_SUPERS, num_tri_supers)
                boot = lambda cr: jax.lax.fori_loop(
                    0, nb,
                    lambda i, cr2: super_gate(tsup_get, tcl_get, tri_leaf,
                                              tri_order[base + i], cr2,
                                              tri_body), cr)
            elif num_tri_supers > 0:
                nb = min(MASKPOP_BOOT_SUPERS, num_tri_supers)
                boot = lambda cr: jax.lax.fori_loop(
                    0, nb,
                    lambda g, cr2: super_gate(tsup_get, tcl_get, tri_leaf,
                                              tri_sup_base + g, cr2,
                                              tri_body, cl_base=tri_cl_base),
                    cr)
            elif tri_ordered:
                base = cell * num_tri_clusters
                nb = min(MASKPOP_BOOT, num_tri_clusters)
                boot = lambda cr: jax.lax.fori_loop(
                    0, nb,
                    lambda i, cr2: cluster_gate(tcl_get, tri_leaf,
                                                tri_order[base + i], cr2,
                                                tri_body), cr)
            else:
                nb = min(MASKPOP_BOOT, num_tri_clusters)
                boot = lambda cr: jax.lax.fori_loop(
                    0, nb,
                    lambda c, cr2: cluster_gate(tcl_get, tri_leaf, c, cr2,
                                                tri_body,
                                                cl_base=tri_cl_base), cr)
            return maskpop_loop(tcl_get, tri_leaf, num_tri_clusters, carry,
                                tri_body, boot, cl_base=tri_cl_base)
        if tri_ordered and num_tri_supers > 0:
            base = cell * num_tri_supers
            return jax.lax.fori_loop(
                0, num_tri_supers,
                lambda i, cr: super_gate(tsup_get, tcl_get, tri_leaf,
                                         tri_order[base + i], cr, tri_body),
                carry)
        if tri_ordered:
            base = cell * num_tri_clusters
            return ordered_cluster_loop(tcl_get, tri_leaf, tri_order, base,
                                        num_tri_clusters, carry, tri_body)
        if num_tri_supers > 0:
            return jax.lax.fori_loop(
                0, num_tri_supers,
                lambda g, cr: super_gate(tsup_get, tcl_get, tri_leaf,
                                         tri_sup_base + g, cr, tri_body,
                                         cl_base=tri_cl_base),
                carry)
        if num_tri_clusters > 0:
            return cluster_loop(tcl_get, tri_leaf, num_tri_clusters, carry,
                                tri_body, cl_base=tri_cl_base)
        if num_tris > 0:
            def tflat(j, cr):
                base = j * UNROLL
                for u in range(UNROLL):
                    cr = tri_body(base + u, cr)
                return cr
            return jax.lax.fori_loop(0, num_tris // UNROLL, tflat, carry)
        return carry

    def tri_lane_fn(carry):
        return lane_traverse(tri_lane_cl_get, tri_lane_pf, tri_lane_pi,
                             num_tri_lane, tri_lane_leaf, tri_body_at,
                             carry, 1)

    def run_tri(carry):
        if tri_hybrid:
            if LANE_FORCE:
                return tri_lane_fn(carry)
            return jax.lax.cond(tile_coherent, tri_shared, tri_lane_fn,
                                carry)
        return tri_shared(carry)

    carry = run_tri(run_sph(carry))

    if stats_ref is not None:
        flat_adjust = 0.0
        if num_sph_clusters == 0:
            flat_adjust += float(num_spheres)
        if num_tri_clusters == 0:
            flat_adjust += float(num_tris)
        if flat_adjust:
            stats_ref[:] = stats_ref[:] + flat_adjust

    return carry


def param_rows(n: int) -> int:
    """Lane-padded rows one primitive-parameter plane needs for n prims."""
    return max(1, -(-n // LANES))


def pack_param_planes(scene):
    """Winner-parameter planes for the deferred post-sweep fetch (VMEM).

    Plane layout: row ``p * rows + r``, lane ``l`` holds parameter ``p`` of
    primitive ``r * 128 + l``. Returns (sphp_f, sphp_i, trip_f, trip_i):
      sphp_f: centre x/y/z            (3 * rows_s, 128) f32
      sphp_i: colour30, smooth|mat    (2 * rows_s, 128) i32
      trip_f: normal x/y/z [+ uv0..2] (3 or 9 * rows_t, 128) f32
      trip_i: colour30, smooth|mat    (2 * rows_t, 128) i32
    """
    def to_plane(col):
        rows = param_rows(col.shape[0])
        pad = rows * LANES - col.shape[0]
        return jnp.pad(col, (0, pad)).reshape(rows, LANES)

    sphp_f = jnp.concatenate([to_plane(scene.sph_center[:, c])
                              for c in range(3)], axis=0)
    sphp_i = jnp.concatenate([
        to_plane(encode_colour30(scene.sph_colour)),
        to_plane(encode_smooth_mat(scene.sph_smooth, scene.sph_mat)),
    ], axis=0)
    tri_cols = [scene.tri_normal[:, c] for c in range(3)]
    if scene.needs_tri_uv:
        tri_cols += [scene.tri_uv0[:, 0], scene.tri_uv0[:, 1],
                     scene.tri_uv1[:, 0], scene.tri_uv1[:, 1],
                     scene.tri_uv2[:, 0], scene.tri_uv2[:, 1]]
    trip_f = jnp.concatenate([to_plane(c) for c in tri_cols], axis=0)
    trip_i = jnp.concatenate([
        to_plane(encode_colour30(scene.tri_colour)),
        to_plane(encode_smooth_mat(scene.tri_smooth, scene.tri_mat)),
    ], axis=0)
    return sphp_f, sphp_i, trip_f, trip_i


def fetch_winner_param(ref, base: int, nrows: int, row_idx, lane_idx, init):
    """Per-lane fetch of one parameter plane by (row, lane) primitive index.

    One native lane-dimension dynamic gather + select per plane row — the
    deferred replacement for a per-primitive winner select inside the sweep
    (~3 vector ops per plane row per tile, independent of how many
    primitives were swept)."""
    shape = lane_idx.shape
    acc = init
    for r in range(nrows):
        g = jnp.take_along_axis(
            jnp.broadcast_to(ref[base + r:base + r + 1, :], shape),
            lane_idx, axis=1)
        acc = jnp.where(row_idx == r, g, acc)
    return acc
