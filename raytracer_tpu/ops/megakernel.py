"""Full-frame Pallas megakernel: spp x bounces x shading in one kernel.

The reference's ``get_pixel_colour`` (src/raytracer.cu:116-136) is a true
megakernel: one thread per pixel runs its entire sample/bounce loop. The
wavefront pipeline (ops/integrator.py) splits that across XLA ops with a
global synchronisation per bounce; this kernel puts the whole loop back on
chip, TPU-style:

- one grid step owns a Morton-ordered tile of rays (pixels);
- a ``while_loop`` advances every lane through its path, regenerating a
  finished lane onto its pixel's next sample immediately (path regeneration);
- the loop exits when *this tile's* lanes have finished all their samples —
  sky tiles retire in a handful of iterations while busy tiles keep running,
  with no cross-tile synchronisation at all;
- randomness comes from the on-core PRNG (pltpu.prng_*), seeded per
  (frame key, global tile index), a counter-based scheme that keeps renders
  deterministic and shard-invariant;
- material parameters are fetched with a per-material masked loop gated by
  "does any lane in this tile use material m" — the tile-level analog of the
  reference's per-thread switch.

All four texture types are supported in-kernel, including images: distinct
images pack into one colour30-packed texel plane and each lane's texel is
fetched with Mosaic's native lane-dimension dynamic gather plus a static
row-select sweep (see ``_fetch_image``). Statically checked limits (the caller
falls back to the wavefront pipeline): packed texture rows <= IMG_MAX_ROWS,
image width <= 128 texels, and the scene's SMEM-resident layout within
``sweep.SMEM_BUDGET``.

Outputs per pixel: the mean radiance over ``rays_per_pixel`` samples plus
the traced segment count, i.e. exactly ``render_sample_mean``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ANTIALIAS_OFFSET_RANGE, RenderSettings
from ..models.materials import (MAT_EMISSIVE, MAT_REFRACTIVE,
                                TEX_CHECKERBOARD, TEX_GRADIENT,
                                TEX_IMAGE)
from ..models.scene import SceneArrays
from .intersect_pallas import _interpret
from .sweep import (LANES, decode_colour30, decode_smooth_mat,
                    encode_colour30, fetch_winner_param, pack_lane_planes,
                    pack_param_planes, pack_scene, param_rows, sweep_tile)

_EPS = 1e-6
_INF = 1e30

# Lanes per tile: bigger tiles amortise SMEM scalar broadcasts better but
# make tile-granular BVH culling coarser. Measured optimum: 64 rows for
# cluster-light scenes, 32 for mesh-heavy ones (chosen per scene below).
import os
# Rows per independent ray stream (measured best: 32).
SROWS = int(os.environ.get("RAYTRACER_SROWS", "32"))
# Independent ray streams interleaved per grid step (see _kernel). Measured
# on v5e: 1 stream 251 Mrays/s, 2 streams 230, 3 streams 217 on the
# reference workload — the extra register pressure (spills) costs more than
# the latency hiding buys, so the default stays 1; the machinery remains
# for future tuning on other TPU generations.
NSTREAM = int(os.environ.get("RAYTRACER_STREAMS", "1"))
# Bounce-body applications per while_loop iteration: each iteration carries
# a fixed scalar-unit cost (loop control plus the vector->scalar sync of the
# any-lane-live exit test); applying the body K times per iteration divides
# that cost by K for <= K-1 wasted tail iterations per tile (~1% at K=2 on
# the reference workload's ~100-iteration tiles). Per-lane semantics are
# identical (finished lanes regenerate or no-op exactly as in single-step
# iterations), so this is bitwise-invariant; K=2 measured +3.3% on the
# headline (v5e), K=3 regressed (register pressure), so the default is 2.
BODY_UNROLL = int(os.environ.get("RAYTRACER_BODY_UNROLL", "2"))
# Pack the antialias jitters into the top bytes of the three uniform draw
# rows (see the nrand comment in _kernel); halves PRNG generation.
AA_PACK = os.environ.get("RAYTRACER_AA_PACK", "1") == "1"
# Park retired lanes' ray origins at 1e30 so they stop opening cluster
# gates during the tile-retirement tail (see the regen block).
RETIRE_POISON = os.environ.get("RAYTRACER_RETIRE_POISON", "1") == "1"
# Scene size (spheres + triangles) from which the megakernel defers winner
# params out of the sweep (sweep.defer_params + post-sweep lane-gather).
DEFER_MIN = int(os.environ.get("RAYTRACER_DEFER_MIN", "64"))
# Approximate-reciprocal triangle divide in the sweep (statistically
# validated; exact divide in the wavefront kernels regardless).
FAST_DIV = os.environ.get("RAYTRACER_FAST_DIV", "1") == "1"
# Pixels per lane ("pixel packing"). A tile's while_loop runs until its
# SLOWEST lane finishes all samples, so at spp 1-2 (interactive / temporal
# fly-through frames) mean lane activity collapses to ~avg/max path length
# (~32% measured on scene 4): a finished lane has no next sample to
# regenerate onto. PIXPACK=K gives each lane K pixels — path regeneration
# rolls a finished path onto the lane's NEXT PIXEL, so the idle tail is
# paid once per K pixels instead of once per pixel, and per-tile fixed
# costs (bootstrap sweeps, SMEM broadcasts) amortise Kx. Estimator
# per pixel is unchanged (spp samples, same per-iteration draw streams);
# the pixel->(tile, lane, sample) assignment changes, so renders differ
# bitwise from K=1 but are held to the same statistical contracts as any
# sampler change. Pointless at high spp (regen already fills the tail).
# The K=1 path emits exactly the original ops. Resolution order: explicit
# ``pixpack`` arg > this env flag (A/B override) > settings.pixpack > 1.
# The production auto policy (K=8 at spp <= 32, measured: headline 20 spp
# 642 -> 741-766, 4K temporal 1 spp 11.4 -> 12.5 fps; K=8 vs K=4 +4-6%
# on headline, stress10k AND every verify scene — docs/TESTLOG.md
# sessions 7+9+10) lives at the Renderer layer,
# which materialises it into settings.pixpack — direct ops-layer callers
# (tests, bound artifacts) keep the original K=1 assignment by default.
_PIXPACK_ENV = os.environ.get("RAYTRACER_PIXPACK")
PIXPACK = int(_PIXPACK_ENV) if _PIXPACK_ENV else None
# Tile-coherent scatter sampling: one shared random triple per loop
# iteration (instead of per lane). Each pixel's marginal distribution is
# exactly unchanged — a pixel's successive samples still draw fresh
# randoms every iteration — only cross-pixel covariance within a tile
# changes. Post-diffuse directions then cluster by surface normal, so
# secondary-bounce tiles keep tight cluster-gate footprints (the
# structured-sampling / coherent-path-tracing trick, here keyed to the
# tile-sweep's union-footprint economics).
COHERENT = os.environ.get("RAYTRACER_COHERENT", "0") == "1"
MROWS = SROWS * NSTREAM
MROWS_FLAT = MROWS
# Timing ablations (measurement only): comma-separated flags.
#   sweep2 — run the primitive sweep twice per bounce (marginal sweep cost)
#   rng2   — draw every random twice (marginal RNG cost)
_ABLATE = set(filter(None, os.environ.get("RAYTRACER_ABLATE", "").split(",")))
MEGA_TILE = MROWS * LANES

# material table rows (behaviour only — colour/smoothness are denormalised
# onto the primitives; ior is a per-material medium property)
(_M_TYPE, _M_IOR, _M_EMR, _M_EMG, _M_EMB, _M_TEXTYPE,
 _M_LR, _M_LG, _M_LB, _M_DR, _M_DG, _M_DB, _M_NSQ,
 _M_TW, _M_TH, _M_TROW) = range(16)
_M_ROWS = 16


# Packed texture-plane row cap for in-kernel image sampling (VMEM: rows x
# 128 x 4 B, so 8192 rows = 4 MiB). The row-select sweep only runs on
# iterations where some lane samples an image, and above IMG_STATIC_ROWS
# it is clamped to the tile's [min, max] texel-row range (below), so even
# a 1024x512 earth (4096 packed rows) stays in-kernel; beyond the cap the
# wavefront pipeline's XLA atlas gather takes over.
IMG_MAX_ROWS = int(os.environ.get("RAYTRACER_IMG_MAX_ROWS", "8192"))
# Packed-row count up to which the fetch's row select is a statically
# unrolled sweep over every row; above it, a fori_loop over the tile's
# clamped [min(ty), max(ty)] row range with a dynamic single-row slice.
# The clamp only pays when tiles sample a THIN band of the texture —
# true for coherent primaries, false for diffuse-bounce tiles, whose UV
# spread covers most of the plane. Measured on the earth512 config
# (1024 packed rows, v5e): static unroll 198 Mrays/s vs clamped loop
# 51 (the round-3 "range-clamped row select" was a silent 3.9x
# regression there — caught by the round-4 docs refresh, fixed by
# raising this threshold from 64 to 1024; docs/TESTLOG.md session 7).
# Beyond the threshold the clamped loop is the only VMEM-resident
# option, and past IMG_MAX_ROWS the HBM-paged variant takes over.
IMG_STATIC_ROWS = int(os.environ.get("RAYTRACER_IMG_STATIC_ROWS", "1024"))
# Past IMG_MAX_ROWS the packed texel plane stays in HBM and the fetch DMAs
# the tile's clamped texel-row band into a VMEM page scratch, IMG_PAGE rows
# (x 128 x 4 B = 256 KiB) per copy — the VMEM-residency cap disappears and
# the in-kernel path covers any practical texture; IMG_HBM_MAX_ROWS is a
# sanity bound on the HBM plane itself (2^18 rows = 128 MiB).
IMG_PAGE = int(os.environ.get("RAYTRACER_IMG_PAGE", "512"))
IMG_HBM_MAX_ROWS = int(os.environ.get("RAYTRACER_IMG_HBM_MAX_ROWS",
                                      str(1 << 18)))


def supports(scene: SceneArrays) -> bool:
    """Megakernel preconditions.

    Image textures are sampled in-kernel with a lane-gather + row-select
    fetch (_fetch_image). Images wider than 128 texels pack each image row
    into ceil(w/128) column-block rows. Planes up to IMG_MAX_ROWS live in
    VMEM; bigger ones stay in HBM and the fetch DMAs the tile's clamped
    texel-row band through a VMEM page scratch, so the only cap left is
    the IMG_HBM_MAX_ROWS sanity bound on the plane itself."""
    from .sweep import fits_smem
    if not fits_smem(scene):
        # scene-resident SMEM layout would blow the ~1 MiB budget; the
        # wavefront pipeline's HBM-streamed kernel takes over
        return False
    if not scene.has_image_tex:
        return True
    return 0 < scene.img_rows <= IMG_HBM_MAX_ROWS


# Auto-routing cliff for big image textures (VERDICT round-4 item 4): the
# in-kernel row-select fetch WINS at earth512's 1024 packed rows (191 vs
# the wavefront atlas gather, docs/TESTLOG.md session 8) but LOSES 2.2x at
# 4096 rows (earth1024: 12.7 in-kernel vs 28.0 wavefront) and 8.3x on the
# HBM-paged path (earth2048: 3.2 vs 28.0). Under sampler='auto' scenes
# whose packed plane exceeds this row count route to the wavefront
# pipeline (regen sampler, XLA atlas gather); sampler='mega' still forces
# the in-kernel capability. Default sits at the measured crossover's safe
# side (2172 rows measured in-kernel-loses on hardware: 23.5 vs 28.4
# Mrays/s — docs/TESTLOG.md session 11).
IMG_AUTO_MAX_ROWS = int(os.environ.get("RAYTRACER_IMG_AUTO_MAX_ROWS",
                                       "2048"))


def auto_prefers_mega(scene: SceneArrays) -> bool:
    """True when the 'auto' sampler should pick the megakernel for this
    scene — ``supports()`` minus the measured big-texture cliff."""
    if not supports(scene):
        return False
    if not scene.has_image_tex:
        return True
    return scene.img_rows <= IMG_AUTO_MAX_ROWS


def pack_textures(scene: SceneArrays) -> jax.Array:
    """Image textures -> packed colour30 texel plane (img_rows, 128).

    Row ``trow + v * nb + cb``, lane ``u & 127`` holds texel
    (v, cb * 128 + u & 127) of the image whose packed rows start at
    ``trow``, where ``nb = ceil(w / 128)`` is the image's column-block
    count (1 for narrow images — then the row is just ``trow + v``). All
    three channels ride one int32 (10 bits per channel — the same colour30
    scheme the sweep uses for primitive albedo; the atlas is quantised to
    these exact values at scene build, materials.compile_materials). One
    int32 per texel means the in-kernel fetch needs a single lane-gather +
    select per packed row (_fetch_image).
    """
    if scene.img_rows == 0:
        return jnp.zeros((8, LANES), jnp.int32)
    planes = jnp.zeros((scene.img_rows, LANES), jnp.int32)
    for (off, h, w, row) in scene.img_layout:
        img = scene.atlas[off:off + h * w].reshape(h, w, 3)
        packed = encode_colour30(img)                       # (h, w)
        nb = -(-w // LANES)
        packed = jnp.pad(packed, ((0, 0), (0, nb * LANES - w)))
        packed = packed.reshape(h * nb, LANES)
        planes = planes.at[row:row + h * nb, :].set(packed)
    return planes


def mega_tile_for(scene: SceneArrays) -> int:
    """Rays per megakernel tile for this scene — the adaptive tile size.

    Must match ``render_sample_mean_mega`` exactly: shard_map callers use it
    to compute global tile offsets so megakernel RNG streams stay bitwise
    shard-invariant (one tile id per tile regardless of topology).
    """
    return MROWS * LANES


def pack_materials(scene: SceneArrays) -> jax.Array:
    return jnp.concatenate([
        scene.mat_type.astype(jnp.float32)[None, :],
        scene.mat_ior[None, :],
        scene.mat_emit.T,
        scene.tex_type.astype(jnp.float32)[None, :],
        scene.tex_light.T,
        scene.tex_dark.T,
        scene.tex_nsq[None, :],
        scene.tex_width.astype(jnp.float32)[None, :],
        scene.tex_height.astype(jnp.float32)[None, :],
        scene.tex_row.astype(jnp.float32)[None, :],
    ], axis=0)


def _fetch_image(tex_ref, uu, vv, mtw, mth, mtrow, *, img_rows: int,
                 mask=None, page_ref=None, page_sem=None,
                 img_rows_padded: int = 0):
    """Nearest-neighbour texel fetch (src/material.cu:119-124), pure VPU.

    The texture column select is Mosaic's native lane-dimension dynamic
    gather (``take_along_axis(..., axis=1)`` — one vector op per vreg); the
    row select is a select-accumulate sweep over the packed texel rows
    (texels ride one colour30 int32 each, so the sweep is ~3 vector ops
    per row per tile). Images wider than 128 texels are packed as
    ceil(w/128) column-block rows per image row (pack_textures); the fetch
    then addresses row ``trow + v * nb + (u >> 7)``, lane ``u & 127``. No
    MXU round-trips, no per-lane scalar work — the TPU-native form of the
    reference's ``image[v * width + u]`` indexing.

    Up to IMG_STATIC_ROWS the sweep is statically unrolled over every
    packed row. Beyond that it is a ``fori_loop`` over the tile's
    ``[min(ty), max(ty)]`` range (``mask`` excludes lanes not sampling an
    image from the bounds): a tile's live rays usually sample a thin
    coherent band of the texture, so the clamped loop touches a small
    fraction of a multi-thousand-row image. Bitwise identical either way.
    """
    shape = uu.shape
    w_i = mtw.astype(jnp.int32)
    u_i = jnp.clip(((mtw - 1.0) * uu).astype(jnp.int32), 0,
                   jnp.maximum(w_i - 1, 0))
    v_i = jnp.clip(((mth - 1.0) * vv).astype(jnp.int32), 0,
                   jnp.maximum(mth.astype(jnp.int32) - 1, 0))
    nb = (w_i + (LANES - 1)) >> 7           # column blocks per image row
    ty = mtrow.astype(jnp.int32) + v_i * nb + (u_i >> 7)
    # NaN-poisoned or non-image lanes can cast to garbage row indices;
    # clamp so the range bounds below stay inside the table.
    ty = jnp.clip(ty, 0, img_rows - 1)
    lane = u_i & (LANES - 1)
    acc = u_i * 0
    if page_ref is not None:
        # HBM plane (img_rows > IMG_MAX_ROWS): stream the tile's clamped
        # [min(ty), max(ty)] texel-row band through the VMEM page scratch,
        # IMG_PAGE rows per DMA, and run the same row select against each
        # page. Page starts are 8-row aligned and clipped to the padded
        # plane (pages may overlap near the end; the exact ``ty == row``
        # match makes duplicate rows idempotent). Bitwise identical to the
        # VMEM path.
        if mask is None:
            ty_lo = jnp.min(ty)
            ty_hi = jnp.max(ty)
        else:
            ty_lo = jnp.min(jnp.where(mask, ty, jnp.int32(img_rows - 1)))
            ty_hi = jnp.max(jnp.where(mask, ty, jnp.int32(0)))
        base = (ty_lo >> 3) << 3
        n_pages = (ty_hi - base + IMG_PAGE) // IMG_PAGE

        def fpage(p, acc):
            start = jnp.minimum(base + p * IMG_PAGE,
                                img_rows_padded - IMG_PAGE)
            cp = pltpu.make_async_copy(
                tex_ref.at[pl.ds(start, IMG_PAGE), :], page_ref, page_sem)
            cp.start()
            cp.wait()

            def frow(i, acc):
                row = page_ref[pl.ds(i, 1), :]
                g = jnp.take_along_axis(jnp.broadcast_to(row, shape), lane,
                                        axis=1)
                return jnp.where(ty == start + i, g, acc)

            lo = jnp.maximum(ty_lo - start, 0)
            hi = jnp.minimum(ty_hi - start + 1, IMG_PAGE)
            return jax.lax.fori_loop(lo, hi, frow, acc)

        acc = jax.lax.fori_loop(0, n_pages, fpage, acc)
        return decode_colour30(acc)
    # In interpret mode (CPU test suites) the static unroll's jaxpr grows
    # with every row — a 1024-row texture times the whole suite out — and
    # there is no VPU to schedule it onto anyway; keep interpret tracing
    # compact and let the compiled TPU path use the measured threshold.
    static_rows = 64 if _interpret() else IMG_STATIC_ROWS
    if img_rows <= static_rows:
        for i in range(img_rows):
            g = jnp.take_along_axis(
                jnp.broadcast_to(tex_ref[i:i + 1, :], shape), lane, axis=1)
            acc = jnp.where(ty == i, g, acc)
        return decode_colour30(acc)
    if mask is None:
        ty_lo = jnp.min(ty)
        ty_hi = jnp.max(ty)
    else:
        ty_lo = jnp.min(jnp.where(mask, ty, jnp.int32(img_rows - 1)))
        ty_hi = jnp.max(jnp.where(mask, ty, jnp.int32(0)))

    def frow(i, acc):
        row = tex_ref[pl.ds(i, 1), :]
        g = jnp.take_along_axis(jnp.broadcast_to(row, shape), lane, axis=1)
        return jnp.where(ty == i, g, acc)

    acc = jax.lax.fori_loop(ty_lo, ty_hi + 1, frow, acc)
    return decode_colour30(acc)


def _asin(x):
    """Abramowitz-Stegun 4.4.45 arcsin approximation (|err| < 7e-5).

    Mosaic has no asin/acos primitive; texture UVs tolerate the error.
    """
    ax = jnp.abs(x)
    r = (1.5707288 + ax * (-0.2121144 + ax * (0.0742610 + ax * -0.0187293)))
    v = jnp.pi / 2.0 - jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * r
    return jnp.where(x < 0.0, -v, v)


def _kernel(seed_ref, sphf_ref, sphi_ref, trif_ref, trii_ref,
            sphc_ref, tric_ref, sphs_ref, tris_ref,
            sph_order_ref, tri_order_ref, grid_ref, mat_ref,
            slcl_ref, tlcl_ref, matv_ref,
            sphpf_ref, sphpi_ref, tripf_ref, tripi_ref,
            slpf_ref, slpi_ref, tlpf_ref, tlpi_ref,
            tex_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            sum_r_ref, sum_g_ref, sum_b_ref, segs_ref, depth_ref,
            *scratch,
            num_spheres: int, num_tris: int, num_sph_clusters: int,
            num_tri_clusters: int, num_sph_supers: int,
            num_tri_supers: int, num_materials: int, spp: int,
            limit: int, antialias: bool, sky: tuple,
            emissive_terminates: bool, fix_exit_ior: bool,
            need_sphere_uv: bool, has_one_way: bool, needs_tri_uv: bool,
            sph_ordered: bool, tri_ordered: bool,
            sph_leaf: int, tri_leaf: int, mrows: int, nstream: int,
            img_rows: int, rows_s: int, rows_t: int,
            num_sph_lane: int = 0, num_tri_lane: int = 0,
            sph_lane_leaf: int = 0, tri_lane_leaf: int = 0,
            interp_rng: bool = False, coherent: bool = False,
            img_rows_padded: int = 0, has_refractive: bool = True,
            rr_start: int = 0, pixpack: int = 1):
    # HBM-paged image textures (img_rows > IMG_MAX_ROWS): the texel plane
    # arrives as an HBM ref and pallas passes a VMEM page scratch + DMA
    # semaphore after the outputs.
    tex_page_ref, tex_sem = scratch if scratch else (None, None)
    tile = pl.program_id(0)
    # Defer the winner-param selects out of the sweep when the scene is big
    # enough that the per-bounce fetch pass costs less than the per-swept-
    # primitive selects it replaces (measured crossover ~tens of prims).
    defer = (num_spheres + num_tris) >= DEFER_MIN
    # counter-based seeding: (frame key material, global tile index)
    # two 32-bit seed words max: fold (frame key, global tile) together
    # (golden-ratio multiplier, int32 wraparound)
    if interp_rng:
        # Interpreter mode (CPU test suites): pltpu.prng_* has no interpret
        # lowering, so randoms come from a counter-based splitmix32-style
        # hash of (frame key, global tile, loop iteration, element id)
        # instead. A *different* stream than the hardware PRNG — renders are
        # still deterministic per (key, tile), and the full spp x bounce
        # loop numerics run on every backend; cross-sampler tests compare
        # statistically, exactly as they must on TPU anyway.
        seed_w0 = jax.lax.bitcast_convert_type(seed_ref[0], jnp.uint32)
        seed_w1 = jax.lax.bitcast_convert_type(
            seed_ref[1] + (seed_ref[2] + tile) * jnp.int32(-1640531527),
            jnp.uint32)
    else:
        pltpu.prng_seed(
            seed_ref[0],
            seed_ref[1] + (seed_ref[2] + tile) * jnp.int32(-1640531527))

    o0x_t, o0y_t, o0z_t = ox_ref[:], oy_ref[:], oz_ref[:]
    d0x_t, d0y_t, d0z_t = dx_ref[:], dy_ref[:], dz_ref[:]
    srows = mrows // (nstream * pixpack)
    # per-lane sample budget: spp per pixel x pixpack pixels per lane
    budget = spp * pixpack

    # The per-bounce program is one long dependency chain of (rows, 128)
    # ops; measured on v5e it is latency-bound with most VPU issue slots
    # idle (doubling whole blocks costs ~nothing). Advancing ``nstream``
    # independent ray streams per grid step lets their chains overlap in
    # the pipeline — near-linear throughput gain until register pressure
    # bites (2 x 32 rows measured best).
    def make_stream(stream):
      # pixel block k of stream s rides rows [(k*nstream + s) * srows ...):
      # consecutive Morton tiles stay contiguous per k, so each of a lane's
      # pixpack pixels comes from a spatially coherent block.
      offs = [(k * nstream + stream) * srows for k in range(pixpack)]
      lo = offs[0]
      o0x_l = [o0x_t[off:off + srows] for off in offs]
      o0y_l = [o0y_t[off:off + srows] for off in offs]
      o0z_l = [o0z_t[off:off + srows] for off in offs]
      d0x_l = [d0x_t[off:off + srows] for off in offs]
      d0y_l = [d0y_t[off:off + srows] for off in offs]
      d0z_l = [d0z_t[off:off + srows] for off in offs]
      o0x, o0y, o0z = o0x_l[0], o0y_l[0], o0z_l[0]
      d0x, d0y, d0z = d0x_l[0], d0y_l[0], d0z_l[0]

      shape = (srows, LANES)
      # Derive loop-carry seeds from loaded data: broadcast constants get a
      # "replicated" Mosaic layout that is invalid as a while_loop carry.
      f0 = o0x * 0.0
      i0 = f0.astype(jnp.int32)

      def sweep(  ox, oy, oz, dx, dy, dz):
          """Nearest hit + winner shade params (shared core, ops/sweep.py)."""
          return sweep_tile(
              sphf_ref, sphi_ref, trif_ref, trii_ref,
              sphc_ref, tric_ref, sphs_ref, tris_ref,
              sph_order_ref, tri_order_ref, grid_ref,
              ox, oy, oz, dx, dy, dz, f0, i0,
              num_spheres=num_spheres, num_tris=num_tris,
              num_sph_clusters=num_sph_clusters,
              num_tri_clusters=num_tri_clusters,
              num_sph_supers=num_sph_supers,
              num_tri_supers=num_tri_supers,
              has_one_way=has_one_way, needs_tri_uv=needs_tri_uv,
              sph_ordered=sph_ordered, tri_ordered=tri_ordered,
              sph_leaf=sph_leaf, tri_leaf=tri_leaf, defer_params=defer,
              fast_div=FAST_DIV,
              sph_lane_cl_get=lambda i, k: slcl_ref[i, k],
              tri_lane_cl_get=lambda i, k: tlcl_ref[i, k],
              sph_lane_pf=slpf_ref, sph_lane_pi=slpi_ref,
              tri_lane_pf=tlpf_ref, tri_lane_pi=tlpi_ref,
              num_sph_lane=num_sph_lane, num_tri_lane=num_tri_lane,
              sph_lane_leaf=sph_lane_leaf, tri_lane_leaf=tri_lane_leaf)

      def body(state):
          if pixpack > 1:
              # pixel-packed carry: the pixel accumulators (sr/sg/sb),
              # per-pixel primary depths (t0) ride as pixpack-tuples and
              # cur_k tracks each lane's current pixel block
              (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, bounce_i,
               sample_i, ior, srs, sgs, sbs, segs, t0s, cur_k,
               *itc_t) = state
              sr = sg = sb = t0 = None
          elif interp_rng:
              (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, bounce_i,
               sample_i, ior, sr, sg, sb, segs, t0, itc) = state
          else:
              (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, bounce_i,
               sample_i, ior, sr, sg, sb, segs, t0) = state
          if pixpack > 1 and interp_rng:
              itc = itc_t[0] + 1
          elif pixpack > 1:
              itc_t = ()
          elif interp_rng:
              itc = itc + 1
          active = sample_i < budget
          if "iters" in _ABLATE:
              # measurement: count every lane-iteration instead of active ones
              # (base_mrays / iters_mrays = mean lane activity)
              segs = segs + 1.0
          else:
              segs = segs + jnp.where(active, 1.0, 0.0)

          # --- randoms (on-core PRNG). One batched draw per iteration:
          # every prng_random_bits call is ordered on the PRNG state, so k
          # separate draws serialise k generation latencies at the head of
          # the bounce chain; slicing one (k*rows, 128) draw pays that
          # latency once. ---
          # Three 24-bit uniforms (direction pair + fresnel) are consumed
          # from the low bits of three draw rows; with AA_PACK the
          # antialias jitters (range +-1e-3 — 8 bits of resolution is
          # ~4e3x below a pixel footprint) are packed into those rows'
          # otherwise-unused top bytes, halving the per-iteration PRNG
          # generation when AA is on.
          nrand_base = 3 if (AA_PACK or not antialias) else 6
          # Russian roulette (rr_start > 0) consumes one extra uniform per
          # iteration, appended AFTER the existing draw rows so rows
          # 0..nrand_base-1 keep their meaning; with RR off the draw shape
          # (hence the whole stream) is bitwise unchanged.
          nrand = nrand_base + (1 if rr_start > 0 else 0)
          if coherent:
              # one shared draw per iteration: (nrand, 128) bits, lane 0 of
              # each row broadcast tile-wide (see COHERENT note above)
              if interp_rng:
                  r_ = jax.lax.broadcasted_iota(jnp.uint32, (8, LANES), 0)
                  l_ = jax.lax.broadcasted_iota(jnp.uint32, (8, LANES), 1)
                  # salt by the stream's tile-row offset: the hash is
                  # stateless, so without it NSTREAM > 1 streams would draw
                  # bit-identical randoms (the hardware PRNG's state advances
                  # between streams and needs no equivalent)
                  x = (itc.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                       + jnp.uint32((lo * 2654435761) & 0xFFFFFFFF)
                       + r_ * jnp.uint32(LANES) + l_) ^ seed_w0
                  x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
                  x = x + seed_w1
                  x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
                  sbits = jax.lax.bitcast_convert_type(x ^ (x >> 16),
                                                       jnp.int32)
              else:
                  sbits = pltpu.prng_random_bits((8, LANES))

              def uni(i):
                  # lane-0 value broadcast tile-wide: sublane broadcast of
                  # the draw row + a constant-zero-index lane gather (no
                  # scalar-unit round trip, no (1,1) broadcasts — Mosaic
                  # supports neither cheaply)
                  row = jnp.broadcast_to(sbits[i:i + 1, :], (srows, LANES))
                  b = jnp.take_along_axis(row, i0, axis=1)
                  return (b & jnp.int32(0x00FFFFFF)).astype(jnp.float32) * (
                      1.0 / 16777216.0)

              def jit_u(i):
                  # the coherent draw has 8 rows regardless; rows 3-5 are
                  # free for the jitters at full precision
                  return uni(3 + i)
          elif interp_rng:
              shape_b = (nrand * srows, LANES)
              r_ = jax.lax.broadcasted_iota(jnp.uint32, shape_b, 0)
              l_ = jax.lax.broadcasted_iota(jnp.uint32, shape_b, 1)
              x = (itc.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                   + jnp.uint32((lo * 2654435761) & 0xFFFFFFFF)  # stream salt
                   + r_ * jnp.uint32(LANES) + l_) ^ seed_w0
              x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
              x = x + seed_w1
              x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
              x = x ^ (x >> 16)
              bits = jax.lax.bitcast_convert_type(x, jnp.int32)
          else:
              bits = pltpu.prng_random_bits((nrand * srows, LANES))
          if not coherent:
              if "rng2" in _ABLATE:
                  # measurement: a second full batch, opaquely mixed in
                  bits2 = pltpu.prng_random_bits((nrand * srows, LANES))
                  bits = jnp.where(bits2 < jnp.int32(0x7FFFFFFF), bits,
                                   bits2)

              def uni(i):
                  # low 24 bits as non-negative int32 (uint32->f32 casts
                  # are unsupported in Mosaic) -> [0, 1) with full mantissa
                  # precision
                  b = bits[i * srows:(i + 1) * srows]
                  return (b & jnp.int32(0x00FFFFFF)).astype(jnp.float32) * (
                      1.0 / 16777216.0)

              if AA_PACK:
                  def jit_u(i):
                      # top byte of draw row i (unused by uni): an 8-bit
                      # uniform centred as (k + 0.5)/256 so the mean is
                      # exactly 0.5 (no systematic direction bias)
                      b = bits[i * srows:(i + 1) * srows]
                      return ((b >> 24) & jnp.int32(0xFF)).astype(
                          jnp.float32) * (1.0 / 256.0) + (0.5 / 256.0)
              else:
                  def jit_u(i):
                      return uni(3 + i)

          if antialias:
              jx = (jit_u(0) - 0.5) * (2 * ANTIALIAS_OFFSET_RANGE)
              jy = (jit_u(1) - 0.5) * (2 * ANTIALIAS_OFFSET_RANGE)
              jz = (jit_u(2) - 0.5) * (2 * ANTIALIAS_OFFSET_RANGE)
              dx, dy, dz = dx + jx, dy + jy, dz + jz
              inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
              dx, dy, dz = dx * inv, dy * inv, dz * inv

          # Uniform unit vector, sampled directly on the sphere. The
          # reference draws a gaussian triple and normalises it
          # (src/utils.cu:234-239 + src/ray.cu:157-170); only the
          # *normalised* vector is ever used, and a gaussian triple's
          # direction is exactly uniform on the sphere — so this is the
          # same distribution with 2 fewer uniforms, no logs and no
          # normalise on the bounce chain.
          def sphere_dir(u1, u2):
              z = 2.0 * u1 - 1.0
              phi = (2.0 * jnp.pi) * u2
              r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
              return r * jnp.cos(phi), r * jnp.sin(phi), z

          gx, gy, gz = sphere_dir(uni(0), uni(1))
          if "bm2" in _ABLATE:
              # measurement: duplicate the direction sampling, opaque take
              gx2, gy2, gz2 = sphere_dir(uni(1), uni(0))
              take2 = gz < 2.0  # always true; opaque to the compiler
              gx = jnp.where(take2, gx2, gx)
              gy = jnp.where(take2, gy2, gy)
              gz = jnp.where(take2, gz2, gz)
          fres_u = uni(2)
          if rr_start > 0:
              # RR survival uniform: coherent mode's fixed 8-row draw has
              # row 6 free — a tile-shared survival uniform keeps each
              # lane's marginal exact (P(u < p_lane) = p_lane; whole-tile
              # deaths only tighten the retirement tail).
              rr_u = uni(6) if coherent else uni(nrand_base)

          # --- nearest hit + deferred winner-param fetch ---
          if "nosweep" in _ABLATE:
              # measurement: fake always-hit, skip intersection entirely
              bt = jnp.abs(oz) + 0.5
              bc, pa, pb = i0, i0, i0
              bu, bv = fres_u, fres_u
              n0, n1, n2 = f0, f0 + 1.0, f0
          elif not defer:
              # small scenes: the in-sweep winner selects cost less than a
              # post-sweep fetch pass (few primitives per bounce)
              (bt, bc, bu, bv, n0, n1, n2, pa, pb) = sweep(
                  ox, oy, oz, dx, dy, dz)
          else:
              bt, bc, bu, bv = sweep(ox, oy, oz, dx, dy, dz)
              # The sweep carried only (best t, winner code): reconstruct
              # the winner's parameters with one lane-gather per plane row
              # instead of one select per swept primitive (see
              # sweep.pack_param_planes / fetch_winner_param).
              prim = bc >> 1
              lane_i = prim & (LANES - 1)
              row_i = prim >> 7
              is_tri_w = (bc & 1) == 1
              if num_spheres > 0:
                  scx = fetch_winner_param(sphpf_ref, 0, rows_s,
                                           row_i, lane_i, f0)
                  scy = fetch_winner_param(sphpf_ref, rows_s, rows_s,
                                           row_i, lane_i, f0)
                  scz = fetch_winner_param(sphpf_ref, 2 * rows_s, rows_s,
                                           row_i, lane_i, f0)
                  spa = fetch_winner_param(sphpi_ref, 0, rows_s,
                                           row_i, lane_i, i0)
                  spb = fetch_winner_param(sphpi_ref, rows_s, rows_s,
                                           row_i, lane_i, i0)
              else:
                  scx = scy = scz = f0
                  spa = spb = i0
              if num_tris > 0:
                  tn0 = fetch_winner_param(tripf_ref, 0, rows_t,
                                           row_i, lane_i, f0)
                  tn1 = fetch_winner_param(tripf_ref, rows_t, rows_t,
                                           row_i, lane_i, f0)
                  tn2 = fetch_winner_param(tripf_ref, 2 * rows_t, rows_t,
                                           row_i, lane_i, f0)
                  tpa = fetch_winner_param(tripi_ref, 0, rows_t,
                                           row_i, lane_i, i0)
                  tpb = fetch_winner_param(tripi_ref, rows_t, rows_t,
                                           row_i, lane_i, i0)
              else:
                  tn0 = tn1 = tn2 = f0
                  tpa = tpb = i0
              n0 = jnp.where(is_tri_w, tn0, scx)
              n1 = jnp.where(is_tri_w, tn1, scy)
              n2 = jnp.where(is_tri_w, tn2, scz)
              pa = jnp.where(is_tri_w, tpa, spa)
              pb = jnp.where(is_tri_w, tpb, spb)
              if needs_tri_uv and num_tris > 0:
                  uvp = [fetch_winner_param(tripf_ref, (3 + c) * rows_t,
                                            rows_t, row_i, lane_i, f0)
                         for c in range(6)]
                  # barycentric UV with the reference's argument order
                  # (src/objects.cu:160,196-199): uv0*w + uv1*u + uv2*v
                  w_bar = 1.0 - bu - bv
                  bu, bv = (uvp[0] * w_bar + uvp[2] * bu + uvp[4] * bv,
                            uvp[1] * w_bar + uvp[3] * bu + uvp[5] * bv)
          if "noshade" in _ABLATE:
              # measurement: consume every sweep output (so none of its
              # selects are DCE'd), then regenerate immediately — isolates
              # while+RNG+sweep from the shading/scatter half of the body.
              # (measurement knob; not composed with pixel packing — see
              # the pixpack guard in render_sample_mean_mega)
              dummy = (bt + bu + bv + n0 + n1 + n2
                       + (bc + pa + pb).astype(jnp.float32))
              sr = sr + jnp.where(active, dummy * 1e-30, 0.0)
              sample_i = jnp.where(active, sample_i + 1, sample_i)
              out = (o0x, o0y, o0z, d0x, d0y, d0z, tr, tg, tb, rr, rg, rb,
                     bounce_i, sample_i, ior, sr, sg, sb, segs, t0)
              return out + (itc,) if interp_rng else out
          if "sweep2" in _ABLATE:
              # identical second sweep on epsilon-perturbed origins (defeats
              # CSE; adding 1e-30 to scene-scale floats is bitwise identity)
              bt2, *_ = sweep(ox + 1e-30, oy, oz, dx, dy, dz)
              bt = jnp.minimum(bt, bt2)
          msm, mid = decode_smooth_mat(pb)
          pcol_r, pcol_g, pcol_b = decode_colour30(pa)
          hit = bt < _INF
          is_tri = (bc & 1) == 1
          # primary-hit depth (sample 0, bounce 0): free per-pixel depth
          # for temporal reprojection of camera moves (runtime/renderer.py)
          if pixpack > 1:
              # first sample of the lane's CURRENT pixel block
              first = (active & (bounce_i == 0)
                       & (sample_i == cur_k * spp))
              t0s = tuple(jnp.where(first & (cur_k == k), bt, t0s[k])
                          for k in range(pixpack))
          else:
              first = active & (sample_i == 0) & (bounce_i == 0)
              t0 = jnp.where(first, bt, t0)
          safe_t = jnp.where(hit, bt, 0.0)
          px = ox + dx * safe_t
          py = oy + dy * safe_t
          pz = oz + dz * safe_t

          # sphere outward normal = normalised (p - c); the reference divides
          # by the radius then normalises (src/objects.cu:66) — the radius
          # cancels, so it is never carried through the sweep.
          rx = px - n0
          ry = py - n1
          rz = pz - n2
          rmag = jax.lax.rsqrt(jnp.maximum(rx * rx + ry * ry + rz * rz, 1e-24))
          # sphere UV (lat/long, src/objects.cu:82-97); statically skipped
          # when no sphere carries a UV-dependent texture
          if need_sphere_uv:
              theta = _asin(jnp.clip(ry * rmag, -1.0, 1.0))
              phi = jnp.pi / 2.0 - _asin(jnp.clip(rx * rmag, -1.0, 1.0))
              sph_u = (theta + jnp.pi / 2.0) / jnp.pi
              v_ratio = (1.0 - phi / jnp.pi) / 2.0
              behind = jnp.where(pz > n2, 1.0, 0.0)
              sph_v = behind + (1.0 - 2.0 * behind) * v_ratio
          else:
              sph_u = f0
              sph_v = f0

          # triangle normal flipped against the ray (src/objects.cu:158)
          ndd = n0 * dx + n1 * dy + n2 * dz
          flip = jnp.where(ndd > 0.0, -1.0, 1.0)
          nx = jnp.where(is_tri, n0 * flip, rx * rmag)
          ny = jnp.where(is_tri, n1 * flip, ry * rmag)
          nz = jnp.where(is_tri, n2 * flip, rz * rmag)
          uu = jnp.where(is_tri, bu, sph_u)
          vv = jnp.where(is_tri, bv, sph_v)

          # --- material behaviour fetch (the per-primitive colour/smoothness
          # came out of the sweep). For tables up to 128 materials the fetch
          # is one lane-dimension dynamic gather per behaviour row — 13
          # independent vector ops of depth 1, regardless of table size.
          # (The previous per-material masked loop cost a cross-lane
          # any-reduce plus a scalar branch per material — 36 scalar-unit
          # syncs per bounce on the 36-material RTiOW scene.) ---
          has_img = img_rows > 0

          if num_materials <= LANES:
              def mfetch(row):
                  return jnp.take_along_axis(
                      jnp.broadcast_to(matv_ref[row:row + 1, :], shape),
                      mid, axis=1)

              rows = [_M_TYPE, _M_IOR, _M_EMR, _M_EMG, _M_EMB, _M_TEXTYPE,
                      _M_LR, _M_LG, _M_LB, _M_DR, _M_DG, _M_DB, _M_NSQ]
              if has_img:
                  rows += [_M_TW, _M_TH, _M_TROW]
              macc = tuple(mfetch(r) for r in rows)
          else:
              # fallback: per-material masked loop, gated per material
              def mtake(m, acc, use):
                  out = (
                      jnp.where(use, mat_ref[_M_TYPE, m], acc[0]),
                      jnp.where(use, mat_ref[_M_IOR, m], acc[1]),
                      jnp.where(use, mat_ref[_M_EMR, m], acc[2]),
                      jnp.where(use, mat_ref[_M_EMG, m], acc[3]),
                      jnp.where(use, mat_ref[_M_EMB, m], acc[4]),
                      jnp.where(use, mat_ref[_M_TEXTYPE, m], acc[5]),
                      jnp.where(use, mat_ref[_M_LR, m], acc[6]),
                      jnp.where(use, mat_ref[_M_LG, m], acc[7]),
                      jnp.where(use, mat_ref[_M_LB, m], acc[8]),
                      jnp.where(use, mat_ref[_M_DR, m], acc[9]),
                      jnp.where(use, mat_ref[_M_DG, m], acc[10]),
                      jnp.where(use, mat_ref[_M_DB, m], acc[11]),
                      jnp.where(use, mat_ref[_M_NSQ, m], acc[12]),
                  )
                  if has_img:
                      out = out + (
                          jnp.where(use, mat_ref[_M_TW, m], acc[13]),
                          jnp.where(use, mat_ref[_M_TH, m], acc[14]),
                          jnp.where(use, mat_ref[_M_TROW, m], acc[15]),
                      )
                  return out

              macc = (f0, f0 + 1.0) + (f0,) * (14 if has_img else 11)

              def mbody(m, acc):
                  use = mid == m
                  return jax.lax.cond(jnp.any(use & hit),
                                      lambda a: mtake(m, a, use),
                                      lambda a: a, acc)
              macc = jax.lax.fori_loop(0, num_materials, mbody, macc)
          (mtype, mior, mer, meg, meb, mtt,
           ml0, ml1, ml2, md0, md1, md2, mnsq) = macc[:13]

          # --- texture colour (const / gradient / checker / image) ---
          u_c = (uu * mnsq).astype(jnp.int32)
          v_c = (vv * mnsq).astype(jnp.int32)
          is_light = ((u_c + v_c) % 2) == 0
          tex_r = jnp.where(mtt == TEX_CHECKERBOARD,
                            jnp.where(is_light, ml0, md0),
                            jnp.where(mtt == TEX_GRADIENT, uu, pcol_r))
          tex_g = jnp.where(mtt == TEX_CHECKERBOARD,
                            jnp.where(is_light, ml1, md1),
                            jnp.where(mtt == TEX_GRADIENT, vv, pcol_g))
          tex_b = jnp.where(mtt == TEX_CHECKERBOARD,
                            jnp.where(is_light, ml2, md2),
                            jnp.where(mtt == TEX_GRADIENT, 0.0, pcol_b))

          if has_img:
              # In-kernel nearest-neighbour texel fetch (the reference
              # samples image texels inside its one kernel,
              # src/material.cu:119-124). Gated per iteration: a tile whose
              # live rays hit no image-textured primitive this bounce skips
              # the MXU fetch entirely.
              mtw, mth, mtrow = macc[13], macc[14], macc[15]
              is_img = (mtt == float(TEX_IMAGE)) & hit

              def img_fetch(args):
                  tr_, tg_, tb_ = args
                  ir, ig, ib = _fetch_image(tex_ref, uu, vv, mtw, mth,
                                            mtrow, img_rows=img_rows,
                                            mask=is_img,
                                            page_ref=tex_page_ref,
                                            page_sem=tex_sem,
                                            img_rows_padded=img_rows_padded)
                  return (jnp.where(is_img, ir, tr_),
                          jnp.where(is_img, ig, tg_),
                          jnp.where(is_img, ib, tb_))

              tex_r, tex_g, tex_b = jax.lax.cond(
                  jnp.any(is_img), img_fetch, lambda args: args,
                  (tex_r, tex_g, tex_b))

          # --- radiance bookkeeping (src/raytracer.cu:76-90) ---
          miss = active & ~hit
          rr = rr + jnp.where(miss, tr * sky[0], 0.0)
          rg = rg + jnp.where(miss, tg * sky[1], 0.0)
          rb = rb + jnp.where(miss, tb * sky[2], 0.0)

          is_em = mtype == float(MAT_EMISSIVE)
          live_hit = active & hit
          em = live_hit & is_em
          rr = rr + jnp.where(em, tr * mer, 0.0)
          rg = rg + jnp.where(em, tg * meg, 0.0)
          rb = rb + jnp.where(em, tb * meb, 0.0)
          absorb = live_hit & ~is_em
          tr = jnp.where(absorb, tr * tex_r, tr)
          tg = jnp.where(absorb, tg * tex_g, tg)
          tb = jnp.where(absorb, tb * tex_b, tb)

          # --- scatter (src/ray.cu:67-128, transcendental-free) ---
          def scatter_block(gx, gy, gz):
              # g arrives unit (sphere_dir), so hemisphere-flipping it is a
              # sign select, not a normalise (src/ray.cu:157-170 flips the
              # normalised gaussian the same way).
              gdotn = gx * nx + gy * ny + gz * nz
              gflip = jnp.where(gdotn < 0.0, -1.0, 1.0)
              ax_ = nx + gx * gflip
              ay_ = ny + gy * gflip
              az_ = nz + gz * gflip
              # |n + g·flip|^2 = 2 + 2|g·n| since both are unit (triangle
              # normals precomputed unit, sphere normal r*rmag, g is the
              # unit sphere_dir) — one abs+fma instead of the 3-square dot,
              # and never degenerate (>= 2), so no epsilon clamp needed.
              dinv = jax.lax.rsqrt(2.0 + 2.0 * jnp.abs(gdotn))
              dfx, dfy, dfz = ax_ * dinv, ay_ * dinv, az_ * dinv  # diffuse
              ddn = dx * nx + dy * ny + dz * nz
              sx = dx - 2.0 * ddn * nx
              sy = dy - 2.0 * ddn * ny
              sz = dz - 2.0 * ddn * nz  # specular (unit already)
              refx = dfx + (sx - dfx) * msm
              refy = dfy + (sy - dfy) * msm
              refz = dfz + (sz - dfz) * msm
              rinv = jax.lax.rsqrt(jnp.maximum(
                  refx * refx + refy * refy + refz * refz, 1e-24))
              refx, refy, refz = refx * rinv, refy * rinv, refz * rinv

              if not has_refractive:
                  # no glass in the scene (static): the Snell/Schlick block
                  # below (2 sqrt + 2 divides) is dead weight —
                  # skip it the way the reference's need_uv flag skips UV
                  # math (src/material.cu:142). fres_u stays drawn so the
                  # RNG stream is identical with the block on or off.
                  return refx, refy, refz, ior

              exiting = ddn > 0.0
              n1_ = jnp.where(exiting, mior, ior)
              # exit medium: the reference forgets air (quirk), the fix restores it
              exit_ior = jnp.ones_like(ior) if fix_exit_ior else ior
              n2_ = jnp.where(exiting, exit_ior, mior)
              sgn = jnp.where(exiting, 1.0, -1.0)
              rnx, rny, rnz = nx * sgn, ny * sgn, nz * sgn
              cos1 = jnp.minimum(dx * rnx + dy * rny + dz * rnz, 1.0)
              sin1 = jnp.sqrt(jnp.maximum(1.0 - cos1 * cos1, 0.0))
              sin2 = jnp.minimum(n1_ * sin1 / n2_, 1.0)
              cos2 = jnp.sqrt(jnp.maximum(1.0 - sin2 * sin2, 0.0))
              # sin1 > n2/n1  <=>  sin1 * n1 > n2 (IORs are positive);
              # saves a divide on the bounce chain
              tir = sin1 * n1_ > n2_
              sq0 = (n1_ - n2_) / (n1_ + n2_)
              r0 = sq0 * sq0
              mm_ = 1.0 - cos1
              m2 = mm_ * mm_
              refl = r0 + (1.0 - r0) * (m2 * m2 * mm_)
              do_reflect = tir | (refl > fres_u)
              # one reciprocal instead of three divides (x * (1/s) — the
              # megakernel is held to statistical/PSNR tests, not bitwise)
              inv_s1 = jnp.where(sin1 == 0.0, 0.0,
                                 1.0 / jnp.where(sin1 == 0.0, 1.0, sin1))
              pfx = (dx - rnx * cos1) * inv_s1
              pfy = (dy - rny * cos1) * inv_s1
              pfz = (dz - rnz * cos1) * inv_s1
              # rn is unit and pf = (d - rn*cos1)/sin1 is the unit
              # perpendicular component (orthogonal to rn), so
              # rn*cos2 + pf*sin2 is unit BY CONSTRUCTION (cos2^2+sin2^2=1);
              # the sin1==0 guard degenerates to rf = rn (cos2=1) which is
              # unit too. The old renormalising rsqrt only corrected
              # rounding — dropped (statistical contract, like inv_s1).
              rfx = rnx * cos2 + pfx * sin2
              rfy = rny * cos2 + pfy * sin2
              rfz = rnz * cos2 + pfz * sin2

              is_refr = mtype == float(MAT_REFRACTIVE)
              use_refr = is_refr & ~do_reflect
              ndx = jnp.where(is_refr, jnp.where(do_reflect, refx, rfx), refx)
              ndy = jnp.where(is_refr, jnp.where(do_reflect, refy, rfy), refy)
              ndz = jnp.where(is_refr, jnp.where(do_reflect, refz, rfz), refz)
              ior_upd = (is_refr & use_refr) if fix_exit_ior else is_refr
              new_ior = jnp.where(ior_upd & live_hit, n2_, ior)
              return ndx, ndy, ndz, new_ior

          if "noscat" in _ABLATE:
              # measurement: skip the scatter/refraction block entirely
              ndx, ndy, ndz = gx, gy, gz
              new_ior = ior
          else:
              ndx, ndy, ndz, new_ior = scatter_block(gx, gy, gz)
          if "scat2" in _ABLATE:
              ndx2, ndy2, ndz2, nior2 = scatter_block(gx + 1e-30, gy, gz)
              take2 = fres_u < 2.0  # always true; opaque to the compiler
              ndx = jnp.where(take2, ndx2, ndx)
              ndy = jnp.where(take2, ndy2, ndy)
              ndz = jnp.where(take2, ndz2, ndz)
              new_ior = jnp.where(take2, nior2, new_ior)

          ox = jnp.where(live_hit, px, ox)
          oy = jnp.where(live_hit, py, oy)
          oz = jnp.where(live_hit, pz, oz)
          dx = jnp.where(live_hit, ndx, dx)
          dy = jnp.where(live_hit, ndy, dy)
          dz = jnp.where(live_hit, ndz, dz)
          ior = new_ior

          continues = live_hit
          if emissive_terminates:
              continues = continues & ~is_em
          if rr_start > 0:
              # Russian roulette (flag-gated deviation — the reference
              # always traces to the limit, src/raytracer.cu:71). Exactly
              # the wavefront estimator (integrator._bounce_physics): once
              # a path has completed rr_start bounces it survives with
              # p = clamp(max(post-absorption throughput), 0.05, 1) and is
              # boosted 1/p — unbiased, E[thru/p * survive] = thru.
              p = jnp.clip(jnp.maximum(tr, jnp.maximum(tg, tb)), 0.05, 1.0)
              eligible = continues & (bounce_i + 1 >= rr_start)
              survive = rr_u < p
              boost = eligible & survive
              inv_p = 1.0 / p
              tr = jnp.where(boost, tr * inv_p, tr)
              tg = jnp.where(boost, tg * inv_p, tg)
              tb = jnp.where(boost, tb * inv_p, tb)
              continues = continues & (~eligible | survive)
          at_limit = bounce_i + 1 >= limit
          path_end = active & (~continues | at_limit)

          if pixpack > 1:
              # bank the finished path's radiance into its PIXEL's
              # accumulator (pre-advance cur_k)
              srs = tuple(srs[k] + jnp.where(path_end & (cur_k == k),
                                             rr, 0.0)
                          for k in range(pixpack))
              sgs = tuple(sgs[k] + jnp.where(path_end & (cur_k == k),
                                             rg, 0.0)
                          for k in range(pixpack))
              sbs = tuple(sbs[k] + jnp.where(path_end & (cur_k == k),
                                             rb, 0.0)
                          for k in range(pixpack))
          else:
              sr = sr + jnp.where(path_end, rr, 0.0)
              sg = sg + jnp.where(path_end, rg, 0.0)
              sb = sb + jnp.where(path_end, rb, 0.0)

          sample_i = jnp.where(path_end, sample_i + 1, sample_i)
          bounce_i = jnp.where(path_end, 0,
                               jnp.where(active, bounce_i + 1, bounce_i))
          if pixpack > 1:
              # advance to the next pixel block once this one's spp samples
              # are done (sample_i is post-increment here); the clamp keeps
              # fully retired lanes on their last pixel's primary exactly
              # like the K=1 regen (active gates every accumulate anyway)
              adv = path_end & (sample_i == (cur_k + 1) * spp)
              cur_k = jnp.minimum(cur_k + adv.astype(jnp.int32),
                                  pixpack - 1)

              def selk(plst):
                  out = plst[0]
                  for k in range(1, pixpack):
                      out = jnp.where(cur_k == k, plst[k], out)
                  return out

              o0x_s, o0y_s, o0z_s = selk(o0x_l), selk(o0y_l), selk(o0z_l)
              d0x_s, d0y_s, d0z_s = selk(d0x_l), selk(d0y_l), selk(d0z_l)
          else:
              o0x_s, o0y_s, o0z_s = o0x, o0y, o0z
              d0x_s, d0y_s, d0z_s = d0x, d0y, d0z
          ox = jnp.where(path_end, o0x_s, ox)
          oy = jnp.where(path_end, o0y_s, oy)
          oz = jnp.where(path_end, o0z_s, oz)
          if RETIRE_POISON:
              # A lane whose sample budget is exhausted would otherwise
              # keep its primary ray in (o, d) and keep opening cluster
              # gates for the rest of the tile's retirement tail. Parking
              # the origin at 1e30 makes every slab entry and primitive
              # test fail (huge/NaN arithmetic, all compares strict), so
              # retired lanes stop paying for leaf sweeps. Pure work
              # removal: retired lanes' results are already banked and
              # every accumulate is gated on `active`.
              retired = sample_i >= budget
              ox = jnp.where(retired, 1e30, ox)
              oy = jnp.where(retired, 1e30, oy)
              oz = jnp.where(retired, 1e30, oz)
          dx = jnp.where(path_end, d0x_s, dx)
          dy = jnp.where(path_end, d0y_s, dy)
          dz = jnp.where(path_end, d0z_s, dz)
          tr = jnp.where(path_end, 1.0, tr)
          tg = jnp.where(path_end, 1.0, tg)
          tb = jnp.where(path_end, 1.0, tb)
          rr = jnp.where(path_end, 0.0, rr)
          rg = jnp.where(path_end, 0.0, rg)
          rb = jnp.where(path_end, 0.0, rb)
          ior = jnp.where(path_end, 1.0, ior)

          if pixpack > 1:
              out = (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb,
                     bounce_i, sample_i, ior, srs, sgs, sbs, segs, t0s,
                     cur_k)
          else:
              out = (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb,
                     bounce_i, sample_i, ior, sr, sg, sb, segs, t0)
          return out + (itc,) if interp_rng else out

      one = f0 + 1.0
      if pixpack > 1:
          state0 = (o0x, o0y, o0z, d0x, d0y, d0z,
                    one, one, one,               # throughput
                    f0, f0, f0,                  # path radiance
                    i0, i0,                      # bounce, sample
                    one,                         # ior
                    (f0,) * pixpack,             # pixel sums r
                    (f0,) * pixpack,             # pixel sums g
                    (f0,) * pixpack,             # pixel sums b
                    f0,                          # segments
                    (f0 + _INF,) * pixpack,      # primary-hit depths
                    i0)                          # current pixel block
      else:
          state0 = (o0x, o0y, o0z, d0x, d0y, d0z,
                    one, one, one,          # throughput
                    f0, f0, f0,             # path radiance
                    i0, i0,                 # bounce, sample
                    one,                    # ior
                    f0, f0, f0,             # pixel sums
                    f0,                     # segments
                    f0 + _INF)              # primary-hit depth
      if interp_rng:
          state0 = state0 + (jnp.int32(0),)  # loop iteration counter
      return body, state0

    streams = [make_stream(s) for s in range(nstream)]

    def cond(states):
        live = [jnp.any(st[13] < budget) for st in states]
        out = live[0]
        for lv in live[1:]:
            out = jnp.logical_or(out, lv)
        return out

    def body_all(states):
        # The streams are data-independent; tracing them together lets the
        # compiler interleave their chains.
        for _ in range(BODY_UNROLL):
            states = tuple(streams[i][0](st) for i, st in enumerate(states))
        return states

    states = jax.lax.while_loop(
        cond, body_all, tuple(b_s[1] for b_s in streams))

    inv_spp = 1.0 / float(spp)
    for s, st in enumerate(states):
        if pixpack > 1:
            srs, sgs, sbs, segs, t0s = st[15], st[16], st[17], st[18], st[19]
            for k in range(pixpack):
                off = (k * nstream + s) * srows
                sum_r_ref[off:off + srows] = srs[k] * inv_spp
                sum_g_ref[off:off + srows] = sgs[k] * inv_spp
                sum_b_ref[off:off + srows] = sbs[k] * inv_spp
                # segments are counted per LANE (they span the lane's
                # pixpack pixels); bank the lane total on block 0 so the
                # frame sum stays exact (per-pixel segs are undefined in
                # packed mode — see the lane_segs guard in
                # render_sample_mean_mega)
                segs_ref[off:off + srows] = segs if k == 0 else segs * 0.0
                depth_ref[off:off + srows] = t0s[k]
        else:
            lo = s * srows
            sum_r_ref[lo:lo + srows] = st[15] * inv_spp
            sum_g_ref[lo:lo + srows] = st[16] * inv_spp
            sum_b_ref[lo:lo + srows] = st[17] * inv_spp
            segs_ref[lo:lo + srows] = st[18]
            depth_ref[lo:lo + srows] = st[19]


def render_sample_mean_mega(
    scene: SceneArrays,
    settings: RenderSettings,
    o: jax.Array,        # (3, N) primary origins (Morton order recommended)
    d: jax.Array,        # (3, N) primary directions
    frame_key: jax.Array,
    tile_offset=0,
    lane_segs: bool = False,
    want_depth: bool = False,
    pixpack: int | None = None,
):
    """Full-frame megakernel sampler; returns ((3, N) mean, segments).

    RNG is seeded per (frame key, global tile); ``tile_offset`` shifts tile
    ids under shard_map so multi-chip renders stay deterministic.
    ``lane_segs=True`` returns the per-pixel segment counts instead of their
    sum — the cost signal the Renderer's adaptive pixel binning sorts by.
    ``pixpack`` packs K pixels per lane — see the PIXPACK module comment;
    default resolution is env flag > settings.pixpack > 1. Forced to 1
    for lane_segs (per-pixel costs are undefined when a lane spans K
    pixels); K > 1 changes the pixel->tile assignment, so use the same K
    on every shard of a sharded render (settings-driven resolution makes
    that automatic).
    """
    if pixpack is not None:
        K = int(pixpack)
    elif PIXPACK is not None:
        K = PIXPACK
    else:
        sp = getattr(settings, "pixpack", None)
        K = 1 if sp is None else int(sp)
    if lane_segs:
        K = 1
    if K > 1 and _ABLATE:
        raise ValueError("RAYTRACER_ABLATE paths assume the unpacked "
                         "carry layout; unset it or use pixpack=1")
    n = o.shape[1]
    mega_tile = mega_tile_for(scene) * K
    mrows = mega_tile // LANES
    n_pad = max(mega_tile, ((n + mega_tile - 1) // mega_tile) * mega_tile)
    if n_pad != n:
        pad_o = jnp.zeros((3, n_pad - n), o.dtype)
        pad_d = jnp.zeros((3, n_pad - n), d.dtype).at[0].set(1.0)
        o = jnp.concatenate([o, pad_o], axis=1)
        d = jnp.concatenate([d, pad_d], axis=1)
    rows = n_pad // LANES

    # The sweep assumes unit directions (a = 1). Radiance is independent of
    # the direction parameterisation, so this is semantics-free.
    d = d * jax.lax.rsqrt(jnp.sum(d * d, axis=0))[None, :]

    planes = [p.reshape(rows, LANES)
              for p in (o[0], o[1], o[2], d[0], d[1], d[2])]
    (sphf, sphi, trif, trii, sphc, tric, sphs, tris,
     sph_order, tri_order, cell_grid) = pack_scene(scene)
    slpf, slpi, tlpf, tlpi = pack_lane_planes(scene)
    sph_lane = (scene.sph_lane_leaf > 0
                and scene.sph_lane_clusters.shape[0] > 0)
    tri_lane = (scene.tri_lane_leaf > 0
                and scene.tri_lane_clusters.shape[0] > 0)
    dummy_cl = jnp.zeros((1, 8), jnp.float32)
    slcl = scene.sph_lane_clusters if sph_lane else dummy_cl
    tlcl = scene.tri_lane_clusters if tri_lane else dummy_cl
    mat = pack_materials(scene)
    # VMEM copy of the table, lane-padded: the in-kernel fetch gathers each
    # behaviour row by material id along the lane dimension (<= 128 mats)
    matv = jnp.zeros((_M_ROWS, LANES), jnp.float32)
    if mat.shape[1] <= LANES:
        matv = matv.at[:, :mat.shape[1]].set(mat)
    sphp_f, sphp_i, trip_f, trip_i = pack_param_planes(scene)
    tex = pack_textures(scene)
    # Texel planes past the VMEM cap stay in HBM; the kernel pages the
    # tile's sampled row band through a VMEM scratch (see _fetch_image).
    img_hbm = int(scene.img_rows) > IMG_MAX_ROWS
    img_rows_padded = 0
    if img_hbm:
        if IMG_PAGE < 8 or IMG_PAGE % 8 != 0:
            # page starts are 8-row (sublane) aligned and the plane is
            # padded to a multiple of 8; an unaligned page size would
            # mis-tile the DMA instead of failing loudly
            raise ValueError(
                f"RAYTRACER_IMG_PAGE={IMG_PAGE} must be a positive "
                f"multiple of 8")
        img_rows_padded = max(IMG_PAGE, -(-int(scene.img_rows) // 8) * 8)
        if img_rows_padded > tex.shape[0]:
            tex = jnp.pad(tex, ((0, img_rows_padded - tex.shape[0]), (0, 0)))
    kd = jax.random.key_data(frame_key).astype(jnp.int32).reshape(-1)
    seed = jnp.concatenate(
        [kd[:2], jnp.asarray([tile_offset], jnp.int32).reshape(1)])

    ray_spec = pl.BlockSpec((mrows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    f32 = jnp.float32
    # Under shard_map, pallas_call outputs must declare how they vary over
    # mesh axes (check_vma); the outputs vary exactly like the ray planes.
    vma = getattr(jax.typeof(planes[0]), "vma", frozenset())
    outs = pl.pallas_call(
        functools.partial(
            _kernel,
            num_spheres=int(scene.sph_center.shape[0]),
            num_tris=int(scene.tri_v0.shape[0]),
            num_sph_clusters=int(scene.sph_clusters.shape[0]),
            num_tri_clusters=int(scene.tri_clusters.shape[0]),
            num_sph_supers=int(scene.sph_supers.shape[0]),
            num_tri_supers=int(scene.tri_supers.shape[0]),
            num_materials=int(scene.mat_type.shape[0]),
            spp=int(settings.rays_per_pixel),
            limit=int(settings.reflect_limit),
            antialias=bool(settings.antialias),
            sky=tuple(float(c) for c in settings.sky_colour),
            emissive_terminates=bool(settings.emissive_terminates),
            fix_exit_ior=bool(settings.fix_exit_ior),
            need_sphere_uv=bool(scene.needs_sphere_uv),
            has_one_way=bool(scene.has_one_way),
            needs_tri_uv=bool(scene.needs_tri_uv),
            sph_ordered=scene.sph_cell_order.shape[0] > 1,
            tri_ordered=scene.tri_cell_order.shape[0] > 1,
            sph_leaf=int(scene.sph_leaf),
            tri_leaf=int(scene.tri_leaf),
            mrows=mrows,
            nstream=NSTREAM,
            img_rows=int(scene.img_rows),
            rows_s=param_rows(int(scene.sph_center.shape[0])),
            rows_t=param_rows(int(scene.tri_v0.shape[0])),
            num_sph_lane=int(slcl.shape[0]) if sph_lane else 0,
            num_tri_lane=int(tlcl.shape[0]) if tri_lane else 0,
            sph_lane_leaf=int(scene.sph_lane_leaf) if sph_lane else 0,
            tri_lane_leaf=int(scene.tri_lane_leaf) if tri_lane else 0,
            interp_rng=_interpret(),
            coherent=(COHERENT if settings.coherent is None
                      else bool(settings.coherent)),
            img_rows_padded=img_rows_padded,
            has_refractive=bool(scene.has_refractive),
            rr_start=int(settings.russian_roulette),
            pixpack=K,
        ),
        grid=(rows // mrows,),
        in_specs=([smem] * 15
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
                  + [pl.BlockSpec(memory_space=(pl.ANY if img_hbm
                                                else pltpu.VMEM))]
                  + [ray_spec] * 6),
        out_specs=(ray_spec,) * 5,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, LANES), f32, vma=vma)
                        for _ in range(5)),
        scratch_shapes=([pltpu.VMEM((IMG_PAGE, LANES), jnp.int32),
                         pltpu.SemaphoreType.DMA] if img_hbm else []),
        # The lane traversal's while carry holds lane_words(n_cl) int32 mask
        # planes per pool; past ~2 chunks that blows Mosaic's default 16 MiB
        # scoped-vmem stack (measured: stress10k lane-forced needs 17.2 MiB).
        # Raise the cap only when lane pools ride along — the default path
        # keeps the compiler's own budget.
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
            if (sph_lane or tri_lane) else None),
        interpret=_interpret(),
    )(seed, sphf, sphi, trif, trii, sphc, tric, sphs, tris,
      sph_order, tri_order, cell_grid, mat, slcl, tlcl, matv,
      sphp_f, sphp_i, trip_f, trip_i, slpf, slpi, tlpf, tlpi,
      tex, *planes)

    mean = jnp.stack([x.reshape(-1)[:n] for x in outs[:3]])
    segs_plane = outs[3].reshape(-1)[:n]
    if want_depth:
        return mean, jnp.sum(segs_plane), outs[4].reshape(-1)[:n]
    if lane_segs:
        return mean, segs_plane
    return mean, jnp.sum(segs_plane)
