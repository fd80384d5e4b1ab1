"""Frame-loop runtime: persistent device state, stats, checkpoint/resume.

TPU-native replacement for the reference's host dispatcher + app loop
(src/dispatch.cu:111-163, src/main.cu:401-432). Key differences by design:

- The progressive accumulator is a *donated* jit argument, so it lives in one
  persistent device buffer across frames — the reference cudaMallocs, copies
  out, and frees every buffer every frame (src/dispatch.cu:129-152,
  SURVEY.md quirk #12).
- Dispatch is async: we only ``block_until_ready`` when a frame is displayed
  or timed, where the reference calls ``cudaDeviceSynchronize`` per frame
  (src/dispatch.cu:141).
- ``(frame_num, accumulator)`` serialises to disk, giving checkpoint/resume
  of long renders (the reference's closest analog is its in-memory
  ``VariableRenderData``, src/dispatch.cu:111-115).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig, RenderSettings
from ..models.camera import build_camera, morton_order, primary_rays
from ..models.scene import SceneArrays
from ..ops import film
from ..ops.integrator import render_frame


# Temporal history rides ONE int32 per pixel: XLA random-index gathers on
# TPU cost ~5 ms per (N,) plane per 1M pixels (a forward scatter-add warp
# was ~750 ms per 4K move), so the inverse warp is engineered down to a
# single packed gather. Radiance is sqrt-encoded at 9 bits/channel over
# [0, _HIST_MAX) (history is decaying approximate data; fresh samples are
# never quantised) and the capped frame-count weight takes the low 5 bits.
_HIST_MAX = 8.0
# Temporal warp gather backend: the banded Pallas kernel (ops/warp.py) vs
# the plain XLA gather. Tri-state: None (env unset) lets the caller pick —
# the Renderer turns it on exactly when the temporal pixel order is
# scanline (hardware A/B, docs/TESTLOG.md session 7: banded wins 11.4 vs
# 9.2 fps under scanline, loses 139.9 vs 102.3 ms under Morton, whose
# pixel order destroys the source-row bands). "1"/"0" forces it.
_WB_ENV = os.environ.get("RAYTRACER_WARP_BANDED")
_WARP_BANDED = None if _WB_ENV is None else _WB_ENV == "1"


def _pack_history_body(accum, wpix, inv_order, history):
    """(slot-ordered accum, weights) -> pixel-ordered packed history.

    ``inv_order=None`` means the slot order IS pixel order (scanline
    temporal mode): the permutation gather — the expensive half of this
    function at 4K — is skipped entirely. Plain function so the warp step
    can inline it (a standalone pack launch costs ~29 ms at 4K even when
    it is pure elementwise — the full-frame dispatch + HBM floor)."""
    w = jnp.clip(jnp.minimum(wpix, history), 0.0, 31.0).astype(jnp.int32)
    q = jnp.round(jnp.sqrt(jnp.clip(accum / _HIST_MAX, 0.0, 1.0))
                  * 511.0).astype(jnp.int32)
    packed = (q[:, 0] << 23) | (q[:, 1] << 14) | (q[:, 2] << 5) | w
    return packed if inv_order is None else packed[inv_order]


_pack_history = jax.jit(_pack_history_body)


def _gather_history(width, height, order, o, d, depth, packed_pix,
                    pos, tl, du, dv, banded: bool = False):
    """Inverse-warp the previous accumulation into the current view.

    For each *current* pixel, projects its primary-hit world point (depth
    from the megakernel) through the *old* pinhole and gathers the packed
    old accumulation there — fused elementwise math plus ONE (N,) gather.
    Out-of-view or missed pixels get weight 0: the disocclusion fallback
    is a clean progressive restart.

    Returns (history radiance, history weight) per current pixel.
    """
    hit = depth < 1e29
    p_world = o + d * jnp.minimum(depth, 1e29)[:, None]
    v = p_world - pos
    n = jnp.cross(dv, du)
    n = n / jnp.linalg.norm(n)
    focal = jnp.dot(tl - pos, n)
    vn = v @ n
    s = focal / jnp.where(vn > 1e-9, vn, 1.0)
    r = pos + v * s[:, None] - tl
    x = (r @ du) / jnp.dot(du, du)
    y = (r @ dv) / jnp.dot(dv, dv)
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    valid = (hit & (vn > 1e-9) & (xi >= 0) & (xi < width)
             & (yi >= 0) & (yi < height))
    flat = jnp.clip(yi * width + xi, 0, width * height - 1)
    if banded if _WARP_BANDED is None else _WARP_BANDED:
        # tile-banded Pallas gather (ops/warp.py): per output tile, DMA
        # the [min, max] source-row band and row-select within it — the
        # XLA random gather below costs ~98 ms at 4K, the band a few ms
        # for interactive moves. Bitwise: valid lanes identical; invalid
        # lanes read 0 here vs garbage there, and both are erased by the
        # w=0 weight (history enters the blend only as hist * w).
        from ..ops.warp import banded_gather
        packed = banded_gather(packed_pix, flat, valid)
    else:
        packed = packed_pix[flat]
    # velocity-aware history: fast-moving pixels keep less history (their
    # reprojection error and ghost-trail length grow with screen motion)
    xd = (order % width).astype(jnp.float32)
    yd = (order // width).astype(jnp.float32)
    motion = jnp.sqrt((x - xd) ** 2 + (y - yd) ** 2)
    w = jnp.where(valid, (packed & 31).astype(jnp.float32), 0.0)
    w = jnp.minimum(w, 31.0 / (1.0 + 0.5 * motion))
    scale = jnp.float32(_HIST_MAX / (511.0 * 511.0))
    cr = ((packed >> 23) & 511).astype(jnp.float32)
    cg = ((packed >> 14) & 511).astype(jnp.float32)
    cb = ((packed >> 5) & 511).astype(jnp.float32)
    hist = jnp.stack([cr * cr, cg * cg, cb * cb], axis=-1) * scale
    return hist, w


class Renderer:
    """Progressive renderer with a persistent on-device accumulator."""

    def __init__(
        self,
        scene: SceneArrays,
        camera: CameraConfig = CameraConfig(),
        settings: RenderSettings = RenderSettings(),
        backend: str | None = None,
        seed: int = 0,
        sharding=None,
        shard_mode: str = "pixel",
        adaptive_order: bool = False,
        temporal: bool = False,
    ):
        self.scene = scene
        self.camera_cfg = camera
        if settings.pixpack is None:
            # Production auto policy (see RenderSettings.pixpack): pack 8
            # pixels per megakernel lane in the low-spp regime where the
            # per-tile retirement tail dominates (K=8 beat the session-7
            # K=4 default on both flagship configs: headline 741/757 vs
            # 711/723 Mrays/s, 4K fly 12.46/12.49 vs 12.27/12.41 fps —
            # docs/TESTLOG.md session 9). Materialised here so every step
            # this Renderer builds — standard, sharded, temporal —
            # resolves the same K from settings.
            import dataclasses as _dc
            settings = _dc.replace(
                settings, pixpack=8 if settings.rays_per_pixel <= 32 else 1)
        self.settings = settings
        if backend is None:
            # Pallas sweep kernel on real TPUs; XLA matmul path elsewhere
            # (the Pallas interpreter is far too slow for real renders).
            backend = "pallas" if jax.default_backend() == "tpu" else "woop"
        self.backend = backend

        self._sharding = sharding
        self._shard_mode = shard_mode
        temporal_active = bool(
            temporal and sharding is None and backend == "pallas"
            and jax.default_backend() == "tpu")
        # Morton pixel order: kernel ray tiles become compact screen blocks
        # (the wavefront analog of the reference's 8x8 thread grid,
        # src/dispatch.cu:136) — primary-ray coherence for cluster culling.
        # Temporal mode defaults to scanline (identity) order instead:
        # tiles become full-width screen strips, the slot<->pixel maps
        # collapse to the identity (deleting one full-frame permutation
        # gather from every camera move, ~40+ ms at 4K), and — decisively —
        # the megakernel at temporal spp is within noise of Morton while
        # the warp/pack machinery collapses (hardware A/B, docs/TESTLOG.md
        # session 7: 4K fly-through 5.8 fps Morton vs 9.1-9.3 scanline,
        # 11.3-11.5 with the banded warp). RAYTRACER_TEMPORAL_ORDER=morton
        # restores the old order.
        self._identity_order = (
            temporal_active and os.environ.get(
                "RAYTRACER_TEMPORAL_ORDER", "scanline") == "scanline")
        self._pixel_order = (
            np.arange(camera.num_pixels, dtype=np.int32)
            if self._identity_order
            else morton_order(camera.width, camera.height))
        self._set_rays(camera)

        # Adaptive pixel binning (off by default — measured net-negative):
        # after the first frame, re-sort the pixel order by measured
        # per-pixel path cost so megakernel tiles get homogeneous workloads.
        # Lane activity does improve, but the re-binned tiles lose
        # primary-ray spatial coherence and the BVH gates stop pruning for
        # primaries, which costs more than the ~26% idle-lane recovery is
        # worth on the reference workload (252 -> 239 Mrays/s pixel-granular,
        # 252 -> ~204 row-granular). Kept as an option for scenes with
        # extreme per-pixel cost variance and no culling benefit.
        self._adaptive_pending = (
            adaptive_order and sharding is None and backend == "pallas"
            and jax.default_backend() == "tpu"
            and settings.sampler in ("auto", "mega"))

        self.frame_num = 0
        self.accum = film.new_accumulator(camera.num_pixels)
        if sharding is not None and shard_mode in ("pixel", "hybrid"):
            self.accum = jax.device_put(self.accum, sharding)
        self.base_key = jax.random.key(seed)
        self.total_segments = 0.0
        self.last_frame_ms = float("nan")
        self.stats_log: list = []

        # Temporal accumulation mode (fly-throughs, BASELINE stretch
        # config): per-pixel accumulation weights instead of the scalar
        # frame counter, and the megakernel's free primary-hit depth output
        # — move_camera() then re-projects the accumulated image into the
        # new view instead of restarting from black. Megakernel-only (the
        # depth rides its carry), so it requires the TPU pallas path.
        self._temporal = temporal_active
        self._wpix = (jnp.zeros(camera.num_pixels, jnp.float32)
                      if self._temporal else None)
        self._depth = None
        self._inv_order = None  # cached pixel->slot map (reprojection)
        self._warp_src = None   # pending history to inverse-warp next frame
        self._rng_frame = 0  # monotonic RNG frame counter (never reset)

        if sharding is not None:
            # Multi-chip: the explicit shard_map step. GSPMD cannot
            # auto-partition the Pallas kernels, so this is the supported
            # multi-device path. Two strategies (SURVEY.md §2.3):
            # - "pixel": pixel tiles sharded, scene replicated, zero
            #   steady-state collectives (default);
            # - "spp": every chip traces all pixels with its own slice of
            #   the sample budget, one psum-mean over ICI per frame — for
            #   images too small to shard with a large sample budget.
            if shard_mode == "spp":
                from ..parallel.shard import make_spp_sharded_step
                self._step = make_spp_sharded_step(
                    sharding.mesh, settings, backend=backend)
            elif shard_mode == "pixel":
                from ..parallel.shard import make_pixel_sharded_step
                self._step = make_pixel_sharded_step(
                    sharding.mesh, settings, backend=backend)
            elif shard_mode == "hybrid":
                # 2D (px, spp) mesh: pixel tiles AND sample slices —
                # pass sharding=pixel_sharding(make_mesh_2d(px, spp))
                from ..parallel.mesh import SPP_AXIS
                from ..parallel.shard import make_hybrid_sharded_step
                if SPP_AXIS not in sharding.mesh.axis_names:
                    raise ValueError(
                        "shard_mode='hybrid' needs a 2D (px, spp) mesh — "
                        "build it with parallel.mesh.make_mesh_2d")
                self._step = make_hybrid_sharded_step(
                    sharding.mesh, settings, backend=backend)
            else:
                raise ValueError(
                    f"unknown shard_mode {shard_mode!r}; use 'pixel', "
                    "'spp' or 'hybrid'")
        else:
            # Rays are runtime args so moving the camera (set_camera) reuses
            # the compiled step instead of recompiling — needed for
            # fly-throughs.
            @functools.partial(jax.jit, donate_argnums=(4,),
                               static_argnums=())
            def _step(scene_arrays, ray_idx, o, d, accum, frame_num,
                      base_key):
                return render_frame(
                    scene_arrays, settings, ray_idx, o, d, accum, frame_num,
                    base_key, backend=backend,
                )

            self._step = _step

    def _set_rays(self, camera: CameraConfig) -> None:
        cam = build_camera(camera)
        # jit the (H*W)-sized ray build: camera moves re-run it every frame
        # of a fly-through, and eager dispatch costs ~10 ops x 8M pixels
        if getattr(self, "_ray_fn", None) is None:
            self._ray_fn = jax.jit(functools.partial(
                primary_rays, width=camera.width, height=camera.height))
            self._order_dev = jnp.asarray(self._pixel_order, jnp.int32)
        o, d = self._ray_fn(cam, pixel_order=self._order_dev)
        ray_idx = self._order_dev
        if self._sharding is not None and self._shard_mode in ("pixel", "hybrid"):
            # Pixel rows sharded across the mesh; the scene pytree stays
            # replicated (it is broadcast on first use).
            o = jax.device_put(o, self._sharding)
            d = jax.device_put(d, self._sharding)
            ray_idx = jax.device_put(ray_idx, self._sharding)
        self._o, self._d, self._ray_idx = o, d, ray_idx

    def set_camera(self, camera: CameraConfig) -> None:
        """Move the camera: restart progressive accumulation, reuse the
        compiled step (resolution must stay fixed)."""
        assert (camera.width, camera.height) == (self.camera_cfg.width,
                                                 self.camera_cfg.height), \
            "set_camera keeps the film size; build a new Renderer to resize"
        self.camera_cfg = camera
        self._set_rays(camera)
        self.accum = film.new_accumulator(camera.num_pixels)
        if self._sharding is not None and self._shard_mode in ("pixel", "hybrid"):
            self.accum = jax.device_put(self.accum, self._sharding)
        if self._wpix is not None:
            self._wpix = jnp.zeros_like(self._wpix)
        self._depth = None
        self.frame_num = 0

    def _maybe_learn_order(self) -> None:
        """One-shot adaptive pixel binning (see __init__)."""
        if not self._adaptive_pending or self.frame_num < 1:
            return
        self._adaptive_pending = False
        from ..ops import rng
        from ..ops.megakernel import render_sample_mean_mega, supports
        if not supports(self.scene):
            return
        import dataclasses
        probe = dataclasses.replace(self.settings, rays_per_pixel=4)
        fkey = rng.frame_key(self.base_key, jnp.int32(-1))
        _, lane_segs = jax.jit(
            lambda o, d, k: render_sample_mean_mega(
                self.scene, probe, o, d, k, lane_segs=True)
        )(self._o.T, self._d.T, fkey)
        costs = np.asarray(lane_segs)
        n = costs.shape[0]
        if n % 128 == 0:
            # Row-granular: move whole 128-pixel Morton runs so their
            # primary-ray spatial coherence survives the re-binning
            # (pixel-granular sorting was measured net-negative — it opens
            # the BVH gates for primary rays).
            row_cost = costs.reshape(-1, 128).sum(axis=1)
            row_order = np.argsort(row_cost, kind="stable")
            order = (row_order[:, None] * 128
                     + np.arange(128)[None, :]).reshape(-1)
        else:
            order = np.argsort(costs, kind="stable")
        self._pixel_order = self._pixel_order[order]
        self._inv_order = None  # pixel->slot map changed; rebuild lazily
        if getattr(self, "_ray_fn", None) is not None:
            self._order_dev = jnp.asarray(self._pixel_order, jnp.int32)
        self._o = jnp.take(self._o, order, axis=0)
        self._d = jnp.take(self._d, order, axis=0)
        self._ray_idx = jnp.take(self._ray_idx, order)
        self.accum = jnp.take(self.accum, order, axis=0)

    # -- temporal accumulation (fly-through) ---------------------------------
    def _temporal_render(self):
        """One frame in temporal mode: per-pixel-weight accumulation plus
        the megakernel's primary-hit depth capture."""
        import dataclasses

        from ..ops import rng as _rng
        from ..ops.megakernel import render_sample_mean_mega

        if getattr(self, "_tstep", None) is None:
            settings = self.settings
            width, height = self.camera_cfg.width, self.camera_cfg.height

            # Primary rays are generated INSIDE the step jit from the tiny
            # camera basis: a camera move then costs nothing outside the
            # frame launch (a separate 8M-ray build + dispatch was ~40 ms
            # per 4K move).
            @functools.partial(jax.jit, donate_argnums=(4, 5))
            def _tstep(scene, cam, order, accum, wpix, fkey):
                o, d = primary_rays(cam, width, height, pixel_order=order)
                mean, segs, depth = render_sample_mean_mega(
                    scene, settings, o.T, d.T, fkey, want_depth=True)
                w = wpix[:, None]
                accum2 = (mean.T + accum * w) / (w + 1.0)
                return accum2, wpix + 1.0, segs, depth

            @functools.partial(jax.jit, donate_argnums=(3, 4))
            def _tstep_warp(scene, cam, order, old_accum, old_wpix,
                            inv_order, hist_cap, pos, tl, du, dv, fkey):
                # first frame after a camera move: render the new view,
                # pack the old accumulation, and gather it into the new
                # view (inverse warp — see _gather_history) all in ONE
                # launch. The pack used to be its own launch at
                # move_camera time; even pure-elementwise (scanline) it
                # cost ~29 ms at 4K — the full-frame dispatch floor.
                o, d = primary_rays(cam, width, height, pixel_order=order)
                mean, segs, depth = render_sample_mean_mega(
                    scene, settings, o.T, d.T, fkey, want_depth=True)
                packed_pix = _pack_history_body(
                    old_accum, old_wpix, inv_order, hist_cap)
                hist, w = _gather_history(
                    width, height, order, o, d, depth, packed_pix,
                    pos, tl, du, dv, banded=self._identity_order)
                wcol = w[:, None]
                accum2 = (mean.T + hist * wcol) / (wcol + 1.0)
                return accum2, w + 1.0, segs, depth

            self._tstep = _tstep
            self._tstep_warp = _tstep_warp
        fkey = _rng.frame_key(self.base_key, jnp.int32(self._rng_frame))
        self._rng_frame += 1
        cam = build_camera(self.camera_cfg)
        if getattr(self, "_order_dev", None) is None:
            self._order_dev = jnp.asarray(self._pixel_order, jnp.int32)
        if self._warp_src is not None:
            (old_accum, old_wpix, inv_order, hist_cap,
             pos, tl, du, dv) = self._warp_src
            self._warp_src = None
            self.accum, self._wpix, segs, self._depth = self._tstep_warp(
                self.scene, cam, self._order_dev, old_accum, old_wpix,
                inv_order, hist_cap, pos, tl, du, dv, fkey)
        else:
            self.accum, self._wpix, segs, self._depth = self._tstep(
                self.scene, cam, self._order_dev, self.accum, self._wpix,
                fkey)
        return segs

    def move_camera(self, camera: CameraConfig, reproject: bool = True,
                    history: float = 8.0) -> None:
        """Camera move with temporal reprojection (temporal mode only).

        The warp is deferred and inverse: the old accumulation (and the old
        camera basis) are stashed, and the *next* rendered frame gathers
        history into the new view per pixel using its own primary-hit depth
        (_gather_history — gather-only; the scatter-based forward warp cost
        ~750 ms per 4K move on v5e). History weight is capped at
        ``history`` frames so stale radiance decays; disoccluded or
        out-of-view pixels restart clean. Repeated moves before the next
        frame keep warping from the last *rendered* view. Falls back to a
        plain restart (set_camera) when there is nothing to reproject.
        """
        rendered = (self._wpix is not None
                    and (self.frame_num > 0 or self._warp_src is not None))
        if not (self._temporal and reproject and rendered
                and (camera.width, camera.height) == (self.camera_cfg.width,
                                                      self.camera_cfg.height)):
            if self._wpix is not None:
                self._wpix = jnp.zeros_like(self._wpix)
            self._depth = None
            self._warp_src = None
            self.set_camera(camera)
            return
        if self._warp_src is None:
            old_cam = build_camera(self.camera_cfg)
            if self._inv_order is None and not self._identity_order:
                inv = np.zeros_like(self._pixel_order)
                inv[self._pixel_order] = np.arange(len(self._pixel_order))
                self._inv_order = jnp.asarray(inv, jnp.int32)
            # Deferred pack: the raw accumulation (and weights) ride the
            # stash and are packed INSIDE the next warp frame's launch
            # (_tstep_warp donates them), deleting a standalone full-frame
            # pack dispatch (~29 ms at 4K) from every camera move.
            self._warp_src = (self.accum, self._wpix,
                              None if self._identity_order else self._inv_order,
                              jnp.float32(history), old_cam.position,
                              old_cam.tl_pixel, old_cam.delta_u,
                              old_cam.delta_v)
            self._wpix = jnp.zeros(self.camera_cfg.num_pixels, jnp.float32)
            self.accum = film.new_accumulator(self.camera_cfg.num_pixels)
        self._depth = None
        self.camera_cfg = camera
        # no _set_rays: the temporal step builds rays in-jit from the basis
        self.frame_num = 0

    # -- frame loop ----------------------------------------------------------
    def render_frame(self, block: bool = False) -> jax.Array:
        """Render one progressive frame; returns the (device) accumulator."""
        self._maybe_learn_order()
        t0 = time.perf_counter()
        if self._temporal:
            segs = self._temporal_render()
        else:
            self.accum, segs = self._step(
                self.scene, self._ray_idx, self._o, self._d, self.accum,
                jnp.int32(self.frame_num), self.base_key
            )
        self._last_segs = segs  # device scalar; float() it after a sync
        if block:
            self.accum.block_until_ready()
        dt = time.perf_counter() - t0
        self.frame_num += 1
        if block:
            segs_f = float(segs)
            self.total_segments += segs_f
            self.last_frame_ms = dt * 1000.0
            self.stats_log.append(self.frame_stats(segs_f, dt))
        return self.accum

    def render_frames(self, n: int, fuse: bool = False) -> dict:
        """Render ``n`` progressive frames with a single final sync.

        With ``fuse=True`` and no sharding, the n frames run as
        ONE launch carrying n x rays_per_pixel samples: the progressive
        running mean over equal-spp frames is just the mean of all their
        samples, so the result is mathematically the same accumulator while
        the megakernel's per-tile retirement tail is paid once instead of n
        times (a tile runs until its slowest lane finishes its budget; the
        idle fraction shrinks ~1/sqrt(n)). Sample streams differ from n
        sequential ``render_frame`` calls (one frame key covers the batch)
        but stay fully deterministic. Measured on v5e the tail saving is a
        wash against the async pipeline (247 vs 251 Mrays/s on the
        reference workload), so the default stays the sequential pipeline
        (the reference's per-frame dispatch analog, src/dispatch.cu:141,
        minus its per-frame synchronise).
        """
        self._maybe_learn_order()
        if fuse and n > 1 and self._sharding is None and not self._temporal:
            rec = self._render_frames_fused(n)
        else:
            t0 = time.perf_counter()
            seg_handles = []
            for _ in range(n):
                self.accum, segs = self._step(
                    self.scene, self._ray_idx, self._o, self._d, self.accum,
                    jnp.int32(self.frame_num), self.base_key
                )
                self.frame_num += 1
                seg_handles.append(segs)
            jax.block_until_ready(self.accum)
            dt = time.perf_counter() - t0
            segments = float(sum(float(s) for s in seg_handles))
            self.total_segments += segments
            self.last_frame_ms = dt / n * 1000.0
            rec = self.frame_stats(segments, dt)
            rec["frames"] = n
        self.stats_log.append(rec)
        return rec

    def _render_frames_fused(self, n: int) -> dict:
        import dataclasses

        from ..ops import rng as _rng
        from ..ops.integrator import render_sample_mean

        if getattr(self, "_fused_n", None) != n:
            batch = dataclasses.replace(
                self.settings,
                rays_per_pixel=self.settings.rays_per_pixel * n)

            @functools.partial(jax.jit, donate_argnums=(4,))
            def _batch_step(scene, ray_idx, o, d, accum, frame_num, key):
                fkey = _rng.frame_key(key, frame_num)
                mean, segs = render_sample_mean(
                    scene, batch, ray_idx, o, d, fkey,
                    backend=self.backend)
                fn = frame_num.astype(jnp.float32)
                return (mean * n + accum * fn) / (fn + n), segs

            # AOT-compile outside the timed region (a fused-step compile is
            # expensive and must not pollute frame timings or benchmarks)
            self._batch_step = _batch_step.lower(
                self.scene, self._ray_idx, self._o, self._d,
                jax.ShapeDtypeStruct(self.accum.shape, self.accum.dtype),
                jnp.int32(0), self.base_key).compile()
            self._fused_n = n

        t0 = time.perf_counter()
        self.accum, segs = self._batch_step(
            self.scene, self._ray_idx, self._o, self._d, self.accum,
            jnp.int32(self.frame_num), self.base_key)
        jax.block_until_ready(self.accum)
        dt = time.perf_counter() - t0
        self.frame_num += n
        segments = float(segs)
        self.total_segments += segments
        self.last_frame_ms = dt / n * 1000.0
        rec = self.frame_stats(segments, dt)
        rec["frames"] = n
        return rec

    def frame_stats(self, segments: float, seconds: float) -> dict:
        """Structured per-frame stats (replaces the FPS printf,
        src/main.cu:423-428)."""
        return {
            "frame": self.frame_num,
            "spp_total": self.frame_num * self.settings.rays_per_pixel,
            "frame_ms": seconds * 1000.0,
            "fps": 1.0 / seconds if seconds > 0 else float("inf"),
            "mrays_per_sec": segments / seconds / 1e6 if seconds > 0 else 0.0,
            "segments": segments,
        }

    # -- output --------------------------------------------------------------
    def image(self) -> np.ndarray:
        """Current render as (H, W, 3) u8."""
        flat = np.empty((self.camera_cfg.num_pixels, 3), np.float32)
        flat[self._pixel_order] = np.asarray(self.accum)  # undo Morton order
        return film.to_u8(flat, self.camera_cfg.width,
                          self.camera_cfg.height, gamma=self.settings.gamma)

    def save_png(self, path: str) -> None:
        from PIL import Image
        Image.fromarray(self.image()).save(path)

    # -- checkpoint / resume --------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        np.savez(
            path,
            accum=np.asarray(self.accum),
            frame_num=self.frame_num,
            key_data=jax.random.key_data(self.base_key),
            total_segments=self.total_segments,
        )

    def load_checkpoint(self, path: str) -> None:
        """Restore a checkpoint into THIS renderer's placement.

        Checkpoints are host numpy (device-count agnostic), so this is
        also the elastic-resume path: a run checkpointed on N chips
        restores onto any other mesh — the accumulator is re-placed into
        the current renderer's sharding, and RNG streams are pixel-keyed
        (shard-invariant), so the continued render is bitwise identical
        to never having stopped, whatever the new topology.
        """
        data = np.load(path)
        accum = jnp.asarray(data["accum"])
        # pixel mode shards the accumulator; spp mode keeps it replicated
        # (make_spp_sharded_step declares it P()) — same guard as every
        # other placement site (__init__, set_camera, _set_rays)
        if self._sharding is not None and self._shard_mode in ("pixel", "hybrid"):
            accum = jax.device_put(accum, self._sharding)
        self.accum = accum
        self.frame_num = int(data["frame_num"])
        self.base_key = jax.random.wrap_key_data(jnp.asarray(data["key_data"]))
        self.total_segments = float(data["total_segments"])

    def write_stats(self, path: str) -> None:
        """JSONL stats sink."""
        with open(path, "a") as f:
            for rec in self.stats_log:
                f.write(json.dumps(rec) + "\n")
        self.stats_log.clear()

    # -- profiling -------------------------------------------------------------
    def profile_frame(self, trace_dir: str) -> None:
        """Capture a device profile of one frame (the jax.profiler analog of
        the reference's dormant BVH::debug_stats hook); view with
        TensorBoard or xprof."""
        with jax.profiler.trace(trace_dir):
            self.render_frame(block=True)

    def check_health(self) -> None:
        """Validate the accumulator (NaN/Inf guard, see utils.debug)."""
        from ..utils.debug import check_finite
        check_finite(self.accum, "progressive accumulator")
