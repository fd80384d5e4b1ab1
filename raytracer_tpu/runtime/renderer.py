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
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig, RenderSettings
from ..models.camera import build_camera, morton_order, primary_rays
from ..models.scene import SceneArrays
from ..ops import film
from ..ops.integrator import render_frame


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
    ):
        self.scene = scene
        self.camera_cfg = camera
        self.settings = settings
        if backend is None:
            # Pallas sweep kernel on real TPUs; XLA matmul path elsewhere
            # (the Pallas interpreter is far too slow for real renders).
            backend = "pallas" if jax.default_backend() == "tpu" else "woop"
        self.backend = backend

        self._sharding = sharding
        # Morton pixel order: kernel ray tiles become compact screen blocks
        # (the wavefront analog of the reference's 8x8 thread grid,
        # src/dispatch.cu:136) — primary-ray coherence for cluster culling.
        self._pixel_order = morton_order(camera.width, camera.height)
        self._set_rays(camera)

        self.frame_num = 0
        self.accum = film.new_accumulator(camera.num_pixels)
        if sharding is not None:
            self.accum = jax.device_put(self.accum, sharding)
        self.base_key = jax.random.key(seed)
        self.total_segments = 0.0
        self.last_frame_ms = float("nan")
        self.stats_log: list = []

        if sharding is not None:
            # Multi-chip: the explicit shard_map step (pixel tiles sharded,
            # scene replicated, zero steady-state collectives). GSPMD cannot
            # auto-partition the Pallas kernels, so this is the supported
            # multi-device path.
            from ..parallel.shard import make_pixel_sharded_step
            self._step = make_pixel_sharded_step(
                sharding.mesh, settings, backend=backend)
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
        o, d = primary_rays(cam, camera.width, camera.height,
                            pixel_order=self._pixel_order)
        ray_idx = jnp.asarray(self._pixel_order, jnp.int32)
        if self._sharding is not None:
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
        if self._sharding is not None:
            self.accum = jax.device_put(self.accum, self._sharding)
        self.frame_num = 0

    # -- frame loop ----------------------------------------------------------
    def render_frame(self, block: bool = False) -> jax.Array:
        """Render one progressive frame; returns the (device) accumulator."""
        t0 = time.perf_counter()
        self.accum, segs = self._step(
            self.scene, self._ray_idx, self._o, self._d, self.accum,
            jnp.int32(self.frame_num), self.base_key
        )
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

    def render_frames(self, n: int) -> dict:
        """Render ``n`` progressive frames with async dispatch and a single
        final sync — frames pipeline on device (host bookkeeping overlaps
        execution), unlike the reference's per-frame ``cudaDeviceSynchronize``
        (src/dispatch.cu:141). Returns the aggregated stats record."""
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
        data = np.load(path)
        self.accum = jnp.asarray(data["accum"])
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
