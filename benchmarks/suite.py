"""Benchmark suite: every BASELINE.json config, one JSON line each.

Usage:  python benchmarks/suite.py [--quick]

Configs (BASELINE.md):
  1. RTiOW trio (ground + diffuse/metal/glass), 640x360, 100 spp, 5 bounces
  2. cube.obj textured + checkered floor, 720p, 200 spp
  3. low_poly_monkey.obj + emissive area light + dielectric, 1080p
  4. 10k random-sphere stress (BVH cluster sweep)
  5. progressive 4K camera fly-through (temporal accumulation restart per
     move), spp 1/frame
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import raytracer_tpu as rt
from raytracer_tpu.models import bench_scenes


_ONLY = None   # --only substring filter (set in main)


class _Lazy:
    """Build-once scene factory: --only runs skip the (expensive) BVH
    clustering / texture generation of every filtered-out config."""

    def __init__(self, fn):
        self.fn, self._v = fn, None

    def __call__(self):
        if self._v is None:
            self._v = self.fn()
        return self._v


def run_config(name, scene_fn, cam, spp, bounces, frames,
               coherent=None, sampler="auto"):
    if _ONLY and _ONLY not in name:
        return None
    scene, use_sky = scene_fn()
    settings = rt.RenderSettings(rays_per_pixel=spp, reflect_limit=bounces,
                                 coherent=coherent,
                                 sampler=sampler).with_sky(use_sky)
    r = rt.Renderer(scene, cam, settings)
    r.render_frame(block=True)  # compile + warm
    stats = r.render_frames(frames)  # async pipeline, single final sync
    rec = {
        "metric": name,
        "value": round(stats["mrays_per_sec"], 3),
        "unit": "Mrays/s",
        "frame_ms": round(stats["frame_ms"], 1),
        "spp": spp,
    }
    print(json.dumps(rec), flush=True)
    return rec


def run_flythrough(width, height, positions, spp=1):
    """Progressive fly-through with temporal reprojection: each camera move
    forward-warps the accumulated image into the new view (per-pixel
    weights, depth from the megakernel) instead of restarting from black —
    the BASELINE stretch config's temporal accumulation."""
    import jax
    # The stretch config pins resolution + temporal accumulation, not the
    # scene; fly through the reference's own flagship scene (RTiOW random
    # spheres, src/main.cu:215-250) like the interactive app would.
    scene, use_sky = rt.build_scene(4, seed=0)
    settings = rt.RenderSettings(rays_per_pixel=spp, reflect_limit=5
                                 ).with_sky(use_sky)
    cam = rt.CameraConfig(width=width, height=height, position=(0, 0.5, -6))
    temporal = jax.default_backend() == "tpu"
    r = rt.Renderer(scene, cam, settings, temporal=temporal)
    r.render_frame(block=True)  # compile + capture depth
    if temporal:
        # compile the warp outside the timed loop
        r.move_camera(rt.CameraConfig(width=width, height=height,
                                      position=(0, 0.5, -6)))
        r.render_frame(block=True)
    # async frame pipeline with one final sync — the same production-loop
    # pattern as render_frames / bench.py (the reference likewise never
    # synchronises except to display, src/dispatch.cu:141 being per-frame
    # only because of its managed-memory copy-out)
    t0 = time.perf_counter()
    segs_dev = []
    for i in range(positions):
        r.move_camera(rt.CameraConfig(
            width=width, height=height,
            position=(0.0, 0.5, -6.0 + 0.25 * i), y_rot=0.02 * i))
        r.render_frame(block=(i == positions - 1))
        segs_dev.append(r._last_segs)
    dt = time.perf_counter() - t0
    segs = sum(float(s) for s in segs_dev)
    rec = {
        "metric": f"flythrough_{width}x{height}_{spp}spp",
        "value": round(positions / dt, 2),
        "unit": "fps",
        "mrays_per_sec": round(segs / dt / 1e6, 1),
        "temporal_reprojection": temporal,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced spp/frames for smoke runs")
    ap.add_argument("--only", default=None,
                    help="run only configs whose name contains this "
                         "substring (fly-through included iff it matches "
                         "'flythrough')")
    args = ap.parse_args()
    q = args.quick
    global _ONLY
    _ONLY = args.only

    run_config("rtiow_trio_640x360_100spp",
               _Lazy(bench_scenes.rtiow_trio_scene),
               rt.CameraConfig(width=640, height=360),
               spp=10 if q else 100, bounces=5, frames=2)

    run_config("cube_1280x720_200spp", _Lazy(bench_scenes.cube_scene),
               rt.CameraConfig(width=1280, height=720),
               spp=10 if q else 200, bounces=5, frames=2)

    # Big-image-texture configs (VERDICT round-2 item 4): a 256x512 earth
    # (1024 packed rows) and a 512x1024 earth (4096 rows) stay on the
    # megakernel's VMEM-resident fetch — the row select clamps to the
    # tile's [min, max] texel-row range past IMG_STATIC_ROWS; a 1024x2048
    # earth (16384 rows) exceeds IMG_MAX_ROWS and rides the HBM-paged
    # texel plane (IMG_PAGE-row DMA bands through a VMEM scratch); the
    # wavefront XLA atlas gather is measured once as the explicit fallback.
    from raytracer_tpu.models.scenes import procedural_earth_texture

    def earth(size):
        return _Lazy(lambda: rt.build_scene(
            2, earth_image=procedural_earth_texture(size)))

    earth_2048 = earth(1024)
    # earth512 (1024 rows) sits below IMG_AUTO_MAX_ROWS: auto == in-kernel.
    run_config("earth512_in_kernel_1000x800_20spp", earth(256),
               rt.CameraConfig(width=1000, height=800),
               spp=5 if q else 20, bounces=5, frames=2)
    # The bigger planes exceed the auto cliff, so their in-kernel/paged
    # arms pin sampler='mega' (capability record); the _auto arms measure
    # what pure defaults now deliver (expected == the wavefront number).
    run_config("earth1024_in_kernel_1000x800_20spp", earth(512),
               rt.CameraConfig(width=1000, height=800),
               spp=2 if q else 20, bounces=5, frames=2, sampler="mega")
    run_config("earth1024_auto_1000x800_20spp", earth(512),
               rt.CameraConfig(width=1000, height=800),
               spp=2 if q else 20, bounces=5, frames=2)
    run_config("earth2048_hbm_paged_1000x800_20spp", earth_2048,
               rt.CameraConfig(width=1000, height=800),
               spp=2 if q else 20, bounces=5, frames=2, sampler="mega")
    run_config("earth2048_auto_1000x800_20spp", earth_2048,
               rt.CameraConfig(width=1000, height=800),
               spp=2 if q else 20, bounces=5, frames=2)
    run_config("earth2048_wavefront_1000x800_20spp", earth_2048,
               rt.CameraConfig(width=1000, height=800),
               spp=2 if q else 20, bounces=5, frames=2, sampler="regen")
    # The auto cliff itself (2172 rows, just past IMG_AUTO_MAX_ROWS=2048):
    # forced in-kernel vs the auto wavefront route — the session-10 A/B
    # that pins the crossover side.
    run_config("earth1448_in_kernel_1000x800_20spp", earth(362),
               rt.CameraConfig(width=1000, height=800),
               spp=2 if q else 20, bounces=5, frames=2, sampler="mega")
    run_config("earth1448_auto_1000x800_20spp", earth(362),
               rt.CameraConfig(width=1000, height=800),
               spp=2 if q else 20, bounces=5, frames=2)

    monkey = _Lazy(bench_scenes.monkey_light_scene)
    run_config("monkey_1920x1080_100spp", monkey,
               rt.CameraConfig(width=1920, height=1080),
               spp=5 if q else 100, bounces=5, frames=2)
    # Divergent-scene coherent-sampling mode (tile-shared scatter randoms,
    # unchanged per-pixel marginals — RenderSettings.coherent): the
    # secondary-bounce footprint collapse is the whole gap between the
    # easy configs and these, so both modes are reported.
    run_config("monkey_coherent_1920x1080_100spp", monkey,
               rt.CameraConfig(width=1920, height=1080),
               spp=5 if q else 100, bounces=5, frames=2, coherent=True)
    # lanesort on the mesh scene: monkey's throughput is dominated by
    # post-diffuse secondaries sweeping the whole mesh footprint — the
    # re-binned wavefront is the other divergent-scene candidate besides
    # coherent mode (20 spp: Mrays/s is ~spp-invariant, keeps the wall
    # time of the 1080p wavefront run bounded).
    run_config("monkey_lanesort_1920x1080_20spp", monkey,
               rt.CameraConfig(width=1920, height=1080),
               spp=5 if q else 20, bounces=5, frames=2, sampler="lanesort")

    stress = _Lazy(bench_scenes.stress_10k_scene)
    run_config("stress10k_1000x800_20spp", stress,
               rt.CameraConfig(width=1000, height=800, position=(0, 1, -4)),
               spp=5 if q else 20, bounces=5, frames=2)
    run_config("stress10k_coherent_1000x800_20spp", stress,
               rt.CameraConfig(width=1000, height=800, position=(0, 1, -4)),
               spp=5 if q else 20, bounces=5, frames=2, coherent=True)
    # Per-ray re-binning (MXU counting sort, ops/rebin.lane_destinations):
    # the wavefront sampler whose tiles stay (cell, octant)-coherent after
    # diffuse bounces — the divergent-scene alternative to the megakernel.
    run_config("stress10k_lanesort_1000x800_20spp", stress,
               rt.CameraConfig(width=1000, height=800, position=(0, 1, -4)),
               spp=5 if q else 20, bounces=5, frames=2, sampler="lanesort")
    run_config("stress10k_lanesort_coherent_1000x800_20spp", stress,
               rt.CameraConfig(width=1000, height=800, position=(0, 1, -4)),
               spp=5 if q else 20, bounces=5, frames=2, sampler="lanesort",
               coherent=True)

    # Beyond-SMEM scene: the HBM-streamed blocked kernel (per-block union
    # gates + in-block supers, ops/intersect_pallas.py _kernel_blocked)
    run_config("stress100k_1000x800_4spp",
               _Lazy(lambda: bench_scenes.stress_10k_scene(num=100000,
                                                           seed=1)),
               rt.CameraConfig(width=1000, height=800, position=(0, 1, -4)),
               spp=2 if q else 4, bounces=5, frames=2)

    w, h = (1024, 512) if q else (3840, 2160)
    if not _ONLY or _ONLY in f"flythrough_{w}x{h}_1spp":
        run_flythrough(w, h, positions=4 if q else 16)


if __name__ == "__main__":
    main()
