"""Sampler shoot-out on the incoherence-bound BASELINE configs.

Usage: python benchmarks/samplers.py [spp]

Compares the megakernel (tile-local regeneration, no re-binning), plain
wavefront regen, and the re-binning wavefront sampler (ops/rebin.py) on the
scenes where post-bounce ray divergence defeats tile-granular BVH culling —
the 10k-sphere stress scene and the monkey mesh. Informs the 'auto'
sampler policy in ops/integrator.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import raytracer_tpu as rt
from raytracer_tpu.models import bench_scenes


def run(name, scene, sky, cam, spp, sampler, frames=2):
    settings = rt.RenderSettings(rays_per_pixel=spp, reflect_limit=5,
                                 sampler=sampler).with_sky(sky)
    r = rt.Renderer(scene, cam, settings)
    r.render_frame(block=True)  # compile + warm
    rec = r.render_frames(frames)
    print(json.dumps({
        "cfg": name, "sampler": sampler,
        "mrays": round(rec["mrays_per_sec"], 1),
        "frame_ms": round(rec["frame_ms"], 1),
    }), flush=True)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    scene, sky = bench_scenes.stress_10k_scene()
    cam = rt.CameraConfig(width=1000, height=800, position=(0, 1, -4))
    for s in ("rebin", "regen", "mega"):
        run("stress10k_1000x800", scene, sky, cam, spp, s)

    scene, sky = bench_scenes.monkey_light_scene()
    cam = rt.CameraConfig(width=1920, height=1080)
    for s in ("rebin", "mega"):
        run("monkey_1920x1080", scene, sky, cam, spp, s)


if __name__ == "__main__":
    main()
