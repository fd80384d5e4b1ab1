"""Benchmark: Mrays/s on the RTiOW random-sphere scene (BASELINE.json config).

Renders scene 4 (100 random spheres + checkered floor, src/main.cu:215-250)
at the reference's fixed 1000x800 resolution (src/camera.cu:4-5) with 5
bounces, and reports traced ray segments per second on the current device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
vs_baseline is against the 500 Mrays/s/chip north-star target.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_MRAYS = 500.0


def main() -> None:
    import raytracer_tpu as rt

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    scene, use_sky = rt.build_scene(4, seed=0)
    settings = rt.RenderSettings(
        rays_per_pixel=spp, reflect_limit=5, antialias=True
    ).with_sky(use_sky)
    # Reference workload: fixed 1000x800, default camera at the origin
    # (src/camera.cu:4-5,34), 5 bounces, scene 4.
    cam = rt.CameraConfig(width=1000, height=800)
    r = rt.Renderer(scene, cam, settings)

    # warmup / compile
    r.render_frame(block=True)

    t0 = time.perf_counter()
    segments = 0.0
    for _ in range(frames):
        r.render_frame(block=True)
        segments += r.stats_log[-1]["segments"]
    dt = time.perf_counter() - t0

    mrays = segments / dt / 1e6
    print(json.dumps({
        "metric": "rtiow_100sphere_1000x800_mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
