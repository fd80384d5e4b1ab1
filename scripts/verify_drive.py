"""Verify drive: render the five reference scenes end-to-end, save PNGs.

The build-and-drive recipe from .claude/skills/verify, as a script so the
hardware queue can run it unattended (scene-0's megakernel at the auto
pixpack K=4 cold-compiles in the 10-20 min range through the axon tunnel,
far past an interactive wait). PNGs land in /tmp/scene{i}.png for
inspection. Reference scenes: src/main.cu:100-122.
"""

import os
import sys

# Run as `python scripts/verify_drive.py`: sys.path[0] is scripts/, so the
# package root must be added explicitly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import raytracer_tpu as rt


def main() -> None:
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    for i in range(5):
        scene, use_sky = rt.build_scene(i)
        settings = rt.RenderSettings(rays_per_pixel=spp,
                                     reflect_limit=5).with_sky(use_sky)
        cam = (rt.CameraConfig(width=250, height=200) if i != 4 else
               rt.CameraConfig(width=250, height=200,
                               position=(0.0, 0.5, -6.0)))
        r = rt.Renderer(scene, cam, settings)
        for _ in range(3):
            r.render_frame(block=True)
        r.save_png(f"/tmp/scene{i}.png")
        print(i, r.stats_log[-1], flush=True)


if __name__ == "__main__":
    main()
