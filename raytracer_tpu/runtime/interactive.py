"""Interactive SDL window: progressive render + keyboard fly-through.

TPU-native analog of the reference's SFML app loop (src/main.cu:374-432):
an OS window redrawn from the accumulated render every frame with the FPS
line printed with ``\\r`` (src/main.cu:423-428) — plus first-person camera
input the reference window doesn't have. Moves route through
``Renderer.move_camera``, so in temporal mode the accumulated image is
warped (gather-only inverse reprojection) instead of restarted and the
window stays dense during motion.

Controls:
    W/S       dolly forward / back          A/D   strafe left / right
    R/F       rise / fall                   arrows yaw (←→) and pitch (↑↓)
    Q / Esc   quit                          P     save a PNG snapshot

The loop is headless-testable: pass ``event_source`` (an iterable of
per-frame key-state dicts) and the SDL window is replaced by the dummy
video driver — the same code path CI exercises.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Iterable, Optional

import numpy as np

from ..config import CameraConfig
from ..utils import matrix as hm
from .renderer import Renderer

# key-name -> (dx, dy, dz) in the camera frame (right, up, forward)
_MOVES = {
    "w": (0.0, 0.0, 1.0),
    "s": (0.0, 0.0, -1.0),
    "a": (-1.0, 0.0, 0.0),
    "d": (1.0, 0.0, 0.0),
    "r": (0.0, 1.0, 0.0),
    "f": (0.0, -1.0, 0.0),
}
# key-name -> (dyaw, dpitch) steps
_TURNS = {
    "left": (-1.0, 0.0),
    "right": (1.0, 0.0),
    "up": (0.0, -1.0),
    "down": (0.0, 1.0),
}


def camera_step(cfg: CameraConfig, keys, move: float,
                turn: float) -> CameraConfig:
    """Apply one frame of held-key input to the camera pose.

    ``keys`` is a mapping/set of held key names (``w``/``a``/.../``left``).
    Translation happens in the *camera* frame: right = rotated +x, up =
    rotated +y, forward = rotated +z — the same rotation the viewport basis
    uses (models/camera.py build_camera, src/camera.cu:71-97), so W always
    dollies into the view.
    """
    dx = dy = dz = dyaw = dpitch = 0.0
    for k in keys:
        if k in _MOVES:
            mx, my, mz = _MOVES[k]
            dx += mx
            dy += my
            dz += mz
        if k in _TURNS:
            ty, tp = _TURNS[k]
            dyaw += ty
            dpitch += tp
    if not (dx or dy or dz or dyaw or dpitch):
        return cfg
    rot = hm.rotate_xyz(cfg.x_rot, cfg.y_rot, cfg.z_rot)
    delta = rot @ np.array([dx, dy, dz], dtype=np.float32) * move
    pos = tuple(float(p) + float(d) for p, d in zip(cfg.position, delta))
    return dataclasses.replace(
        cfg, position=pos,
        y_rot=cfg.y_rot + dyaw * turn,
        x_rot=float(np.clip(cfg.x_rot + dpitch * turn,
                            -math.pi / 2, math.pi / 2)))


def run_interactive(
    renderer: Renderer,
    max_frames: int = 0,
    move_speed: float = 0.25,
    turn_speed: float = math.radians(3.0),
    out_path: Optional[str] = None,
    quiet: bool = False,
    event_source: Optional[Iterable] = None,
) -> int:
    """Run the interactive window loop; returns frames rendered.

    ``max_frames == 0`` runs until quit. With ``event_source`` set, each
    item is one frame's held-key set (headless mode — no real window); the
    iterator ending quits the loop.
    """
    headless = event_source is not None
    if headless:
        os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    import pygame

    pygame.display.init()
    cfg = renderer.camera_cfg
    screen = pygame.display.set_mode((cfg.width, cfg.height))
    pygame.display.set_caption("raytracer_tpu")
    events = iter(event_source) if headless else None

    frames = 0
    last = time.perf_counter()
    try:
        while max_frames == 0 or frames < max_frames:
            # -- input --------------------------------------------------
            quit_now = False
            for ev in pygame.event.get():
                if ev.type == pygame.QUIT:
                    quit_now = True
            if headless:
                try:
                    keys = set(next(events))
                except StopIteration:
                    break
            else:
                pygame.key.set_repeat()  # held keys via get_pressed below
                pressed = pygame.key.get_pressed()
                keys = {name for name in (*_MOVES, *_TURNS, "q", "p")
                        if pressed[pygame.key.key_code(name)]}
                if pressed[pygame.K_ESCAPE]:
                    quit_now = True
            if "q" in keys or quit_now:
                break
            if "p" in keys and out_path:
                renderer.save_png(out_path)

            new_cfg = camera_step(renderer.camera_cfg, keys,
                                  move_speed, turn_speed)
            if new_cfg is not renderer.camera_cfg:
                renderer.move_camera(new_cfg)

            # -- render + blit (src/main.cu:417-428) --------------------
            renderer.render_frame(block=True)
            frames += 1
            img = renderer.image()  # (h, w, 3) u8
            surf = pygame.surfarray.make_surface(img.transpose(1, 0, 2))
            screen.blit(surf, (0, 0))
            pygame.display.flip()

            now = time.perf_counter()
            if not quiet:
                stats = renderer.stats_log[-1]
                print(f"FPS: {1.0 / max(now - last, 1e-9):.2f}  "
                      f"spp {stats['spp_total']}  "
                      f"{stats['mrays_per_sec']:.1f} Mrays/s",
                      end="\r", flush=True)
            last = now
    except KeyboardInterrupt:
        pass
    finally:
        if not quiet:
            print()
        if out_path:
            renderer.save_png(out_path)
        pygame.display.quit()
    return frames
