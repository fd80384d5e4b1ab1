"""Interactive progressive viewer + render loop.

TPU-native replacement for the reference's SFML window loop
(src/main.cu:374-432): renders progressive frames, displays them (matplotlib
window when a display exists, PNG file otherwise), and prints the FPS /
Mrays line the reference writes with ``\\r`` (src/main.cu:423-428).
"""

from __future__ import annotations

import sys
from typing import Optional

from .renderer import Renderer


def run_render_loop(
    renderer: Renderer,
    frames: int = 0,
    out_path: Optional[str] = None,
    display: bool = False,
    checkpoint: Optional[str] = None,
    checkpoint_every: int = 0,
    quiet: bool = False,
    per_frame=None,
) -> None:
    """Render progressively; ``frames == 0`` runs until interrupted.

    ``per_frame(frame_index)`` runs before each frame — e.g. a camera move
    for a temporal fly-through (CLI ``--temporal --orbit``).
    """
    fig = im = None
    if display:
        try:
            import matplotlib
            import matplotlib.pyplot as plt
            if not hasattr(sys, "ps1"):
                matplotlib.use("TkAgg")
            plt.ion()
            fig, ax = plt.subplots()
            im = ax.imshow(renderer.image())
            ax.set_axis_off()
        except Exception:
            fig = im = None  # headless: fall back to PNG snapshots

    n = 0
    try:
        while frames == 0 or n < frames:
            if per_frame is not None:
                per_frame(n)
            renderer.render_frame(block=True)
            n += 1
            stats = renderer.stats_log[-1]
            if not quiet:
                print(
                    f"frame {stats['frame']}  "
                    f"spp {stats['spp_total']}  "
                    f"{stats['frame_ms']:.0f} ms  "
                    f"FPS {stats['fps']:.2f}  "
                    f"{stats['mrays_per_sec']:.1f} Mrays/s",
                    end="\r", flush=True)
            if im is not None:
                im.set_data(renderer.image())
                fig.canvas.draw_idle()
                fig.canvas.flush_events()
            elif display and out_path:
                renderer.save_png(out_path)  # live PNG "window"
            if checkpoint and checkpoint_every and n % checkpoint_every == 0:
                renderer.save_checkpoint(checkpoint)
    except KeyboardInterrupt:
        pass
    finally:
        if not quiet:
            print()
        if out_path:
            renderer.save_png(out_path)
        if checkpoint:
            renderer.save_checkpoint(checkpoint)
