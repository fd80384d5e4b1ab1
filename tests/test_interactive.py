"""Interactive viewer: camera input math + headless SDL window loop."""

import math
import os

import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.runtime.interactive import camera_step, run_interactive


def test_camera_step_moves_in_camera_frame():
    cfg = rt.CameraConfig(width=64, height=48)
    # no rotation: forward is +z, right is +x, up is +y
    fwd = camera_step(cfg, {"w"}, move=0.5, turn=0.1)
    assert np.allclose(fwd.position, (0.0, 0.0, 0.5))
    right = camera_step(cfg, {"d"}, move=0.5, turn=0.1)
    assert np.allclose(right.position, (0.5, 0.0, 0.0))
    up = camera_step(cfg, {"r"}, move=0.5, turn=0.1)
    assert np.allclose(up.position, (0.0, 0.5, 0.0))
    # yaw 90 degrees: forward becomes +x (the viewport basis rotation)
    turned = camera_step(cfg, {"left"}, move=0.5, turn=math.pi / 2)
    assert turned.y_rot == pytest.approx(-math.pi / 2)
    fwd2 = camera_step(turned, {"w"}, move=1.0, turn=0.1)
    delta = np.asarray(fwd2.position) - np.asarray(turned.position)
    assert abs(abs(delta[0]) - 1.0) < 1e-5 and abs(delta[2]) < 1e-5
    # pitch clamps at +-pi/2
    c = cfg
    for _ in range(100):
        c = camera_step(c, {"down"}, move=0.0, turn=0.3)
    assert c.x_rot == pytest.approx(math.pi / 2)
    # no input -> the exact same config object (no warp/restart triggered)
    assert camera_step(cfg, set(), 0.5, 0.1) is cfg


def test_run_interactive_headless_flythrough(tmp_path):
    pytest.importorskip("pygame")
    os.environ["SDL_VIDEODRIVER"] = "dummy"
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2,
                                 reflect_limit=2).with_sky(use_sky)
    r = rt.Renderer(scene, rt.CameraConfig(width=64, height=48), settings)
    out = str(tmp_path / "fly.png")
    # 3 frames: accumulate, dolly forward, then yaw — the loop must apply
    # the moves through move_camera and keep rendering
    frames = run_interactive(
        r, event_source=[set(), {"w"}, {"left"}], out_path=out, quiet=True)
    assert frames == 3
    assert r.camera_cfg.position[2] > 0.0
    assert r.camera_cfg.y_rot < 0.0
    assert os.path.exists(out)
    # quit key ends the loop immediately (no frame rendered that step)
    r2 = rt.Renderer(scene, rt.CameraConfig(width=64, height=48), settings)
    assert run_interactive(r2, event_source=[{"q"}], quiet=True) == 0


def test_run_interactive_temporal_tpu():
    """TPU-only: the interactive loop over the temporal warp path — a
    keyboard fly-through where each move re-projects accumulated history
    (the hardware path behind the measured ~5.8 fps 4K fly-through)."""
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("temporal mode needs the megakernel (TPU)")
    os.environ["SDL_VIDEODRIVER"] = "dummy"
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2,
                                 reflect_limit=3).with_sky(use_sky)
    r = rt.Renderer(scene, rt.CameraConfig(width=128, height=64), settings,
                    temporal=True)
    assert r._temporal
    frames = run_interactive(
        r, event_source=[set(), set(), {"w"}, {"left"}, {"w"}], quiet=True)
    assert frames == 5
    assert r.camera_cfg.position[2] > 0.0
    w = np.asarray(r._wpix)
    # moves warped history instead of restarting: weights survive > 1
    assert (w > 1).mean() > 0.3, f"only {(w > 1).mean():.2f} pixels kept"


def test_run_interactive_temporal_scanline_banded_tpu(monkeypatch):
    """TPU-only: the temporal warp with the round-4 fast path — scanline
    (identity) pixel order plus the banded Pallas warp gather — must
    fly through with history surviving moves, exactly like the Morton +
    XLA-gather test above."""
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("temporal mode needs the megakernel (TPU)")
    import raytracer_tpu.runtime.renderer as rd
    os.environ["SDL_VIDEODRIVER"] = "dummy"
    monkeypatch.setenv("RAYTRACER_TEMPORAL_ORDER", "scanline")
    monkeypatch.setattr(rd, "_WARP_BANDED", True)
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2,
                                 reflect_limit=3).with_sky(use_sky)
    r = rt.Renderer(scene, rt.CameraConfig(width=128, height=64), settings,
                    temporal=True)
    assert r._temporal and r._identity_order
    frames = run_interactive(
        r, event_source=[set(), set(), {"w"}, {"left"}, {"w"}], quiet=True)
    assert frames == 5
    w = np.asarray(r._wpix)
    assert (w > 1).mean() > 0.3, f"only {(w > 1).mean():.2f} pixels kept"
    assert np.isfinite(np.asarray(r.accum)).all()
