"""Film, Renderer runtime, checkpoint/resume."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

import raytracer_tpu as rt
from raytracer_tpu.ops import film


def test_progressive_update():
    accum = jnp.full((4, 3), 2.0)
    mean = jnp.full((4, 3), 5.0)
    out = film.progressive_update(accum, mean, jnp.int32(2))
    np.testing.assert_allclose(np.asarray(out), 3.0)  # (5 + 2*2)/3


def test_to_u8_clamps_and_truncates():
    accum = jnp.array([[-0.5, 0.5, 2.0]])
    img = film.to_u8(accum, 1, 1)
    np.testing.assert_array_equal(img[0, 0], [0, 127, 255])


def test_to_u8_gamma():
    accum = jnp.array([[0.25, 0.25, 0.25]])
    img = film.to_u8(accum, 1, 1, gamma=2.0)
    np.testing.assert_array_equal(img[0, 0], [127, 127, 127])


def _small_renderer(**kw):
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3,
                                 **kw).with_sky(use_sky)
    cam = rt.CameraConfig(width=32, height=16)
    return rt.Renderer(scene, cam, settings)


def test_renderer_frames_and_image():
    r = _small_renderer()
    r.render_frame(block=True)
    r.render_frame(block=True)
    assert r.frame_num == 2
    img = r.image()
    assert img.shape == (16, 32, 3) and img.dtype == np.uint8
    assert img.max() > 0
    stats = r.stats_log[-1]
    assert stats["mrays_per_sec"] > 0
    assert stats["spp_total"] == 4


def test_checkpoint_resume():
    r = _small_renderer()
    r.render_frame(block=True)
    r.render_frame(block=True)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt.npz")
        r.save_checkpoint(path)

        r2 = _small_renderer()
        r2.load_checkpoint(path)
        assert r2.frame_num == 2
        np.testing.assert_array_equal(np.asarray(r2.accum), np.asarray(r.accum))

        # the next frame must be identical from both
        a1 = np.asarray(r.render_frame(block=True))
        a2 = np.asarray(r2.render_frame(block=True))
        np.testing.assert_array_equal(a1, a2)


def test_stats_jsonl(tmp_path):
    r = _small_renderer()
    r.render_frame(block=True)
    path = tmp_path / "stats.jsonl"
    r.write_stats(str(path))
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 1
    assert '"frame": 1' in lines[0]


def test_renderer_auto_pixpack_policy():
    """RenderSettings.pixpack=None resolves at the Renderer layer: K=8 in
    the measured low-spp regime (headline 20 spp 741-757 Mrays/s vs
    711-723 at K=4, 4K temporal 1 spp 12.5 fps on v5e — docs/TESTLOG.md
    sessions 7+9), K=1 above it; an explicit value is preserved.
    Ops-layer callers that never pass through a Renderer keep the
    original K=1 assignment."""
    assert _small_renderer().settings.pixpack == 8  # spp=2
    scene, use_sky = rt.build_scene(1)
    cam = rt.CameraConfig(width=32, height=16)
    hi = rt.Renderer(scene, cam, rt.RenderSettings(
        rays_per_pixel=100, reflect_limit=3).with_sky(use_sky))
    assert hi.settings.pixpack == 1
    forced = rt.Renderer(scene, cam, rt.RenderSettings(
        rays_per_pixel=2, reflect_limit=3, pixpack=2).with_sky(use_sky))
    assert forced.settings.pixpack == 2


def test_debug_helpers():
    from raytracer_tpu.utils.debug import check_finite, finite_fraction
    import pytest
    check_finite(np.zeros(4), "ok")
    with pytest.raises(FloatingPointError):
        check_finite(np.array([1.0, np.nan]), "bad")
    assert finite_fraction(np.array([1.0, np.inf])) == 0.5


def test_renderer_health_and_profile(tmp_path):
    r = _small_renderer()
    r.render_frame(block=True)
    r.check_health()
    r.profile_frame(str(tmp_path / "trace"))
    assert any((tmp_path / "trace").iterdir())


def test_viewer_loop_png_sink(tmp_path):
    from raytracer_tpu.runtime.viewer import run_render_loop
    r = _small_renderer()
    out = tmp_path / "view.png"
    ckpt = tmp_path / "view.ckpt.npz"
    run_render_loop(r, frames=2, out_path=str(out), checkpoint=str(ckpt),
                    checkpoint_every=1, quiet=True)
    assert out.exists() and ckpt.exists()
    assert r.frame_num == 2
