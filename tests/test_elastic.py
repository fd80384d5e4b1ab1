"""Failure detection + elastic recovery (runtime/elastic.py).

The reference's failure handling is throw-and-die (src/utils.cu:5-10);
the TPU runtime adds supervised recovery. The key contract: a run that
loses its device mid-render and recovers from the last checkpoint is
BITWISE identical to one that never failed (counter-based RNG keyed by
(frame, sample, pixel, bounce) re-renders the lost frames exactly).
"""

import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.runtime.elastic import (is_transient_device_error,
                                           render_resilient)


def _factory(tmp_path=None):
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3
                                 ).with_sky(use_sky)
    cam = rt.CameraConfig(width=16, height=8)
    return lambda: rt.Renderer(scene, cam, settings)


def _failing_factory(base_factory, fail_at_frame, errors):
    """Renderers from the FIRST call raise ``errors.pop()`` when asked to
    render frame ``fail_at_frame``; recovery renderers are clean."""
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        r = base_factory()
        if calls["n"] == 1:
            real = r.render_frame

            def flaky(block=False):
                if r.frame_num == fail_at_frame and errors:
                    raise errors.pop()
                return real(block=block)

            r.render_frame = flaky
        return r

    return factory, calls


def test_recovery_is_bitwise_identical(tmp_path):
    base = _factory()

    # uninterrupted run
    ref = base()
    for _ in range(4):
        ref.render_frame(block=True)

    # run that dies rendering frame 2 (after checkpointing frame 2? no:
    # frame indices 0,1 checkpointed, failure while rendering the third)
    errors = [RuntimeError("UNAVAILABLE: injected tunnel loss")]
    factory, calls = _failing_factory(base, fail_at_frame=2, errors=errors)
    ckpt = str(tmp_path / "elastic.npz")
    r = render_resilient(factory, frames=4, checkpoint_path=ckpt,
                         checkpoint_every=1, max_retries=2, backoff_s=0.0)
    assert calls["n"] == 2          # one rebuild
    assert r.frame_num == 4
    np.testing.assert_array_equal(np.asarray(r.accum), np.asarray(ref.accum))


def test_recovery_from_unclean_checkpoint_cadence(tmp_path):
    # checkpoint_every=2: the failure at frame 3 rolls back to frame 2 and
    # re-renders frame 2's successor deterministically
    base = _factory()
    ref = base()
    for _ in range(5):
        ref.render_frame(block=True)

    errors = [RuntimeError("ABORTED: injected")]
    factory, calls = _failing_factory(base, fail_at_frame=3, errors=errors)
    ckpt = str(tmp_path / "elastic2.npz")
    r = render_resilient(factory, frames=5, checkpoint_path=ckpt,
                         checkpoint_every=2, max_retries=1, backoff_s=0.0)
    assert calls["n"] == 2
    np.testing.assert_array_equal(np.asarray(r.accum), np.asarray(ref.accum))


def test_nontransient_error_is_fatal(tmp_path):
    errors = [ValueError("INVALID_ARGUMENT: bad program")]
    factory, _ = _failing_factory(_factory(), fail_at_frame=1, errors=errors)
    with pytest.raises(ValueError):
        render_resilient(factory, frames=3,
                         checkpoint_path=str(tmp_path / "c.npz"),
                         max_retries=5, backoff_s=0.0)


def test_retries_exhausted(tmp_path):
    base = _factory()
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        r = base()

        def always_fail(block=False):
            raise RuntimeError("UNAVAILABLE: still down")

        r.render_frame = always_fail
        return r

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        render_resilient(factory, frames=2,
                         checkpoint_path=str(tmp_path / "c.npz"),
                         max_retries=2, backoff_s=0.0)
    assert calls["n"] == 3          # initial + 2 retries


def test_poisoned_accumulator_never_overwrites_checkpoint(tmp_path):
    # numeric poison is detected BEFORE checkpointing and raises as fatal
    base = _factory()
    ckpt = str(tmp_path / "c.npz")

    r0 = base()
    r0.render_frame(block=True)
    r0.save_checkpoint(ckpt)
    good = np.load(ckpt)["accum"].copy()

    def factory():
        r = base()
        real = r.render_frame

        def poison(block=False):
            out = real(block=block)
            r.accum = r.accum.at[0, 0].set(np.nan)
            return out

        r.render_frame = poison
        return r

    with pytest.raises(FloatingPointError):
        render_resilient(factory, frames=3, checkpoint_path=ckpt,
                         checkpoint_every=1, max_retries=3, backoff_s=0.0)
    np.testing.assert_array_equal(np.load(ckpt)["accum"], good)


def test_rebuild_failure_consumes_retries_not_the_run(tmp_path):
    # the backend may still be down when the first backoff expires: a
    # failing REBUILD must burn a retry and back off, not kill the run
    base = _factory()
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        if calls["n"] == 2:   # the first recovery attempt fails too
            raise RuntimeError("UNAVAILABLE: backend still down")
        r = base()
        if calls["n"] == 1:
            real = r.render_frame

            def flaky(block=False):
                if r.frame_num == 1:
                    raise RuntimeError("UNAVAILABLE: injected")
                return real(block=block)

            r.render_frame = flaky
        return r

    ref = base()
    for _ in range(3):
        ref.render_frame(block=True)

    ckpt = str(tmp_path / "c.npz")
    r = render_resilient(factory, frames=3, checkpoint_path=ckpt,
                         checkpoint_every=1, max_retries=3, backoff_s=0.0)
    assert calls["n"] == 3    # initial + failed rebuild + working rebuild
    np.testing.assert_array_equal(np.asarray(r.accum), np.asarray(ref.accum))


def test_keyboard_interrupt_stops_cleanly(tmp_path):
    # Ctrl-C mid-run returns the renderer with completed frames intact
    # (the CLI then writes the PNG) instead of propagating
    base = _factory()

    def factory():
        r = base()
        real = r.render_frame

        def interrupting(block=False):
            if r.frame_num == 2:
                raise KeyboardInterrupt
            return real(block=block)

        r.render_frame = interrupting
        return r

    r = render_resilient(factory, frames=0,   # "until interrupted" mode
                         checkpoint_path=str(tmp_path / "c.npz"),
                         checkpoint_every=1, max_retries=1, backoff_s=0.0)
    assert r.frame_num == 2


def test_cli_retries_wiring(tmp_path):
    # --retries + --checkpoint takes the supervised path end-to-end, and
    # --frames counts ADDITIONAL frames on a second (resumed) run, matching
    # the unsupervised loop's semantics
    from raytracer_tpu.__main__ import main
    out = tmp_path / "r.png"
    ckpt = tmp_path / "r.npz"
    argv = ["render", "--scene", "1", "--width", "16", "--height", "8",
            "--spp", "2", "--bounces", "3", "--frames", "2",
            "--retries", "2", "--checkpoint", str(ckpt), "--out", str(out)]
    rc = main(argv)
    assert rc == 0
    assert out.exists()
    assert int(np.load(ckpt)["frame_num"]) == 2
    rc = main(argv)           # resumes from the checkpoint: 2 MORE frames
    assert rc == 0
    assert int(np.load(ckpt)["frame_num"]) == 4


def test_transient_classifier():
    assert is_transient_device_error(RuntimeError("UNAVAILABLE: socket"))
    assert is_transient_device_error(Exception("DEADLINE_EXCEEDED while x"))
    # prose markers match case-insensitively (raw socket errors are
    # capitalized: "Connection reset by peer", gRPC "Socket closed")
    assert is_transient_device_error(
        ConnectionResetError("[Errno 104] Connection reset by peer"))
    assert is_transient_device_error(RuntimeError("Socket closed"))
    assert not is_transient_device_error(ValueError("INVALID_ARGUMENT"))
    assert not is_transient_device_error(TypeError("bad call"))
