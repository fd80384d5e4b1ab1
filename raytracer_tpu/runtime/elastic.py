"""Failure detection + elastic recovery for long progressive renders.

The reference's whole failure story is throw-and-die (``check_cuda_error``,
src/utils.cu:5-10, and the per-frame ``cudaPeekAtLastError``,
src/dispatch.cu:161-162). A TPU deployment has *transient* failure modes the
reference never faces — preemption, interconnect blips, a remote backend
restart — so ``render_resilient`` supervises the frame loop:

- **detection**: device exceptions are classified transient / fatal by
  their runtime status markers, and the accumulator is health-checked
  (NaN/Inf) BEFORE it may overwrite the checkpoint — numeric poison never
  destroys the last good state;
- **recovery**: on a transient failure the device state is rebuilt from a
  caller-supplied factory (the rebuild itself is retry-protected — the
  backend may still be down when the first backoff expires) and the last
  checkpoint is restored. Checkpoints are host numpy and topology-agnostic
  (Renderer.load_checkpoint), so the rebuilt renderer may sit on a
  different mesh (elastic: N chips -> M);
- **determinism**: RNG streams are counter-based, keyed by
  (frame, sample, pixel, bounce) — re-rendering the frames since the last
  checkpoint reproduces them bitwise, so a recovered run's accumulator is
  identical to one that never failed (tests/test_elastic.py asserts this).

The supervised loop is deliberately headless (no display window, no
per-frame hooks) — it is the unattended-production counterpart of
viewer.run_render_loop, not a replacement. When the whole process dies,
the same checkpoint file is the CLI ``--resume`` path — the two recovery
tiers share one format.
"""

from __future__ import annotations

import os
import time
from typing import Callable

# Substrings that mark an error as transient infrastructure failure
# (matched case-insensitively; JAX surfaces backend faults as
# XlaRuntimeError whose message leads with the gRPC/absl status code, and
# raw socket errors carry prose like "Connection reset by peer").
# INVALID_ARGUMENT / compile errors stay fatal: retrying deterministic
# program construction cannot succeed.
TRANSIENT_MARKERS = (
    "unavailable",
    "deadline_exceeded",
    "aborted",
    "cancelled",
    "resource_exhausted",   # HBM OOM can be another tenant; worth one retry
    "connection reset",
    "socket closed",
    "failed to connect",
    "device or resource busy",
)


def is_transient_device_error(exc: BaseException) -> bool:
    """True when ``exc`` looks like transient device/backend failure."""
    msg = str(exc).lower()
    return any(m in msg for m in TRANSIENT_MARKERS)


def _accum_healthy(renderer) -> bool:
    """Device-side NaN/Inf probe: one scalar reduce + one bool transfer
    (check_finite would gather the whole accumulator to host per call)."""
    import jax.numpy as jnp
    return bool(jnp.isfinite(renderer.accum).all())


def render_resilient(
    renderer_factory: Callable[[], "Renderer"],
    frames: int,
    checkpoint_path: str,
    checkpoint_every: int = 1,
    max_retries: int = 3,
    backoff_s: float = 1.0,
    is_transient: Callable[[BaseException], bool] = is_transient_device_error,
    quiet: bool = True,
):
    """Render up to ``frames`` TOTAL progressive frames (counting any frames
    already in the checkpoint), surviving transient failures. ``frames == 0``
    runs until KeyboardInterrupt, like viewer.run_render_loop; Ctrl-C at any
    point stops cleanly and returns the renderer with its last completed
    frame intact.

    ``renderer_factory`` builds a fresh Renderer (fresh device placement /
    mesh) — called once up front and once per recovery. If
    ``checkpoint_path`` exists the run resumes from it, so a crashed
    *process* can simply be re-run with the same arguments.

    Returns the final (healthy) Renderer. Raises the last error when it is
    non-transient or ``max_retries`` recoveries are exhausted.
    """
    state = {"retries_left": max_retries}

    def rebuild():
        # The backend may still be down when the backoff expires — a failed
        # rebuild consumes a retry and backs off again (doubling, so an
        # hours-long outage costs O(log) wakeups, not the whole budget in
        # the first minute) instead of killing the run.
        delay = backoff_s
        while True:
            try:
                r = renderer_factory()
                if os.path.exists(checkpoint_path):
                    r.load_checkpoint(checkpoint_path)
                return r
            except KeyboardInterrupt:
                raise
            except Exception as e:  # noqa: BLE001 — classified below
                if state["retries_left"] <= 0 or not is_transient(e):
                    raise
                state["retries_left"] -= 1
                if not quiet:
                    print(f"rebuild failed ({e!r}); "
                          f"{state['retries_left']} retries left")
                time.sleep(delay)
                delay = min(delay * 2.0, 300.0)

    renderer = rebuild()
    try:
        while frames == 0 or renderer.frame_num < frames:
            try:
                renderer.render_frame(block=True)
                at_target = frames > 0 and renderer.frame_num >= frames
                if checkpoint_every and (
                        renderer.frame_num % checkpoint_every == 0
                        or at_target):
                    # Health gate BEFORE the write: a poisoned accumulator
                    # must never overwrite the last good checkpoint. Poison
                    # is deterministic (counter-based RNG) — retrying cannot
                    # fix it — so it raises as fatal with the full
                    # diagnostic rather than burning retries. (Progressive
                    # means keep NaN forever, so checking at checkpoint
                    # cadence loses nothing.)
                    if not _accum_healthy(renderer):
                        renderer.check_health()  # raises with counts
                    renderer.save_checkpoint(checkpoint_path)
            except KeyboardInterrupt:
                raise
            except FloatingPointError:
                raise
            except Exception as e:  # noqa: BLE001 — classified just below
                if state["retries_left"] <= 0 or not is_transient(e):
                    raise
                state["retries_left"] -= 1
                if not quiet:
                    print(f"transient device failure ({e!r}); rebuilding "
                          f"device state, {state['retries_left']} retries "
                          "left")
                time.sleep(backoff_s)
                renderer = rebuild()
    except KeyboardInterrupt:
        if not quiet:
            print(f"\ninterrupted at frame {renderer.frame_num}")
    return renderer
