"""Failure detection + elastic recovery for long progressive renders.

The reference's whole failure story is throw-and-die (``check_cuda_error``,
src/utils.cu:5-10, and the per-frame ``cudaPeekAtLastError``,
src/dispatch.cu:161-162). A TPU deployment has *transient* failure modes the
reference never faces — preemption, interconnect blips, a remote backend
restart — so ``render_resilient`` supervises the frame loop:

- **detection**: device exceptions are classified transient / fatal by
  their runtime status markers, and every frame's accumulator is health-
  checked (NaN/Inf, utils.debug.check_finite) BEFORE it may overwrite the
  checkpoint — numeric poison never destroys the last good state;
- **recovery**: on a transient failure the device state is rebuilt from a
  caller-supplied factory and the last checkpoint is restored. Checkpoints
  are host numpy and topology-agnostic (Renderer.load_checkpoint), so the
  rebuilt renderer may sit on a different mesh (elastic: N chips -> M);
- **determinism**: RNG streams are counter-based, keyed by
  (frame, sample, pixel, bounce) — re-rendering the frames since the last
  checkpoint reproduces them bitwise, so a recovered run's accumulator is
  identical to one that never failed (tests/test_elastic.py asserts this).

In-process retry covers backend errors that a fresh executable/buffer set
survives; when the whole process dies, the same checkpoint file is the CLI
``--resume`` path — the two recovery tiers share one format.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

# Substrings that mark an error as transient infrastructure failure (JAX
# surfaces backend faults as XlaRuntimeError whose message leads with the
# gRPC/absl status code). INVALID_ARGUMENT / compile errors stay fatal:
# retrying deterministic program construction cannot succeed.
TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "CANCELLED",
    "RESOURCE_EXHAUSTED",   # HBM OOM can be another tenant; worth one retry
    "connection reset",
    "socket closed",
    "failed to connect",
    "device or resource busy",
)


def is_transient_device_error(exc: BaseException) -> bool:
    """True when ``exc`` looks like transient device/backend failure."""
    msg = str(exc)
    return any(m in msg for m in TRANSIENT_MARKERS)


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
    """Render ``frames`` progressive frames, surviving transient failures.

    ``renderer_factory`` builds a fresh Renderer (fresh device placement /
    mesh) — called once up front and once per recovery. If
    ``checkpoint_path`` exists the run resumes from it, so a crashed
    *process* can simply be re-run with the same arguments.

    Returns the final (healthy) Renderer. Raises the last error when it is
    non-transient or ``max_retries`` recoveries are exhausted.
    """
    renderer = renderer_factory()
    if os.path.exists(checkpoint_path):
        renderer.load_checkpoint(checkpoint_path)

    retries_left = max_retries
    while renderer.frame_num < frames:
        try:
            renderer.render_frame(block=True)
            # Health gate: validate BEFORE checkpointing so numeric poison
            # can never overwrite the last good state. A NaN accumulator is
            # deterministic (counter-based RNG) — retrying cannot fix it —
            # so it raises as fatal rather than burning retries.
            renderer.check_health()
            at_target = renderer.frame_num >= frames
            if checkpoint_every and (
                    renderer.frame_num % checkpoint_every == 0 or at_target):
                renderer.save_checkpoint(checkpoint_path)
        except KeyboardInterrupt:
            raise
        except FloatingPointError:
            raise
        except Exception as e:  # noqa: BLE001 — classified just below
            if retries_left <= 0 or not is_transient(e):
                raise
            retries_left -= 1
            if not quiet:
                print(f"transient device failure ({e!r}); "
                      f"rebuilding device state, {retries_left} retries left")
            time.sleep(backoff_s)
            renderer = renderer_factory()
            if os.path.exists(checkpoint_path):
                renderer.load_checkpoint(checkpoint_path)
    return renderer
