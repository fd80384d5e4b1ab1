"""Multi-host (DCN) setup helpers.

The reference is single-process with zero collectives (SURVEY.md §2.3). The
TPU-native multi-host story: ``jax.distributed`` for process bootstrap, the
scene replicated at init (a DCN broadcast handled by ``device_put`` of the
replicated pytree), pixel tiles sharded across the global mesh with no
steady-state communication, and a host-side gather only when a frame is
displayed or saved.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bootstrap multi-process JAX (no-op when single-process).

    Wraps ``jax.distributed.initialize``; with no arguments it relies on the
    environment (TPU pod metadata / JAX_COORDINATOR_ADDRESS).
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def gather_image(accum: jax.Array):
    """Fetch the (possibly sharded) accumulator to the host for display.

    With a pixel-sharded accumulator this is the only cross-host transfer in
    the render loop — the analog of the reference's per-frame managed-memory
    copy (src/dispatch.cu:144-146), but on demand instead of every frame.
    Under multi-process JAX the accumulator's shards live on devices this
    process cannot address, so the fetch is a cross-host allgather over DCN;
    every process returns the full image (tests/test_distributed.py).
    """
    import numpy as np
    if not accum.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(accum,
                                                            tiled=True))
    return np.asarray(jax.device_get(accum))
