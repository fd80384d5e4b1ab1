"""Debug and observability helpers.

The reference's whole error story is ``check_cuda_error`` throw-and-die
(src/utils.cu:5-10) plus a per-frame ``cudaPeekAtLastError``
(src/dispatch.cu:161-162). The JAX-native equivalents:

- exceptions surface from jit naturally;
- ``check_finite`` validates render outputs (NaN/Inf) — the functional model
  makes data races impossible by construction, so numeric poison is the
  remaining failure class;
- ``enable_nan_debugging`` flips ``jax_debug_nans`` for interactive hunts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(x, name: str = "array") -> None:
    """Raise with context when a render buffer contains NaN/Inf
    (the ``check_cuda_error`` analog for numeric poison)."""
    arr = np.asarray(x)
    if not np.isfinite(arr).all():
        bad = int((~np.isfinite(arr)).sum())
        raise FloatingPointError(
            f"non-finite values in {name}: {bad}/{arr.size} elements")


def enable_nan_debugging(on: bool = True) -> None:
    """Trap NaNs at the op that produced them (recompiles everything)."""
    jax.config.update("jax_debug_nans", on)


def finite_fraction(x) -> float:
    """Fraction of finite elements — a cheap health metric for stats lines."""
    arr = jnp.asarray(x)
    return float(jnp.mean(jnp.isfinite(arr).astype(jnp.float32)))
