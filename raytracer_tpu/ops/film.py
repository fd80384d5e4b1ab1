"""Film: progressive accumulation buffer and display conversion.

TPU-native replacement for the reference's per-frame float buffer round-trip
and u8 conversion (src/dispatch.cu:111-152, src/main.cu:343-371). The
accumulator lives on device across frames (donated jit argument); only the
display path pulls it to the host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def new_accumulator(num_pixels: int) -> jax.Array:
    return jnp.zeros((num_pixels, 3), jnp.float32)


def progressive_update(accum: jax.Array, frame_mean: jax.Array,
                       frame_num: jax.Array) -> jax.Array:
    """(mean + accum*frame_num) / (frame_num + 1) (src/raytracer.cu:109-113)."""
    fn = frame_num.astype(jnp.float32)
    return (frame_mean + accum * fn) / (fn + 1.0)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB — the fidelity metric BASELINE.json
    specifies for comparing renders (within Monte-Carlo variance)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def to_u8(accum: jax.Array, width: int, height: int,
          gamma: Optional[float] = None) -> np.ndarray:
    """Float RGB -> (H, W, 3) u8 image.

    The reference clamps linear floats straight to bytes with truncation and
    no gamma (src/main.cu:343-371); ``gamma`` optionally fixes that (quirk #8).
    """
    img = np.asarray(accum).reshape(height, width, 3)
    if gamma is not None:
        img = np.power(np.clip(img, 0.0, None), 1.0 / gamma)
    return np.clip(img * 255.0, 0.0, 255.0).astype(np.uint8)
