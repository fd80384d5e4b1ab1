"""Banded warp gather (ops/warp.py) vs the XLA gather, bitwise.

The kernel's contract: where(valid, values[idx], 0), integer-exact. The
index patterns cover the shapes the temporal warp produces: a coherent
band (small camera move), full-range random (teleport), an all-invalid
tile (off-view region), and boundary rows. The large-plane case crosses
DMA pages (plane > the in-VMEM threshold)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.ops.warp import LANES, PAGE, TROWS, banded_gather


def _oracle(values, idx, valid):
    v = np.asarray(values)[np.asarray(idx)]
    return np.where(np.asarray(valid), v, 0)


def _run(m, idx, valid, seed=0):
    rng = np.random.default_rng(seed)
    values = jnp.asarray(rng.integers(-2**31, 2**31 - 1, m, dtype=np.int64)
                         .astype(np.int32))
    got = banded_gather(values, jnp.asarray(idx, jnp.int32),
                        jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(got),
                                  _oracle(values, idx, valid))


def test_banded_gather_coherent_band():
    m = 64 * LANES                        # small plane: in-VMEM path
    n = 2 * TROWS * LANES                 # two output tiles
    rng = np.random.default_rng(1)
    base = np.repeat(np.arange(n) // 4, 1)  # slowly advancing band
    idx = np.clip(base + rng.integers(-64, 64, n), 0, m - 1)
    valid = rng.uniform(size=n) < 0.9
    _run(m, idx, valid)


def test_banded_gather_random_full_range():
    m = 64 * LANES
    n = TROWS * LANES + 300               # ragged n (padding path)
    rng = np.random.default_rng(2)
    idx = rng.integers(0, m, n)
    valid = rng.uniform(size=n) < 0.7
    _run(m, idx, valid)


def test_banded_gather_all_invalid_tile():
    m = 32 * LANES
    n = 2 * TROWS * LANES
    rng = np.random.default_rng(3)
    idx = rng.integers(0, m, n)
    valid = np.zeros(n, bool)
    valid[TROWS * LANES:] = rng.uniform(size=TROWS * LANES) < 0.5
    _run(m, idx, valid)


def test_banded_gather_boundary_rows():
    m = 16 * LANES + 37                   # ragged plane (padding path)
    n = TROWS * LANES
    idx = np.concatenate([np.zeros(n // 2, np.int64),
                          np.full(n - n // 2, m - 1, np.int64)])
    valid = np.ones(n, bool)
    _run(m, idx, valid)


@pytest.mark.slow
def test_banded_gather_cross_page():
    # plane past the in-VMEM threshold: exercises the HBM page-DMA loop,
    # with a band straddling a page boundary
    m = (2 * PAGE + 192) * LANES
    n = TROWS * LANES
    rng = np.random.default_rng(4)
    idx = (PAGE - 40) * LANES + rng.integers(0, 80 * LANES, n)
    valid = rng.uniform(size=n) < 0.95
    _run(m, idx, valid)


def test_gather_history_banded_matches_xla(monkeypatch):
    """The renderer's inverse warp with the banded kernel must agree with
    the XLA-gather path wherever it matters: identical history weights
    everywhere, identical radiance on w > 0 lanes, and an identical
    accumulator blend (invalid lanes' radiance is erased by w == 0 in
    both)."""
    import raytracer_tpu.runtime.renderer as rd
    from raytracer_tpu.models.camera import build_camera, primary_rays
    import raytracer_tpu as rt

    w_img, h_img = 96, 64
    n = w_img * h_img
    rng = np.random.default_rng(7)
    packed = jnp.asarray(
        rng.integers(0, 2**31 - 1, n, dtype=np.int64).astype(np.int32))
    order = jnp.arange(n, dtype=jnp.int32)
    cam_old = build_camera(rt.CameraConfig(width=w_img, height=h_img))
    cam_new = build_camera(rt.CameraConfig(width=w_img, height=h_img,
                                           position=(0.05, 0.02, -0.1),
                                           y_rot=0.03))
    o, d = primary_rays(cam_new, w_img, h_img, pixel_order=order)
    depth = jnp.asarray(rng.uniform(0.5, 6.0, n).astype(np.float32))
    # a band of misses exercises the invalid path
    depth = depth.at[: n // 5].set(1e30)

    def run():
        return rd._gather_history(w_img, h_img, order, o, d, depth, packed,
                                  cam_old.position, cam_old.tl_pixel,
                                  cam_old.delta_u, cam_old.delta_v)

    hist_x, w_x = run()
    monkeypatch.setattr(rd, "_WARP_BANDED", True)
    hist_b, w_b = run()
    np.testing.assert_array_equal(np.asarray(w_x), np.asarray(w_b))
    live = np.asarray(w_x) > 0
    np.testing.assert_array_equal(np.asarray(hist_x)[live],
                                  np.asarray(hist_b)[live])
    np.testing.assert_array_equal(
        np.asarray(hist_x) * np.asarray(w_x)[:, None],
        np.asarray(hist_b) * np.asarray(w_b)[:, None])
