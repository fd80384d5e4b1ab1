"""Fly-through frame breakdown (TPU): where do the 4K temporal-mode ms go?

The BASELINE stretch config (suite `flythrough_3840x2160_1spp`) measures
5.76 fps / 76.8 Mrays/s on one v5e — 8x below the 630 Mrays/s headline —
so ~85% of the frame is NOT sweep throughput. This artifact separates the
candidate costs, each timed blocked over repeated runs:

  mega            render_sample_mean_mega alone, 1 spp, no depth capture
  mega_depth      + want_depth=True (the temporal path always captures it)
  mega_4spp       4 spp (does the spp-1 retirement tail amortise? compare
                  per-SEGMENT rates, not frame times)
  static_frame    Renderer temporal step, no camera move (render+accumulate)
  warp_frame      camera move + render (adds _pack_history + the
                  _gather_history fused warp)

Run on TPU (the megakernel has no CPU lowering):
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python benchmarks/flythrough_profile.py [W H]

Reference analog: the interactive window re-renders from scratch per move
(src/main.cu:401-432); the temporal path is the framework's addition, so
this breakdown has no reference counterpart to match — it serves the
10+ fps target in docs/ROADMAP.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu as rt
from raytracer_tpu.models.camera import build_camera, primary_rays
from raytracer_tpu.ops import rng as _rng
from raytracer_tpu.ops.megakernel import render_sample_mean_mega

REPS = 5


def _timed(label, fn, *, segs=None, extra=None):
    """Median wall time of ``fn()`` over REPS blocked calls (after one
    untimed warmup call that also pays any compile)."""
    out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[len(times) // 2] * 1e3
    rec = {"phase": label, "ms": round(ms, 2),
           "reps_ms": [round(t * 1e3, 2) for t in times]}
    if segs is not None:
        rec["segments"] = float(segs)
        rec["mrays_per_sec"] = round(float(segs) / ms * 1e-3, 1)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return out


def main() -> None:
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 2160
    scene, use_sky = rt.build_scene(4, seed=0)
    cfg = rt.CameraConfig(width=w, height=h, position=(0, 0.5, -6))
    settings1 = rt.RenderSettings(rays_per_pixel=1, reflect_limit=5
                                  ).with_sky(use_sky)

    # -- megakernel alone (the suite's exact scene/camera, Morton order
    # inherited from the Renderer below so tiles match production) --------
    r = rt.Renderer(scene, cfg, settings1, temporal=True)
    r.render_frame(block=True)          # compiles + learns pixel order
    order = jnp.asarray(r._pixel_order, jnp.int32)
    cam = build_camera(cfg)
    o, d = primary_rays(cam, w, h, pixel_order=order)
    oT, dT = o.T, d.T
    fkey = _rng.frame_key(jax.random.key(7), jnp.int32(0))

    mega = jax.jit(lambda s, key: render_sample_mean_mega(
        s, settings1, oT, dT, key)[1])
    segs = mega(scene, fkey)
    _timed("mega", lambda: mega(scene, fkey), segs=segs)

    megad = jax.jit(lambda s, key: render_sample_mean_mega(
        s, settings1, oT, dT, key, want_depth=True)[1])
    segs = megad(scene, fkey)
    _timed("mega_depth", lambda: megad(scene, fkey), segs=segs)

    # scanline (identity) pixel order: if the kernel tolerates full-width
    # strip tiles, the temporal path can drop the Morton permutation and
    # its two full-frame index gathers (pack + primary reorder)
    o_s, d_s = primary_rays(cam, w, h)
    oS, dS = o_s.T, d_s.T
    megas = jax.jit(lambda s, key: render_sample_mean_mega(
        s, settings1, oS, dS, key, want_depth=True)[1])
    segs = megas(scene, fkey)
    _timed("mega_scanline", lambda: megas(scene, fkey), segs=segs)

    settings4 = rt.RenderSettings(rays_per_pixel=4, reflect_limit=5
                                  ).with_sky(use_sky)
    mega4 = jax.jit(lambda s, key: render_sample_mean_mega(
        s, settings4, oT, dT, key, want_depth=True)[1])
    segs = mega4(scene, fkey)
    _timed("mega_4spp", lambda: mega4(scene, fkey), segs=segs)

    # -- production temporal frames (Renderer path) -----------------------
    def static_frame():
        r.render_frame(block=True)
        return r._last_segs
    segs = static_frame()
    _timed("static_frame", static_frame, segs=segs)

    def warp_frame():
        warp_frame.i += 1
        r.move_camera(rt.CameraConfig(
            width=w, height=h,
            position=(0.0, 0.5, -6.0 + 0.01 * warp_frame.i),
            y_rot=0.002 * warp_frame.i))
        r.render_frame(block=True)
        return r._last_segs
    warp_frame.i = 0
    segs = warp_frame()
    _timed("warp_frame", warp_frame, segs=segs,
           extra={"note": "move (pack history) + render + gather warp"})

    # -- fine-grained sub-phases of the two frame shapes -------------------
    from raytracer_tpu.runtime.renderer import (_gather_history,
                                                _pack_history)

    n = w * h
    accum = r.accum
    wpix = (r._wpix if r._wpix is not None
            else jnp.ones((n,), jnp.float32))
    mean3n = jnp.zeros((3, n), jnp.float32) + 0.25   # a staged mega output

    # the production accumulate: (3,N) kernel mean -> transpose -> (N,3)
    # accumulator blend (the layout conversion rides inside)
    acc_t = jax.jit(lambda m, a, wp: (m.T + a * wp[:, None])
                    / (wp[:, None] + 1.0))
    _timed("accum_transpose", lambda: acc_t(mean3n, accum, wpix))
    # the same blend with a (3,N) accumulator (no transpose): the layout
    # cost is the difference
    acc_n = jax.jit(lambda m, a, wp: (m + a * wp[None, :])
                    / (wp[None, :] + 1.0))
    accum3n = jnp.zeros((3, n), jnp.float32)
    _timed("accum_lane_major", lambda: acc_n(mean3n, accum3n, wpix))

    inv = jnp.asarray(np.argsort(np.asarray(order)), jnp.int32)
    _timed("pack_history", lambda: _pack_history(
        accum, wpix, inv, jnp.float32(8.0)))
    # the elementwise half alone (scanline mode skips the permutation)
    _timed("pack_history_no_reorder", lambda: _pack_history(
        accum, wpix, None, jnp.float32(8.0)))

    packed = _pack_history(accum, wpix, inv, jnp.float32(8.0))
    cam_b = build_camera(cfg)
    depth = r._depth if r._depth is not None else jnp.ones((n,), jnp.float32)
    gath = jax.jit(lambda o_, d_, dep, pk: _gather_history(
        w, h, order, o_, d_, dep, pk, cam_b.position, cam_b.tl_pixel,
        cam_b.delta_u, cam_b.delta_v))
    _timed("gather_history", lambda: gath(o, d, depth, packed))

    # the banded Pallas warp kernel on the same projection (a small-move
    # band: the production case)
    import raytracer_tpu.runtime.renderer as _rd
    orig = _rd._WARP_BANDED
    _rd._WARP_BANDED = True
    try:
        gath_b = jax.jit(lambda o_, d_, dep, pk: _gather_history(
            w, h, order, o_, d_, dep, pk, cam_b.position, cam_b.tl_pixel,
            cam_b.delta_u, cam_b.delta_v))
        _timed("gather_history_banded", lambda: gath_b(o, d, depth, packed))
    finally:
        _rd._WARP_BANDED = orig

    # calibration: a trivial full-frame op — the dispatch + HBM-alloc floor
    # every phase above also pays (phases are jit-per-piece; the production
    # steps fuse several pieces into one launch)
    calib = jax.jit(lambda a: a + 1.0)
    accum3n = jnp.zeros((3, n), jnp.float32)
    _timed("calib_add_3n", lambda: calib(accum3n))
    calib_n3 = jax.jit(lambda a: a + 1.0)
    _timed("calib_add_n3", lambda: calib_n3(accum))


if __name__ == "__main__":
    main()
