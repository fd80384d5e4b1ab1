"""Wavefront path-tracing integrator.

TPU-native replacement for the reference megakernel
(``trace_ray``/``get_ray_colour``/``get_pixel_colour``,
src/raytracer.cu:67-136). One thread-per-pixel with divergent loops becomes:
the whole frame's rays as flat SoA ``(3, N)`` arrays and masked branchless
shading. Three samplers compute the same estimator:

- ``mega`` (auto-picked on TPU): the full spp x bounce loop inside one
  Pallas kernel with tile-local early exit (ops/megakernel.py) — fastest.
- ``regen``: wavefront path regeneration — one ``lax.while_loop`` in which a
  lane whose path ends (sky miss or bounce limit) immediately restarts on
  its pixel's next sample.
- ``scan``: a ``lax.scan`` of fixed depth over bounces, wrapped in a scan
  over samples-per-pixel — the direct wavefront transcription of the
  reference's nested loops (src/raytracer.cu:71,102).

Randomness is counter-based per *global* pixel index (``ray_idx``), so the
result is bitwise identical regardless of device sharding or ray chunking —
the property the multi-chip tests assert.

Semantics match the reference, including its documented quirks (SURVEY.md
§5.1): emissive hits add light but do not terminate the path
(src/raytracer.cu:86-90), antialiasing jitters the *direction* every bounce
(src/raytracer.cu:72), and the dead first intersection of ``get_ray_colour``
(src/raytracer.cu:98) is dropped.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..config import RenderSettings
from ..models.materials import MAT_EMISSIVE
from ..models.scene import SceneArrays
from . import rng
from .intersect import nearest_hit, resolve_hit
from .scatter import antialias_jitter, scatter
from .tables import lookup_material
from .textures import sample_texture

# Coherent (tile-shared) scatter sampling for the regen/rebin samplers —
# same flag and same estimator argument as the megakernel's COHERENT mode
# (ops/megakernel.py): per-pixel marginals unchanged, cross-pixel
# covariance within a 1024-lane tile traded for tight secondary-bounce
# gate footprints. Opt-in; default streams stay pixel-keyed
# (shard-invariant).
_COHERENT = os.environ.get("RAYTRACER_COHERENT", "0") == "1"
# lanesort cadence: re-bin every k-th while_loop iteration (1 = every
# iteration). Post-diffuse directions re-randomise each bounce, so sorted
# order decays in one bounce — but if the permutation's fixed cost
# dominates on hardware, k=2..3 trades footprint for build time.
_LANESORT_EVERY = int(os.environ.get("RAYTRACER_LANESORT_EVERY", "1"))


def _bounce_physics(scene, settings, backend, o, d, thru, rad, alive,
                    cur_ior, jitter_u3, gauss, fresnel_u,
                    rr_u=None, bounces_done=None):
    """One bounce for all lanes; the shared body of both samplers.

    Returns (o, d, thru, rad, cur_ior, path_continues). ``rad`` has sky and
    emission contributions added; ``path_continues`` is False where the path
    ended this bounce by missing (sky) or terminating on an emissive (when
    that quirk-fix is enabled).

    With ``rr_u`` (an independent (N,) uniform) russian roulette runs on
    paths that would otherwise continue: once a path has completed
    ``settings.russian_roulette`` bounces it survives with probability
    p = clamp(max(throughput), 0.05, 1) and its throughput is divided by p
    (unbiased — E[thru/p * survive] = thru). ``bounces_done`` is the
    0-based index of the bounce just traced (scalar or per-lane).
    """
    if settings.antialias:
        d = antialias_jitter(jitter_u3, d)

    if backend == "pallas":
        from .intersect_pallas import hit_and_resolve_pallas
        rec, shade = hit_and_resolve_pallas(
            o, d, scene, need_sphere_uv=scene.needs_sphere_uv)
    else:
        rec = nearest_hit(o, d, scene, backend=backend)
        shade = resolve_hit(o, d, scene, rec)

    # Miss => sky contribution, path dies (src/raytracer.cu:76-80).
    miss = alive & ~rec.hit
    rad = rad + jnp.where(miss[None, :], thru * jnp.asarray(
        settings.sky_colour, jnp.float32)[:, None], 0.0)

    cols = lookup_material(scene, shade.mat_id)
    is_emissive = cols.mat_type == MAT_EMISSIVE
    live_hit = alive & rec.hit

    # Emission adds, otherwise throughput multiplies by the texture colour
    # (src/raytracer.cu:86-90).
    rad = rad + jnp.where((live_hit & is_emissive)[None, :],
                          thru * cols.emit, 0.0)
    tex = sample_texture(scene, cols, shade.u, shade.v, shade.colour)
    thru = jnp.where((live_hit & ~is_emissive)[None, :], thru * tex, thru)

    new_d, new_ior = scatter(
        gauss, fresnel_u, d, shade.normal,
        cols.mat_type, shade.smooth, cols.ior, cur_ior,
        fix_exit_ior=settings.fix_exit_ior,
        has_refractive=bool(scene.has_refractive),
    )
    o = jnp.where(live_hit[None, :], shade.point, o)
    d = jnp.where(live_hit[None, :], new_d, d)
    cur_ior = jnp.where(live_hit, new_ior, cur_ior)

    path_continues = live_hit
    if settings.emissive_terminates:
        path_continues = path_continues & ~is_emissive
    if rr_u is not None:
        # survival probability from the post-absorption throughput; paths
        # keep their first `russian_roulette` bounces unconditionally
        p = jnp.clip(jnp.max(thru, axis=0), 0.05, 1.0)
        eligible = path_continues & (
            bounces_done + 1 >= settings.russian_roulette)
        survive = rr_u < p
        thru = jnp.where((eligible & survive)[None, :],
                         thru / p[None, :], thru)
        path_continues = path_continues & ~(eligible & ~survive)
    return o, d, thru, rad, cur_ior, path_continues


def trace(
    scene: SceneArrays,
    settings: RenderSettings,
    ray_idx: jax.Array,   # (N,) i32 global pixel indices (RNG stream ids)
    o: jax.Array,         # (N, 3) ray origins
    d: jax.Array,         # (N, 3) unit directions
    key: jax.Array,       # sample-level key
    backend: str = "woop",
):
    """Trace one sample for every ray; returns (radiance (N, 3), segments).

    Mirrors ``trace_ray`` (src/raytracer.cu:67-94) as a fixed-depth scan.
    ``segments`` counts live ray segments actually traced (the Mrays metric
    the dormant BVH debug counter hints at, src/objects.cu:534-584).
    """
    rad, segs = _trace_soa(scene, settings, ray_idx, o.T, d.T, key, backend)
    return rad.T, segs


def _trace_soa(
    scene: SceneArrays,
    settings: RenderSettings,
    ray_idx: jax.Array,
    o: jax.Array,         # (3, N) — SoA: components on the sublane axis,
    d: jax.Array,         # rays on the lane axis. An (N, 3) layout would pad
                          # its trailing 3 to 128 lanes (~40x bandwidth waste).
    key: jax.Array,
    backend: str = "woop",
):
    """SoA core of ``trace``; returns (radiance (3, N), segments)."""
    ray_keys = rng.per_ray_keys(key, ray_idx)

    use_rr = settings.russian_roulette > 0

    def bounce(carry, bounce_i):
        o, d, thru, rad, alive, cur_ior = carry
        live_count = jnp.sum(alive.astype(jnp.float32))
        drawn = rng.bounce_randoms(ray_keys, bounce_i, with_rr=use_rr)
        jitter_u3, gauss, fresnel_u = drawn[:3]
        rr_u = drawn[3] if use_rr else None
        o, d, thru, rad, cur_ior, alive = _bounce_physics(
            scene, settings, backend, o, d, thru, rad, alive, cur_ior,
            jitter_u3, gauss, fresnel_u,
            rr_u=rr_u, bounces_done=bounce_i if use_rr else None)
        return (o, d, thru, rad, alive, cur_ior), live_count

    # Derive the init carry from ``o`` so its sharding/varying type matches
    # under shard_map (a literal jnp.ones would be replicated-typed).
    init = (
        o,
        d,
        jnp.ones_like(o),                    # throughput
        jnp.zeros_like(o),                   # radiance
        jnp.ones_like(o[0], dtype=bool),     # alive
        jnp.ones_like(o[0]),                 # current IOR = air (src/ray.cu:58)
    )
    bounce_idx = jnp.arange(settings.reflect_limit, dtype=jnp.int32)
    (_, _, _, rad, _, _), seg_counts = jax.lax.scan(bounce, init, bounce_idx)
    return rad, jnp.sum(seg_counts)


def _render_regen_soa(
    scene: SceneArrays,
    settings: RenderSettings,
    ray_idx: jax.Array,
    o0: jax.Array,        # (3, N) primary origins
    d0: jax.Array,        # (3, N) primary directions
    frame_key: jax.Array,
    backend: str = "woop",
    rebin: bool = False,
    lane_sort: bool = False,
    tile_offset=0,
):
    """Path-regeneration sampler: all spp samples in one while_loop.

    Each lane owns one pixel. When its current path ends, the lane restarts
    on the pixel's next sample, so lanes stay ~100% live until the final
    tail — the wavefront alternative to stream compaction for taming
    divergence. Returns ((3, N) mean, segments).

    With ``rebin=True`` (the big-scene path), rays are regrouped between
    bounces at 128-lane-row granularity by (spatial cell, direction octant)
    — see ops/rebin.py — so the Pallas sweep's tile-granular BVH gates keep
    pruning after diffuse bounces instead of degrading to a full primitive
    scan. Lanes whose pixel has exhausted its samples are parked at a far
    sentinel origin so their tiles retire with every gate closed. RNG
    streams are keyed by pixel, so re-binning never changes the image: the
    per-pixel sums are un-permuted at the end.

    With ``lane_sort=True``, the regrouping is per RAY instead of per row
    (ops/rebin.lane_destinations — an MXU counting sort, since argsort is
    off the table on TPU): post-diffuse divergence is *within* rows, which
    row moves cannot touch, so this is the mode that actually re-coheres
    tiles on sphere-field scenes. All per-lane state (including the
    pixel-keyed RNG streams and the per-pixel sums) rides the permutation
    in two packed movements per bounce, so the image is still bitwise
    identical to plain regen.
    """
    spp = settings.rays_per_pixel
    limit = settings.reflect_limit
    base_keys = rng.per_ray_keys(frame_key, ray_idx)
    n = o0.shape[1]
    coherent = (_COHERENT if settings.coherent is None
                else bool(settings.coherent))
    use_rr = settings.russian_roulette > 0

    from .rebin import (LANES, apply_lane_permutation, bucket_permutation,
                        lane_buckets, lane_destinations, permute_rows,
                        row_buckets)
    lane_sort = bool(lane_sort) and n % LANES == 0 and n // LANES >= 8
    # Row re-binning needs whole 128-lane rows, and is only worth its cost
    # when there are enough rows to regroup.
    rebin = (bool(rebin) and not lane_sort
             and n % LANES == 0 and n // LANES >= 8)
    carries_keys = rebin or lane_sort
    num_rows = n // LANES if rebin else (n if lane_sort else 0)

    def cond(state):
        sample_i = state[5]
        it = state[-1]
        return (it < spp * limit) & jnp.any(sample_i < spp)

    def body(state):
        (o, d, thru, rad, bounce_i, sample_i, cur_ior, pixel_sum,
         o0p, d0p, kd, home, segs, it) = state
        active = sample_i < spp
        segs = segs + jnp.sum(active.astype(jnp.float32))

        if coherent:
            # tile-shared randoms keyed by loop iteration (see
            # rng.tile_randoms): divergence-absorbing opt-in for big
            # scenes — secondary directions cluster by surface normal so
            # the Pallas tile sweep's union gates stay tight. The shard's
            # global tile base is folded in so pixel-sharded shards draw
            # distinct streams (the megakernel does the same via its
            # seed words); without it every shard would repeat one
            # structured tile-noise pattern across the frame.
            drawn = rng.tile_randoms(
                jax.random.fold_in(
                    jax.random.fold_in(frame_key, tile_offset), it), n,
                with_rr=use_rr)
        else:
            keys = (jax.random.wrap_key_data(kd.T) if carries_keys
                    else base_keys)
            drawn = rng.lane_randoms(keys, sample_i, bounce_i,
                                     with_rr=use_rr)
        jitter_u3, gauss, fresnel_u = drawn[:3]
        rr_u = drawn[3] if use_rr else None
        o, d, thru, rad, cur_ior, continues = _bounce_physics(
            scene, settings, backend, o, d, thru, rad, active, cur_ior,
            jitter_u3, gauss, fresnel_u,
            rr_u=rr_u, bounces_done=bounce_i if use_rr else None)

        # Path ends on miss/termination or at the bounce limit
        # (src/raytracer.cu:71: fixed reflect_limit iterations).
        at_limit = bounce_i + 1 >= limit
        path_end = active & (~continues | at_limit)

        pixel_sum = pixel_sum + jnp.where(path_end[None, :], rad, 0.0)

        # Regenerate finished lanes onto their next sample.
        sample_i = jnp.where(path_end, sample_i + 1, sample_i)
        bounce_i = jnp.where(path_end, 0, jnp.where(active, bounce_i + 1,
                                                    bounce_i))
        restart = path_end[None, :]
        o = jnp.where(restart, o0p, o)
        d = jnp.where(restart, d0p, d)
        thru = jnp.where(restart, 1.0, thru)
        rad = jnp.where(restart, 0.0, rad)
        cur_ior = jnp.where(path_end, 1.0, cur_ior)

        if rebin or lane_sort:
            # Park exhausted lanes far away, pointing at nothing: their
            # tiles' BVH gates all fail, so retired rows cost ~zero sweeps.
            done = sample_i >= spp
            o = jnp.where(done[None, :], 1e13, o)
            d = jnp.where(done[None, :],
                          jnp.asarray([1.0, 0.0, 0.0],
                                      jnp.float32)[:, None], d)
        if lane_sort:
            def resort(args):
                o, d = args[0], args[1]
                dest = lane_destinations(lane_buckets(o, d, done))
                return tuple(apply_lane_permutation(dest, args))

            args = (o, d, thru, rad, pixel_sum, o0p, d0p, cur_ior, kd,
                    bounce_i, sample_i, home)
            if _LANESORT_EVERY > 1:
                args = jax.lax.cond(it % _LANESORT_EVERY == 0, resort,
                                    lambda a: a, args)
            else:
                args = resort(args)
            (o, d, thru, rad, pixel_sum, o0p, d0p, cur_ior, kd,
             bounce_i, sample_i, home) = args
        elif rebin:
            perm = bucket_permutation(row_buckets(o, d, done))
            (o, d, thru, rad, pixel_sum, o0p, d0p, kd) = (
                permute_rows(perm, a)
                for a in (o, d, thru, rad, pixel_sum, o0p, d0p, kd))
            bounce_i, sample_i = (permute_rows(perm, a)
                                  for a in (bounce_i, sample_i))
            cur_ior = permute_rows(perm, cur_ior)
            home = jnp.take(home, perm)
        return (o, d, thru, rad, bounce_i, sample_i, cur_ior, pixel_sum,
                o0p, d0p, kd, home, segs, it + 1)

    zero_i = jnp.zeros_like(ray_idx)
    # (2, N) uint32 key data rides the carry so the permutation can move
    # each lane's pixel-keyed RNG stream along with it.
    kd0 = (jax.random.key_data(base_keys).T.astype(jnp.uint32)
           if carries_keys else jnp.zeros((), jnp.uint32))
    home0 = (jnp.arange(num_rows, dtype=jnp.int32) if carries_keys
             else jnp.zeros((), jnp.int32))
    state = (
        o0, d0,
        jnp.ones_like(o0),        # throughput
        jnp.zeros_like(o0),       # current-path radiance
        zero_i,                   # bounce index
        zero_i,                   # sample index
        jnp.ones_like(o0[0]),     # current IOR
        jnp.zeros_like(o0),       # per-pixel radiance sum
        o0, d0,                   # (possibly permuted) primary rays
        kd0,                      # per-lane RNG key data (rebin only)
        home0,                    # row -> original row (rebin only)
        jnp.zeros_like(o0[0, 0]),  # segments
        jnp.zeros((), jnp.int32),  # iteration counter (safety bound)
    )
    state = jax.lax.while_loop(cond, body, state)
    pixel_sum, home, segs = state[7], state[11], state[12]
    if lane_sort:
        # Undo the accumulated lane permutation: home[current] = original.
        pixel_sum = jnp.zeros_like(pixel_sum).at[:, home].set(pixel_sum)
    elif rebin:
        # Undo the accumulated row permutation: home[current] = original.
        unperm = jnp.zeros_like(home).at[home].set(
            jnp.arange(num_rows, dtype=jnp.int32))
        pixel_sum = permute_rows(unperm, pixel_sum)
    return pixel_sum / jnp.float32(spp), segs


def render_sample_mean(
    scene: SceneArrays,
    settings: RenderSettings,
    ray_idx: jax.Array,
    o: jax.Array,
    d: jax.Array,
    frame_key: jax.Array,
    backend: str = "woop",
    tile_offset=0,
):
    """Average ``rays_per_pixel`` independent traces of the same primary rays
    (src/raytracer.cu:97-107). Returns ((N, 3) mean, segment count).

    ``tile_offset`` globalises megakernel RNG tile ids under shard_map.
    """
    o3, d3 = o.T, d.T  # SoA once, outside the sample loop

    sampler = settings.sampler
    if sampler == "auto":
        # auto picks the megakernel on real TPUs only: off-TPU it runs in
        # Pallas interpret mode (with a counter-hash RNG replacing the
        # on-core PRNG), which is correct but far slower than the regen
        # sampler's compiled XLA — interpret mega is for tests, opted into
        # explicitly with sampler='mega'. auto_prefers_mega also routes
        # scenes past the measured big-texture cliff (img_rows >
        # IMG_AUTO_MAX_ROWS) to the wavefront pipeline, where the XLA
        # atlas gather beats the in-kernel row select 2-8x.
        from .megakernel import auto_prefers_mega
        use_mega = (backend == "pallas" and auto_prefers_mega(scene)
                    and jax.default_backend() == "tpu")
        sampler = "mega" if use_mega else "regen"
    if sampler == "mega":
        from .megakernel import render_sample_mean_mega, supports
        # Explicit 'mega' must respect the same scene preconditions the
        # 'auto' gate checks (the kernel statically rejects scenes it
        # cannot shade). Off-TPU it runs under the Pallas interpreter.
        if not supports(scene):
            raise ValueError(
                "sampler='mega' cannot render this scene (unsupported "
                "texture configuration); use sampler='regen' or 'auto'.")
        mean, segs = render_sample_mean_mega(scene, settings, o3, d3,
                                             frame_key,
                                             tile_offset=tile_offset)
        return mean.T, segs

    if sampler in ("regen", "rebin", "lanesort"):
        mean, segs = _render_regen_soa(scene, settings, ray_idx, o3, d3,
                                       frame_key, backend=backend,
                                       rebin=(sampler == "rebin"),
                                       lane_sort=(sampler == "lanesort"),
                                       tile_offset=tile_offset)
        return mean.T, segs

    def sample(carry, s_idx):
        acc, segs = carry
        s_key = rng.sample_key(frame_key, s_idx)
        rad, n_segs = _trace_soa(scene, settings, ray_idx, o3, d3, s_key,
                                 backend=backend)
        return (acc + rad, segs + n_segs), None

    # zeros_like(o3[0, 0]) keeps the scalar's varying type aligned with the
    # sharded inputs under shard_map.
    (total, segs), _ = jax.lax.scan(
        sample, (jnp.zeros_like(o3), jnp.zeros_like(o3[0, 0])),
        jnp.arange(settings.rays_per_pixel, dtype=jnp.int32))
    return (total / jnp.float32(settings.rays_per_pixel)).T, segs


def render_frame(
    scene: SceneArrays,
    settings: RenderSettings,
    ray_idx: jax.Array,
    o: jax.Array,
    d: jax.Array,
    accum: jax.Array,      # (N, 3) progressive accumulator
    frame_num: jax.Array,  # scalar i32 (frames already accumulated)
    base_key: jax.Array,
    backend: str = "woop",
    tile_offset=0,
):
    """One progressive frame: new running mean of all frames so far.

    accum' = (frame_mean + accum * frame_num) / (frame_num + 1)
    (src/raytracer.cu:109-113). The accumulator is intended to be donated so
    it stays a single persistent device buffer — the reference re-allocates
    and round-trips it through the host every frame (src/dispatch.cu:129-152).

    Returns (new_accum, traced segment count).
    """
    fkey = rng.frame_key(base_key, frame_num)
    mean, segs = render_sample_mean(scene, settings, ray_idx, o, d, fkey,
                                    backend=backend, tile_offset=tile_offset)
    fn = frame_num.astype(jnp.float32)
    return (mean + accum * fn) / (fn + 1.0), segs
