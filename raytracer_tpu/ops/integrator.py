"""Wavefront path-tracing integrator.

TPU-native replacement for the reference megakernel
(``trace_ray``/``get_ray_colour``/``get_pixel_colour``,
src/raytracer.cu:67-136). One thread-per-pixel with divergent loops becomes:
the whole frame's rays as flat ``(N, 3)`` arrays, a ``lax.scan`` of fixed
depth over bounces carrying ``(origin, dir, throughput, radiance, alive,
cur_ior)`` live-ray state, and a ``lax.scan`` over samples-per-pixel. The
entire frame — spp x bounces x intersection x shading — is a single jitted
XLA program.

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
    sky = jnp.asarray(settings.sky_colour, jnp.float32)
    ray_keys = rng.per_ray_keys(key, ray_idx)
    # Static: does any sphere carry a UV-dependent texture? (The analog of
    # the reference's need_uv flag, src/material.cu:142 — skips per-ray
    # arcsin/arccos when no sphere is textured.)
    need_sphere_uv = scene.needs_sphere_uv

    def bounce(carry, bounce_i):
        o, d, thru, rad, alive, cur_ior = carry
        live_count = jnp.sum(alive.astype(jnp.float32))
        jitter_u3, gauss, fresnel_u = rng.bounce_randoms(ray_keys, bounce_i)

        if settings.antialias:
            d = antialias_jitter(jitter_u3, d)

        if backend == "pallas":
            from .intersect_pallas import hit_and_resolve_pallas
            rec, shade = hit_and_resolve_pallas(
                o, d, scene, need_sphere_uv=need_sphere_uv)
        else:
            rec = nearest_hit(o, d, scene, backend=backend)
            shade = resolve_hit(o, d, scene, rec)

        # Miss => sky contribution, path dies (src/raytracer.cu:76-80).
        miss = alive & ~rec.hit
        rad = rad + jnp.where(miss[None, :], thru * sky[:, None], 0.0)

        cols = lookup_material(scene, shade.mat_id)
        is_emissive = cols.mat_type == MAT_EMISSIVE
        live_hit = alive & rec.hit

        # Emission adds, otherwise throughput multiplies by the texture
        # colour (src/raytracer.cu:86-90).
        rad = rad + jnp.where((live_hit & is_emissive)[None, :],
                              thru * cols.emit, 0.0)
        tex = sample_texture(scene, cols, shade.u, shade.v)
        thru = jnp.where((live_hit & ~is_emissive)[None, :], thru * tex, thru)

        new_d, new_ior = scatter(
            gauss, fresnel_u, d, shade.normal,
            cols.mat_type,
            cols.smooth,
            cols.ior,
            cur_ior,
            fix_exit_ior=settings.fix_exit_ior,
        )
        o = jnp.where(live_hit[None, :], shade.point, o)
        d = jnp.where(live_hit[None, :], new_d, d)
        cur_ior = jnp.where(live_hit, new_ior, cur_ior)

        alive = live_hit
        if settings.emissive_terminates:
            alive = alive & ~is_emissive
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


def render_sample_mean(
    scene: SceneArrays,
    settings: RenderSettings,
    ray_idx: jax.Array,
    o: jax.Array,
    d: jax.Array,
    frame_key: jax.Array,
    backend: str = "woop",
):
    """Average ``rays_per_pixel`` independent traces of the same primary rays
    (src/raytracer.cu:97-107). Returns ((N, 3) mean, segment count)."""

    o3, d3 = o.T, d.T  # SoA once, outside the sample loop

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
                                    backend=backend)
    fn = frame_num.astype(jnp.float32)
    return (mean + accum * fn) / (fn + 1.0), segs
