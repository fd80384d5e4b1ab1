"""Scattering / BSDF sampling as branchless masked math (SoA layout).

TPU-native replacement for ``Ray::reflect`` / ``Ray::refract`` and friends
(src/ray.cu:67-196). Every ray evaluates every scattering model on the VPU
and selects by material type — the wavefront answer to the reference's
per-thread ``switch`` (``update_ray``, src/raytracer.cu:49-64).

All vectors are (3, N): N rides the lane dimension (see ops.intersect for
why (N, 3) would be a 40x bandwidth mistake on TPU).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import ANTIALIAS_OFFSET_RANGE
from ..models.materials import MAT_REFRACTIVE


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """(3, N) . (3, N) -> (N,)."""
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _normalize(a: jax.Array) -> jax.Array:
    """(3, N) -> unit vectors; no epsilon guard (reference: src/utils.cu:123)."""
    inv = jax.lax.rsqrt(_dot(a, a))
    return a * inv[None, :]


def antialias_jitter(u3: jax.Array, d: jax.Array) -> jax.Array:
    """Jitter ray *directions* by ±0.001 per axis, renormalised.

    ``u3`` is (3, N) uniform [0,1). The reference applies this every bounce,
    not just on primary rays (src/ray.cu:130-142, called at
    src/raytracer.cu:72) — it acts as added roughness as much as
    antialiasing; we reproduce it exactly.
    """
    offset = (u3 - 0.5) * (2.0 * ANTIALIAS_OFFSET_RANGE)
    return _normalize(d + offset)


def _diffuse_dir(gauss: jax.Array, normal: jax.Array) -> jax.Array:
    """True Lambertian-style sample: hemisphere-flipped Gaussian + normal
    (src/ray.cu:157-178). ``gauss`` is (3, N) standard normal."""
    flip = jnp.where(_dot(gauss, normal) < 0.0, -1.0, 1.0)
    rand_unit = _normalize(gauss * flip[None, :])
    return _normalize(normal + rand_unit)


def _specular_dir(d: jax.Array, normal: jax.Array) -> jax.Array:
    """Mirror reflection r = d - 2(d·n)n (src/ray.cu:180-186)."""
    return _normalize(d - normal * (2.0 * _dot(d, normal))[None, :])


def _schlick(cos_theta: jax.Array, n1: jax.Array, n2: jax.Array) -> jax.Array:
    """Schlick reflectance approximation (src/ray.cu:188-196)."""
    sqrt_r0 = (n1 - n2) / (n1 + n2)
    r0 = sqrt_r0 * sqrt_r0
    m = 1.0 - cos_theta
    m2 = m * m
    return r0 + (1.0 - r0) * (m2 * m2 * m)


def scatter(
    gauss: jax.Array,        # (3, N) standard-normal draws (diffuse sample)
    fresnel_u: jax.Array,    # (N,) uniform draws (Schlick reflection test)
    d: jax.Array,            # (3, N) incoming unit directions
    normal: jax.Array,       # (3, N) hit normals (reference orientation)
    mat_type: jax.Array,     # (N,) i32
    smoothness: jax.Array,   # (N,) f32
    mat_ior: jax.Array,      # (N,) f32
    cur_ior: jax.Array,      # (N,) f32 medium the ray is travelling in
    fix_exit_ior: bool = False,
    has_refractive: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Sample outgoing directions for all rays; returns (new_dir, new_cur_ior).

    Standard & emissive materials reflect via lerp(diffuse, specular,
    smoothness) (src/ray.cu:67-75); refractives follow Snell + Schlick with
    probabilistic reflection (src/ray.cu:77-128). Randoms are passed in
    pre-drawn (per-ray counter-based streams — see ops.rng).

    ``has_refractive=False`` (static, from the scene) skips the whole
    refraction block — with no refractive material ids present, the
    ``is_refr`` selects below never pick it, so this is bitwise identical
    and strictly cheaper.
    """
    # -- reflection family (STANDARD / EMISSIVE; also Fresnel bounce) -------
    diffuse = _diffuse_dir(gauss, normal)
    specular = _specular_dir(d, normal)
    reflect_dir = _normalize(
        diffuse + (specular - diffuse) * smoothness[None, :])
    if not has_refractive:
        return reflect_dir, cur_ior

    # -- refraction (REFRACTIVE) --------------------------------------------
    # Sphere normals stay outward, so dot(n, d) > 0 means the ray is exiting
    # (src/ray.cu:84-96). The reference forgets the outer medium on exit:
    # n2 = current (already the glass IOR after entry), so exit rays never
    # bend (quirk documented in config.RenderSettings.fix_exit_ior).
    exiting = _dot(normal, d) > 0.0
    n1 = jnp.where(exiting, mat_ior, cur_ior)
    exit_ior = jnp.ones_like(cur_ior) if fix_exit_ior else cur_ior
    n2 = jnp.where(exiting, exit_ior, mat_ior)
    ref_sign = jnp.where(exiting, 1.0, -1.0)
    ref_n = normal * ref_sign[None, :]

    # The reference goes through acos/asin angles (src/ray.cu:101-106); the
    # math below is the identical trig rewritten transcendental-free
    # (angles are only ever used through sin/cos, and the comparisons are
    # monotone on [0, pi/2]):
    #   sin(theta1)       = sqrt(1 - cos1^2)
    #   theta1 > critical <=> sin1 > n2/n1   (asin(>1)=NaN compares False in
    #                        the reference, and sin1 <= 1 < n2/n1 here: same)
    #   cos(theta2)       = sqrt(1 - sin2^2)
    cos1 = jnp.minimum(_dot(d, ref_n), 1.0)
    sin1 = jnp.sqrt(jnp.maximum(1.0 - cos1 * cos1, 0.0))
    # min() corrects float error as in the reference (src/ray.cu:101-102).
    sin2 = jnp.minimum(n1 * sin1 / n2, 1.0)
    cos2 = jnp.sqrt(jnp.maximum(1.0 - sin2 * sin2, 0.0))
    tir = sin1 > (n2 / n1)
    refl_coeff = _schlick(cos1, n1, n2)
    do_reflect = tir | (refl_coeff > fresnel_u)

    # Normal-incidence special case theta1 == 0 (src/ray.cu:116-121).
    safe_sin1 = jnp.where(sin1 == 0.0, 1.0, sin1)
    perp = jnp.where(
        (sin1 != 0.0)[None, :],
        (d - ref_n * cos1[None, :]) / safe_sin1[None, :],
        0.0,
    )
    refr_dir = _normalize(ref_n * cos2[None, :] + perp * sin2[None, :])
    # Refractive smoothness is forced to 1 (src/material.cu:182), so the
    # Fresnel/TIR bounce is exactly the specular lerp the reference takes.
    refractive_dir = jnp.where(do_reflect[None, :], reflect_dir, refr_dir)

    is_refr = mat_type == MAT_REFRACTIVE
    new_dir = jnp.where(is_refr[None, :], refractive_dir, reflect_dir)

    # The reference updates the medium IOR before deciding reflect-vs-refract
    # (src/ray.cu:98), so even a Fresnel reflection switches medium; with
    # fix_exit_ior we only switch when light actually crosses the interface.
    ior_update = is_refr & (~do_reflect if fix_exit_ior else jnp.bool_(True))
    new_cur_ior = jnp.where(ior_update, n2, cur_ior)
    return new_dir, new_cur_ior
