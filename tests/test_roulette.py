"""Russian roulette (RenderSettings.russian_roulette) — flag-gated
deviation from the reference, which always traces to reflect_limit
(src/raytracer.cu:71). Contract: unbiased estimator, fewer traced
segments, and bitwise-unchanged RNG streams when off."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.models.camera import build_camera, primary_rays
from raytracer_tpu.ops import rng
from raytracer_tpu.ops.integrator import render_sample_mean


def _render(settings, spp, width=48, height=32, scene_id=1):
    scene, use_sky = rt.build_scene(scene_id)
    settings = dataclasses.replace(settings, rays_per_pixel=spp
                                   ).with_sky(use_sky)
    cam_cfg = rt.CameraConfig(width=width, height=height)
    cam = build_camera(cam_cfg)
    o, d = primary_rays(cam, width, height)
    ray_idx = jnp.arange(width * height, dtype=jnp.int32)
    mean, segs = jax.jit(
        lambda s, ri, o, d, k: render_sample_mean(s, settings, ri, o, d, k),
    )(scene, ray_idx, o, d, jax.random.key(7))
    return np.asarray(mean), float(segs)


def test_rr_streams_unchanged_when_off():
    # the first seven draws must be bitwise identical with and without the
    # 8th RR split — the property that keeps rr=0 renders golden-stable
    keys = rng.per_ray_keys(jax.random.key(0), jnp.arange(64))
    plain = rng.bounce_randoms(keys, 2)
    with_rr = rng.bounce_randoms(keys, 2, with_rr=True)
    for a, b in zip(plain, with_rr[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    lane = rng.lane_randoms(keys, jnp.zeros(64, jnp.int32),
                            jnp.full((64,), 2, jnp.int32))
    lane_rr = rng.lane_randoms(keys, jnp.zeros(64, jnp.int32),
                               jnp.full((64,), 2, jnp.int32), with_rr=True)
    for a, b in zip(lane, lane_rr[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the RR draw is a genuinely distinct stream
    assert not np.array_equal(np.asarray(with_rr[3]), np.asarray(plain[2]))


@pytest.mark.parametrize("sampler", ["regen", "scan"])
def test_rr_is_unbiased_and_cheaper(sampler):
    # enclosed Cornell scene: every path otherwise runs to the 5-bounce
    # limit, so RR both saves segments and must not shift the estimate
    base = rt.RenderSettings(reflect_limit=5, sampler=sampler)
    plain, segs_plain = _render(base, spp=220)
    rr, segs_rr = _render(
        dataclasses.replace(base, russian_roulette=2), spp=220)

    assert segs_rr < 0.9 * segs_plain          # actually kills paths
    assert np.isfinite(rr).all()
    # unbiasedness: global per-channel means agree within Monte-Carlo
    # noise (220 spp x 1536 px; RR adds variance, hence the loose bound)
    for c in range(3):
        m_plain, m_rr = plain[:, c].mean(), rr[:, c].mean()
        assert abs(m_rr - m_plain) < 0.05 * max(m_plain, 1e-3), (
            c, m_plain, m_rr)


def test_rr_first_bounces_protected():
    # russian_roulette=N never kills a path before N completed bounces:
    # with N >= reflect_limit the render is bitwise identical to rr off
    # EXCEPT for throughput boosts — which cannot happen either, since no
    # bounce reaches eligibility. (The RR uniform is still drawn, so this
    # also pins that drawing it leaves the other streams untouched.)
    base = rt.RenderSettings(reflect_limit=3, sampler="regen")
    plain, segs_plain = _render(base, spp=40)
    protected, segs_prot = _render(
        dataclasses.replace(base, russian_roulette=3), spp=40)
    np.testing.assert_array_equal(plain, protected)
    assert segs_prot == segs_plain


def _render_mega(settings, spp, width=48, height=32):
    scene, use_sky = rt.build_scene(1)
    settings = dataclasses.replace(settings, rays_per_pixel=spp,
                                   sampler="mega").with_sky(use_sky)
    cam_cfg = rt.CameraConfig(width=width, height=height)
    cam = build_camera(cam_cfg)
    o, d = primary_rays(cam, width, height)
    ray_idx = jnp.arange(width * height, dtype=jnp.int32)
    mean, segs = render_sample_mean(scene, settings, ray_idx, o, d,
                                    jax.random.key(7), backend="pallas")
    return np.asarray(mean), float(segs)


def test_rr_mega_unbiased_and_cheaper():
    """In-kernel RR (megakernel rr_start): a killed lane banks its radiance
    and regenerates onto the pixel's next sample immediately, so segment
    counts drop while the estimator stays unbiased."""
    base = rt.RenderSettings(reflect_limit=5)
    spp = 40 if jax.default_backend() == "tpu" else 24
    plain, segs_plain = _render_mega(base, spp=spp)
    rr, segs_rr = _render_mega(
        dataclasses.replace(base, russian_roulette=2), spp=spp)

    assert segs_rr < 0.9 * segs_plain          # actually kills paths
    assert np.isfinite(rr).all()
    for c in range(3):
        m_plain, m_rr = plain[c].mean(), rr[c].mean()
        assert abs(m_rr - m_plain) < 0.08 * max(m_plain, 1e-3), (
            c, m_plain, m_rr)


def test_rr_mega_first_bounces_protected():
    """rr_start >= reflect_limit: no bounce ever reaches eligibility, so
    the render equals rr-off — bitwise off-TPU (the interp hash RNG keys
    draw rows by absolute index, so appending the RR row leaves rows 0-2
    untouched; the hardware PRNG state advances differently, where only
    the distribution is pinned)."""
    base = rt.RenderSettings(reflect_limit=3)
    plain, segs_plain = _render_mega(base, spp=8, width=32, height=16)
    prot, segs_prot = _render_mega(
        dataclasses.replace(base, russian_roulette=3), spp=8,
        width=32, height=16)
    assert segs_prot == segs_plain
    if jax.default_backend() != "tpu":
        np.testing.assert_array_equal(plain, prot)
    else:
        assert abs(prot.mean() - plain.mean()) < 0.05 * max(
            plain.mean(), 1e-3)


def test_rr_auto_sampler_allows_mega():
    """'auto' no longer demotes RR renders to the wavefront path: on TPU it
    must pick the megakernel regardless of russian_roulette (off-TPU auto
    always resolves to regen — compiled XLA beats interpret mode)."""
    import raytracer_tpu.ops.integrator as integ
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, sampler="auto",
                                 russian_roulette=2).with_sky(use_sky)
    cam = build_camera(rt.CameraConfig(width=16, height=8))
    o, d = primary_rays(cam, 16, 8)
    # must not raise, whatever the backend resolves to
    mean, segs = integ.render_sample_mean(
        scene, settings, jnp.arange(128, dtype=jnp.int32), o, d,
        jax.random.key(0), backend="pallas")
    assert np.isfinite(np.asarray(mean)).all() and float(segs) > 0
