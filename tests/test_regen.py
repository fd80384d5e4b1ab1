"""Path-regeneration sampler: statistical agreement with the scan sampler."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu as rt
from raytracer_tpu.models.camera import build_camera, primary_rays
from raytracer_tpu.ops.integrator import render_sample_mean


def _setup(spp):
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=spp, reflect_limit=5
                                 ).with_sky(use_sky)
    cam = build_camera(rt.CameraConfig(width=24, height=16))
    o, d = primary_rays(cam, 24, 16)
    idx = jnp.arange(24 * 16, dtype=jnp.int32)
    return scene, settings, idx, o, d


def test_regen_matches_scan_statistically():
    scene, settings, idx, o, d = _setup(spp=48)
    regen = dataclasses.replace(settings, sampler="regen")
    scan = dataclasses.replace(settings, sampler="scan")
    m_r, segs_r = render_sample_mean(scene, regen, idx, o, d,
                                     jax.random.key(0))
    m_s, segs_s = render_sample_mean(scene, scan, idx, o, d,
                                     jax.random.key(0))
    m_s2, _ = render_sample_mean(scene, scan, idx, o, d, jax.random.key(1))
    m_r, m_s, m_s2 = np.asarray(m_r), np.asarray(m_s), np.asarray(m_s2)
    assert np.isfinite(m_r).all()
    # Same estimator, different RNG assignment: the regen-vs-scan error must
    # be the same order as pure Monte-Carlo noise (scan-vs-scan with a
    # different key).
    err = np.abs(m_r - m_s).mean()
    noise = np.abs(m_s - m_s2).mean()
    assert err < 2.0 * noise + 1e-3, (err, noise)
    # Both trace the same expected number of segments (same paths
    # statistically); allow a few percent.
    assert abs(float(segs_r) - float(segs_s)) / float(segs_s) < 0.1


def test_regen_deterministic():
    scene, settings, idx, o, d = _setup(spp=8)
    m1, s1 = render_sample_mean(scene, settings, idx, o, d, jax.random.key(3))
    m2, s2 = render_sample_mean(scene, settings, idx, o, d, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert float(s1) == float(s2)


def test_regen_early_exit_segment_count():
    """Sky-only scene: every path is 1 segment; regen must do ~spp
    iterations of work, not spp * reflect_limit."""
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.models.materials import Material, Texture
    b = SceneBuilder()
    b.add_sphere((1000, 0, 0), 1.0,
                 Material.standard(Texture.const_colour((1, 1, 1)), 0))
    scene = b.build()
    settings = rt.RenderSettings(rays_per_pixel=16, reflect_limit=5,
                                 antialias=False)
    n = 64
    idx = jnp.arange(n, dtype=jnp.int32)
    o = jnp.zeros((n, 3))
    d = jnp.zeros((n, 3)).at[:, 2].set(1.0)
    mean, segs = render_sample_mean(scene, settings, idx, o, d,
                                    jax.random.key(0))
    assert float(segs) == n * 16  # exactly one segment per sample
    np.testing.assert_allclose(np.asarray(mean),
                               np.tile([0.8, 1.0, 1.0], (n, 1)), rtol=1e-6)


def test_rebin_bitwise_equals_regen():
    """Row re-binning permutes execution order only: RNG streams are keyed
    by pixel and per-pixel sums are un-permuted at the end, so the image
    must be bitwise identical to plain regen."""
    import dataclasses
    scene, use_sky = rt.build_scene(4, seed=0)  # 100 spheres => clusters
    settings = rt.RenderSettings(rays_per_pixel=6, reflect_limit=4
                                 ).with_sky(use_sky)
    cam = build_camera(rt.CameraConfig(width=64, height=32,
                                       position=(0.0, 0.5, -6.0)))
    o, d = primary_rays(cam, 64, 32)  # 2048 rays = 16 rows
    idx = jnp.arange(64 * 32, dtype=jnp.int32)
    regen = dataclasses.replace(settings, sampler="regen")
    rebin = dataclasses.replace(settings, sampler="rebin")
    m_a, s_a = render_sample_mean(scene, regen, idx, o, d, jax.random.key(7))
    m_b, s_b = render_sample_mean(scene, rebin, idx, o, d, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    assert float(s_a) == float(s_b)


def test_lane_destinations_match_stable_argsort():
    """MXU counting sort (ops/rebin.lane_destinations) must equal a stable
    argsort by bucket key — a permutation, stable within equal keys."""
    from raytracer_tpu.ops.rebin import (LANE_BUCKETS, apply_lane_permutation,
                                         lane_destinations)
    rng = np.random.default_rng(11)
    n = 128 * 40
    key = jnp.asarray(rng.integers(0, LANE_BUCKETS, n), jnp.int32)
    dest = np.asarray(lane_destinations(key))
    # dest is a permutation
    assert sorted(dest.tolist()) == list(range(n))
    # sorted-by-key and stable: dest of ray i = its position in stable order
    order = np.argsort(np.asarray(key), kind="stable")
    expect = np.empty(n, np.int64)
    expect[order] = np.arange(n)
    np.testing.assert_array_equal(dest, expect)

    # apply: both movement modes are bitwise identical and actually sort
    vals = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    one = jnp.asarray(rng.normal(size=n), jnp.float32)
    mv_s = apply_lane_permutation(jnp.asarray(dest), [vals, one],
                                  mode="scatter")
    mv_g = apply_lane_permutation(jnp.asarray(dest), [vals, one],
                                  mode="gather")
    for a, b in zip(mv_s, mv_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(mv_s[1]),
                                  np.asarray(one)[order])


def test_lane_buckets_group_coherent_rays():
    """Rays sharing an origin cell and direction octant share a bucket;
    done rays collapse into one bucket."""
    from raytracer_tpu.ops.rebin import lane_buckets
    n = 256
    o = jnp.zeros((3, n), jnp.float32)
    o = o.at[:, n // 2:].set(10.0)            # two spatial groups
    d = jnp.ones((3, n), jnp.float32)
    d = d.at[0, ::2].set(-1.0)                # two direction octants
    done = jnp.zeros((n,), bool).at[:4].set(True)
    b = np.asarray(lane_buckets(o, d, done))
    # exactly 4 buckets among live rays (2 cells x 2 octants)
    assert len(set(b[4:].tolist())) == 4


def test_lanesort_bitwise_equals_regen():
    """Per-ray re-binning (MXU counting sort) permutes execution order only:
    RNG key data rides the permutation and per-pixel sums are un-permuted at
    the end, so the image must be bitwise identical to plain regen."""
    scene, use_sky = rt.build_scene(4, seed=0)
    settings = rt.RenderSettings(rays_per_pixel=6, reflect_limit=4
                                 ).with_sky(use_sky)
    cam = build_camera(rt.CameraConfig(width=64, height=32,
                                       position=(0.0, 0.5, -6.0)))
    o, d = primary_rays(cam, 64, 32)
    idx = jnp.arange(64 * 32, dtype=jnp.int32)
    regen = dataclasses.replace(settings, sampler="regen")
    lane = dataclasses.replace(settings, sampler="lanesort")
    m_a, s_a = render_sample_mean(scene, regen, idx, o, d, jax.random.key(7))
    m_b, s_b = render_sample_mean(scene, lane, idx, o, d, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_b))
    assert float(s_a) == float(s_b)
