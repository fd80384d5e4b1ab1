"""Megakernel sampler tests.

The megakernel requires real TPU hardware (on-core PRNG has no CPU
lowering); these tests cover the static plumbing everywhere and the full
numerics only when a TPU is attached.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.models.camera import build_camera, primary_rays
from raytracer_tpu.ops.integrator import render_sample_mean
from raytracer_tpu.ops.megakernel import pack_materials, supports

ON_TPU = jax.default_backend() == "tpu"


def test_supports_flags():
    scene, _ = rt.build_scene(1)
    assert supports(scene)          # const/checker textures only
    scene2, _ = rt.build_scene(2)
    assert not supports(scene2)     # image texture => fallback


def test_pack_materials_shape():
    scene, _ = rt.build_scene(1)
    mat = pack_materials(scene)
    assert mat.shape == (13, scene.mat_type.shape[0])


def test_auto_sampler_falls_back_off_tpu():
    """auto must not pick the megakernel off-TPU (no CPU lowering)."""
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3,
                                 sampler="auto").with_sky(use_sky)
    n = 128
    idx = jnp.arange(n, dtype=jnp.int32)
    o = jnp.zeros((n, 3))
    d = jnp.zeros((n, 3)).at[:, 2].set(1.0)
    mean, segs = render_sample_mean(scene, settings, idx, o, d,
                                    jax.random.key(0), backend="pallas")
    assert np.isfinite(np.asarray(mean)).all()


@pytest.mark.skipif(not ON_TPU, reason="megakernel needs a TPU")
def test_mega_matches_regen_statistically():
    scene, use_sky = rt.build_scene(1)
    base = rt.RenderSettings(rays_per_pixel=32, reflect_limit=4
                             ).with_sky(use_sky)
    w, h = 32, 32
    cam = build_camera(rt.CameraConfig(width=w, height=h))
    o, d = primary_rays(cam, w, h)
    idx = jnp.arange(w * h, dtype=jnp.int32)

    mega = dataclasses.replace(base, sampler="mega")
    regen = dataclasses.replace(base, sampler="regen")
    m_m, s_m = render_sample_mean(scene, mega, idx, o, d, jax.random.key(0),
                                  backend="pallas")
    m_r, s_r = render_sample_mean(scene, regen, idx, o, d, jax.random.key(0),
                                  backend="pallas")
    m_r2, _ = render_sample_mean(scene, regen, idx, o, d, jax.random.key(1),
                                 backend="pallas")
    err = float(jnp.abs(m_m - m_r).mean())
    noise = float(jnp.abs(m_r - m_r2).mean())
    assert err < 2.0 * noise + 1e-3, (err, noise)
    # closed box => per-pixel path lengths are deterministic: segs match
    assert float(s_m) == float(s_r)


@pytest.mark.skipif(not ON_TPU, reason="megakernel needs a TPU")
def test_mega_deterministic():
    scene, use_sky = rt.build_scene(4, seed=0)
    settings = rt.RenderSettings(rays_per_pixel=4, reflect_limit=5,
                                 sampler="mega").with_sky(use_sky)
    w, h = 64, 32
    cam = build_camera(rt.CameraConfig(width=w, height=h))
    o, d = primary_rays(cam, w, h)
    idx = jnp.arange(w * h, dtype=jnp.int32)
    m1, s1 = render_sample_mean(scene, settings, idx, o, d,
                                jax.random.key(7), backend="pallas")
    m2, s2 = render_sample_mean(scene, settings, idx, o, d,
                                jax.random.key(7), backend="pallas")
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert float(s1) == float(s2)
