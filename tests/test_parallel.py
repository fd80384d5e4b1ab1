"""Multi-chip sharding tests on a simulated 8-device CPU mesh.

Per SURVEY.md §4(d): asserts the pixel-sharded render is *bitwise identical*
to the single-device render (RNG streams are global-pixel-keyed), and that
the spp-sharded mode averages correctly across the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.models.camera import build_camera, primary_rays
from raytracer_tpu.ops.integrator import render_frame
from raytracer_tpu.parallel.mesh import make_mesh, pixel_sharding
from raytracer_tpu.parallel.shard import (make_pixel_sharded_step,
                                          make_spp_sharded_step)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual) backend")


def _setup(width=32, height=16):
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3
                                 ).with_sky(use_sky)
    cam = build_camera(rt.CameraConfig(width=width, height=height))
    o, d = primary_rays(cam, width, height)
    idx = jnp.arange(width * height, dtype=jnp.int32)
    return scene, settings, idx, o, d


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_pixel_sharded_equals_single_device():
    scene, settings, idx, o, d = _setup()
    n = o.shape[0]
    key = jax.random.key(0)

    # single device reference
    ref, ref_segs = render_frame(scene, settings, idx, o, d,
                                 jnp.zeros((n, 3)), jnp.int32(0), key)

    mesh = make_mesh()
    sh = pixel_sharding(mesh)
    step = make_pixel_sharded_step(mesh, settings)
    accum = jax.device_put(jnp.zeros((n, 3)), sh)
    out, segs = step(scene, jax.device_put(idx, sh), jax.device_put(o, sh),
                     jax.device_put(d, sh), accum, jnp.int32(0), key)

    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert float(ref_segs) == float(segs)


def test_pixel_sharded_two_frames_progress():
    scene, settings, idx, o, d = _setup()
    n = o.shape[0]
    key = jax.random.key(1)
    mesh = make_mesh()
    sh = pixel_sharding(mesh)
    step = make_pixel_sharded_step(mesh, settings)
    idx_s, o_s, d_s = (jax.device_put(x, sh) for x in (idx, o, d))

    accum = jax.device_put(jnp.zeros((n, 3)), sh)
    accum, _ = step(scene, idx_s, o_s, d_s, accum, jnp.int32(0), key)
    f1 = np.asarray(accum)
    accum, _ = step(scene, idx_s, o_s, d_s, accum, jnp.int32(1), key)
    f2 = np.asarray(accum)
    assert not np.array_equal(f1, f2)
    assert np.isfinite(f2).all()

    # matches the single-device two-frame sequence exactly
    ref, _ = render_frame(scene, settings, idx, o, d, jnp.zeros((n, 3)),
                          jnp.int32(0), key)
    ref, _ = render_frame(scene, settings, idx, o, d, ref, jnp.int32(1), key)
    np.testing.assert_array_equal(np.asarray(ref), f2)


def test_spp_sharded_mode():
    scene, settings, idx, o, d = _setup(16, 8)
    n = o.shape[0]
    key = jax.random.key(2)
    mesh = make_mesh()
    step = make_spp_sharded_step(mesh, settings)
    accum = jnp.zeros((n, 3))
    out, segs = step(scene, idx, o, d, accum, jnp.int32(0), key)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert out.max() > 0
    # 8 shards x spp traces: segments at least 8 * N (first bounces)
    assert float(segs) >= 8 * settings.rays_per_pixel * n


def test_renderer_sharded_end_to_end():
    """Renderer(sharding=...) drives the shard_map step and matches the
    single-device renderer bitwise."""
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3
                                 ).with_sky(use_sky)
    cam = rt.CameraConfig(width=32, height=16)

    mesh = make_mesh()
    sh = pixel_sharding(mesh)
    r_sharded = rt.Renderer(scene, cam, settings, sharding=sh, seed=0)
    r_single = rt.Renderer(scene, cam, settings, seed=0)
    for _ in range(2):
        r_sharded.render_frame(block=True)
        r_single.render_frame(block=True)
    np.testing.assert_array_equal(r_sharded.image(), r_single.image())
    assert r_sharded.stats_log[-1]["segments"] == \
        r_single.stats_log[-1]["segments"]


def test_renderer_spp_sharded_mode():
    """Renderer(shard_mode='spp'): D chips render D x rays_per_pixel samples
    per frame via one psum-mean; result must be finite and segments scale
    with the device count."""
    import raytracer_tpu as rt
    from raytracer_tpu.parallel.mesh import make_mesh, pixel_sharding
    devs = jax.devices()
    mesh = make_mesh(devs)
    sharding = pixel_sharding(mesh)
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3
                                 ).with_sky(use_sky)
    r = rt.Renderer(scene, rt.CameraConfig(width=32, height=16), settings,
                    sharding=sharding, shard_mode="spp")
    r.render_frame(block=True)
    img = np.asarray(r.accum)
    assert np.isfinite(img).all()
    # D devices x 2 spp x 512 pixels: at least one segment per sample
    assert r.total_segments >= len(devs) * 2 * 512


def test_hybrid_sharded_matches_manual_slice_mean():
    """2D (px, spp) hybrid mode: a (4, 2) mesh must reproduce, bitwise, the
    mean of the two spp-slice renders computed unsharded (per spp slice the
    pixel split is the established bitwise-invariant pixel mode; the psum
    over the 2-wide spp axis is one add in shard order)."""
    from raytracer_tpu.ops import rng as rng_mod
    from raytracer_tpu.ops.integrator import render_sample_mean
    from raytracer_tpu.parallel.mesh import make_mesh_2d
    from raytracer_tpu.parallel.shard import make_hybrid_sharded_step

    scene, settings, idx, o, d = _setup()
    n = o.shape[0]
    key = jax.random.key(7)

    mesh2 = make_mesh_2d(4, 2)
    sh = pixel_sharding(mesh2)
    step = make_hybrid_sharded_step(mesh2, settings)
    out, segs = step(scene, jax.device_put(idx, sh), jax.device_put(o, sh),
                     jax.device_put(d, sh),
                     jax.device_put(jnp.zeros((n, 3)), sh), jnp.int32(0),
                     key)

    means, seg_tot = [], 0.0
    for i in range(2):
        fkey = rng_mod.frame_key(jax.random.fold_in(key, i), jnp.int32(0))
        m, s = render_sample_mean(scene, settings, idx, o, d, fkey)
        means.append(np.asarray(m))
        seg_tot += float(s)   # px shards partition each slice's segments
    ref = (means[0] + means[1]) / np.float32(2.0)
    np.testing.assert_array_equal(ref, np.asarray(out))
    assert float(segs) == seg_tot
    assert np.isfinite(np.asarray(out)).all()


def test_renderer_hybrid_mode_end_to_end(tmp_path):
    """Renderer(shard_mode='hybrid') on a (4, 2) mesh renders finite frames,
    checkpoint/resumes bitwise with the sharded placement, and rejects 1D
    meshes."""
    from raytracer_tpu.parallel.mesh import make_mesh_2d
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3
                                 ).with_sky(use_sky)
    cam = rt.CameraConfig(width=32, height=16)
    sh = pixel_sharding(make_mesh_2d(4, 2))
    r = rt.Renderer(scene, cam, settings, sharding=sh, shard_mode="hybrid")
    for _ in range(2):
        r.render_frame(block=True)
    assert np.isfinite(np.asarray(r.accum)).all()
    assert r.total_segments >= 2 * 2 * 512   # 2 slices x 2 spp x pixels

    # checkpoint/resume keeps the pixel-sharded placement (guard parity
    # with pixel mode) and the continued render stays bitwise identical
    path = str(tmp_path / "ck.npz")
    r.save_checkpoint(path)
    r2 = rt.Renderer(scene, cam, settings, sharding=sh, shard_mode="hybrid")
    r2.load_checkpoint(path)
    assert r2.accum.sharding.is_equivalent_to(r.accum.sharding,
                                              r.accum.ndim)
    r.render_frame(block=True)
    r2.render_frame(block=True)
    np.testing.assert_array_equal(np.asarray(r.accum), np.asarray(r2.accum))

    with pytest.raises(ValueError, match="2D"):
        rt.Renderer(scene, cam, settings, sharding=pixel_sharding(
            make_mesh()), shard_mode="hybrid")


def test_pixel_sharded_lanesort_equals_single_device():
    """lanesort under shard_map: each shard counting-sorts only its own
    rays, but RNG streams are pixel-keyed and ride the permutation, so the
    sharded image must stay bitwise identical to the single-device render
    (which equals plain regen)."""
    import dataclasses
    scene, use_sky = rt.build_scene(4, seed=0)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3,
                                 sampler="lanesort").with_sky(use_sky)
    cam = build_camera(rt.CameraConfig(width=64, height=32,
                                       position=(0.0, 0.5, -6.0)))
    o, d = primary_rays(cam, 64, 32)
    idx = jnp.arange(64 * 32, dtype=jnp.int32)
    n = o.shape[0]
    key = jax.random.key(5)

    ref, ref_segs = render_frame(scene, settings, idx, o, d,
                                 jnp.zeros((n, 3)), jnp.int32(0), key)
    mesh = make_mesh()
    sh = pixel_sharding(mesh)
    step = make_pixel_sharded_step(mesh, settings)
    out, segs = step(scene, jax.device_put(idx, sh), jax.device_put(o, sh),
                     jax.device_put(d, sh),
                     jax.device_put(jnp.zeros((n, 3)), sh), jnp.int32(0),
                     key)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert float(ref_segs) == float(segs)

    regen = dataclasses.replace(settings, sampler="regen")
    ref2, _ = render_frame(scene, regen, idx, o, d, jnp.zeros((n, 3)),
                           jnp.int32(0), key)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ref2))


def test_spp_mode_checkpoint_resume(tmp_path):
    """load_checkpoint in spp shard mode must keep the accumulator
    replicated (make_spp_sharded_step declares it P()); re-placing it with
    the pixel sharding raised/resharded. Regression for a round-3 review
    finding."""
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3
                                 ).with_sky(use_sky)
    cam = rt.CameraConfig(width=32, height=16)
    ckpt = str(tmp_path / "spp.npz")

    mesh = make_mesh()
    sh = pixel_sharding(mesh)
    r_a = rt.Renderer(scene, cam, settings, sharding=sh, shard_mode="spp")
    r_a.render_frame(block=True)
    r_a.save_checkpoint(ckpt)

    r_b = rt.Renderer(scene, cam, settings, sharding=sh, shard_mode="spp")
    r_b.load_checkpoint(ckpt)
    assert r_b.frame_num == 1
    r_b.render_frame(block=True)
    assert np.isfinite(np.asarray(r_b.accum)).all()
    assert r_b.frame_num == 2


def test_coherent_pixel_shards_draw_distinct_streams():
    """Coherent (tile-shared) wavefront sampling folds the shard's global
    tile base into its iteration key: two shards of the same frame must NOT
    repeat one structured tile-noise pattern. Regression for a round-3
    review finding (the megakernel path already globalised its seed)."""
    from raytracer_tpu.ops.integrator import render_sample_mean
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(
        rays_per_pixel=2, reflect_limit=3, sampler="regen", coherent=True,
    ).with_sky(use_sky)
    cam = build_camera(rt.CameraConfig(width=32, height=16))
    o, d = primary_rays(cam, 32, 16)
    idx = jnp.arange(32 * 16, dtype=jnp.int32)
    key = jax.random.key(3)

    m0, _ = render_sample_mean(scene, settings, idx, o, d, key,
                               tile_offset=0)
    m0b, _ = render_sample_mean(scene, settings, idx, o, d, key,
                                tile_offset=0)
    m7, _ = render_sample_mean(scene, settings, idx, o, d, key,
                               tile_offset=7)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m0b))
    assert not np.array_equal(np.asarray(m0), np.asarray(m7))
    assert np.isfinite(np.asarray(m7)).all()


def test_elastic_resume_across_topologies(tmp_path):
    """Elastic resume (SURVEY §5 failure-recovery plan): a checkpoint
    written single-device restores onto an 8-device pixel-sharded mesh
    (and back) and the continued render is bitwise identical — RNG
    streams are global-pixel-keyed and the checkpoint is host numpy, so
    device topology is a free variable across restarts."""
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3
                                 ).with_sky(use_sky)
    cam = rt.CameraConfig(width=32, height=16)
    ckpt = str(tmp_path / "elastic.npz")

    # 3 uninterrupted single-device frames = the ground truth
    r_ref = rt.Renderer(scene, cam, settings, seed=0)
    for _ in range(3):
        r_ref.render_frame(block=True)

    # 2 frames single-device, checkpoint, resume on an 8-device mesh
    r_a = rt.Renderer(scene, cam, settings, seed=0)
    r_a.render_frame(block=True)
    r_a.render_frame(block=True)
    r_a.save_checkpoint(ckpt)

    mesh = make_mesh()
    sh = pixel_sharding(mesh)
    r_b = rt.Renderer(scene, cam, settings, sharding=sh, seed=0)
    r_b.load_checkpoint(ckpt)
    assert r_b.frame_num == 2
    r_b.render_frame(block=True)
    np.testing.assert_array_equal(r_b.image(), r_ref.image())

    # and shrink back: checkpoint the sharded run, resume single-device
    r_b.save_checkpoint(ckpt)
    r_c = rt.Renderer(scene, cam, settings, seed=0)
    r_c.load_checkpoint(ckpt)
    r_c.render_frame(block=True)
    r_ref.render_frame(block=True)
    np.testing.assert_array_equal(r_c.image(), r_ref.image())
