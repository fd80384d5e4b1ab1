"""Benchmark scene builders (BASELINE.json configs) build and render."""

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu as rt
from raytracer_tpu.models import bench_scenes
from raytracer_tpu.models.camera import build_camera, primary_rays
from raytracer_tpu.ops.integrator import render_sample_mean


def _smoke_render(scene, use_sky, cam_kwargs=None):
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3
                                 ).with_sky(use_sky)
    kw = dict(width=16, height=8)
    kw.update(cam_kwargs or {})
    cam = build_camera(rt.CameraConfig(**kw))
    o, d = primary_rays(cam, kw["width"], kw["height"])
    idx = jnp.arange(kw["width"] * kw["height"], dtype=jnp.int32)
    mean, segs = render_sample_mean(scene, settings, idx, o, d,
                                    jax.random.key(0))
    assert np.isfinite(np.asarray(mean)).all()
    assert float(segs) > 0


def test_rtiow_trio():
    scene, sky = bench_scenes.rtiow_trio_scene()
    assert sky and scene.num_spheres >= 4
    _smoke_render(scene, sky)


def test_cube_scene_variants():
    scene, sky = bench_scenes.cube_scene()
    assert not scene.has_image_tex
    _smoke_render(scene, sky)
    scene_img, _ = bench_scenes.cube_scene(image_texture=True)
    assert scene_img.has_image_tex


def test_monkey_scene():
    scene, sky = bench_scenes.monkey_light_scene()
    assert scene.num_triangles >= 700
    assert (np.asarray(scene.mat_type) == 1).any()  # emissive light
    _smoke_render(scene, sky)


def test_stress_scene_small():
    scene, sky = bench_scenes.stress_10k_scene(num=300, seed=2)
    assert scene.sph_clusters.shape[0] > 0
    _smoke_render(scene, sky, dict(position=(0, 1, -4)))
