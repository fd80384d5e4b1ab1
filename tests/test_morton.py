"""Morton pixel ordering: permutation validity and render equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

import raytracer_tpu as rt
from raytracer_tpu.models.camera import build_camera, morton_order, primary_rays
from raytracer_tpu.ops.integrator import render_frame


def test_morton_is_permutation_and_local():
    order = morton_order(16, 8)
    assert sorted(order.tolist()) == list(range(128))
    # first 4 pixels of a Z-curve are the 2x2 block at the origin
    first = set(order[:4].tolist())
    assert first == {0, 1, 16, 17}


def test_renderer_image_matches_linear_order():
    """Morton ordering must not change the image: RNG streams are keyed by
    true pixel id, so per-pixel radiance is bitwise identical.

    Pinned to the regen sampler — the megakernel's on-core PRNG is
    tile-content-keyed, so its streams (not its estimator) depend on pixel
    order by design."""
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3,
                                 sampler="regen").with_sky(use_sky)
    w, h = 32, 16
    cam_cfg = rt.CameraConfig(width=w, height=h)
    r = rt.Renderer(scene, cam_cfg, settings, seed=0)
    r.render_frame(block=True)
    img_morton = r.image()

    # direct linear-order render with the same frame/key schedule
    cam = build_camera(cam_cfg)
    o, d = primary_rays(cam, w, h)
    idx = jnp.arange(w * h, dtype=jnp.int32)
    accum, _ = render_frame(scene, settings, idx, o, d,
                            jnp.zeros((w * h, 3)), jnp.int32(0),
                            jax.random.key(0), backend=r.backend)
    from raytracer_tpu.ops import film
    img_linear = film.to_u8(accum, w, h)
    np.testing.assert_array_equal(img_morton, img_linear)
