"""Megakernel sampler tests.

The full spp x bounce loop runs on every backend: on TPU with the on-core
PRNG, off-TPU under the Pallas interpreter with a counter-hash RNG
(megakernel.py interp_rng) — so the numerics of the flagship kernel are
exercised in the default CPU suite, not just on opt-in TPU runs. Sizes are
kept small off-TPU (interpret mode is ~100x slower than compiled)."""

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
    # scene 2's earth image fits the packed planes => in-kernel sampling
    assert scene2.has_image_tex and scene2.img_rows > 0
    assert supports(scene2)
    # a wide image packs into column-block rows and stays in-kernel
    import numpy as np
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.ops.megakernel import IMG_MAX_ROWS
    b = SceneBuilder()
    wide = Texture.from_image(np.zeros((64, 320, 3), np.float32))
    b.add_sphere((0, 0, 2), 1.0, Material.standard(wide, 0))
    s_wide = b.build()
    assert s_wide.img_rows == 64 * 3 and supports(s_wide)  # ceil(320/128)=3
    # an image past the VMEM packed-row cap now stays in-kernel (HBM-paged
    # texel plane); only the HBM sanity bound disables the megakernel
    import raytracer_tpu.ops.megakernel as mk
    b = SceneBuilder()
    big = Texture.from_image(
        np.zeros((IMG_MAX_ROWS, 256, 3), np.float32))
    b.add_sphere((0, 0, 2), 1.0, Material.standard(big, 0))
    s_big = b.build()
    assert s_big.img_rows > IMG_MAX_ROWS and supports(s_big)
    orig = mk.IMG_HBM_MAX_ROWS
    try:
        mk.IMG_HBM_MAX_ROWS = s_big.img_rows - 1
        assert not supports(s_big)
    finally:
        mk.IMG_HBM_MAX_ROWS = orig


def test_auto_routes_big_textures_to_wavefront():
    """The auto-sampler texture cliff (VERDICT round-4 item 4): scenes
    whose packed image plane exceeds IMG_AUTO_MAX_ROWS route to the
    wavefront pipeline under 'auto' (the XLA atlas gather beats the
    in-kernel row select 2.2-8.3x there — docs/TESTLOG.md session 8)
    while staying fully supported under explicit sampler='mega'."""
    import numpy as np
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.ops.megakernel import (IMG_AUTO_MAX_ROWS,
                                              auto_prefers_mega)

    def scene_with_rows(h, w):
        b = SceneBuilder()
        tex = Texture.from_image(np.zeros((h, w, 3), np.float32))
        b.add_sphere((0, 0, 2), 1.0, Material.standard(tex, 0))
        return b.build()

    small = scene_with_rows(256, 512)        # 256*4 = 1024 rows
    assert small.img_rows <= IMG_AUTO_MAX_ROWS
    assert supports(small) and auto_prefers_mega(small)

    big = scene_with_rows(512, 1024)         # 512*8 = 4096 rows
    assert big.img_rows > IMG_AUTO_MAX_ROWS
    assert supports(big)                     # mega capability intact
    assert not auto_prefers_mega(big)        # but auto routes to wavefront

    plain, _ = rt.build_scene(1)             # no image textures: unaffected
    assert auto_prefers_mega(plain)


def test_pack_materials_shape():
    scene, _ = rt.build_scene(1)
    mat = pack_materials(scene)
    assert mat.shape == (16, scene.mat_type.shape[0])


def test_auto_sampler_falls_back_off_tpu():
    """auto must not pick the megakernel off-TPU (interpret mode is ~100x
    slower than the regen sampler's compiled XLA; mega is opt-in there)."""
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


def test_mega_matches_regen_statistically():
    scene, use_sky = rt.build_scene(1)
    spp = 32 if ON_TPU else 12
    base = rt.RenderSettings(rays_per_pixel=spp, reflect_limit=4
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
    # Per-pixel path lengths are near-deterministic, so segment counts must
    # agree closely — but not exactly. Two independent, benign sources of
    # grazing-ray divergence between the samplers exist: (a) a non-default
    # RAYTRACER_SROWS salts the megakernel's draw-row RNG offsets into a
    # different (equally valid) random stream; (b) on real TPU hardware the
    # megakernel's Newton-refined reciprocal (ops/megakernel.py triangle
    # divide) is not bitwise equal to the regen sampler's XLA divide, so an
    # AA-jittered grazing ray at a box seam can flip hit<->miss and retire
    # a bounce early (measured on v5e 2026-08-19: 83550 vs 83552 segs at
    # the default tile shape — 0.0024%). Allow 0.1% there; determinism of
    # each sampler stays exact (test_mega_deterministic). Off-TPU at the
    # default tile shape neither source applies (interpret mode uses XLA
    # divides), so the default CI path keeps the exact-equality check — a
    # bug dropping a few segments must not pass silently.
    from raytracer_tpu.ops.megakernel import SROWS
    if not ON_TPU and SROWS == 32:
        assert float(s_m) == float(s_r), (s_m, s_r)
    else:
        assert abs(float(s_m) - float(s_r)) <= 1e-3 * float(s_r), (s_m, s_r)


def test_pixpack_statistical_depth_deterministic():
    """Pixel packing (megakernel.PIXPACK / pixpack arg): K pixels per lane,
    path regen rolls onto the lane's next pixel. The estimator per pixel is
    unchanged (spp samples, same draw machinery) but the pixel->(tile,
    lane, sample) assignment is not, so radiance is held to the same
    statistical contract as mega-vs-regen. Primary-hit DEPTH, however,
    depends only on each pixel's primary ray geometry when antialias is
    off (no direction jitter), so it must be bitwise identical to the
    unpacked kernel. Runs interpret-mode off TPU.

    The frame covers mega_tile * K pixels EXACTLY: packed-mode segment
    outputs are per-LANE totals banked on pixel block 0, so with padding
    pixels present a lane's total would include its pad pixel's segments
    and the sums would not be comparable (verified: at 512/8192 coverage
    packed reads 5370 vs 3322 plain — pure pad pollution, radiance and
    depth still match)."""
    from raytracer_tpu.ops.megakernel import (mega_tile_for,
                                              render_sample_mean_mega)
    scene, use_sky = rt.build_scene(4, seed=0)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=4,
                                 antialias=False).with_sky(use_sky)
    w, h = 128, 64
    assert w * h == mega_tile_for(scene) * 2  # full coverage at K=2
    cam = build_camera(rt.CameraConfig(width=w, height=h))
    o, d = primary_rays(cam, w, h)
    oT, dT = o.T, d.T

    m1, s1, dep1 = render_sample_mean_mega(
        scene, settings, oT, dT, jax.random.key(5), want_depth=True)
    m2, s2, dep2 = render_sample_mean_mega(
        scene, settings, oT, dT, jax.random.key(5), want_depth=True,
        pixpack=2)
    # independent-key yardstick for the sampler's own noise floor
    m1b, _, _ = render_sample_mean_mega(
        scene, settings, oT, dT, jax.random.key(6), want_depth=True)
    err = float(jnp.abs(m1 - m2).mean())
    noise = float(jnp.abs(m1 - m1b).mean())
    assert err < 2.0 * noise + 1e-3, (err, noise)
    # depth: pure primary-ray geometry with AA off -> bitwise equal
    np.testing.assert_array_equal(np.asarray(dep1), np.asarray(dep2))
    # segment totals: path lengths are near-deterministic; pixels beyond
    # the first mega_tile sit in tile 1 unpacked vs tile 0 packed, so
    # their draw streams differ and grazing tails can flip a few
    # (measured: 27371 vs 27372 at this size)
    assert abs(float(s1) - float(s2)) <= 5e-3 * float(s1), (s1, s2)
    # determinism: same key + same packing -> bitwise equal
    m2b, s2b, dep2b = render_sample_mean_mega(
        scene, settings, oT, dT, jax.random.key(5), want_depth=True,
        pixpack=2)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m2b))
    assert float(s2) == float(s2b)
    np.testing.assert_array_equal(np.asarray(dep2), np.asarray(dep2b))
    # settings-driven resolution (the Renderer's auto policy materialises
    # into settings.pixpack) selects the same kernel as the explicit arg
    import dataclasses
    m2c, s2c, dep2c = render_sample_mean_mega(
        scene, dataclasses.replace(settings, pixpack=2), oT, dT,
        jax.random.key(5), want_depth=True)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m2c))
    assert float(s2) == float(s2c)


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


def test_fetch_image_matches_atlas_gather():
    """The megakernel's lane-gather texel fetch (no PRNG involved — runs
    under the interpreter on CPU) must reproduce the wavefront path's atlas
    gather exactly (texels are colour30-quantised at scene build, so the
    packed int32 decode round-trips bitwise)."""
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from raytracer_tpu.models.scenes import procedural_earth_texture
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.ops.megakernel import (_fetch_image, pack_textures,
                                              supports)

    b = SceneBuilder()
    tex = Texture.from_image(procedural_earth_texture(32))  # (32, 64, 3)
    b.add_sphere((0, 0, 2), 1.0, Material.standard(tex, 0))
    scene = b.build()
    assert scene.img_rows == 32 and supports(scene)
    planes = pack_textures(scene)

    rng = np.random.default_rng(3)
    rows, lanes = 4, 128
    uu = jnp.asarray(rng.uniform(0, 1, (rows, lanes)), jnp.float32)
    vv = jnp.asarray(rng.uniform(0, 1, (rows, lanes)), jnp.float32)
    w = jnp.full((rows, lanes), 64.0)
    h = jnp.full((rows, lanes), 32.0)
    trow = jnp.zeros((rows, lanes))

    def kernel(tex_ref, u_ref, v_ref, w_ref, h_ref, row_ref,
               r_ref, g_ref, b_ref):
        r, g, bb = _fetch_image(tex_ref, u_ref[:], v_ref[:], w_ref[:],
                                h_ref[:], row_ref[:], img_rows=32)
        r_ref[:] = r
        g_ref[:] = g
        b_ref[:] = bb

    r, g, bch = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, lanes), jnp.float32)
                        for _ in range(3)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(3)),
        interpret=True,
    )(planes, uu, vv, w, h, trow)

    # oracle: the wavefront atlas gather (src/material.cu:119-124 formula)
    u_i = np.clip((63.0 * np.asarray(uu)).astype(np.int32), 0, 63)
    v_i = np.clip((31.0 * np.asarray(vv)).astype(np.int32), 0, 31)
    flat = 1 + v_i * 64 + u_i  # atlas slot 0 is the dummy texel
    atlas = np.asarray(scene.atlas)
    expect = atlas[flat]       # (rows, lanes, 3)
    np.testing.assert_array_equal(np.asarray(r), expect[..., 0])
    np.testing.assert_array_equal(np.asarray(g), expect[..., 1])
    np.testing.assert_array_equal(np.asarray(bch), expect[..., 2])


@pytest.mark.parametrize("earth", [None, 64, 128])
def test_mega_image_texture_matches_regen(earth):
    """Scene 2 (image-textured earth sphere) on the megakernel's in-kernel
    one-hot texel fetch must agree with the wavefront pipeline's atlas
    gather within Monte-Carlo noise. earth=None uses the scene-2 default —
    the checked-in 256x512 assets/earth.png (1024 packed rows, column
    blocks, static unrolled row select since IMG_STATIC_ROWS went to
    1024 on a REAL image asset); earth=64 pins a small procedural texture
    and earth=128 a 128x256 one (256 rows) — all static-select sizes now;
    the clamped fori_loop select is covered bitwise by
    test_fetch_image_wide_texture_matches_atlas_gather."""
    if earth is None:
        scene, use_sky = rt.build_scene(2)
    else:
        from raytracer_tpu.models.scenes import procedural_earth_texture
        scene, use_sky = rt.build_scene(
            2, earth_image=procedural_earth_texture(earth))
    assert supports(scene)
    spp = 48 if ON_TPU else 16
    base = rt.RenderSettings(rays_per_pixel=spp, reflect_limit=4
                             ).with_sky(use_sky)
    w, h = 64, 32
    cam = build_camera(rt.CameraConfig(width=w, height=h))
    o, d = primary_rays(cam, w, h)
    idx = jnp.arange(w * h, dtype=jnp.int32)

    mega = dataclasses.replace(base, sampler="mega")
    regen = dataclasses.replace(base, sampler="regen")
    m_m, _ = render_sample_mean(scene, mega, idx, o, d, jax.random.key(1),
                                backend="pallas")
    m_r, _ = render_sample_mean(scene, regen, idx, o, d, jax.random.key(1),
                                backend="pallas")
    m_r2, _ = render_sample_mean(scene, regen, idx, o, d, jax.random.key(2),
                                 backend="pallas")
    m_m, m_r, m_r2 = (np.asarray(x) for x in (m_m, m_r, m_r2))
    assert np.isfinite(m_m).all()
    err = np.abs(m_m - m_r).mean()
    noise = np.abs(m_r - m_r2).mean()
    assert err < 2.0 * noise + 1e-3, (err, noise)


@pytest.mark.parametrize("h_img,w_img,use_mask,static_rows", [
    (24, 320, False, 16),   # 72 packed rows -> clamped fori_loop select
    (16, 96, False, None),  # 16 packed rows -> static unrolled select
    (96, 1024, True, 16),   # 768 rows, 8 column blocks; masked bounds
])
def test_fetch_image_wide_texture_matches_atlas_gather(h_img, w_img,
                                                       use_mask,
                                                       static_rows,
                                                       monkeypatch):
    """Column-block packing (images wider than 128 texels): the in-kernel
    fetch must reproduce the wavefront atlas gather bitwise on both row
    selects (static unroll and the clamped fori_loop), with and without
    the is-image lane mask feeding the range bounds. ``static_rows`` pins
    IMG_STATIC_ROWS below the image so the clamped path stays covered now
    that the production threshold is 1024 (the static sweep measured 3.9x
    faster at 1024 rows — see the IMG_STATIC_ROWS comment)."""
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    import raytracer_tpu.ops.megakernel as mk
    from raytracer_tpu.ops.megakernel import (_fetch_image, pack_textures,
                                              supports)

    if static_rows is not None:
        monkeypatch.setattr(mk, "IMG_STATIC_ROWS", static_rows)
    rng = np.random.default_rng(11)
    img = rng.uniform(0, 1, (h_img, w_img, 3)).astype(np.float32)
    b = SceneBuilder()
    b.add_sphere((0, 0, 2), 1.0,
                 Material.standard(Texture.from_image(img), 0))
    scene = b.build()
    nb = -(-w_img // 128)
    assert scene.img_rows == h_img * nb and supports(scene)
    planes = pack_textures(scene)

    rows, lanes = 4, 128
    uu = jnp.asarray(rng.uniform(0, 1, (rows, lanes)), jnp.float32)
    vv = jnp.asarray(rng.uniform(0, 1, (rows, lanes)), jnp.float32)
    w = jnp.full((rows, lanes), float(w_img))
    hh = jnp.full((rows, lanes), float(h_img))
    trow = jnp.zeros((rows, lanes))
    def kernel(tex_ref, u_ref, v_ref, w_ref, h_ref, row_ref,
               r_ref, g_ref, b_ref):
        if use_mask:
            # even lanes only: unmasked lanes' texels are still fetched
            # exactly whenever their ty lands inside the masked range, so
            # the assertion below checks only the masked lanes
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
            m = lane_ids % 2 == 0
        else:
            m = None
        r, g, bb = _fetch_image(tex_ref, u_ref[:], v_ref[:], w_ref[:],
                                h_ref[:], row_ref[:],
                                img_rows=scene.img_rows, mask=m)
        r_ref[:] = r
        g_ref[:] = g
        b_ref[:] = bb

    r, g, bch = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, lanes), jnp.float32)
                        for _ in range(3)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(3)),
        interpret=True,
    )(planes, uu, vv, w, hh, trow)

    u_i = np.clip(((w_img - 1.0) * np.asarray(uu)).astype(np.int32),
                  0, w_img - 1)
    v_i = np.clip(((h_img - 1.0) * np.asarray(vv)).astype(np.int32),
                  0, h_img - 1)
    flat = 1 + v_i * w_img + u_i  # atlas slot 0 is the dummy texel
    expect = np.asarray(scene.atlas)[flat]
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(bch)], -1)
    if use_mask:
        sel = np.broadcast_to(np.arange(lanes)[None, :] % 2 == 0,
                              got.shape[:2])
        np.testing.assert_array_equal(got[sel], expect[sel])
    else:
        np.testing.assert_array_equal(got, expect)


def test_fetch_image_hbm_paged_matches_atlas_gather():
    """The HBM-paged texel fetch (plane in ANY memory, IMG_PAGE-row DMA
    bands through a VMEM scratch) must reproduce the atlas gather bitwise —
    same check as the VMEM-resident test, different residency."""
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from raytracer_tpu.models.materials import Material, Texture
    from raytracer_tpu.models.scene import SceneBuilder
    from raytracer_tpu.ops.megakernel import (IMG_PAGE, _fetch_image,
                                              pack_textures)

    h_img, w_img = 96, 1024                 # 768 packed rows -> 2 DMA pages
    rng = np.random.default_rng(13)
    img = rng.uniform(0, 1, (h_img, w_img, 3)).astype(np.float32)
    b = SceneBuilder()
    b.add_sphere((0, 0, 2), 1.0,
                 Material.standard(Texture.from_image(img), 0))
    scene = b.build()
    planes = pack_textures(scene)
    padded = max(IMG_PAGE, -(-scene.img_rows // 8) * 8)
    if padded > planes.shape[0]:
        planes = jnp.pad(planes, ((0, padded - planes.shape[0]), (0, 0)))

    rows, lanes = 4, 128
    uu = jnp.asarray(rng.uniform(0, 1, (rows, lanes)), jnp.float32)
    vv = jnp.asarray(rng.uniform(0, 1, (rows, lanes)), jnp.float32)
    w = jnp.full((rows, lanes), float(w_img))
    hh = jnp.full((rows, lanes), float(h_img))
    trow = jnp.zeros((rows, lanes))

    def kernel(tex_ref, u_ref, v_ref, w_ref, h_ref, row_ref,
               r_ref, g_ref, b_ref, page_ref, sem):
        r, g, bb = _fetch_image(tex_ref, u_ref[:], v_ref[:], w_ref[:],
                                h_ref[:], row_ref[:],
                                img_rows=scene.img_rows, mask=None,
                                page_ref=page_ref, page_sem=sem,
                                img_rows_padded=padded)
        r_ref[:] = r
        g_ref[:] = g
        b_ref[:] = bb

    r, g, bch = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, lanes), jnp.float32)
                        for _ in range(3)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((IMG_PAGE, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        interpret=not ON_TPU,
    )(planes, uu, vv, w, hh, trow)

    u_i = np.clip(((w_img - 1.0) * np.asarray(uu)).astype(np.int32),
                  0, w_img - 1)
    v_i = np.clip(((h_img - 1.0) * np.asarray(vv)).astype(np.int32),
                  0, h_img - 1)
    flat = 1 + v_i * w_img + u_i
    expect = np.asarray(scene.atlas)[flat]
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(bch)], -1)
    np.testing.assert_array_equal(got, expect)


def test_mega_hbm_paged_textures_match_vmem(monkeypatch):
    """End-to-end megakernel render with the texel plane forced onto the
    HBM-paged path (IMG_MAX_ROWS patched below the scene's packed rows)
    must be bitwise identical to the VMEM-resident render: the fetch math
    is the same, only the residency changes."""
    import raytracer_tpu.ops.megakernel as mk
    from raytracer_tpu.models.scenes import procedural_earth_texture
    scene, use_sky = rt.build_scene(
        2, earth_image=procedural_earth_texture(128))   # 256 packed rows
    settings = rt.RenderSettings(rays_per_pixel=6, reflect_limit=3,
                                 sampler="mega").with_sky(use_sky)
    w, h = 64, 32
    cam = build_camera(rt.CameraConfig(width=w, height=h))
    o, d = primary_rays(cam, w, h)
    idx = jnp.arange(w * h, dtype=jnp.int32)

    m_vmem, s_v = render_sample_mean(scene, settings, idx, o, d,
                                     jax.random.key(5), backend="pallas")
    m_vmem = np.asarray(m_vmem)
    monkeypatch.setattr(mk, "IMG_MAX_ROWS", 64)
    assert scene.img_rows > 64 and supports(scene)
    m_hbm, s_h = render_sample_mean(scene, settings, idx, o, d,
                                    jax.random.key(5), backend="pallas")
    np.testing.assert_array_equal(m_vmem, np.asarray(m_hbm))
    assert float(s_v) == float(s_h)


def test_mega_tile_offset_shard_invariance():
    """The sharding contract (SURVEY.md §2.3): megakernel RNG streams are
    keyed by *global* tile id, so rendering a frame in per-shard pieces
    with the correct ``tile_offset`` must be bitwise identical to the
    unsharded render. This is the property make_pixel_sharded_step relies
    on; the CPU mesh exercises it for the wavefront samplers, this test
    pins it for the megakernel itself on every backend."""
    from raytracer_tpu.ops.megakernel import (mega_tile_for,
                                              render_sample_mean_mega)
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3,
                                 sampler="mega").with_sky(use_sky)
    tile = mega_tile_for(scene)
    w, h = 128, 2 * tile // 128  # exactly two megakernel tiles
    cam = build_camera(rt.CameraConfig(width=w, height=h))
    o, d = primary_rays(cam, w, h)
    o3, d3 = o.T, d.T
    key = jax.random.key(5)

    full, segs = render_sample_mean_mega(scene, settings, o3, d3, key)
    lo, s_lo = render_sample_mean_mega(scene, settings, o3[:, :tile],
                                       d3[:, :tile], key, tile_offset=0)
    hi, s_hi = render_sample_mean_mega(scene, settings, o3[:, tile:],
                                       d3[:, tile:], key, tile_offset=1)
    np.testing.assert_array_equal(
        np.asarray(full), np.asarray(jnp.concatenate([lo, hi], axis=1)))
    assert float(segs) == float(s_lo) + float(s_hi)


@pytest.mark.skipif(not ON_TPU, reason="real shard_map+Pallas composition")
def test_mega_under_shard_map_on_tpu():
    """Pixel-sharded step on a real 1-device TPU mesh with sampler='mega':
    the shard_map + Pallas megakernel composition (which the CPU mesh can
    never exercise — mega is TPU/interpret only) must match the unsharded
    render bitwise (VERDICT round-2 item 9)."""
    from raytracer_tpu.ops.integrator import render_frame
    from raytracer_tpu.parallel.mesh import make_mesh, pixel_sharding
    from raytracer_tpu.parallel.shard import make_pixel_sharded_step

    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=2, reflect_limit=3,
                                 sampler="mega").with_sky(use_sky)
    w, h = 128, 64
    cam = build_camera(rt.CameraConfig(width=w, height=h))
    o, d = primary_rays(cam, w, h)
    idx = jnp.arange(w * h, dtype=jnp.int32)
    n = o.shape[0]
    key = jax.random.key(3)

    ref, ref_segs = render_frame(scene, settings, idx, o, d,
                                 jnp.zeros((n, 3)), jnp.int32(0), key,
                                 backend="pallas")

    mesh = make_mesh()
    sh = pixel_sharding(mesh)
    step = make_pixel_sharded_step(mesh, settings, backend="pallas")
    accum = jax.device_put(jnp.zeros((n, 3)), sh)
    out, segs = step(scene, jax.device_put(idx, sh), jax.device_put(o, sh),
                     jax.device_put(d, sh), accum, jnp.int32(0), key)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert float(ref_segs) == float(segs)


@pytest.mark.skipif(not ON_TPU, reason="temporal mode needs the megakernel")
def test_temporal_reprojection_flythrough():
    """Temporal mode: camera moves re-project the accumulated image (with
    per-pixel weights) instead of restarting from black."""
    scene, use_sky = rt.build_scene(1)
    settings = rt.RenderSettings(rays_per_pixel=4, reflect_limit=4
                                 ).with_sky(use_sky)
    cam = rt.CameraConfig(width=64, height=32)
    r = rt.Renderer(scene, cam, settings, temporal=True)
    assert r._temporal
    r.render_frame(block=True)
    r.render_frame(block=True)
    assert r._depth is not None
    # small dolly forward: the warp is deferred (inverse, gather-only) —
    # the next frame pulls history in, so most pixels carry weight > 1
    r.move_camera(rt.CameraConfig(width=64, height=32,
                                  position=(0.0, 0.0, 0.05)))
    assert r._warp_src is not None
    r.render_frame(block=True)
    w = np.asarray(r._wpix)
    assert np.isfinite(np.asarray(r.accum)).all()
    assert (w > 1).mean() > 0.5, f"only {(w > 1).mean():.2f} pixels kept"
    r.render_frame(block=True)
    assert np.isfinite(np.asarray(r.accum)).all()
