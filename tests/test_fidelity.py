"""Fidelity guard against the CUDA reference's shipped render.

Compares a low-res quirk-faithful render of scene 0 against a downscaled
``/root/reference/images/image0.png`` (the only shipped render reproducible
from the reference source — see docs/FIDELITY.md). The threshold is far
above what any structural mismatch (wrong wall colour, flipped UV, wrong
light strength, broken mirror) can reach, while comfortably below the
Monte-Carlo noise of the low sample count, so the test is stable yet
catches real regressions. Skipped when the reference images are absent.
"""

import os

import numpy as np
import pytest

import raytracer_tpu as rt

REF_IMAGE = "/root/reference/images/image0.png"


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10.0 * np.log10(255.0 ** 2 / mse)


@pytest.mark.skipif(not os.path.exists(REF_IMAGE),
                    reason="reference render not available")
def test_scene0_matches_reference_render():
    from PIL import Image
    w, h = 165, 132  # 990x792 / 6, same 1.25 aspect as the reference window
    scene, use_sky = rt.build_scene(0)
    settings = rt.RenderSettings(rays_per_pixel=24, reflect_limit=5,
                                 antialias=True).with_sky(use_sky)
    r = rt.Renderer(scene, rt.CameraConfig(width=w, height=h), settings)
    r.render_frame(block=True)
    ours = r.image()

    # Compare 3x box-downscaled: averaging 9 pixels knocks ~9.5 dB off the
    # low-spp Monte-Carlo noise while structural errors (wrong wall colour,
    # flipped geometry, broken mirror) survive downscaling unchanged.
    dw, dh = w // 3, h // 3
    ref_s = np.asarray(Image.open(REF_IMAGE).convert("RGB").resize(
        (dw, dh), Image.Resampling.BOX))
    ours_s = np.asarray(Image.fromarray(ours).resize(
        (dw, dh), Image.Resampling.BOX))

    p = _psnr(ours_s, ref_s)
    # The raw comparison carries a systematic global radiometric offset
    # quantified in docs/FIDELITY.md: the screenshot is brighter by a
    # smooth gamma-like transform (fitted once at 4000 spp:
    # ref ~ 255 * 1.038 * (ours/255)^0.80; emissive-smoothness UB was
    # measured at only ~0.5% mean and is NOT the cause). Applying that
    # fixed transform removes the known scale difference so the bound can
    # sit >= 2 dB below the measured value (21.5 dB at these settings)
    # while still catching every structural error (mirrored scores ~12 dB).
    ours_c = np.clip(255.0 * 1.038 * (ours_s / 255.0) ** 0.80, 0, 255)
    p_corr = _psnr(ours_c, ref_s)
    # sanity: a structurally broken image (mirrored) must score much worse
    p_broken = _psnr(ours_s[:, ::-1], ref_s)
    assert p_corr > 19.4, (
        f"gain/gamma-corrected PSNR vs CUDA reference too low: "
        f"{p_corr:.2f} dB (raw {p:.2f})")
    assert p > 17.0, f"raw PSNR vs CUDA reference too low: {p:.2f} dB"
    assert p > p_broken + 3.0, (p, p_broken)
