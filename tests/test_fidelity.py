"""Fidelity guard against the CUDA reference's shipped render.

Compares a low-res quirk-faithful render of scene 0 against a downscaled
``/root/reference/images/image0.png`` (the only shipped render reproducible
from the reference source — see docs/FIDELITY.md). Pinned to the H3
best-explanation anchor (docs/TESTLOG.md session 8, VERDICT round-4 item 6):
the screenshot behaves like a ``reflect_limit ~= 8`` render — reflect_limit
is one of the reference's named changeable settings (src/main.cu:318-330) —
so rendered at bounces=8 the RAW comparison lands at ~21.9 dB and the
best-fit global (gain, gamma) transform collapses to ~identity
(measured gamma 0.96-0.98, gain 1.03 at these test settings). The guard
asserts both: raw PSNR with margin, and the fitted transform staying near
identity — a radiometric drift would move the fit away from (1, 1) long
before it dents the mirrored-image structural floor (~12 dB).
Skipped when the reference images are absent.
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

    from benchmarks.fidelity import fit_gain_gamma
    w, h = 165, 132  # 990x792 / 6, same 1.25 aspect as the reference window
    scene, use_sky = rt.build_scene(0)
    # reflect_limit=8: the H3 anchor (the shipped default is 5; 8 is the
    # value the screenshot's energy matches — see module docstring).
    settings = rt.RenderSettings(rays_per_pixel=24, reflect_limit=8,
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
    # Measured at these settings (seeds 0/1): raw 21.81 / 21.95 dB.
    assert p > 20.5, f"raw PSNR vs CUDA reference too low: {p:.2f} dB"

    # The best-fit global transform ref/255 ~ g * (ours/255)^gamma must be
    # near identity: measured gamma 0.96/0.98, g 1.029/1.036. A wall-colour
    # or light-strength regression shows up here as a fitted gain/gamma
    # excursion even when raw PSNR survives.
    gamma, g, p_fit = fit_gain_gamma(ours_s, ref_s)
    assert abs(gamma - 1.0) <= 0.10, (
        f"fitted gamma {gamma:.2f} drifted from identity (raw {p:.2f} dB)")
    assert abs(g - 1.0) <= 0.10, (
        f"fitted gain {g:.3f} drifted from identity (raw {p:.2f} dB)")
    assert p_fit >= p - 0.01  # the fit can only explain variance away

    # sanity: a structurally broken image (mirrored) must score much worse
    p_broken = _psnr(ours_s[:, ::-1], ref_s)
    assert p > p_broken + 3.0, (p, p_broken)
