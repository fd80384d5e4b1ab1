"""Fidelity anchor: PSNR against the CUDA reference's own shipped render.

The reference repo ships three renders (README.md:5-7). Only ``image0.png``
corresponds to a scene in the current source (scene 0: Cornell box +
Suzanne + mirror sphere, src/main.cu:150-170); image1/image2 predate the
current scene list (a blue-sphere/red-floor scene that no longer exists in
main.cu) and cannot be reproduced from the shipped source.

image0.png is a 990x792 screenshot of the reference's fixed 1000x800 window
(same 1.25 aspect), so we render scene 0 natively at 990x792 in
quirk-faithful mode (no gamma, emissive non-termination, per-bounce
direction-jitter AA — SURVEY.md §5.1) and compare u8-to-u8.

The pass bound is Monte-Carlo-aware: we also render the same scene with a
different seed and report self-PSNR at the same sample count — the noise
floor two independent renders of the *same* program exhibit. The reference
screenshot's own accumulation depth is unknown, so PSNR(ours vs CUDA) is
expected to sit at or below the self-PSNR, dominated by whichever image is
noisier.

Usage: python benchmarks/fidelity.py [frames=40] [--write-doc]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import raytracer_tpu as rt

REF_IMAGE = "/root/reference/images/image0.png"


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def render_scene0(frames: int, seed: int, reflect_limit: int = 5,
                  antialias: bool = True, **scene_kwargs) -> np.ndarray:
    scene, use_sky = rt.build_scene(0, **scene_kwargs)
    settings = rt.RenderSettings(rays_per_pixel=100,
                                 reflect_limit=reflect_limit,
                                 antialias=antialias).with_sky(use_sky)
    cam = rt.CameraConfig(width=990, height=792)
    r = rt.Renderer(scene, cam, settings, seed=seed)
    r.render_frame(block=True)
    r.render_frames(frames - 1)
    return r.image()


def fit_gain(ours: np.ndarray, ref: np.ndarray):
    """Per-channel least-squares gain g: ref ~ g * ours. Returns (g, psnr)."""
    a = ours.astype(np.float64)
    b = ref.astype(np.float64)
    g = np.array([(a[..., c] * b[..., c]).sum() / (a[..., c] ** 2).sum()
                  for c in range(3)])
    corrected = np.clip(a * g, 0, 255)
    return g, psnr(corrected, b)


def fit_gain_gamma(ours: np.ndarray, ref: np.ndarray):
    """Global (gain, gamma): ref/255 ~ g * (ours/255)^gamma, gamma by grid
    search with the closed-form least-squares gain at each point."""
    a = ours.astype(np.float64) / 255.0
    b = ref.astype(np.float64) / 255.0
    best = (1.0, 1.0, -1.0)
    for gamma in np.arange(0.50, 1.51, 0.02):
        ag = a ** gamma
        g = (ag * b).sum() / (ag * ag).sum()
        p = psnr(np.clip(ag * g, 0, 1) * 255.0, b * 255.0)
        if p > best[2]:
            best = (float(gamma), float(g), p)
    return best


def ablate(frames: int) -> None:
    """Quantify the radiometry-gap hypotheses against image0.png.

    H1 (reference UB): src/material.cu:170 never sets emissive smoothness,
    so the post-emission bounce (src/raytracer.cu:56-58 + ray.cu:67-75)
    lerps diffuse->specular by an uninitialised value. Render smoothness
    0 vs 1 and measure the PSNR reach of the entire UB range.
    H2 (capture transform): the screenshot may have passed through a
    display/colour pipeline. Fit a global per-channel gain and a global
    (gain, gamma) and report the corrected PSNR — if a smooth 2-parameter
    transform recovers most of the gap, the gap is radiometric scaling,
    not structure.
    """
    from PIL import Image
    ref = np.asarray(Image.open(REF_IMAGE).convert("RGB"))

    print(f"# fidelity ablation, scene 0 @ 990x792, {frames * 100} spp")
    results = {}
    for name, s in (("em_smooth=0", 0.0), ("em_smooth=1", 1.0)):
        img = render_scene0(frames, seed=0, emissive_smoothness=s)
        raw = psnr(img, ref)
        g, p_gain = fit_gain(img, ref)
        gamma, gg, p_gg = fit_gain_gamma(img, ref)
        mean = img.reshape(-1, 3).mean(axis=0)
        results[name] = (img, raw, g, p_gain, gamma, gg, p_gg, mean)
        print(f"{name}: raw {raw:.2f} dB | mean rgb "
              f"{mean[0]:.1f}/{mean[1]:.1f}/{mean[2]:.1f} "
              f"(ref {ref.reshape(-1, 3).mean(axis=0).round(1)})")
        print(f"  gain fit  g=({g[0]:.3f},{g[1]:.3f},{g[2]:.3f})"
              f" -> {p_gain:.2f} dB")
        print(f"  gain+gamma fit gamma={gamma:.2f} g={gg:.3f}"
              f" -> {p_gg:.2f} dB")
    a = results["em_smooth=0"][0].astype(np.float64)
    b = results["em_smooth=1"][0].astype(np.float64)
    print(f"UB reach (smooth 0 vs 1 renders): {psnr(a, b):.2f} dB, "
          f"mean |delta| {np.abs(a - b).mean():.2f}/255")


def ablate_bounces(frames: int) -> None:
    """H3: the screenshot's reflect_limit is unknown — the reference names
    it a changeable setting (src/main.cu:318-330, default 5). In a closed
    box with quirk-faithful emissive non-termination, bounces past 5 keep
    adding energy exactly where the residual sits (the light glow), so
    sweep the limit and see whether raw/corrected PSNR vs image0.png rises.
    An antialias=off arm rides along (the per-bounce direction jitter is
    the other named-changeable knob that shifts pixel statistics).
    """
    from PIL import Image
    ref = np.asarray(Image.open(REF_IMAGE).convert("RGB"))
    rmean = ref.reshape(-1, 3).mean(axis=0)

    print(f"# bounce-limit ablation, scene 0 @ 990x792, {frames * 100} spp")
    print(f"ref mean rgb {rmean[0]:.1f}/{rmean[1]:.1f}/{rmean[2]:.1f}")
    for name, kw in (
        ("bounces=5 (default)", dict(reflect_limit=5)),
        ("bounces=8", dict(reflect_limit=8)),
        ("bounces=12", dict(reflect_limit=12)),
        ("bounces=20", dict(reflect_limit=20)),
        ("bounces=5, antialias=off", dict(reflect_limit=5, antialias=False)),
    ):
        img = render_scene0(frames, seed=0, **kw)
        raw = psnr(img, ref)
        gamma, gg, p_gg = fit_gain_gamma(img, ref)
        mean = img.reshape(-1, 3).mean(axis=0)
        print(f"{name}: raw {raw:.2f} dB | gain+gamma "
              f"(gamma={gamma:.2f}, g={gg:.3f}) -> {p_gg:.2f} dB | "
              f"mean rgb {mean[0]:.1f}/{mean[1]:.1f}/{mean[2]:.1f}",
              flush=True)


def main() -> None:
    from PIL import Image
    frames = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 40
    if "--ablate-bounces" in sys.argv:
        ablate_bounces(frames)
        return
    if "--ablate" in sys.argv:
        ablate(frames)
        return
    ref = np.asarray(Image.open(REF_IMAGE).convert("RGB"))

    ours_a = render_scene0(frames, seed=0)
    ours_b = render_scene0(frames, seed=1)

    p_ref = psnr(ours_a, ref)
    p_self = psnr(ours_a, ours_b)

    # content region = the lit box interior (the surround is black in both)
    nz = ref.sum(axis=2) > 6
    rows = np.where(nz.any(axis=1))[0]
    cols = np.where(nz.any(axis=0))[0]
    box = (slice(rows.min(), rows.max() + 1),
           slice(cols.min(), cols.max() + 1))
    p_ref_box = psnr(ours_a[box], ref[box])
    p_self_box = psnr(ours_a[box], ours_b[box])

    spp = frames * 100
    print(f"scene 0 @ 990x792, {spp} spp accumulated")
    print(f"PSNR vs CUDA reference render : {p_ref:6.2f} dB "
          f"(box interior {p_ref_box:6.2f} dB)")
    print(f"PSNR self (seed 0 vs seed 1)  : {p_self:6.2f} dB "
          f"(box interior {p_self_box:6.2f} dB)")

    Image.fromarray(ours_a).save("/tmp/fidelity_scene0.png")

    if "--write-doc" in sys.argv:
        doc = f"""# FIDELITY — match against the CUDA reference's renders

The reference ships three renders (`/root/reference/images/image{{0,1,2}}.png`,
README.md:5-7). Only `image0.png` is reproducible from the shipped source:
it shows scene 0 (Cornell box + Suzanne + mirror sphere, src/main.cu:150-170)
as a 990x792 screenshot of the 1000x800 window (same 1.25 aspect).
`image1.png`/`image2.png` show a blue-sphere-on-red-floor scene that exists
nowhere in the current `main.cu` scene list — they predate it and have no
ground truth in the source, so no comparison is possible.

## Method

Scene 0 rendered natively at 990x792 in quirk-faithful mode (no gamma
correction, emissive non-termination, per-bounce direction-jitter AA —
SURVEY.md §5.1), accumulated to {spp} spp, converted to u8 exactly as the
reference does (clamp, no gamma, src/main.cu:343-371), compared u8-to-u8.
The Monte-Carlo bound is the self-PSNR of two independent renders of this
framework at the same sample count (different seeds) — the best any
noise-limited comparison can do. The reference screenshot's own
accumulation depth is unknown and its grain is visible, so it contributes
additional irreducible noise to the cross comparison.

## Results (one TPU v5e chip)

| comparison | full frame | box interior |
|---|---|---|
| ours vs CUDA reference (`image0.png`) | **{p_ref:.2f} dB** | {p_ref_box:.2f} dB |
| ours seed-0 vs ours seed-1 (noise floor) | {p_self:.2f} dB | {p_self_box:.2f} dB |

Interpretation: see the committed docs/FIDELITY.md analysis — geometry and
composition align edge-exactly; absolute radiometry differs systematically
(the screenshot's accumulation depth, capture transform and code version
are unknown, and image1/image2 demonstrably predate the shipped source).
A mirrored-image comparison calibrates what structural breakage looks like;
`tests/test_fidelity.py` is the automated guard.

Reproduce: `python benchmarks/fidelity.py {frames} --write-doc`
"""
        with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                               "FIDELITY.md"), "w") as f:
            f.write(doc)
        print("wrote docs/FIDELITY.md")


if __name__ == "__main__":
    main()
