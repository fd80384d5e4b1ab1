#!/usr/bin/env python
"""Generate the checked-in earth image asset (assets/earth.png) and pack it
into the runtime texture library (assets/textures.npz).

The reference's scene 2 samples a real raster earth image
(/root/reference/src/main.cu:40-91) whose converted form is gitignored
(quirk #10 in SURVEY.md §5.1), so a fresh clone of the reference cannot
render it. Here the asset itself is checked in: this script synthesises a
deterministic, longitude-wrapping earth-like planet image (seeded value-noise
fBm continents, ocean depth shading, latitude climate bands, polar ice) and
routes it through the SAME offline pipeline a user's own photo would take —
``assets/earth.png`` -> ``utils.image.convert_textures`` ->
``assets/textures.npz`` -> ``TextureLibrary.get("earth.png")`` at scene
build (models/scenes.py texture_test_scene).

Deterministic: re-running reproduces the committed asset bit-for-bit.

Usage: python scripts/make_earth_asset.py [--height 256]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytracer_tpu.utils.image import convert_textures  # noqa: E402


def _value_noise(shape, cells_y, cells_x, rng):
    """Periodic-in-x value noise upsampled with cosine interpolation."""
    grid = rng.random((cells_y + 1, cells_x), dtype=np.float64)
    grid = np.concatenate([grid, grid[:, :1]], axis=1)  # wrap longitude
    h, w = shape
    y = np.linspace(0, cells_y, h, endpoint=False)
    x = np.linspace(0, cells_x, w, endpoint=False)
    yi = np.floor(y).astype(int)
    xi = np.floor(x).astype(int)
    yf = (1 - np.cos(np.pi * (y - yi))) / 2
    xf = (1 - np.cos(np.pi * (x - xi))) / 2
    g00 = grid[np.ix_(yi, xi)]
    g01 = grid[np.ix_(yi, xi + 1)]
    g10 = grid[np.ix_(yi + 1, xi)]
    g11 = grid[np.ix_(yi + 1, xi + 1)]
    top = g00 * (1 - xf) + g01 * xf
    bot = g10 * (1 - xf) + g11 * xf
    return top * (1 - yf[:, None]) + bot * yf[:, None]


def _fbm(shape, octaves, base_cells, rng):
    out = np.zeros(shape)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        cells = base_cells * (2 ** o)
        out += amp * _value_noise(shape, cells, 2 * cells, rng)
        total += amp
        amp *= 0.55
    return out / total


def make_earth(height: int = 256, seed: int = 1969) -> np.ndarray:
    """(height, 2*height, 3) uint8 earth-like equirectangular image."""
    h, w = height, 2 * height
    rng = np.random.default_rng(seed)

    elev = _fbm((h, w), octaves=6, base_cells=3, rng=rng)
    detail = _fbm((h, w), octaves=5, base_cells=12, rng=rng)

    lat = np.linspace(-np.pi / 2, np.pi / 2, h)[:, None]  # -90..90 deg
    coslat = np.cos(lat)

    # Continents: fBm thresholded, slightly more land near mid-latitudes.
    land_field = elev + 0.08 * (coslat - 0.5)
    sea_level = np.quantile(land_field, 0.62)  # ~38% land
    land = land_field > sea_level

    # Ocean: depth-shaded blue, brighter in shallows near coasts.
    depth = np.clip((sea_level - land_field) / 0.25, 0, 1)
    ocean = (np.array([0.16, 0.35, 0.62])[None, None] * (1 - depth[..., None])
             + np.array([0.04, 0.10, 0.33])[None, None] * depth[..., None])

    # Land: climate by latitude — equatorial green, subtropical tan,
    # temperate forest, subpolar tundra; altitude lightens toward rock.
    alt = np.clip((land_field - sea_level) / (land_field.max() - sea_level),
                  0, 1)
    absl = np.abs(lat) / (np.pi / 2)  # 0 equator .. 1 pole
    tropics = np.exp(-((absl - 0.0) / 0.25) ** 2)
    desert = np.exp(-((absl - 0.35) / 0.12) ** 2) * (0.5 + 0.5 * detail)
    temperate = np.exp(-((absl - 0.6) / 0.18) ** 2)
    tundra = np.clip((absl - 0.75) / 0.2, 0, 1)
    wsum = tropics + desert + temperate + tundra + 1e-6
    base = (tropics[..., None] * np.array([0.13, 0.42, 0.15])
            + desert[..., None] * np.array([0.66, 0.55, 0.33])
            + temperate[..., None] * np.array([0.22, 0.38, 0.16])
            + tundra[..., None] * np.array([0.55, 0.52, 0.45])) / wsum[..., None]
    rock = np.array([0.52, 0.47, 0.42])
    landcol = base * (1 - 0.55 * alt[..., None] ** 2) \
        + rock[None, None] * (0.55 * alt[..., None] ** 2)
    landcol *= (0.85 + 0.3 * detail[..., None])

    img = np.where(land[..., None], landcol, ocean)

    # Polar ice caps: smooth threshold on |lat| modulated by noise; plus
    # high-altitude snow.
    ice = np.clip((absl - (0.88 - 0.06 * detail)) / 0.04, 0, 1)
    snow = np.clip((alt - 0.85) / 0.1, 0, 1) * land
    white = np.array([0.93, 0.95, 0.97])[None, None]
    frost = np.maximum(ice, snow)[..., None]
    img = img * (1 - frost) + white * frost

    # Subtle cloud veil (keeps the texture photo-like without hiding land).
    clouds = np.clip(_fbm((h, w), octaves=5, base_cells=5, rng=rng) - 0.55,
                     0, 1) * 1.6
    img = img * (1 - 0.5 * clouds[..., None]) + 0.5 * clouds[..., None]

    return (np.clip(img, 0, 1) * 255).round().astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets"))
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    img = make_earth(args.height)
    png = os.path.join(args.out_dir, "earth.png")
    from PIL import Image
    Image.fromarray(img).save(png, optimize=True)
    n = convert_textures(args.out_dir, os.path.join(args.out_dir,
                                                    "textures.npz"))
    print(f"wrote {png} ({img.shape[1]}x{img.shape[0]}) and packed "
          f"{n} texture(s) into textures.npz")


if __name__ == "__main__":
    main()
