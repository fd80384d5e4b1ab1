"""Checked-in texture asset tests (VERDICT round-3 item 4).

The reference's scene 2 needs a gitignored parsed_textures.txt generated
offline from earth.png (src/main.cu:40-91, quirk #10) — a fresh clone
cannot render it. Here the asset ships with the repo: a fresh clone must
render scene 2 with the real image texture, no env vars."""

import os

import numpy as np

import raytracer_tpu as rt
from raytracer_tpu.utils.image import (TextureLibrary, find_texture_library,
                                       load_image)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSETS = os.path.join(REPO, "assets")


def test_asset_files_checked_in():
    assert os.path.exists(os.path.join(ASSETS, "earth.png"))
    assert os.path.exists(os.path.join(ASSETS, "textures.npz"))


def test_library_matches_png():
    """The packed npz is exactly the PNG through the offline converter
    (utils/image.py convert_textures == parse_textures.py analog)."""
    lib = TextureLibrary(find_texture_library())
    packed = lib.get("earth.png")
    raw = load_image(os.path.join(ASSETS, "earth.png"))
    assert packed.shape == (256, 512, 3)
    np.testing.assert_array_equal(packed, raw)


def test_scene2_defaults_to_real_asset():
    """build_scene(2) with no args picks up the checked-in library image —
    1024 packed texel rows (256x512 in 4 column blocks), not the 64-row
    procedural stand-in."""
    scene, _ = rt.build_scene(2)
    assert scene.has_image_tex
    assert scene.img_rows == 1024


def test_asset_generator_is_deterministic():
    """scripts/make_earth_asset.py regenerates the committed image
    bit-for-bit (the asset is reviewable + reproducible, never stale)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_earth_asset", os.path.join(REPO, "scripts",
                                         "make_earth_asset.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    regen = mod.make_earth(256)
    from PIL import Image
    committed = np.asarray(Image.open(os.path.join(ASSETS, "earth.png"))
                           .convert("RGB"))
    np.testing.assert_array_equal(regen, committed)
