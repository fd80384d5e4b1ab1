"""Image IO and the texture asset pipeline.

TPU-native replacement for the reference's offline texture converter
(textures/parse_textures.py) and its runtime counterpart ``ImageTexture``
(src/main.cu:40-91). The reference converts every PNG/JPG into a giant text
file of floats and linearly scans it at startup; here the offline step packs
decoded images into one compressed ``.npz`` library, loaded lazily by name.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def save_png(path: str, image_u8: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray(image_u8).save(path)


def load_image(path: str) -> np.ndarray:
    """Decode an image file to (H, W, 3) float32 in [0, 1].

    Matches the converter's /256 normalisation (textures/parse_textures.py:35).
    """
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return (np.asarray(img, np.float32) / 256.0).astype(np.float32)


def convert_textures(src_dir: str, out_path: str) -> int:
    """Offline texture conversion: every png/jpg in ``src_dir`` -> one npz.

    Replacement for parse_textures.py (textures/parse_textures.py:61-67);
    returns the number of textures packed.
    """
    arrays: Dict[str, np.ndarray] = {}
    for name in sorted(os.listdir(src_dir)):
        if os.path.splitext(name)[1].lower() in (".png", ".jpg", ".jpeg"):
            arrays[name] = load_image(os.path.join(src_dir, name))
    np.savez_compressed(out_path, **arrays)
    return len(arrays)


class TextureLibrary:
    """Runtime texture lookup by filename (the ImageTexture analog,
    src/main.cu:40-91, including its file-not-found error)."""

    def __init__(self, path: str):
        self._npz = np.load(path)

    def names(self):
        return list(self._npz.files)

    def get(self, filename: str) -> np.ndarray:
        if filename not in self._npz.files:
            raise FileNotFoundError("Image file not found.")
        return self._npz[filename]


def find_texture_library(explicit: Optional[str] = None) -> Optional[str]:
    for p in (explicit, os.environ.get("RAYTRACER_TEXTURES"),
              os.path.join(os.path.dirname(__file__), "..", "..", "assets",
                           "textures.npz")):
        if p and os.path.exists(p):
            return p
    return None
