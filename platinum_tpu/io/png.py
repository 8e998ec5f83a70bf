"""PNG export with embedded ICC profile.

Parity with the reference's export path (pt_viewport.cpp:559-615: lodepng +
lodepng_set_icc): 8-bit RGBA PNG tagged with the output colorspace's ICC
profile so color-managed viewers display renders correctly.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from platinum_tpu.io.icc import profile_for


def write_png(path: str, image: np.ndarray, output_space: str = "sRGB"):
    """image: (H, W, 3|4) uint8 (already display-encoded) or float in [0,1]
    (will be quantized; assumed already gamma-encoded by the tonemap)."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    mode = "RGBA" if img.shape[2] == 4 else "RGB"
    Image.fromarray(img, mode).save(path, icc_profile=profile_for(output_space))


def read_png(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGBA"))
