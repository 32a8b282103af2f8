"""Generate the committed sample RGB/NIR pair under img/.

The reference checkout ships sample figures under `img/` and every CLI default
assumes assets exist out-of-the-box; this writes a deterministic synthetic
cherry-tomato-style pair (`img/sample_rgb.png`, `img/sample_nir.png`) so
`python predict.py` runs from a clean clone with its defaults.

Usage: python tools/make_sample_pair.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image, ImageDraw

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rng = np.random.Generator(np.random.PCG64(2026))
    w, h = 640, 480
    img = Image.new("RGB", (w, h), (28, 42, 24))
    draw = ImageDraw.Draw(img)
    # leafy background texture
    for _ in range(220):
        x, y = int(rng.integers(0, w)), int(rng.integers(0, h))
        r = int(rng.integers(6, 28))
        g = int(rng.integers(40, 110))
        draw.ellipse([x - r, y - r, x + r, y + r],
                     fill=(int(g * 0.3), g, int(g * 0.25)))
    # tomato bunches: clusters of red spheres
    for cx, cy, n in ((150, 170, 6), (430, 140, 5), (330, 350, 7)):
        for _ in range(n):
            ox, oy = int(rng.integers(-55, 55)), int(rng.integers(-45, 45))
            r = int(rng.integers(18, 34))
            red = int(rng.integers(185, 245))
            draw.ellipse([cx + ox - r, cy + oy - r, cx + ox + r, cy + oy + r],
                         fill=(red, int(rng.integers(25, 70)),
                               int(rng.integers(20, 55))))
            draw.ellipse([cx + ox - r // 3 - 3, cy + oy - r // 3 - 3,
                          cx + ox - r // 3 + 3, cy + oy - r // 3 + 3],
                         fill=(255, 220, 210))
    arr = np.asarray(img, np.float32)
    rgb = np.clip(arr + rng.normal(0, 5, arr.shape), 0, 255).astype(np.uint8)
    # NIR: vegetation bright, fruit darker — grayscale-ish single response
    nir_resp = 0.25 * arr[..., 0] + 0.9 * arr[..., 1] + 0.2 * arr[..., 2]
    nir = np.clip(nir_resp[..., None].repeat(3, -1)
                  + rng.normal(0, 7, arr.shape), 0, 255).astype(np.uint8)
    os.makedirs(os.path.join(REPO, "img"), exist_ok=True)
    Image.fromarray(rgb).save(os.path.join(REPO, "img", "sample_rgb.png"))
    Image.fromarray(nir).save(os.path.join(REPO, "img", "sample_nir.png"))
    print("wrote img/sample_rgb.png img/sample_nir.png")


if __name__ == "__main__":
    sys.exit(main())
