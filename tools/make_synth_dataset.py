"""Create a small synthetic paired-VOC dataset for end-to-end CLI testing.

Images contain bright ellipse "tomato bunches" on dark backgrounds, visible in
both modalities (NIR = channel-shuffled + noised RGB), so a model can actually
learn from them.  Layout matches `voc_annotation_mul.py` expectations.

Usage: python tools/make_synth_dataset.py [out_dir] [n_images]
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

XML = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
{objects}</annotation>
"""
OBJ = """  <object><name>tomato_bunch</name><difficult>0</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>
"""


def main(out_dir: str = "synth_data", n_images: int = 24, size=(480, 360)) -> None:
    rng = np.random.Generator(np.random.PCG64(7))
    base = os.path.join(out_dir, "VOCdevkit", "VOC2007")
    for sub in ("Annotations", "JPEGImages_rgb", "JPEGImages_nir"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "model_data"), exist_ok=True)
    with open(os.path.join(out_dir, "model_data", "voc_classes.txt"), "w") as f:
        f.write("tomato_bunch\n")

    w, h = size
    for i in range(n_images):
        bg = rng.integers(10, 60)
        img = Image.new("RGB", (w, h), (int(bg), int(bg * 1.2), int(bg)))
        draw = ImageDraw.Draw(img)
        objects = []
        for _ in range(int(rng.integers(1, 5))):
            bw, bh = int(rng.integers(40, 120)), int(rng.integers(40, 100))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            color = (int(rng.integers(180, 255)), int(rng.integers(30, 90)),
                     int(rng.integers(30, 90)))
            draw.ellipse([x1, y1, x1 + bw, y1 + bh], fill=color)
            objects.append((x1, y1, x1 + bw, y1 + bh))
        arr = np.asarray(img, np.float32)
        noise = rng.normal(0, 8, arr.shape)
        rgb = np.clip(arr + noise, 0, 255).astype(np.uint8)
        nir = np.clip(arr[..., [2, 0, 1]] * 0.9 + rng.normal(0, 10, arr.shape),
                      0, 255).astype(np.uint8)
        fid = f"{i:06d}"
        Image.fromarray(rgb).save(os.path.join(base, "JPEGImages_rgb", fid + ".jpg"))
        Image.fromarray(nir).save(os.path.join(base, "JPEGImages_nir", fid + ".jpg"))
        # also PNG copies for the get_map CLI (reference reads .png there)
        Image.fromarray(rgb).save(os.path.join(base, "JPEGImages_rgb", fid + ".png"))
        Image.fromarray(nir).save(os.path.join(base, "JPEGImages_nir", fid + ".png"))
        objs = "".join(OBJ.format(x1=o[0], y1=o[1], x2=o[2], y2=o[3])
                       for o in objects)
        with open(os.path.join(base, "Annotations", fid + ".xml"), "w") as f:
            f.write(XML.format(w=w, h=h, objects=objs))
    print(f"wrote {n_images} image pairs under {out_dir}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "synth_data"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    main(out, n)
