"""Dataset prep CLI — counterpart of `voc_annotation_mul.py`.

annotation_mode: 0 = splits + annotation files, 1 = ImageSets splits only,
2 = `2007_train.txt`/`2007_val.txt` only.  Split sampling matches the
reference's `random.seed(0)` protocol.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--annotation-mode", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--classes-path", default="model_data/voc_classes.txt")
    p.add_argument("--trainval-percent", type=float, default=0.9)
    p.add_argument("--train-percent", type=float, default=0.9)
    p.add_argument("--vocdevkit-path", default="VOCdevkit")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from dcfa_yolo_tpu.data.voc import (
        generate_annotation_files,
        generate_imagesets,
    )

    if args.annotation_mode in (0, 1):
        print("Generate txt in ImageSets.")
        sizes = generate_imagesets(args.vocdevkit_path, args.trainval_percent,
                                   args.train_percent, args.seed)
        print("train and val size", sizes["trainval"])
        print("train size", sizes["train"])
        print("Generate txt in ImageSets done.")

    if args.annotation_mode in (0, 2):
        print("Generate 2007_train.txt and 2007_val.txt for train.")
        generate_annotation_files(args.vocdevkit_path, args.classes_path)
        print("Generate 2007_train.txt and 2007_val.txt for train done.")


if __name__ == "__main__":
    main()
