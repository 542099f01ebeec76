"""Grayscale class-index PNGs -> VOC-palette PNGs for the official evaluation
server (reference: tools/convert_test_seg.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from dupl_tpu.utils.colormap import save_indexed_png


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True, help="directory of class-index PNGs")
    p.add_argument("--target-dir", required=True)
    args = p.parse_args()

    os.makedirs(args.target_dir, exist_ok=True)
    names = [n for n in os.listdir(args.dir) if n.endswith(".png")]
    for n in names:
        label = np.asarray(Image.open(os.path.join(args.dir, n)))
        save_indexed_png(os.path.join(args.target_dir, n), label)
    print(f"converted {len(names)} masks -> {args.target_dir}")


if __name__ == "__main__":
    main()
