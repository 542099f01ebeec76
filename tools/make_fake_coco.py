"""Synthetic MS-COCO-2014-layout tree for smoke tests / dry runs.

Mirrors the on-disk layout the COCO datasets expect (data/coco.py, matching
the reference's datasets/coco.py:61-71): images split across
``train2014``/``val2014`` subdirectories keyed by the name prefix, masks
under a sibling ``SegmentationClass/{train2014,val2014}``, name lists +
``cls_labels_onehot.npy`` under ``lists/``:

    out/
      coco2014/{train2014,val2014}/COCO_<sub>_NNNNNNNNNNNN.jpg
      SegmentationClass/{train2014,val2014}/....png
      lists/{train,val,val_part}.txt + cls_labels_onehot.npy

``--data-folder`` for the tools is ``out/coco2014``.  One val image is
written as a GRAYSCALE jpeg to exercise the robust_read_image promotion
(reference coco.py:24-28).  Scenes come from the same generators as the VOC
tree (blobs, or ``--style photo`` for 1/f+JPEG natural statistics).
"""

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.make_fake_voc import render_scene  # noqa: E402


def make_tree(out: str, n_train: int = 8, n_val: int = 4, size: int = 96,
              num_fg: int = 80, seed: int = 0, style: str = "blob") -> str:
    root = os.path.join(out, "coco2014")
    seg_root = os.path.join(out, "SegmentationClass")
    lists = os.path.join(out, "lists")
    os.makedirs(lists, exist_ok=True)

    rs = np.random.RandomState(seed)
    labels = {}
    names = {"train2014": [], "val2014": []}
    for sub, count in (("train2014", n_train), ("val2014", n_val)):
        img_dir = os.path.join(root, sub)
        seg_dir = os.path.join(seg_root, sub)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(seg_dir, exist_ok=True)
        for i in range(count):
            name = f"COCO_{sub}_{i:012d}"
            img, mask = render_scene(rs, size, size, num_fg, style)
            pil = Image.fromarray(img)
            if sub == "val2014" and i == 0:
                pil = pil.convert("L")  # grayscale jpeg: robust-read path
            pil.save(os.path.join(img_dir, name + ".jpg"))
            Image.fromarray(mask).save(os.path.join(seg_dir, name + ".png"))
            onehot = np.zeros(num_fg, np.uint8)
            present = np.unique(mask)
            onehot[present[(present > 0) & (present <= num_fg)] - 1] = 1
            labels[name] = onehot
            names[sub].append(name)

    with open(os.path.join(lists, "train.txt"), "w") as f:
        f.write("\n".join(names["train2014"]) + "\n")
    for split in ("val", "val_part"):
        with open(os.path.join(lists, split + ".txt"), "w") as f:
            f.write("\n".join(names["val2014"]) + "\n")
    np.save(os.path.join(lists, "cls_labels_onehot.npy"), labels,
            allow_pickle=True)
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n-train", type=int, default=8)
    p.add_argument("--n-val", type=int, default=4)
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--num-fg", type=int, default=80)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--style", default="blob", choices=["blob", "photo"])
    args = p.parse_args()
    root = make_tree(args.out, n_train=args.n_train, n_val=args.n_val,
                     size=args.size, num_fg=args.num_fg, seed=args.seed,
                     style=args.style)
    print(f"fake COCO tree at {args.out} (data folder: {root}; "
          f"{args.n_train}+{args.n_val} images, {args.size}px, {args.style})")


if __name__ == "__main__":
    main()
