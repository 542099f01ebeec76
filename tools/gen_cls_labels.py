"""Regenerate ``cls_labels_onehot.npy`` (image name -> multi-hot foreground
label vector) from segmentation masks.

The reference ships this file for VOC but its COCO counterpart is stripped
from the snapshot (SURVEY.md §2.6); this tool rebuilds either from the mask
directory so the datasets never need it at train time.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["voc", "coco"], required=True)
    p.add_argument("--data-folder", required=True)
    p.add_argument("--label-folder", default=None,
                   help="mask root (defaults: VOC SegmentationClassAug / "
                        "COCO ../SegmentationClass)")
    p.add_argument("--list-folder", required=True)
    p.add_argument("--splits", nargs="+", default=None)
    args = p.parse_args()

    from dupl_tpu.data.voc import onehot_from_mask

    if args.dataset == "voc":
        num_classes = 21
        splits = args.splits or ["train_aug", "val"]
        label_root = args.label_folder or os.path.join(
            args.data_folder, "SegmentationClassAug")

        def mask_path(name):
            return os.path.join(label_root, name + ".png")
    else:
        num_classes = 81
        splits = args.splits or ["train", "val", "val_part"]
        label_root = args.label_folder or os.path.join(
            os.path.dirname(args.data_folder.rstrip("/")), "SegmentationClass")

        def mask_path(name):
            sub = "train2014" if "train" in name else "val2014"
            return os.path.join(label_root, sub, name + ".png")

    table = {}
    for split in splits:
        names = [x.strip() for x in
                 open(os.path.join(args.list_folder, split + ".txt")) if x.strip()]
        for name in names:
            if name in table:
                continue
            mask = np.asarray(Image.open(mask_path(name)))
            table[name] = onehot_from_mask(mask, num_classes).astype(np.uint8)
        print(f"{split}: {len(names)} images")

    out = os.path.join(args.list_folder, "cls_labels_onehot.npy")
    np.save(out, table, allow_pickle=True)
    print(f"wrote {out} ({len(table)} entries)")


if __name__ == "__main__":
    main()
