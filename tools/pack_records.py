"""Pack a dataset split into a ``.duplrec`` shard (see
dupl_tpu/data/records.py).

    python tools/pack_records.py --dataset voc --data-folder /data/VOC2012 \
        --list-folder datasets/voc --split train_aug --out voc_train.duplrec

Training/eval then take ``--records voc_train.duplrec`` instead of the
directory flags — one sequential shard instead of ~10k tiny files.
"""

import argparse

from dupl_tpu.data import records


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["voc", "coco"], default="voc")
    p.add_argument("--data-folder", required=True)
    p.add_argument("--list-folder", required=True)
    p.add_argument("--split", required=True,
                   help="name-list file stem, e.g. train_aug / val / train")
    p.add_argument("--out", required=True, help="output .duplrec path")
    p.add_argument("--label-folder", default=None,
                   help="COCO mask root (default: sibling SegmentationClass)")
    p.add_argument("--no-masks", action="store_true",
                   help="skip packing segmentation masks (cls-only training)")
    p.add_argument("--no-cls", action="store_true",
                   help="skip embedding image-level one-hot labels")
    p.add_argument("--shards", type=int, default=1,
                   help="split the output into N contiguous shard files "
                        "(-NNNNN-of-NNNNN suffix); read back with a glob")
    args = p.parse_args()

    if args.dataset == "voc":
        n = records.pack_voc(args.data_folder, args.list_folder, args.split,
                             args.out, with_labels=not args.no_masks,
                             with_cls=not args.no_cls, shards=args.shards)
    else:
        n = records.pack_coco(args.data_folder, args.list_folder, args.split,
                              args.out, label_folder=args.label_folder,
                              with_labels=not args.no_masks,
                              with_cls=not args.no_cls, shards=args.shards)
    print(f"packed {n} samples ({args.dataset}/{args.split}) -> {args.out}"
          + (f" ({args.shards} shards)" if args.shards > 1 else ""))


if __name__ == "__main__":
    main()
