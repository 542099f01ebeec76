"""Export the trained segmentation service as a self-contained serving
artifact (engine/export.py).

    python tools/export_model.py --weights ckpt/weights.npz \
        --dataset voc --branch 1 --batch-size 8 --out dupl_voc.duplsrv

The artifact bakes the weights into the compiled-shape StableHLO program
(multi-scale + flip + branch/ensemble + device CRF); serve it with
``tools/serve.py --artifact dupl_voc.duplsrv``.  ``--platform tpu`` builds a
TPU servable even from a CPU-only host.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dupl_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    from dupl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["voc", "coco"], default="voc")
    p.add_argument("--weights", required=True, help="weights .npz from training")
    p.add_argument("--out", required=True, help="output .duplsrv path")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--branch", default="ensemble",
                   help="1 / 2 (the branch offline eval selected) or "
                        "'ensemble' (mean of both students' logits)")
    p.add_argument("--no-crf", action="store_true")
    p.add_argument("--scales", type=float, nargs="+", default=None)
    p.add_argument("--platform", default=None,
                   help="target platform (default: ambient backend); "
                        "'tpu' works from a CPU host")
    p.add_argument("--no-bake", action="store_true",
                   help="export a (params, images) signature instead of "
                        "baking the weights in")
    p.add_argument("--backbone", default=None,
                   help="override backbone (e.g. test_tiny_patch16 for smoke)")
    p.add_argument("--crop-size", type=int, default=None)
    args = p.parse_args()

    import dataclasses as dc

    from dupl_tpu.config import voc_config, coco_config
    from dupl_tpu.engine.export import export_from_config

    cfg = voc_config() if args.dataset == "voc" else coco_config()
    if args.backbone:
        cfg = dc.replace(cfg, model=dc.replace(cfg.model,
                                               backbone=args.backbone))
    if args.crop_size:
        cfg = dc.replace(cfg, data=dc.replace(cfg.data,
                                              crop_size=args.crop_size))
    # each reference eval driver's own merge protocol (engine/eval_seg.py)
    merge = "max" if args.dataset == "voc" else "sum"
    scales = tuple(args.scales) if args.scales else (
        (1.0, 1.5, 1.25) if args.dataset == "voc" else (1.0, 1.25, 1.5))
    branch = args.branch if args.branch == "ensemble" else int(args.branch)

    meta = export_from_config(
        cfg, args.weights, args.out, batch_size=args.batch_size,
        scales=scales, merge=merge, branch=branch, crf=not args.no_crf,
        platform=args.platform, bake_params=not args.no_bake)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size_mb:.1f} MB)")
    for k in ("platforms", "batch_size", "crop_size", "num_classes",
              "branch", "crf", "input", "output"):
        print(f"  {k}: {meta[k]}")


if __name__ == "__main__":
    main()
