"""Offline segmentation evaluation CLI (reference: tools/eval_seg_voc.py,
tools/eval_seg_coco_ddp.py — one script; pick ``--dataset``).

Multi-scale + flip inference, branch selection by raw mIoU, CRF
post-processing (device mean-field by default; ``--crf native`` uses the
C++ permutohedral oracle at native resolution).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    from dupl_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    from dupl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["voc", "coco"], default="voc")
    p.add_argument("--data-folder", default=None,
                   help="dataset directory tree (or --records packed shard)")
    p.add_argument("--records", default=None,
                   help=".duplrec shard for the eval split "
                        "(tools/pack_records.py); replaces --data-folder")
    p.add_argument("--list-folder", default=None)
    p.add_argument("--label-folder", default=None, help="COCO masks root")
    p.add_argument("--weights", default=None, help="weights .npz from training")
    p.add_argument("--infer-set", default=None, help="val / test / val_part")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--crf", choices=["device", "native", "none"], default="device")
    p.add_argument("--input-mode", choices=["fixed", "native"], default=None,
                   help="'native' evaluates at original image resolution "
                        "(reference VOC eval semantics; compiles per shape). "
                        "Default: native for VOC, fixed for COCO — each "
                        "reference driver's own protocol")
    p.add_argument("--transfer-dtype", default="uint8",
                   choices=["uint8", "float32"],
                   help="image wire format: uint8 ships raw pixels at 1/4 "
                        "the bytes and normalises on device (<=1 ulp from "
                        "the host path); float32 is the reference's format")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--scales", type=float, nargs="+", default=None)
    p.add_argument("--ensemble", action="store_true",
                   help="average both students' logits for the CRF pass "
                        "instead of picking the better branch")
    p.add_argument("--shard", type=int, default=0,
                   help="strided dataset shard (reference DDP eval split, "
                        "eval_seg_coco_ddp.py:240-242)")
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--branch", type=int, default=None, choices=[1, 2],
                   help="force the CRF branch (e.g. after a cross-shard "
                        "merged pick) instead of this run's local pick")
    p.add_argument("--save-hists", default=None,
                   help="save raw confusion matrices to this .npz (for "
                        "--merge-hists across shards)")
    p.add_argument("--merge-hists", nargs="+", default=None,
                   help="merge per-shard hist .npz files into the global "
                        "protocol metric and exit (no inference)")
    p.add_argument("--backbone", default=None,
                   help="override backbone (e.g. test_tiny_patch16 for smoke)")
    p.add_argument("--crop-size", type=int, default=None)
    args = p.parse_args()

    if args.merge_hists:
        merge_main(args.merge_hists)
        return
    if not args.weights:
        raise SystemExit("--weights is required (unless --merge-hists)")

    from dupl_tpu.config import voc_config, coco_config
    from dupl_tpu.engine import checkpoint as ckpt
    from dupl_tpu.engine.eval_seg import SegEvaluator, resolve_input_mode
    from dupl_tpu.engine.train import Trainer
    from dupl_tpu.utils.logging import setup_logger
    from dupl_tpu.utils.metrics import format_score_table
    import jax.numpy as jnp

    import dataclasses as dc

    log = setup_logger()
    args.input_mode = resolve_input_mode(args.dataset, args.input_mode, log)
    cfg = voc_config() if args.dataset == "voc" else coco_config()
    if args.backbone:
        cfg = dc.replace(cfg, model=dc.replace(cfg.model, backbone=args.backbone))
    if args.crop_size:
        cfg = dc.replace(cfg, data=dc.replace(cfg.data, crop_size=args.crop_size))
    list_folder = args.list_folder or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "datasets", args.dataset)

    if not args.data_folder and not args.records:
        raise SystemExit("either --data-folder or --records is required")
    if args.dataset == "voc":
        split = args.infer_set or "val"
        stage = "test" if split == "test" else "val"
        if args.records:
            from dupl_tpu.data.records import RecordVocSegDataset
            ds = RecordVocSegDataset(args.records, stage=stage,
                                     num_classes=cfg.num_classes,
                                     transfer_dtype=args.transfer_dtype)
        else:
            from dupl_tpu.data.voc import VocSegDataset
            ds = VocSegDataset(args.data_folder, list_folder, split,
                               stage=stage,
                               num_classes=cfg.num_classes,
                               transfer_dtype=args.transfer_dtype)
        scales = tuple(args.scales or (1.0, 1.5, 1.25))
        merge = "max"  # eval_seg_voc.py:76-77
        merge_at = "input"
    else:
        if args.records:
            from dupl_tpu.data.records import RecordCocoSegDataset
            ds = RecordCocoSegDataset(args.records,
                                      num_classes=cfg.num_classes,
                                      transfer_dtype=args.transfer_dtype)
        else:
            from dupl_tpu.data.coco import CocoSegDataset
            ds = CocoSegDataset(args.data_folder, list_folder,
                                args.infer_set or "val_part",
                                num_classes=cfg.num_classes,
                                label_folder=args.label_folder,
                                transfer_dtype=args.transfer_dtype)
        scales = tuple(args.scales or (1.0, 1.25, 1.5))
        merge = "sum"  # eval_seg_coco_ddp.py:120-121
        merge_at = "decoder"  # COCO merges at the scale-1.0 seg grid (:93-121)

    trainer = Trainer(cfg)
    sample = jnp.zeros((1, cfg.data.crop_size, cfg.data.crop_size, 3), jnp.float32)
    template = trainer.model.init(jax.random.PRNGKey(0), sample)
    params = ckpt.load_weights(args.weights, template)

    ev = SegEvaluator(cfg, trainer.model, scales=scales, merge=merge,
                      input_mode=args.input_mode,
                      merge_at="input" if args.input_mode == "native" else merge_at)
    if args.num_shards > 1 and not (args.branch or args.ensemble):
        log.warning(
            "num_shards=%d: the branch pick below is LOCAL to this shard's "
            "stride; the reference protocol picks once from the merged "
            "histograms. Save each shard with --save-hists and combine with "
            "--merge-hists (or force --branch after a merged pick).",
            args.num_shards)
    res = ev.run(params, ds, batch_size=args.batch_size, crf=args.crf,
                 out_dir=args.out_dir, max_images=args.max_images, log=log,
                 shard=args.shard, num_shards=args.num_shards,
                 ensemble=args.ensemble, branch=args.branch)

    if args.save_hists:
        np.savez(args.save_hists, hist_1=res["hist_1"], hist_2=res["hist_2"],
                 **({"crf_hist": res["crf_hist"]} if "crf_hist" in res else {}))
        log.info("histograms -> %s", args.save_hists)

    tables = [res["seg_score_1"], res["seg_score_2"]]
    names = ["Seg_1", "Seg_2"]
    if "crf_score" in res:
        tables.append(res["crf_score"])
        names.append("ensemble+CRF" if args.ensemble else f"branch{res['branch']}+CRF")
    print(format_score_table(tables, names, cfg.class_list))


def merge_main(paths):
    """--merge-hists: combine per-shard histogram files into the reference's
    single global metric (gather-then-pick, eval_seg_coco_ddp.py:244-254)."""
    from dupl_tpu.engine.eval_seg import merge_shard_results
    from dupl_tpu.utils.metrics import format_score_table

    shards = [dict(np.load(p)) for p in paths]
    merged = merge_shard_results(shards)
    tables = [merged["seg_score_1"], merged["seg_score_2"]]
    names = ["Seg_1", "Seg_2"]
    if "crf_score" in merged:
        tables.append(merged["crf_score"])
        names.append("merged+CRF")
    nc = merged["hist_1"].shape[0]
    from dupl_tpu.config import voc_config, coco_config
    cfg = voc_config() if nc == 21 else coco_config()
    print(f"merged {len(shards)} shards -> branch {merged['branch']}")
    print(format_score_table(tables, names, cfg.class_list))


if __name__ == "__main__":
    main()
