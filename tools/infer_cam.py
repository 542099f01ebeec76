"""CAM inference & visualisation (reference: tools/infer_cam_voc.py — which
ships broken: wrong model import at :14, duplicate argparse flag :31-32,
undefined args.list_folder :104; rebuilt working by design, SURVEY.md §7).

Writes jet-colormap CAM overlays and reports CAM-label mIoU.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def jet_overlay(image: np.ndarray, cam_max: np.ndarray) -> np.ndarray:
    """0.5*jet(cam)+0.5*image, like utils/imutils.py:255-267."""
    import matplotlib.cm as cm

    heat = (cm.jet(np.clip(cam_max, 0, 1))[..., :3] * 255).astype(np.float32)
    return (0.5 * heat + 0.5 * image.astype(np.float32)).astype(np.uint8)


def main():
    from dupl_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    p = argparse.ArgumentParser()
    p.add_argument("--data-folder", required=True)
    p.add_argument("--list-folder", default=None)
    p.add_argument("--weights", required=True)
    p.add_argument("--infer-set", default="val")
    p.add_argument("--out-dir", default="cam_out")
    p.add_argument("--branch", type=int, default=1, choices=[1, 2])
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--backbone", default=None,
                   help="override backbone (e.g. test_tiny_patch16 for smoke)")
    p.add_argument("--crop-size", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from dupl_tpu.config import voc_config
    from dupl_tpu.data.voc import VocSegDataset
    from dupl_tpu.engine import checkpoint as ckpt
    from dupl_tpu.engine.validate import cam_label_host, _resize_logits_host, add_hist
    from dupl_tpu.models.network import DualStudent, Student
    from dupl_tpu.ops import cam as cam_ops
    from dupl_tpu.ops import image as image_ops
    from dupl_tpu.utils.metrics import scores_from_hist

    import dataclasses as dc
    cfg = voc_config()
    if args.backbone:
        cfg = dc.replace(cfg, model=dc.replace(cfg.model, backbone=args.backbone))
    if args.crop_size:
        cfg = dc.replace(cfg, data=dc.replace(cfg.data, crop_size=args.crop_size))
    list_folder = args.list_folder or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "datasets", "voc")
    ds = VocSegDataset(args.data_folder, list_folder, args.infer_set,
                       num_classes=cfg.num_classes)
    model = DualStudent(cfg.model)
    sample = jnp.zeros((1, cfg.data.crop_size, cfg.data.crop_size, 3), jnp.float32)
    params = ckpt.load_weights(args.weights, model.init(jax.random.PRNGKey(0), sample))
    pb = model.branch(params, args.branch - 1)

    @jax.jit
    def cam_fn(x):
        return cam_ops.multi_scale_cam(
            lambda xx: model.module.apply(pb, xx, method=Student.cam_only),
            x, cfg.cam_scales)

    os.makedirs(args.out_dir, exist_ok=True)
    hist = np.zeros((cfg.num_classes, cfg.num_classes), np.float64)
    n = len(ds) if args.max_images is None else min(args.max_images, len(ds))
    base = cfg.data.crop_size
    for i in range(n):
        s = ds[i]
        img = image_ops.resize_bilinear(
            image_ops.prepare_inputs(jnp.asarray(s["image"])[None])[0],
            (base, base))
        cams, _ = cam_fn(img)
        cams = np.asarray(cams, np.float32)[0]
        size = s["label"].shape
        cam_up = _resize_logits_host(cams, size) * s["cls_label"][None, None, :]
        label = cam_label_host(cam_up, s["cls_label"], cfg.bkg_thre)
        add_hist(hist, s["label"], label)
        overlay = jet_overlay(s["raw_image"], cam_up.max(-1))
        Image.fromarray(overlay).save(os.path.join(args.out_dir, s["name"] + ".jpg"))

    sc = scores_from_hist(hist)
    print(f"CAM-label mIoU: {100 * sc['miou']:.3f}")


if __name__ == "__main__":
    main()
