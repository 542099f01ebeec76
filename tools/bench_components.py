"""Component-level timing of the headline inference pipeline (bench.py) on the
live backend.  Used to direct kernel work; each piece is timed as its own
jitted dispatch (min over ``--iters`` runs, one warmup compile).

Usage: python tools/bench_components.py [--batch 16] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=5):
    import numpy as np
    import jax

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    sync(fn(*args))  # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--int8", action="store_true",
                    help="opt-in dynamic-int8 GEMMs (ModelConfig.quantized_inference)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dataset", choices=["voc", "coco"], default="voc",
                    help="coco = 81 classes + class_budget 16 (the COCO "
                         "inference shapes of BENCHMARKS.md)")
    ap.add_argument("--density", choices=["realistic", "dense"],
                    default="realistic",
                    help="label density: 'realistic' ~3 present classes/img "
                         "(real COCO statistics); 'dense' = 20/img (> the "
                         "class_budget of 16 incl. bkg), which overruns the "
                         "PAR class_budget and measures the lax.cond "
                         "full-width fallback (VERDICT r3 next 7 — keeps the "
                         "cliff visible)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dupl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from dupl_tpu.config import voc_config, coco_config, ModelConfig, ParConfig
    from dupl_tpu.data.pipeline import synthetic_batch
    from dupl_tpu.engine.train import Trainer
    from dupl_tpu.models.network import Student
    from dupl_tpu.ops import cam as cam_ops
    from dupl_tpu.ops import crf as crf_ops
    from dupl_tpu.ops import image as image_ops

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    mk = voc_config if args.dataset == "voc" else coco_config
    nc = 21 if args.dataset == "voc" else 81
    budget = 10 if args.dataset == "voc" else 16
    cfg = mk(model=ModelConfig(backbone="deit_base_patch16",
                               num_classes=nc,
                               gelu_approximate=True,
                               stream_dtype="bfloat16",
                               quantized_inference=args.int8),
             par=ParConfig(compute_dtype="bfloat16", class_budget=budget))
    trainer = Trainer(cfg)
    model = trainer.model

    b = args.batch
    batch = synthetic_batch(b, crop=448, num_fg=nc - 1)
    if args.density == "dense":
        import numpy as _np
        rs = _np.random.RandomState(1)
        dense = _np.zeros((b, nc - 1), _np.float32)
        for i in range(b):  # 20 present classes/img: bkg + 20 > budget 16
            dense[i, rs.choice(nc - 1, size=20, replace=False)] = 1
        batch["cls_label"] = dense
    inputs = jnp.asarray(batch["image"])
    cls_label = jnp.asarray(batch["cls_label"])
    img_box = jnp.asarray(batch["img_box"])
    params = model.init(jax.random.PRNGKey(0), inputs[:1])

    report = {}

    # --- per-scale encoder (cam_only), dual-branch vmap, flip-concat batch
    for s in cfg.cam_scales:
        hw = int(448 * s)
        x = image_ops.resize_bilinear(inputs, (hw, hw)) if s != 1.0 else inputs
        both = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)

        @jax.jit
        def cam_fwd(params, both):
            return jax.vmap(lambda pb: model.module.apply(
                pb, both, method=Student.cam_only))(params)

        dt = timeit(cam_fwd, params, both, iters=args.iters)
        n_tok = (hw // 16) ** 2 + 1
        # ViT-B fwd FLOPs: 12 blocks x (12*N*D^2 matmul + 2*N^2*D attn) MACs x2
        d = 768
        flops = 2 * both.shape[0] * 2 * 12 * (12 * n_tok * d * d + 2 * n_tok * n_tok * d)
        report[f"cam_fwd_scale{s}"] = (dt, flops / dt / 1e12)
        print(f"cam_only scale={s} ({hw}px, {n_tok} tok, 2x{both.shape[0]} seqs): "
              f"{dt*1e3:.1f} ms  ~{flops/dt/1e12:.1f} TFLOPS")

    # --- full multi-scale CAM (fused with seg outputs)
    @jax.jit
    def msc(params, inputs):
        def one_branch(pb):
            return cam_ops.multi_scale_cam_with_outputs(
                lambda x: model.module.apply(pb, x, method=Student.forward_with_cams),
                lambda x: model.module.apply(pb, x, method=Student.cam_only),
                inputs, cfg.cam_scales, with_aux=False,
                merge_size=(inputs.shape[1] // 2, inputs.shape[2] // 2))
        return jax.vmap(one_branch)(params)

    dt = timeit(msc, params, inputs, iters=args.iters)
    report["multi_scale_cam_full"] = dt
    print(f"multi_scale_cam_with_outputs (3 scales x flip x 2 branches): {dt*1e3:.1f} ms")
    cams, cams_aux, out = msc(params, inputs)

    # --- PAR refine
    denorm = image_ops.denormalize(inputs)

    @jax.jit
    def refine(cams, denorm, cls_label, img_box):
        return trainer._refine(cams, denorm, cls_label, img_box,
                               high_thre=cfg.high_thre)

    dt = timeit(refine, cams, denorm, cls_label, img_box, iters=args.iters)
    report["par_refine"] = dt
    print(f"PAR refine (2 branches, 2 planes): {dt*1e3:.1f} ms")

    # PAR sub-pieces at the refine working size (2 branches folded into batch)
    from dupl_tpu.ops import par as par_ops
    from dupl_tpu.ops.par_pallas import propagate_pallas
    hs = 448 // cfg.par.down_scale
    # the real refine path: ONE PAR call at batch b, both branches folded
    # into the class axis, classes compacted to the budget (2 views x 2
    # passes x budget slots)
    ch = 4 * cfg.par.class_budget
    img_small = jnp.zeros((b, hs, hs, 3), jnp.float32)
    masks42 = jnp.zeros((b, hs, hs, ch), jnp.float32)

    aff_fn = jax.jit(lambda im: par_ops.rgb_affinity(im, tuple(cfg.par.dilations),
                                                     cfg.par.w1, cfg.par.w2))
    dt = timeit(aff_fn, img_small, iters=args.iters)
    print(f"  par affinity ({b},{hs},{hs}): {dt*1e3:.1f} ms")
    aff = aff_fn(img_small)
    prop_fn = jax.jit(lambda m, a: propagate_pallas(
        m, a, tuple(cfg.par.dilations), cfg.par.num_iter,
        compute_dtype=cfg.par.compute_dtype))
    dt = timeit(prop_fn, masks42, aff, iters=args.iters)
    print(f"  par propagate ({b},{hs},{hs},{ch}) x10: {dt*1e3:.1f} ms")

    # --- seg resize + CRF (fast mode)
    @jax.jit
    def crf(denorm, seg):
        seg = image_ops.resize_bilinear(seg, (448, 448))
        probs = jax.nn.softmax(seg, axis=-1)
        return crf_ops.crf_from_config(denorm, probs, cfg.crf, fast=True,
                                       return_logits=True)

    dt = timeit(crf, denorm, out.seg[0], iters=args.iters)
    report["crf_fast"] = dt
    print(f"CRF fast (batch {b}): {dt*1e3:.1f} ms")

    # --- the end-to-end pipeline as bench.py runs it
    @jax.jit
    def pipeline(params, inputs, cls_label, img_box):
        def one_branch(pb):
            return cam_ops.multi_scale_cam_with_outputs(
                lambda x: model.module.apply(pb, x, method=Student.forward_with_cams),
                lambda x: model.module.apply(pb, x, method=Student.cam_only),
                inputs, cfg.cam_scales, with_aux=False,
                merge_size=(inputs.shape[1] // 2, inputs.shape[2] // 2))
        cams, _, out = jax.vmap(one_branch)(params)
        denorm = image_ops.denormalize(inputs)
        refined = trainer._refine(cams, denorm, cls_label, img_box,
                                  high_thre=cfg.high_thre)
        seg = image_ops.resize_bilinear(out.seg[0], inputs.shape[1:3])
        probs = jax.nn.softmax(seg, axis=-1)
        labels = crf_ops.crf_labels_from_config(
            denorm, probs, cfg.crf, fast=True,
            class_budget=32 if nc > 32 else None)
        return refined, labels

    dt = timeit(pipeline, params, inputs, cls_label, img_box, iters=args.iters)
    report["pipeline"] = dt
    print(f"end-to-end pipeline: {dt*1e3:.1f} ms -> {b/dt:.2f} img/s "
          f"({b/dt/2.6:.2f}x baseline)")
    comp_sum = (report["multi_scale_cam_full"] + report["par_refine"]
                + report["crf_fast"])
    print(f"(component sum {comp_sum*1e3:.1f} ms; fusion/dispatch delta "
          f"{(dt-comp_sum)*1e3:+.1f} ms)")

    # --- the offline eval protocol: 3 scales x flip seg logits, merged
    # max-at-input-res (VOC, eval_seg_voc.py:76-77) or sum-at-decoder-grid
    # (COCO, eval_seg_coco_ddp.py:93-121 — 16x16-fold smaller merge buffers),
    # both branches, device CRF -> labels
    from dupl_tpu.engine.eval_seg import msc_seg_logits

    ev_merge = "max" if args.dataset == "voc" else "sum"
    ev_scales = (1.0, 1.5, 1.25) if args.dataset == "voc" else (1.0, 1.25, 1.5)
    ev_out = (inputs.shape[1:3] if args.dataset == "voc"
              else (inputs.shape[1] // 16, inputs.shape[2] // 16))

    @jax.jit
    def eval_protocol(params, inputs):
        def seg_fn_b(pb):
            def seg_fn(x):
                return model.module.apply(pb, x, method=Student.forward_with_cams)[0].seg
            return seg_fn
        segs = jax.vmap(
            lambda pb: msc_seg_logits(seg_fn_b(pb), inputs, ev_out,
                                      ev_scales, merge=ev_merge))(params)
        denorm = image_ops.denormalize(inputs)
        pick = segs[0]
        if pick.shape[1:3] != inputs.shape[1:3]:  # decoder-grid merge -> CRF res
            pick = image_ops.resize_bilinear(pick, inputs.shape[1:3])
        probs = jax.nn.softmax(pick, axis=-1)
        labels = crf_ops.crf_labels_from_config(
            denorm, probs, cfg.crf, fast=True,
            class_budget=32 if nc > 32 else None)
        return segs, labels

    dt = timeit(eval_protocol, params, inputs, iters=args.iters)
    report["eval_protocol"] = dt
    print(f"eval protocol (3 scales x flip x 2 branches + CRF): {dt*1e3:.1f} ms "
          f"-> {b/dt:.2f} img/s")



if __name__ == "__main__":
    main()
