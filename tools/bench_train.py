"""Training-step throughput on the live chip (phase-3 = the full curriculum
step: multi-scale CAM, PAR refinement, GMM noise filter, strong-aug
consistency, dual fwd/bwd, optimizer).

Counterpart of tools/bench_components.py for the training path; the
reference anchor is 0.67 it/s at global batch 4 on 2x RTX 3090
(logs/dupl_train_voc/train.log — BASELINE.md)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--phase", default="full",
                    choices=["warmup", "seg_static", "seg", "full"])
    ap.add_argument("--dataset", default="voc", choices=["voc", "coco"])
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from dupl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from dupl_tpu.config import voc_config, coco_config, ModelConfig
    from dupl_tpu.data.pipeline import synthetic_batch
    from dupl_tpu.engine.train import Trainer

    mk = voc_config if args.dataset == "voc" else coco_config
    model_kw = dict(backbone="deit_base_patch16", cam_stream_dtype="bfloat16")
    if args.dataset == "coco":
        model_kw.update(num_classes=81, aux_layer=9)
    cfg = mk(model=ModelConfig(**model_kw), cam_merge_downscale=2)
    trainer = Trainer(cfg)

    b = args.batch
    batch = synthetic_batch(b, crop=cfg.data.crop_size, num_fg=cfg.model.num_fg)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, dev_batch["image"][:1])
    # jump the step counter into the requested phase
    if args.phase == "seg_static" and cfg.refine_switch_iters is None:
        ap.error("--phase seg_static requires --dataset coco "
                 "(VOC has no static-refine phase)")
    step0 = {"warmup": 0, "seg_static": cfg.cam_iters,
             "seg": (cfg.refine_switch_iters if cfg.refine_switch_iters
                     is not None else cfg.cam_iters),
             "full": cfg.gmm_iters}[args.phase]
    state = state._replace(step=jnp.int32(step0))

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    # analytic FLOPs of the compiled phase step (XLA cost model) for the MFU
    # line — from the same jitted callable the loop dispatches
    from dupl_tpu.engine.train import loss_weights, phase_of
    from dupl_tpu.utils import flops as flops_utils
    step_fn = trainer.step_fn(phase_of(cfg, step0))
    w0 = jnp.asarray(loss_weights(cfg, step0), jnp.float32)
    flops_per_step = flops_utils.compiled_flops(step_fn, state, dev_batch, w0)

    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, dev_batch)
    sync(metrics)
    print(f"compile+first step: {time.perf_counter()-t0:.1f} s")

    best = float("inf")
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = trainer.train_step(state, dev_batch)
        sync(metrics)
        best = min(best, time.perf_counter() - t0)
    util = flops_utils.mfu(flops_per_step, 1, best, jax.devices()[0])
    mfu_txt = ("" if util is None else
               f" mfu={util:.3f} ({flops_per_step / 1e12 / b:.2f} TF/img)")
    print(f"phase={args.phase} batch={b}: {best*1e3:.1f} ms/it = "
          f"{1/best:.2f} it/s = {b/best:.2f} img/s "
          f"({b/best/2.7:.2f}x reference train img/s){mfu_txt}")


if __name__ == "__main__":
    main()
