"""Back-to-back A/B of the headline pipeline with the XLA vs Pallas CRF
apply — same process, alternating measurements, so relay drift cancels.

Usage: python tools/crf_ab_pipeline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dupl_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from dupl_tpu.config import voc_config, ModelConfig, ParConfig
from dupl_tpu.data.pipeline import synthetic_batch
from dupl_tpu.engine.train import Trainer
from dupl_tpu.models.network import Student
from dupl_tpu.ops import cam as cam_ops
from dupl_tpu.ops import crf as crf_ops
from dupl_tpu.ops import image as image_ops


def build_pipeline(trainer, cfg, model, pallas_apply):
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
        lg = crf_ops.crf_from_config(denorm, probs, cfg.crf, fast=True,
                                     return_logits=True,
                                     pallas_apply=pallas_apply)
        return refined, jnp.argmax(lg, axis=-1)
    return pipeline


def main():
    print(f"backend={jax.default_backend()}")
    cfg = voc_config(model=ModelConfig(backbone="deit_base_patch16",
                                       gelu_approximate=True,
                                       stream_dtype="bfloat16"),
                     par=ParConfig(compute_dtype="bfloat16", class_budget=10))
    trainer = Trainer(cfg)
    model = trainer.model
    b = 16
    batch = synthetic_batch(b, crop=448)
    inputs = jnp.asarray(batch["image"])
    cls_label = jnp.asarray(batch["cls_label"])
    img_box = jnp.asarray(batch["img_box"])
    params = model.init(jax.random.PRNGKey(0), inputs[:1])

    # distinct pipeline closures with an explicit static pallas_apply flag —
    # monkeypatching a trace-time gate does NOT work (two jax.jit wrappers
    # over one function object share the jaxpr cache, so the second trace
    # reuses the first's path and the A/B compares a path against itself)
    jit_xla = jax.jit(build_pipeline(trainer, cfg, model, pallas_apply=False))
    _ = jit_xla.lower(params, inputs, cls_label, img_box).compile()
    jit_pal = jax.jit(build_pipeline(trainer, cfg, model, pallas_apply=True))
    _ = jit_pal.lower(params, inputs, cls_label, img_box).compile()

    def measure(fn, iters=10):
        outs = [fn(params, inputs, cls_label, img_box) for _ in range(iters)]
        np.asarray(jax.tree.leaves(outs[-1])[0].ravel()[0])
        t0 = time.perf_counter()
        outs = [fn(params, inputs, cls_label, img_box) for _ in range(iters)]
        np.asarray(jax.tree.leaves(outs[-1])[0].ravel()[0])
        return b * iters / (time.perf_counter() - t0)

    for rnd in range(3):
        xa = measure(jit_xla)
        pa = measure(jit_pal)
        print(f"round {rnd}: xla {xa:6.2f} img/s | pallas {pa:6.2f} img/s "
              f"({pa/xa:.3f}x)")


if __name__ == "__main__":
    main()
