"""Serving-program throughput: the deployable MSC+flip+CRF segmentation
service (engine/export.py) on the flagship ViT-B dual student.

    python tools/bench_serve.py [--batch 16] [--branch 1|2|ensemble]
                                [--sealed] [--iters 10]

Measures the device program steady-state (enqueue all iterations, sync once —
the same dispatch-overlap a serving loop achieves), i.e. the accelerator-side
capacity of one chip; host-side decode/resize ride worker threads in
``engine/serve.py`` and overlap it.  ``--sealed`` additionally roundtrips the
program through ``jax.export`` serialize/deserialize and measures the sealed
artifact's ``call`` — pinning "the artifact serves at live-jit speed" with a
number instead of prose.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dupl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["voc", "coco"], default="voc")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--branch", default="1",
                    help="1 / 2 / ensemble (ensemble runs both students)")
    ap.add_argument("--no-crf", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sealed", action="store_true",
                    help="also measure the serialize->deserialize->call path")
    ap.add_argument("--backbone", default=None)
    args = ap.parse_args()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dupl_tpu.config import voc_config, coco_config, ModelConfig
    from dupl_tpu.engine.export import export_serving, make_serving_fn
    from dupl_tpu.models.network import DualStudent

    base = voc_config() if args.dataset == "voc" else coco_config()
    model_cfg = dc.replace(
        base.model, backbone=args.backbone or "deit_base_patch16",
        gelu_approximate=True, stream_dtype="bfloat16")
    cfg = dc.replace(base, model=model_cfg)
    branch = args.branch if args.branch == "ensemble" else int(args.branch)
    scales = (1.0, 1.5, 1.25) if args.dataset == "voc" else (1.0, 1.25, 1.5)
    merge = "max" if args.dataset == "voc" else "sum"

    model = DualStudent(cfg.model)
    crop = cfg.data.crop_size
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, crop, crop, 3), jnp.float32))
    rs = np.random.RandomState(0)
    images = jnp.asarray(
        rs.randint(0, 255, (args.batch, crop, crop, 3)).astype(np.uint8))

    fn = jax.jit(make_serving_fn(cfg, model, scales=scales, merge=merge,
                                 branch=branch, crf=not args.no_crf))

    def sync(x):
        return np.asarray(x.ravel()[0])

    def measure(call, tag):
        sync(call(params, images))  # warmup/compile
        t0 = time.perf_counter()
        outs = [call(params, images) for _ in range(args.iters)]
        sync(outs[-1])
        dt = time.perf_counter() - t0
        ips = args.batch * args.iters / dt
        print(json.dumps({"metric": f"serving_{tag}", "value": round(ips, 2),
                          "unit": "img/s", "batch": args.batch,
                          "branch": args.branch,
                          "crf": not args.no_crf}))
        return ips

    measure(fn, "live")

    if args.sealed:
        from jax import export as jexport

        exp, _ = export_serving(cfg, model, params, batch_size=args.batch,
                                scales=scales, merge=merge, branch=branch,
                                crf=not args.no_crf, bake_params=False)
        sealed = jexport.deserialize(exp.serialize())
        measure(jax.jit(sealed.call), "sealed")


if __name__ == "__main__":
    main()
