"""Headline benchmark: CAM+PAR(+CRF) inference throughput on the flagship
dual-student ViT-B/16 (BASELINE.json metric: "images/sec CAM+PAR+CRF inference
on VOC val").

Baseline: the reference's CAM-path validation covers 1,449 VOC val images in
~9.3 min on an RTX 3090 (≈2.6 img/s, BASELINE.md), and its CRF post-processing
runs on the host CPU at roughly ~1 img/s/core (README "may cost several hours"
on COCO).  ``vs_baseline`` is measured against 2.6 img/s — the reference's
device-side CAM inference throughput, which its CPU CRF can only slow down.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Robustness (round-1 lesson — the TPU relay can be down, in which case the
first device query *hangs* rather than erroring): the backend is probed in a
subprocess with a bounded timeout before anything touches jax in this
process; on an unhealthy backend we fall back to a small CPU measurement and
annotate the JSON line, and any failure still prints a parseable JSON line
instead of a raw traceback.
"""

import json
import os
import subprocess
import sys
import time

REFERENCE_IMG_PER_S = 2.6

# The probe must EXECUTE a computation and pull it to host, not just list
# devices: a half-dead relay (tunnel daemon gone, plugin .so still loaded)
# happily reports "TPU v5 lite0" from jax.devices() and then hangs forever at
# the first array materialisation (observed round 4).
_PROBE_SRC = ("import jax, jax.numpy as jnp, numpy as np; "
              "x = jnp.ones((8, 128)); "
              "v = float(np.asarray(x @ x.T)[0, 0]); "
              "print('PLATFORM=' + jax.devices()[0].platform)")


def probe_platform(timeout_s: float = 120.0, attempts: int = 4) -> str:
    """Ask a subprocess which backend is actually reachable AND executing.

    Returns the platform name ('tpu'/'axon'/...) or 'cpu' if the ambient
    backend is unreachable — or wedged mid-execution — within the timeout."""
    # Probe with the SAME environment the measurement process will use
    # (stripping JAX_PLATFORMS here could report 'tpu' while the parent, with
    # the variable still set, initialises a different backend).
    env = dict(os.environ)
    from dupl_tpu.utils.cache import sanitize_tpu_env
    sanitize_tpu_env(env)
    sanitize_tpu_env()
    for attempt in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=timeout_s, env=env,
            )
            for line in out.stdout.splitlines():
                if line.startswith("PLATFORM="):
                    return line.split("=", 1)[1]
        except subprocess.TimeoutExpired:
            pass
        if attempt + 1 < attempts:
            # relay outages observed in-round last minutes, not seconds
            time.sleep(60)
    return "cpu"


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--style", default="blob", choices=["blob", "photo"],
                    help="synthetic scene statistics: 'photo' = 1/f textures "
                         "+ JPEG noise (the quality-coupled arm in "
                         "BENCHMARKS.md); the driver's headline is 'blob'")
    bench_args = ap.parse_args()

    platform = probe_platform()
    on_device = platform not in ("cpu",)
    if not on_device:
        # Relay down.  A CPU measurement of the ViT-B pipeline takes >20 min —
        # useless to the driver; emit a parseable skip line instead of hanging
        # or tracebacking (round-1 failure mode).
        print(json.dumps({
            "metric": "cam_par_crf_inference_voc_vitb",
            "value": None,
            "unit": "img/s",
            "vs_baseline": None,
            "error": "tpu_unavailable: backend probe returned no TPU "
                     "(relay down or timed out); self-reported TPU numbers "
                     "in BENCHMARKS.md",
        }))
        return

    import jax
    import jax.numpy as jnp

    from dupl_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from dupl_tpu.config import voc_config, ModelConfig, ParConfig
    from dupl_tpu.data.pipeline import synthetic_batch
    from dupl_tpu.engine.train import Trainer

    cfg = voc_config(model=ModelConfig(backbone="deit_base_patch16",
                                       gelu_approximate=True,
                                       stream_dtype="bfloat16"),
                     # inference-only PAR fast path (f32-accumulated bf16
                     # taps; argmax-stable, tests/test_par_pallas.py)
                     par=ParConfig(compute_dtype="bfloat16", class_budget=10))
    trainer = Trainer(cfg)
    model = trainer.model

    # batch 16 is the measured throughput optimum on the 16 GB v5e (re-checked
    # after the round-2 kernel set: 25.5 img/s at batch 32 vs 27.07 at 16 —
    # the scale-1.5 activations of the larger batch pressure HBM; re-swept
    # round 5 after the r3/r4 kernel changes: 16 -> 26.85, 20 -> 26.41,
    # 24 -> 26.67 img/s under tools/bench_components.py conditions)
    batch_size = 16
    batch = synthetic_batch(batch_size, crop=448, style=bench_args.style)
    inputs = jnp.asarray(batch["image"])
    cls_label = jnp.asarray(batch["cls_label"])
    img_box = jnp.asarray(batch["img_box"])

    params = model.init(jax.random.PRNGKey(0), inputs[:1])

    @jax.jit
    def cam_par_pipeline(params, inputs, cls_label, img_box):
        """The full inference pipeline of BASELINE.json: multi-scale CAM for
        both branches, PAR refinement into pseudo-labels, and mean-field CRF
        over the seg posteriors — everything the reference splits between GPU
        inference and hours of host CPU (pydensecrf), in one device program.
        The scale-1.0 encoder pass is shared between CAM fusion and the seg
        head (Student.forward_with_cams)."""
        import jax as _jax
        import dupl_tpu.ops.image as image_ops
        from dupl_tpu.ops import cam as cam_ops
        from dupl_tpu.ops import crf as crf_ops
        from dupl_tpu.models.network import Student

        def one_branch(pb):
            return cam_ops.multi_scale_cam_with_outputs(
                lambda x: model.module.apply(pb, x, method=Student.forward_with_cams),
                lambda x: model.module.apply(pb, x, method=Student.cam_only),
                inputs, cfg.cam_scales, with_aux=False,
                merge_size=(inputs.shape[1] // 2, inputs.shape[2] // 2),
            )

        cams, _, out = _jax.vmap(one_branch)(params)
        denorm = image_ops.denormalize(inputs)
        refined = trainer._refine(
            cams, denorm, cls_label, img_box, high_thre=cfg.high_thre,
        )
        seg = image_ops.resize_bilinear(out.seg[0], inputs.shape[1:3])
        probs = jax.nn.softmax(seg, axis=-1)
        # fast mode: iterations on the pivot lattice, one full-res slice —
        # validated label-equivalent to the full mode and the permutohedral
        # oracle (tests/test_crf_fast.py)
        logits_out = crf_ops.crf_from_config(denorm, probs, cfg.crf,
                                             fast=True, return_logits=True)
        return refined, jnp.argmax(logits_out, axis=-1)

    def sync(x):
        # host transfer forces completion (block_until_ready is unreliable on
        # the remote-relay backend)
        import numpy as np
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    # warmup/compile
    sync(cam_par_pipeline(params, inputs, cls_label, img_box))

    # analytic FLOPs of the exact compiled program (XLA cost model), for the
    # MFU line — measured AFTER warmup so the lowering is cache-hot
    from dupl_tpu.utils import flops as flops_utils
    flops_per_call = flops_utils.compiled_flops(
        cam_par_pipeline, params, inputs, cls_label, img_box)

    # steady-state throughput: enqueue every iteration, then sync once —
    # device execution is in-order, so syncing the last result is a barrier
    # for all of them; per-dispatch relay latency (~30 ms) overlaps compute
    # exactly as it would in a serving loop.  Best of 3 windows (the
    # BENCHMARKS.md methodology): run-to-run relay noise is ~1-2%, and a
    # single window can dip below the steady state it is meant to measure.
    iters = 10
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [cam_par_pipeline(params, inputs, cls_label, img_box)
                for _ in range(iters)]
        sync(outs[-1])
        dt = min(dt, time.perf_counter() - t0)

    img_per_s = batch_size * iters / dt
    util = flops_utils.mfu(flops_per_call, iters, dt, jax.devices()[0])
    line = {
        "metric": "cam_par_crf_inference_voc_vitb"
                  + ("_photo" if bench_args.style == "photo" else ""),
        "value": round(img_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / REFERENCE_IMG_PER_S, 2),
    }
    if util is not None:
        # measured roofline claim (BENCHMARKS.md): analytic FLOPs from the
        # XLA cost model / wall clock / chip bf16 peak
        line["mfu"] = round(util, 4)
        line["tflops_per_img"] = round(flops_per_call / 1e12 / batch_size, 2)
    print(json.dumps(line))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # never a raw traceback: the driver parses stdout
        print(json.dumps({
            "metric": "cam_par_crf_inference_voc_vitb",
            "value": None,
            "unit": "img/s",
            "vs_baseline": None,
            "error": f"{type(exc).__name__}: {exc}"[:500],
        }))
        raise SystemExit(1)
