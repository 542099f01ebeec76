"""Training driver (reference entry scripts: train_final_voc.py /
train_final_coco.py — one script here, recipe selected by ``--dataset``).

Single-controller JAX: no torch.distributed.run wrapper, no LOCAL_RANK — the
device mesh is built in-process and the batch is sharded over its ``data``
axis; ``--model-parallel`` additionally shards the ViT over a ``model`` axis.

Usage:
  python tools/train.py --dataset voc --data-folder /path/VOC2012 \
      --list-folder datasets/voc [--pretrained pretrained/deit_base.pth]
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["voc", "coco"], default="voc")
    p.add_argument("--data-folder", default=None,
                   help="dataset directory tree (or use --train-records/"
                        "--val-records packed shards instead)")
    p.add_argument("--list-folder", default=None)
    p.add_argument("--train-records", default=None,
                   help=".duplrec shard for the train split "
                        "(tools/pack_records.py); replaces --data-folder")
    p.add_argument("--val-records", default=None,
                   help=".duplrec shard for the val split")
    p.add_argument("--work-dir", default="work_dir")
    p.add_argument("--comment", default="")
    p.add_argument("--pretrained", default=None,
                   help="DeiT .pth checkpoint to initialise both branches")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--samples-per-device", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-style fully-sharded data parallelism: params "
                        "and Adam moments shard over the data axis "
                        "(~n_data-fold less state memory per chip; XLA "
                        "inserts the all-gather/reduce-scatter)")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in work-dir")
    p.add_argument("--eval-iters", type=int, default=None)
    p.add_argument("--log-iters", type=int, default=None)
    p.add_argument("--transfer-dtype", default="uint8",
                   choices=["uint8", "float32"],
                   help="train-batch wire format: uint8 ships the augmented "
                        "crop at 1/4 the bytes and normalises on device "
                        "(same floats to <=1 ulp); float32 ships host-"
                        "normalised images (the reference's format)")
    p.add_argument("--val-transfer-dtype", default=None,
                   choices=["bfloat16"],
                   help="round CAM tensors before device->host transfer "
                        "during validation (remote-relay devices; default "
                        "exact f32)")
    p.add_argument("--profile-iters", type=int, nargs=2, default=None,
                   metavar=("START", "STOP"),
                   help="capture a jax.profiler trace between these steps")
    p.add_argument("--multihost", action="store_true",
                   help="initialise jax.distributed for multi-host meshes "
                        "(coordinator from env, e.g. under a TPU pod slice)")
    p.add_argument("--backbone", default=None,
                   help="override backbone (e.g. test_tiny_patch16 for smoke)")
    p.add_argument("--crop-size", type=int, default=None)
    p.add_argument("--cam-iters", type=int, default=None)
    p.add_argument("--gmm-iters", type=int, default=None)
    p.add_argument("--refine-switch-iters", type=int, default=None,
                   help="COCO aux->main refine-source switch boundary "
                        "(train_final_coco.py:312-333; default: recipe "
                        "value 12000 — override for smoke runs so a tiny "
                        "run crosses all four phases)")
    p.add_argument("--cam-stream-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="residual-stream dtype for the no-grad CAM pass "
                        "(ModelConfig.cam_stream_dtype)")
    p.add_argument("--cam-merge-downscale", type=int, default=2,
                   help="merge training CAMs at input/this resolution "
                        "(0 = full-res, the reference semantics)")
    return p.parse_args()


def build_config(args):
    import dataclasses as dc
    from dupl_tpu.config import voc_config, coco_config

    over = {"seed": args.seed}
    for name in ("max_iters", "samples_per_device", "eval_iters", "log_iters",
                 "cam_iters", "gmm_iters", "refine_switch_iters"):
        v = getattr(args, name)
        if v is not None:
            over[name] = v
    cfg = voc_config(**over) if args.dataset == "voc" else coco_config(**over)
    if args.backbone:
        cfg = dc.replace(cfg, model=dc.replace(cfg.model, backbone=args.backbone))
    cfg = dc.replace(cfg, model=dc.replace(
        cfg.model, cam_stream_dtype=args.cam_stream_dtype))
    cfg = dc.replace(cfg, cam_merge_downscale=args.cam_merge_downscale or None)
    if args.crop_size:
        cfg = dc.replace(cfg, data=dc.replace(cfg.data, crop_size=args.crop_size))
    return cfg


def main():
    from dupl_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    from dupl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    args = parse_args()
    from dupl_tpu.data.pipeline import PrefetchLoader
    from dupl_tpu.engine import checkpoint as ckpt
    from dupl_tpu.engine.train import Trainer, phase_of
    from dupl_tpu.engine.validate import Validator
    from dupl_tpu.engine.optimizer import current_lr
    from dupl_tpu.models.pretrained import load_deit_checkpoint, install_pretrained_encoder
    from dupl_tpu.parallel import make_mesh, shard_batch, shard_state
    from dupl_tpu.utils.logging import AverageMeter, cal_eta, setup_logger

    if args.multihost:
        # multi-host: every process sees its local devices; the mesh below is
        # built over jax.devices() (global) and batches shard by process via
        # the loader's shard/num_shards split.  Cluster identity comes from
        # auto-detection (TPU pod slice / SLURM / OMPI) or, when those are
        # absent (e.g. the 2-process CPU integration test), from
        # JAX_COORDINATOR_ADDRESS (read by jax itself) plus
        # JAX_NUM_PROCESSES / JAX_PROCESS_ID.
        def _env_int(name):
            v = os.environ.get(name)
            return int(v) if v else None

        jax.distributed.initialize(
            num_processes=_env_int("JAX_NUM_PROCESSES"),
            process_id=_env_int("JAX_PROCESS_ID"))

    if not args.data_folder and not (args.train_records and args.val_records):
        raise SystemExit("either --data-folder or --train-records + "
                         "--val-records is required")
    cfg = build_config(args)
    list_folder = args.list_folder or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "datasets", args.dataset)

    proc_idx = jax.process_index() if args.multihost else 0
    n_proc = jax.process_count() if args.multihost else 1

    if args.resume:
        # resume in-place: --work-dir points at the previous run directory
        work_dir = args.work_dir
    else:
        stamp = "{0:%Y-%m-%d-%H-%M-%S}".format(datetime.datetime.now()) + args.comment
        if n_proc > 1:
            # every process must agree on the run directory (orbax saves are
            # collective); broadcast process 0's timestamp
            from jax.experimental import multihost_utils
            pad = np.zeros(64, np.uint8)
            raw = stamp.encode()[:64]
            pad[:len(raw)] = np.frombuffer(raw, np.uint8)
            pad = np.asarray(multihost_utils.broadcast_one_to_all(pad))
            stamp = bytes(pad[pad != 0]).decode()
        work_dir = os.path.join(args.work_dir, stamp)
    ckpt_dir = os.path.join(work_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    # process 0 owns the log file / TB / weight exports / validation (the
    # reference is rank-0-only there too, train_final_voc.py:512-536); other
    # processes log to console only
    log = setup_logger(os.path.join(work_dir, "train.log")
                       if proc_idx == 0 else None)

    # machine-readable twin of the text log (process 0 only): one JSON line
    # per log/eval event, for downstream analysis without regex-scraping
    # train.log (the reference offers only the text log + tensorboard)
    metrics_path = (os.path.join(work_dir, "metrics.jsonl")
                    if proc_idx == 0 else None)

    def jlog(**rec):
        if metrics_path:
            with open(metrics_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
    log.info("jax %s devices %s", jax.__version__, jax.devices())
    log.info("config: %s", json.dumps(dataclasses.asdict(cfg), default=str, indent=1))

    # data ---------------------------------------------------------------
    if args.train_records or args.val_records:
        # packed-shard feed (tools/pack_records.py): one sequential file per
        # split instead of the directory tree; samples are pixel-identical
        # to the directory datasets (tests/test_records.py)
        from dupl_tpu.data import records
        if not (args.train_records and args.val_records):
            raise SystemExit("--train-records and --val-records go together "
                             "(mixing a packed train feed with a directory "
                             "val feed is almost never intended)")
        cls_cls = (records.RecordVocClsDataset if args.dataset == "voc"
                   else records.RecordCocoClsDataset)
        seg_cls = (records.RecordVocSegDataset if args.dataset == "voc"
                   else records.RecordCocoSegDataset)
        train_ds = cls_cls(args.train_records, crop_size=cfg.data.crop_size,
                           rescale_range=cfg.data.rescale_range,
                           num_classes=cfg.num_classes,
                           ignore_index=cfg.ignore_index,
                           transfer_dtype=args.transfer_dtype)
        val_ds = seg_cls(args.val_records, num_classes=cfg.num_classes,
                         transfer_dtype=args.transfer_dtype)
    elif args.dataset == "voc":
        from dupl_tpu.data.voc import VocClsDataset, VocSegDataset
        train_ds = VocClsDataset(args.data_folder, list_folder, cfg.data.train_split,
                                 crop_size=cfg.data.crop_size,
                                 rescale_range=cfg.data.rescale_range,
                                 num_classes=cfg.num_classes,
                                 ignore_index=cfg.ignore_index,
                                 transfer_dtype=args.transfer_dtype)
        val_ds = VocSegDataset(args.data_folder, list_folder, cfg.data.val_split,
                               num_classes=cfg.num_classes,
                               transfer_dtype=args.transfer_dtype)
    else:
        from dupl_tpu.data.coco import CocoClsDataset, CocoSegDataset
        train_ds = CocoClsDataset(args.data_folder, list_folder, "train",
                                  crop_size=cfg.data.crop_size,
                                  num_classes=cfg.num_classes,
                                  transfer_dtype=args.transfer_dtype)
        val_ds = CocoSegDataset(args.data_folder, list_folder, "val_part",
                                num_classes=cfg.num_classes,
                                transfer_dtype=args.transfer_dtype)

    mesh = make_mesh(n_model=args.model_parallel)
    n_data = mesh.shape["data"]
    if args.samples_per_device is None:
        # Pin the reference recipe's GLOBAL batch (config.py:global_batch):
        # per-device batch adapts to the mesh so 1 chip and a v5e-4 train
        # the same recipe.
        from dupl_tpu.config import resolve_samples_per_device
        cfg, warn = resolve_samples_per_device(cfg, n_data)
        if warn:
            log.warning("%s", warn)
    global_batch = cfg.samples_per_device * n_data
    log.info("mesh %s; global batch %d", dict(mesh.shape), global_batch)

    # model/state --------------------------------------------------------
    trainer = Trainer(cfg)
    sample = jnp.zeros((1, cfg.data.crop_size, cfg.data.crop_size, 3), jnp.float32)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), sample)

    if args.resume and ckpt.latest_step(ckpt_dir) is not None:
        state = ckpt.restore_state(ckpt_dir, state)
        log.info("resumed from step %d", int(state.step))
        if metrics_path and os.path.exists(metrics_path):
            # drop jsonl records beyond the restored step: the resumed run
            # re-executes those steps and would otherwise append duplicate,
            # conflicting lines for the same step (the file exists for
            # programmatic consumption — keep it single-valued per step)
            kept = [l for l in open(metrics_path)
                    if json.loads(l).get("step", 0) <= int(state.step)]
            with open(metrics_path, "w") as f:
                f.writelines(kept)
    elif args.pretrained:
        enc = load_deit_checkpoint(args.pretrained, cfg.model.depth)
        state = state._replace(
            params=install_pretrained_encoder(state.params, enc))
        log.info("loaded pretrained encoder from %s", args.pretrained)

    # loader is built AFTER restore so a resumed run fast-forwards the
    # deterministic index stream to the restored step: batch order is a pure
    # function of (seed, step), so the resumed trajectory is order-exact
    loader = PrefetchLoader(train_ds, global_batch // n_proc, seed=cfg.seed,
                            num_workers=args.num_workers,
                            shard=proc_idx, num_shards=n_proc,
                            start_step=int(state.step))

    validator = Validator(cfg, trainer.model,
                          transfer_dtype=args.val_transfer_dtype)
    meter = AverageMeter()
    t0 = datetime.datetime.now()

    from dupl_tpu.utils.tb import TbWriter, cam_overlay_grid, image_grid
    tb = TbWriter(os.path.join(work_dir, "tb") if proc_idx == 0 else None)
    import time as _time
    step_t0 = _time.perf_counter()

    # CAM-overlay grids at every log interval (reference:
    # train_final_voc.py:493-508).  The step is jitted so its internal CAMs
    # aren't observable; one extra no-grad CAM dispatch per log interval
    # (compiled once) recreates them for the first few samples.
    from dupl_tpu.ops import image as image_ops

    @jax.jit
    def cam_fn(p, x):
        # accepts either wire format (uint8 production batches or f32)
        norm, denorm01 = image_ops.prepare_inputs(x)
        return trainer._multi_scale_cams(p, norm)[0], denorm01

    def log_cam_grids(state, dev_batch, cls_label_np, step):
        n = min(4, dev_batch["image"].shape[0])
        imgs = dev_batch["image"][:n]
        cams, imgs01 = cam_fn(state.params, imgs)
        cams = np.asarray(cams, np.float32) * cls_label_np[None, :n, None, None, :]
        imgs01 = np.asarray(imgs01, np.float32)
        tb.image("CAM/inputs", image_grid(imgs01), step)
        tb.image("CAM/cams_1", cam_overlay_grid(imgs01, cams[0]), step)
        tb.image("CAM/cams_2", cam_overlay_grid(imgs01, cams[1]), step)

    # Preemption safety: TPU spot/preemptible VMs deliver SIGTERM with a
    # grace window.  Trap it (and SIGINT) into a flag the train loop checks
    # each iteration: save a full checkpoint, then exit cleanly — together
    # with the order-exact --resume path, a preempted run loses at most one
    # step of work.  (The reference has no resume at all; a killed run
    # restarts from iter 0.)
    import signal

    preempted = {"sig": None}

    def _on_term(signum, frame):
        preempted["sig"] = signum

    for _sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(_sig, _on_term)

    with mesh:
        state = shard_state(mesh, state, fsdp=args.fsdp)
        # Host-side step counter (in lockstep with state.step, which advances
        # by exactly 1 per train_step): reading ``int(state.step)`` every
        # iteration would block on the previous step's completion and
        # re-serialise dispatch against the device.
        step = int(state.step)
        # stage H2D transfers ahead of the step (DeviceFeeder thread): the
        # step-N batch uploads while step N-1 computes
        from dupl_tpu.data.pipeline import DeviceFeeder
        feeder = DeviceFeeder(loader, lambda b: shard_batch(mesh, b),
                              keys=("image", "cls_label", "img_box"))
        for batch, dev_batch in feeder:
            if step >= cfg.max_iters:
                break
            if preempted["sig"] is not None:
                log.info("signal %d: checkpointing at step %d and exiting "
                         "(resume with --resume)", preempted["sig"], step)
                ckpt.save_state(ckpt_dir, state)
                jlog(event="preempted", step=step, signal=preempted["sig"])
                feeder.stop()
                tb.close()
                return
            if args.profile_iters and step == args.profile_iters[0]:
                jax.profiler.start_trace(os.path.join(work_dir, "profile"))
            state, metrics = trainer.train_step(state, dev_batch, step=step)
            meter.add(metrics)  # device scalars; synced at the log boundary
            if args.profile_iters and step == args.profile_iters[1]:
                jax.profiler.stop_trace()
                log.info("profiler trace written to %s/profile", work_dir)

            if (step + 1) % cfg.log_iters == 0:
                delta, eta = cal_eta(t0, step + 1, cfg.max_iters)
                lr = float(current_lr(cfg.optim, step, cfg.max_iters))
                dt = (_time.perf_counter() - step_t0) / cfg.log_iters
                step_t0 = _time.perf_counter()
                losses = {k: meter.pop(k) for k in
                          ("cls_loss", "ptc_loss", "seg_loss", "sim_loss", "reg_loss")}
                total_loss = meter.pop("loss")
                cls_score = meter.pop("cls_score")
                log.info(
                    "Iter: %d; Elapsed: %s; ETA: %s; LR: %.3e; phase: %s; "
                    "%.2f s/it; cls: %.4f | ptc: %.4f | seg: %.4f | "
                    "sim: %.4f | reg: %.4f",
                    step + 1, delta, eta, lr, phase_of(cfg, step), dt,
                    losses["cls_loss"], losses["ptc_loss"], losses["seg_loss"],
                    losses["sim_loss"], losses["reg_loss"])
                for k, v in losses.items():
                    tb.scalar(f"Loss/{k}", v, step + 1)
                tb.scalar("Loss/total", total_loss, step + 1)
                tb.scalar("train/cls_f1", cls_score, step + 1)
                tb.scalar("lr", lr, step + 1)
                tb.scalar("perf/s_per_iter", dt, step + 1)
                jlog(event="train", step=step + 1, lr=lr,
                     phase=phase_of(cfg, step), s_per_iter=round(dt, 4),
                     loss=round(total_loss, 6), cls_f1=round(cls_score, 4),
                     **{k: round(v, 6) for k, v in losses.items()})
                if tb.enabled and n_proc == 1:
                    # dev_batch is a GLOBAL array: recreating CAMs for the
                    # grid from one process only would stall the others'
                    # collective schedule, so grids are single-process-only
                    log_cam_grids(state, dev_batch, batch["cls_label"], step + 1)

            if (step + 1) % cfg.eval_iters == 0:
                ckpt.save_state(ckpt_dir, state)  # collective (all processes)
                eval_params = state.params
                if n_proc > 1 and not args.fsdp:
                    # replicated params: process 0's local copy IS the global
                    # state, but the Validator must not jit on arrays whose
                    # sharding spans other processes' devices — pull to host
                    eval_params = jax.tree.map(np.asarray, state.params)
                if args.fsdp and n_proc > 1:
                    # fsdp shards live on non-addressable devices; gather the
                    # full params for export/validation (collective — every
                    # process participates, only process 0 uses the result).
                    # tiled=True is REQUIRED for non-fully-addressable inputs
                    # and returns the assembled GLOBAL value per leaf (no
                    # stacked process dim) — tested end-to-end by
                    # tests/test_multihost.py::test_multihost_fsdp_matches_single
                    from jax.experimental import multihost_utils
                    eval_params = multihost_utils.process_allgather(
                        state.params, tiled=True)
                if proc_idx == 0:
                    # rank-0-only export + validation, like the reference
                    # (train_final_voc.py:512-536); params are replicated so
                    # process 0's copy is the global state
                    ckpt.export_weights(
                        os.path.join(ckpt_dir, "weights.npz"), eval_params)
                    log.info("validating at iter %d ...", step + 1)
                    res = validator.run(eval_params, val_ds, log=log,
                                        progress_every=200)
                    log.info("val cls F1: %.4f / %.4f",
                             res["cls_f1_1"], res["cls_f1_2"])
                    log.info("\n%s", res["table"])
                    for k in ("cam_1", "cam_2", "cam_aux_1", "cam_aux_2",
                              "seg_1", "seg_2"):
                        tb.scalar(f"val/{k}_miou", res[f"{k}_miou"], step + 1)
                    jlog(event="val", step=step + 1,
                         cls_f1_1=round(res["cls_f1_1"], 4),
                         cls_f1_2=round(res["cls_f1_2"], 4),
                         **{f"{k}_miou": round(res[f"{k}_miou"], 4)
                            for k in ("cam_1", "cam_2", "cam_aux_1",
                                      "cam_aux_2", "seg_1", "seg_2")})

            step += 1

    feeder.stop()  # also stops the underlying PrefetchLoader
    tb.close()
    log.info("done.")


if __name__ == "__main__":
    main()
