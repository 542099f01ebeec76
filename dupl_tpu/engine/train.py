"""The training engine: DuPL's full step as jitted, mesh-shardable functions.

The reference's hot loop (train_final_voc.py:174-472, SURVEY.md §3.1) per step:
6 no-grad ViT forwards (3 scales x flip x 2 branches) for multi-scale CAM, 2
(+2 strong-aug) grad forwards, PAR pseudo-label refinement with per-image
Python loops, sklearn GMM on the host, losses, DDP all-reduce.

Here each curriculum phase is ONE jitted function: CAM generation, PAR, GMM,
augmentation and the fused dual-student fwd/bwd all stay on device; the host
only picks which phase function to call (phase boundaries are Python ints).
Under a sharded batch the same functions are data-parallel: XLA inserts the
gradient all-reduce over the mesh's ``data`` axis (replacing
DistributedDataParallel, SURVEY.md §2.10).

Phase layout (VOC; train_final_voc.py:194,286,349,451-456):
  warmup  (step < cam_iters):  cls + ptc + sim
  seg     (step < gmm_iters):  + PAR-refined cross seg loss, dynamic thresholds
  full    (else):              + GMM noise filter + strong-view consistency
COCO variants (train_final_coco.py:241,312-333,441-448): an extra window where
pseudo-labels come from the aux CAM with static thresholds before switching to
main-CAM dynamic thresholds at ``refine_switch_iters``; different weights.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dupl_tpu.config import TrainConfig
from dupl_tpu.engine.optimizer import make_optimizer
from dupl_tpu.models.network import DualStudent, Student
from dupl_tpu.ops import augment as augment_ops
from dupl_tpu.ops import cam as cam_ops
from dupl_tpu.ops import gmm as gmm_ops
from dupl_tpu.ops import image as image_ops
from dupl_tpu.ops import losses as loss_ops
from dupl_tpu.ops import par as par_ops
from dupl_tpu.ops import schedule as schedule_ops


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar
    rng: jax.Array


class LossWeights(NamedTuple):
    cls: float
    ptc: float
    seg: float
    sim: float
    reg: float


def loss_weights(cfg: TrainConfig, step: int) -> LossWeights:
    """Host-side phase weight table.  The reference gates with ``<=`` while the
    compute branches use ``<`` (train_final_voc.py:194 vs :451) — a 1-step
    off-by-one at each boundary; we use ``<`` consistently."""
    if cfg.refine_switch_iters is None:  # VOC (train_final_voc.py:451-456)
        if step < cfg.cam_iters:
            return LossWeights(1.0, cfg.w_ptc, 0.0, cfg.w_sim, 0.0)
        if step < cfg.gmm_iters:
            return LossWeights(1.0, cfg.w_ptc, cfg.w_seg, cfg.w_sim, 0.0)
        return LossWeights(1.0, cfg.w_ptc, cfg.w_seg, cfg.w_sim, cfg.w_reg)
    # COCO (train_final_coco.py:441-448)
    if step < cfg.cam_iters:
        return LossWeights(1.0, 0.0, 0.0, 0.0, 0.0)
    if step < cfg.refine_switch_iters:
        return LossWeights(1.0, 0.0, cfg.w_seg, cfg.w_sim, 0.0)
    return LossWeights(1.0, cfg.w_ptc, cfg.w_seg, cfg.w_sim, cfg.w_reg)


def phase_of(cfg: TrainConfig, step: int) -> str:
    if step < cfg.cam_iters:
        return "warmup"
    if cfg.refine_switch_iters is not None and step < cfg.refine_switch_iters:
        return "seg_static"  # COCO: aux-CAM + static thresholds (coco:312-321)
    if step < cfg.gmm_iters:
        return "seg"
    return "full"


class Trainer:
    """Builds and caches the jitted phase step functions."""

    def __init__(self, cfg: TrainConfig, model: Optional[DualStudent] = None):
        self.cfg = cfg
        self.model = model or DualStudent(cfg.model)
        # Same params, cheaper activation stream for the no-grad CAM pass
        # (ModelConfig.cam_stream_dtype); param pytrees are identical.
        cam_dt = cfg.model.cam_stream_dtype
        if cam_dt is not None and cam_dt != cfg.model.stream_dtype:
            import dataclasses as _dc
            self.cam_model = DualStudent(
                _dc.replace(cfg.model, stream_dtype=cam_dt))
        else:
            self.cam_model = self.model
        self.tx = None
        self.tx_warmup = None
        self._steps: Dict[str, Any] = {}
        self.high_start = jnp.full(
            (cfg.model.num_fg,), cfg.high_thre, jnp.float32
        )
        self.high_target = jnp.asarray(cfg.high_thre_targets, jnp.float32)
        # COCO anneals thresholds from the refine switch, VOC from cam_iters
        self.anneal_start = (
            cfg.refine_switch_iters if cfg.refine_switch_iters is not None
            else cfg.cam_iters
        )

    # ------------------------------------------------------------------ state
    def init_state(self, rng: jax.Array, sample: jax.Array) -> TrainState:
        sample, _ = image_ops.prepare_inputs(sample)  # uint8 wire format ok
        params = self.model.init(rng, sample)
        self.tx = make_optimizer(self.cfg.optim, params, self.cfg.max_iters)
        # Warm-up phase: the reference's seg_loss is a graphless constant
        # (train_final_voc.py:244), so the decoder gets NO grads and torch's
        # AdamW skips it — no decay, no moments, no per-param step count.
        self.tx_warmup = make_optimizer(
            self.cfg.optim, params, self.cfg.max_iters, inactive=("decoder",))
        opt_state = self.tx.init(params)
        return TrainState(params, opt_state, jnp.int32(0), jax.random.PRNGKey(self.cfg.seed))

    # ------------------------------------------------------------- building blocks
    def _multi_scale_cams(self, params, inputs):
        """(2, B, h, w, C_fg) fused CAMs for both branches; no grad.  Merged
        at full resolution (reference semantics) or at
        input/``cam_merge_downscale`` (production recipes) — every consumer
        (``_refine`` at par.down_scale, ``_ptc_targets`` at patch resolution)
        downscales again anyway."""
        p = jax.lax.stop_gradient(params)
        d = self.cfg.cam_merge_downscale
        msize = (None if d is None
                 else (inputs.shape[1] // d, inputs.shape[2] // d))

        def one_branch(pb):
            return cam_ops.multi_scale_cam(
                lambda x: self.cam_model.module.apply(pb, x, method=Student.cam_only),
                inputs, self.cfg.cam_scales, merge_size=msize,
            )

        return jax.vmap(one_branch)(p)  # (cams, cams_aux) each (2, B, H, W, C)

    def _cams_with_grad_out(self, params, inputs):
        """Multi-scale CAMs (no grad) + the differentiated scale-1.0 forward.

        The scale-1.0 unflipped encoder pass is shared between the CAM fusion
        (stop-gradient, ``Student.forward_with_cams``) and the head outputs
        the losses differentiate — the reference runs it twice (the no-grad
        ``multi_scale_cam2_siamese`` pass, train_final_voc.py:216, and the
        grad forward :437); fusing them drops one full ViT forward per branch
        per step.  Non-1.0 scales run the (optionally bf16-stream) cam model
        on stop-gradient params.  Returns (cams, cams_aux, out) with ``out``
        the unflipped scale-1.0 StudentOut, branch-stacked."""
        d = self.cfg.cam_merge_downscale
        msize = (None if d is None
                 else (inputs.shape[1] // d, inputs.shape[2] // d))

        def one_branch(pb):
            return cam_ops.multi_scale_cam_with_outputs(
                lambda x: self.model.module.apply(
                    pb, x, method=Student.forward_with_cams),
                lambda x: self.cam_model.module.apply(
                    jax.lax.stop_gradient(pb), x, method=Student.cam_only),
                inputs, self.cfg.cam_scales, with_aux=True, merge_size=msize,
                split_flip=True,
            )

        return jax.vmap(one_branch)(params)

    def _par_fn(self, imgs, masks):
        p = self.cfg.par
        return par_ops.par_refine(
            imgs, masks, dilations=tuple(p.dilations), num_iter=p.num_iter,
            w1=p.w1, w2=p.w2, compute_dtype=p.compute_dtype,
        )

    def _refine(self, cams, inputs_denorm, cls_label, img_box, high_thre):
        """PAR-refined pseudo-labels per branch.  The branch axis folds into
        the CLASS axis (refine_cams_with_bkg view axis) so both students'
        refinements — and both background planes — ride one PAR kernel launch
        whose image-only affinity is computed once per image, not per
        branch."""
        cfg = self.cfg
        valid = cams * cls_label[None, :, None, None, :]
        return cam_ops.refine_cams_with_bkg(
            self._par_fn, inputs_denorm, valid, cls_label,
            high_thre=high_thre, low_thre=cfg.low_thre, img_box=img_box,
            ignore_index=cfg.ignore_index, down_scale=cfg.par.down_scale,
            class_budget=cfg.par.class_budget,
        )

    def _ptc_targets(self, cams_aux, cls_label, img_box, grid, high_thre, dynamic):
        """Affinity targets for the PTC loss from aux CAMs at patch resolution
        (train_final_voc.py:220-235).  The reference passes full-resolution
        ``img_box`` coords into the patch-res map and relies on torch slice
        clamping; ``box_mask`` reproduces that exactly."""
        cfg = self.cfg
        small = image_ops.resize_bilinear(cams_aux, (grid, grid), batch_dims=2)

        def one_branch(c):
            _, label = cam_ops.cam_to_label(
                c, cls_label, bkg_thre=cfg.bkg_thre, img_box=img_box,
                ignore_mid=True, high_thre=high_thre if dynamic else cfg.high_thre,
                low_thre=cfg.low_thre, ignore_index=cfg.ignore_index,
            )
            return cam_ops.label_to_aff_mask(label, cfg.ignore_index)

        return jax.vmap(one_branch)(small)

    def _high_thresholds(self, step, cls_label):
        cfg = self.cfg
        vec = schedule_ops.cosine_descent(
            self.high_start, self.high_target,
            step - self.anneal_start, cfg.max_iters - self.anneal_start,
        )
        return schedule_ops.per_sample_high_thre(vec, cls_label)  # (B,)

    # ------------------------------------------------------------------ phases
    def _common_losses(self, out, cls_label, aff_masks):
        """cls + ptc + sim — shared by all phases.  ``out`` leaves are
        branch-stacked (2, B, ...)."""
        cls_loss = (
            loss_ops.multilabel_soft_margin_loss(out.cls[0], cls_label)
            + loss_ops.multilabel_soft_margin_loss(out.cls_aux[0], cls_label)
            + loss_ops.multilabel_soft_margin_loss(out.cls[1], cls_label)
            + loss_ops.multilabel_soft_margin_loss(out.cls_aux[1], cls_label)
        )
        ptc_loss = (
            loss_ops.masked_ptc_loss(out.fmap[0], aff_masks[0])
            + loss_ops.masked_ptc_loss(out.fmap[1], aff_masks[1])
        )
        sim_loss = (
            loss_ops.discrepancy_loss(out.fmap[0], out.fmap[1])
            + loss_ops.discrepancy_loss(out.fmap[1], out.fmap[0])
        )
        return cls_loss, ptc_loss, sim_loss

    @staticmethod
    def _train_f1(cls_logits, cls_label):
        """Device-side train-time multilabel F1 of branch 1 (the reference
        logs sklearn F1 of sample 0 each step, train_final_voc.py:458-459;
        here: micro-F1 over the whole batch, no host sync)."""
        pred = cls_logits > 0
        true = cls_label > 0
        tp = jnp.sum(pred & true)
        fp = jnp.sum(pred & ~true)
        fn = jnp.sum(~pred & true)
        return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1)

    def _apply_updates(self, state: TrainState, grads, tx=None) -> TrainState:
        tx = tx or self.tx
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, state.rng)

    def _grads_warmup(self, state: TrainState, batch, weights):
        """Phase 1: cls + ptc + sim (train_final_voc.py:194-258)."""
        cfg = self.cfg
        inputs, _ = image_ops.prepare_inputs(batch["image"])
        cls_label, img_box = batch["cls_label"], batch["img_box"]
        grid = inputs.shape[1] // cfg.model.patch_size

        def loss_fn(params):
            _, cams_aux, out = self._cams_with_grad_out(params, inputs)
            aff = self._ptc_targets(cams_aux, cls_label, img_box, grid,
                                    high_thre=None, dynamic=False)
            cls_l, ptc_l, sim_l = self._common_losses(out, cls_label, aff)
            total = weights[0] * cls_l + weights[1] * ptc_l + weights[3] * sim_l
            return total, {"cls_loss": cls_l, "ptc_loss": ptc_l,
                           "sim_loss": sim_l, "seg_loss": jnp.float32(0),
                           "reg_loss": jnp.float32(0),
                           "cls_score": self._train_f1(out.cls[0], cls_label)}

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        metrics["loss"] = total
        return grads, metrics

    def _step_warmup(self, state: TrainState, batch, weights):
        grads, metrics = self._grads_warmup(state, batch, weights)
        return self._apply_updates(state, grads, tx=self.tx_warmup), metrics

    def _grads_seg(self, state: TrainState, batch, weights, *, static_refine: bool):
        """Phase 2: + cross-supervised seg loss from PAR-refined labels
        (train_final_voc.py:260-356).  ``static_refine`` is the COCO window
        where refinement uses aux CAMs + static thresholds
        (train_final_coco.py:312-321)."""
        cfg = self.cfg
        inputs, inputs_denorm = image_ops.prepare_inputs(batch["image"])
        cls_label, img_box = batch["cls_label"], batch["img_box"]
        b, h, w, _ = inputs.shape
        grid = h // cfg.model.patch_size

        high_b = self._high_thresholds(state.step, cls_label)
        dynamic = not static_refine

        def loss_fn(params):
            cams, cams_aux, out = self._cams_with_grad_out(params, inputs)
            aff = self._ptc_targets(cams_aux, cls_label, img_box, grid,
                                    high_thre=high_b, dynamic=dynamic)
            refined = self._refine(
                cams_aux if static_refine else cams,
                inputs_denorm, cls_label, img_box,
                high_thre=cfg.high_thre if static_refine else high_b,
            )
            cls_l, ptc_l, sim_l = self._common_losses(out, cls_label, aff)
            segs_up = image_ops.resize_bilinear(out.seg, (h, w), batch_dims=2)
            # cross supervision: student k learns from the OTHER student's labels
            seg_l = (
                loss_ops.seg_loss(segs_up[0], refined[1], cfg.ignore_index)
                + loss_ops.seg_loss(segs_up[1], refined[0], cfg.ignore_index)
            )
            total = (weights[0] * cls_l + weights[1] * ptc_l
                     + weights[2] * seg_l + weights[3] * sim_l)
            return total, {"cls_loss": cls_l, "ptc_loss": ptc_l,
                           "seg_loss": seg_l, "sim_loss": sim_l,
                           "reg_loss": jnp.float32(0),
                           "cls_score": self._train_f1(out.cls[0], cls_label)}

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        metrics["loss"] = total
        return grads, metrics

    def _step_seg(self, state: TrainState, batch, weights, *, static_refine: bool):
        grads, metrics = self._grads_seg(state, batch, weights,
                                         static_refine=static_refine)
        return self._apply_updates(state, grads), metrics

    def _grads_full(self, state: TrainState, batch, weights):
        """Phase 3: + GMM noise filtering + strong-view consistency
        (train_final_voc.py:286-447)."""
        cfg = self.cfg
        inputs, inputs_denorm = image_ops.prepare_inputs(batch["image"])
        cls_label, img_box = batch["cls_label"], batch["img_box"]
        b, h, w, _ = inputs.shape
        grid = h // cfg.model.patch_size

        rng = jax.random.fold_in(state.rng, state.step)
        aug01 = augment_ops.strong_augment(rng, inputs_denorm, cfg.aug_n, cfg.aug_m)
        inputs_aug = image_ops.normalize(aug01)
        ha = int(h * cfg.aug_downscale)
        wa = int(w * cfg.aug_downscale)
        inputs_aug_small = image_ops.resize_bilinear(inputs_aug, (ha, wa))

        high_b = self._high_thresholds(state.step, cls_label)

        def loss_fn(params):
            cams, cams_aux, out = self._cams_with_grad_out(params, inputs)
            aff = self._ptc_targets(cams_aux, cls_label, img_box, grid,
                                    high_thre=high_b, dynamic=True)
            refined = self._refine(cams, inputs_denorm, cls_label, img_box, high_b)
            out_aug = self.model.apply(params, inputs_aug_small)
            cls_l, ptc_l, sim_l = self._common_losses(out, cls_label, aff)

            segs_up = image_ops.resize_bilinear(out.seg, (h, w), batch_dims=2)
            segs_sg = jax.lax.stop_gradient(segs_up)

            # GMM filtering: per branch, CE of the branch's own segs against
            # its own refined labels drives the noise fit (voc:358-394)
            def filter_branch(k):
                ce = loss_ops.cross_entropy_map(segs_sg[k], refined[k], cfg.ignore_index)
                return gmm_ops.gmm_filter_labels(
                    ce, refined[k], num_iter=cfg.gmm.num_iter,
                    reg_covar=cfg.gmm.reg_covar, loss_floor=cfg.gmm.loss_floor,
                    min_pixels=cfg.gmm.min_pixels, valid_thre=cfg.gmm.valid_thre,
                    gamma=cfg.gmm.gamma, ignore_index=cfg.ignore_index,
                )

            filtered = jnp.stack([filter_branch(0), filter_branch(1)])

            seg_l = (
                loss_ops.seg_loss(segs_up[0], filtered[1], cfg.ignore_index)
                + loss_ops.seg_loss(segs_up[1], filtered[0], cfg.ignore_index)
            )

            # consistency: the strong view (trained) matches confident clean-view
            # predictions inside the other label's ignore region (voc:404-436)
            segs_aug = out_aug.seg[:, :, :, ::-1, :]  # flip back (B axis is 1)
            segs_aug = image_ops.resize_bilinear(segs_aug, (h, w), batch_dims=2)
            # conf = max(softmax) = exp(max - logsumexp): reductions over the
            # lane-padded class-minor tensor instead of materialising the full
            # softmax map (see ops/losses.py:cross_entropy_map note)
            m = jnp.max(segs_sg, axis=-1)
            conf = jnp.exp(m - jax.nn.logsumexp(segs_sg, axis=-1))
            pseudo = jnp.argmax(segs_sg, axis=-1).astype(jnp.int32)

            def reg_branch(k):
                uncertain = (filtered[1 - k] == cfg.ignore_index) & (
                    conf[k] > cfg.reg_conf_thre)
                target = jnp.where(uncertain, pseudo[k], cfg.ignore_index)
                ce = loss_ops.cross_entropy_map(segs_aug[k], target, cfg.ignore_index)
                cnt = jnp.sum(uncertain)
                return jnp.where(cnt > 0, jnp.sum(ce) / jnp.maximum(cnt, 1), 0.0)

            reg_l = reg_branch(0) + reg_branch(1)

            total = (weights[0] * cls_l + weights[1] * ptc_l + weights[2] * seg_l
                     + weights[3] * sim_l + weights[4] * reg_l)
            return total, {"cls_loss": cls_l, "ptc_loss": ptc_l,
                           "seg_loss": seg_l, "sim_loss": sim_l, "reg_loss": reg_l,
                           "cls_score": self._train_f1(out.cls[0], cls_label)}

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        metrics["loss"] = total
        return grads, metrics

    def _step_full(self, state: TrainState, batch, weights):
        grads, metrics = self._grads_full(state, batch, weights)
        return self._apply_updates(state, grads), metrics

    def full_phase_labels(self, params, batch, step):
        """Parity/debug hook: the phase-3 pseudo-labels before and after GMM
        noise filtering, exactly as :meth:`_grads_full`'s no-grad prelude
        computes them — ``(refined, filtered)`` each (2, B, H, W).  The GMM
        noise mask is ``(filtered == ignore) & (refined != ignore)``
        (train_final_voc.py:358-394 marks fg pixels with p(noise) > gamma).
        Used by the GMM-active co-training agreement test."""
        cfg = self.cfg
        inputs, inputs_denorm = image_ops.prepare_inputs(batch["image"])
        cls_label, img_box = batch["cls_label"], batch["img_box"]
        _, h, w, _ = inputs.shape
        high_b = self._high_thresholds(jnp.asarray(step), cls_label)
        cams, _, out = self._cams_with_grad_out(params, inputs)
        refined = self._refine(cams, inputs_denorm, cls_label, img_box, high_b)
        segs_up = image_ops.resize_bilinear(out.seg, (h, w), batch_dims=2)

        def filter_branch(k):
            ce = loss_ops.cross_entropy_map(segs_up[k], refined[k],
                                            cfg.ignore_index)
            return gmm_ops.gmm_filter_labels(
                ce, refined[k], num_iter=cfg.gmm.num_iter,
                reg_covar=cfg.gmm.reg_covar, loss_floor=cfg.gmm.loss_floor,
                min_pixels=cfg.gmm.min_pixels, valid_thre=cfg.gmm.valid_thre,
                gamma=cfg.gmm.gamma, ignore_index=cfg.ignore_index,
            )

        filtered = jnp.stack([filter_branch(0), filter_branch(1)])
        return refined, filtered

    # ------------------------------------------------------------------ public
    def grad_step(self, state: TrainState, batch,
                  step: Optional[int] = None) -> Tuple[Any, Dict]:
        """Phase-dispatched (grads, metrics) WITHOUT applying updates.

        Parity/debug hook: lets tests compare ``jax.value_and_grad`` output
        leaf-by-leaf against the reference's ``loss.backward()``
        (train_final_voc.py:470-472) before any optimizer state is involved."""
        if step is None:
            step = int(state.step)
        w = jnp.asarray(loss_weights(self.cfg, step), jnp.float32)
        phase = phase_of(self.cfg, step)
        fns = {
            "warmup": self._grads_warmup,
            "seg_static": functools.partial(self._grads_seg, static_refine=True),
            "seg": functools.partial(self._grads_seg, static_refine=False),
            "full": self._grads_full,
        }
        return fns[phase](state, batch, w)

    def step_fn(self, phase: str):
        """The jitted step function for a curriculum phase."""
        if phase not in self._steps:
            if phase == "warmup":
                fn = self._step_warmup
            elif phase == "seg_static":
                fn = functools.partial(self._step_seg, static_refine=True)
            elif phase == "seg":
                fn = functools.partial(self._step_seg, static_refine=False)
            elif phase == "full":
                fn = self._step_full
            else:
                raise ValueError(phase)
            self._steps[phase] = jax.jit(fn, donate_argnums=(0,))
        return self._steps[phase]

    def train_step(self, state: TrainState, batch,
                   step: Optional[int] = None) -> Tuple[TrainState, Dict]:
        """Dispatch on the host-known step count.

        Callers that track the step themselves (the train loop does — the
        count increments by exactly 1 per call) should pass it: reading
        ``int(state.step)`` blocks on the previous step's completion, which
        re-serialises dispatch against the device (~30 ms relay round-trip
        per iteration) that the deferred metric sync exists to avoid."""
        if step is None:
            step = int(state.step)
        w = jnp.asarray(loss_weights(self.cfg, step), jnp.float32)
        return self.step_fn(phase_of(self.cfg, step))(state, batch, w)
