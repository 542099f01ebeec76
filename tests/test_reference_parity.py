"""Numeric parity against the actual torch reference at /root/reference.

The highest-leverage correctness evidence available without VOC data or DeiT
checkpoints (VERDICT round 1, item 1): co-run the reference's own code and the
JAX rebuild on identical weights + identical synthetic batches and compare —
model forwards, PAR, pseudo-label refinement, the loss stack, one full train
step per curriculum phase, and the eval multi-scale merge.

Weight bridge + timm shim live in tests/ref_oracle.py.

Tolerances: pure tensor ops match to ~1e-5; deep fp32 forwards accumulate to
~1e-3 relative on logits; integer pseudo-labels must agree except at banding
boundaries where fp noise flips the comparison (>=99.5% of pixels).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ref_oracle

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(ref_oracle.REFERENCE_ROOT),
        reason="reference not present"),
    pytest.mark.slow,  # torch co-runs dominate suite wall time
]


@pytest.fixture(scope="module")
def R():
    return ref_oracle.load_reference()


def _seeded(seed):
    torch.manual_seed(seed)
    np.random.seed(seed)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

TINY_BACKBONE = "deit_tiny_patch16_224"  # 192-dim, depth 12 — real registry entry
TINY_JAX = "deit_tiny_patch16"


def make_pair(R, num_classes=21, aux_layer=-3, seed=0):
    """(torch siamese_network, repo DualStudent, stacked params) on identical
    random weights."""
    from dupl_tpu.config import ModelConfig
    from dupl_tpu.models.network import DualStudent

    _seeded(seed)
    net = R.model_dupl.siamese_network(
        TINY_BACKBONE, num_classes=num_classes, pretrained=False,
        aux_layer=aux_layer)
    net.eval()
    params = ref_oracle.convert_siamese_state(net)
    cfg = ModelConfig(backbone=TINY_JAX, num_classes=num_classes,
                      aux_layer=aux_layer, compute_dtype="float32")
    return net, DualStudent(cfg), params


def rand_batch(b=2, size=64, num_fg=20, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.rand(b, size, size, 3).astype(np.float32) * 2 - 1
    cls = (rs.rand(b, num_fg) > 0.7).astype(np.float32)
    cls[np.arange(b), rs.randint(0, num_fg, b)] = 1
    box = np.stack([
        np.asarray([4, size - 6, 2, size - 2], np.int32),
        np.asarray([0, size, 8, size - 8], np.int32),
    ])[:b]
    return x, cls, box


# ---------------------------------------------------------------------------
# (a) encoder forward
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("size", [224, 448])
def test_vit_base_forward_parity(R, size):
    """Full flagship ViT-B/16 forward vs the reference torch encoder on
    identical weights — at 224 (pretraining grid) and 448 (exercises the
    bicubic pos-embed interpolation, reference vit.py:294-297)."""
    import model.backbone.deit as deit
    from dupl_tpu.models.pretrained import convert_vit_state_dict
    from dupl_tpu.models.vit import ViT, VIT_CONFIGS

    _seeded(0)
    enc = deit.deit_base_patch16_224(pretrained=False, aux_layer=-3)
    enc.eval()
    state = {k: ref_oracle._np(v) for k, v in enc.state_dict().items()}
    params = {"params": convert_vit_state_dict(state, depth=12)}

    vit = ViT(VIT_CONFIGS["deit_base_patch16"], aux_layer=-3, dtype=jnp.float32)
    x = np.random.RandomState(1).rand(1, size, size, 3).astype(np.float32)

    with torch.no_grad():
        t_cls, t_tok, t_aux = enc.forward_features(ref_oracle.nchw(x))
    j_cls, j_tok, j_aux = jax.jit(vit.apply)(params, jnp.asarray(x))

    scale = np.abs(t_tok.numpy()).max()
    np.testing.assert_allclose(np.asarray(j_tok), t_tok.numpy(),
                               atol=2e-3 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               atol=2e-3 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(j_aux), t_aux.numpy(),
                               atol=2e-3 * scale, rtol=0)


def test_student_forward_and_cam_parity(R):
    """Student heads (cls/seg/fmap/cls_aux) and cam_only vs the reference
    ``network`` (model/model_dupl.py:69-106) on identical weights."""
    net, model, params = make_pair(R)
    x, _, _ = rand_batch(b=2, size=64)

    with torch.no_grad():
        t_cls, t_seg, t_fmap, t_aux = net.branch1(ref_oracle.nchw(x))
        t_cam_aux, t_cam = net.branch1(ref_oracle.nchw(x), cam_only=True)

    out = model.apply_branch(params, 0, jnp.asarray(x))
    cam, cam_aux = model.cam_only(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(out.cls), t_cls.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.cls_aux), t_aux.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.fmap), ref_oracle.nhwc(t_fmap), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out.seg), ref_oracle.nhwc(t_seg), atol=5e-4)
    np.testing.assert_allclose(np.asarray(cam[0]), ref_oracle.nhwc(t_cam), atol=5e-4)
    np.testing.assert_allclose(np.asarray(cam_aux[0]), ref_oracle.nhwc(t_cam_aux), atol=5e-4)


# ---------------------------------------------------------------------------
# (b) PAR
# ---------------------------------------------------------------------------

def test_par_parity(R):
    """ops/par.par_refine vs model/PAR.py:39-89 — full dilations, 10 iters."""
    from dupl_tpu.ops.par import par_refine

    _seeded(0)
    imgs = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    masks = np.random.RandomState(3).rand(2, 64, 64, 6).astype(np.float32)
    masks /= masks.sum(-1, keepdims=True)

    par = R.PAR.PAR(dilations=[1, 2, 4, 8, 12, 24], num_iter=10)
    with torch.no_grad():
        t = par(ref_oracle.nchw(imgs), ref_oracle.nchw(masks))

    j = par_refine(jnp.asarray(imgs), jnp.asarray(masks), use_pallas=False)
    np.testing.assert_allclose(np.asarray(j), ref_oracle.nhwc(t), atol=2e-5)


# ---------------------------------------------------------------------------
# (c) refine_cams_with_bkg_v2 / _dynamic_thres
# ---------------------------------------------------------------------------

def _torch_refine(R, dynamic, imgs01, cams, cls, box, high, low=0.25):
    par = R.PAR.PAR(dilations=[1, 2, 4, 8, 12, 24], num_iter=10)
    ti = ref_oracle.nchw(imgs01)
    tc = ref_oracle.nchw(cams)
    tl = torch.tensor(cls)
    tb = torch.tensor(box)
    with torch.no_grad():
        if dynamic:
            b, _, h, w = ti.shape
            hmap = torch.tensor(high)[:, None, None, None].expand(b, 1, h, w)
            lab = R.cam_helper.refine_cams_with_dynamic_thres(
                par, ti, cams=tc, cls_labels=tl, high_thre_map=hmap,
                low_thre=low, ignore_index=255, img_box=tb)
        else:
            lab = R.cam_helper.refine_cams_with_bkg_v2(
                par, ti, cams=tc, cls_labels=tl, high_thre=high,
                low_thre=low, ignore_index=255, img_box=tb)
    return lab.numpy().astype(np.int32)


@pytest.mark.parametrize("dynamic", [False, True])
def test_refine_cams_parity(R, dynamic):
    """Batched -inf-masked refinement vs the reference's per-image valid-key
    loop (utils/cam_helper.py:338-431)."""
    from dupl_tpu.ops.cam import refine_cams_with_bkg
    from dupl_tpu.ops.par import par_refine

    rs = np.random.RandomState(4)
    b, size, num_fg = 2, 64, 5
    imgs01 = rs.rand(b, size, size, 3).astype(np.float32)
    cls = np.zeros((b, num_fg), np.float32)
    cls[0, [0, 2]] = 1
    cls[1, [1, 3, 4]] = 1
    cams = rs.rand(b, size, size, num_fg).astype(np.float32) * cls[:, None, None, :]
    box = np.stack([[4, 60, 2, 62], [0, 64, 8, 56]]).astype(np.int32)
    high = np.asarray([0.62, 0.55], np.float32) if dynamic else 0.7

    t_lab = _torch_refine(R, dynamic, imgs01, cams, cls, box, high)

    j_lab = refine_cams_with_bkg(
        lambda i, m: par_refine(i, m, use_pallas=False),
        jnp.asarray(imgs01), jnp.asarray(cams), jnp.asarray(cls),
        high_thre=jnp.asarray(high, jnp.float32), low_thre=0.25,
        img_box=jnp.asarray(box), ignore_index=255, down_scale=2)

    agree = np.mean(np.asarray(j_lab) == t_lab)
    assert agree >= 0.995, f"refined-label agreement {agree:.4f}"


# ---------------------------------------------------------------------------
# multi-scale CAM fusion
# ---------------------------------------------------------------------------

def test_multi_scale_cam_parity(R):
    """multi_scale_cam vs cam_helper.multi_scale_cam2_siamese on identical
    weights (scales 1.0/0.5/1.5 + flip + minmax norm)."""
    from dupl_tpu.models.network import Student
    from dupl_tpu.ops.cam import multi_scale_cam

    net, model, params = make_pair(R)
    x, _, _ = rand_batch(b=2, size=64, seed=5)
    scales = (1.0, 0.5, 1.5)

    with torch.no_grad():
        t_cam, t_aux = R.cam_helper.multi_scale_cam2_siamese(
            net, inputs=ref_oracle.nchw(x), scales=scales, branch=1)

    p0 = model.branch(params, 0)
    j_cam, j_aux = multi_scale_cam(
        lambda z: model.module.apply(p0, z, method=Student.cam_only),
        jnp.asarray(x), scales)

    np.testing.assert_allclose(np.asarray(j_cam), ref_oracle.nhwc(t_cam), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_aux), ref_oracle.nhwc(t_aux), atol=2e-3)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def test_loss_function_parity(R):
    from dupl_tpu.ops import losses as L

    rs = np.random.RandomState(6)
    fmap = rs.randn(2, 8, 8, 16).astype(np.float32)
    aff = rs.choice([0, 1, 255], size=(2, 64, 64)).astype(np.int64)
    t_ptc = R.losses.get_masked_ptc_loss(
        ref_oracle.nchw(fmap), torch.tensor(aff))
    j_ptc = L.masked_ptc_loss(jnp.asarray(fmap), jnp.asarray(aff))
    np.testing.assert_allclose(float(j_ptc), float(t_ptc), rtol=1e-5)

    logits = rs.randn(2, 21, 32, 32).astype(np.float32)
    labels = rs.choice([0, 1, 5, 20, 255], size=(2, 32, 32),
                       p=[0.3, 0.25, 0.2, 0.15, 0.1]).astype(np.int64)
    t_seg = R.losses.get_seg_loss(torch.tensor(logits), torch.tensor(labels))
    j_seg = L.seg_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(labels))
    np.testing.assert_allclose(float(j_seg), float(t_seg), rtol=1e-5)


# ---------------------------------------------------------------------------
# (d) full train step, all three phases
# ---------------------------------------------------------------------------

def _torch_step(R, net, batch, cfg, n_iter, with_grad=False, optim=None):
    """The reference VOC train-step loss stack (train_final_voc.py:174-472),
    co-run on the reference's own helpers.  Strong aug is the n=0 limit
    (pure hflip) to keep both sides deterministic.

    ``with_grad=True`` reproduces the reference's autograd topology — the
    pseudo-label stack stays out of the graph exactly as the reference's
    ``torch.no_grad()`` blocks place it, the loss stack differentiates the
    grad forward — then runs ``total.backward()`` (voc:470) and, if ``optim``
    is given, one ``PolyWarmupAdamW.step()`` (voc:471-472).  Returns the loss
    dict with ``grads`` (bridged to the branch-stacked pytree layout) added.
    """
    import contextlib
    import torch.nn.functional as F
    from sklearn.mixture import GaussianMixture
    from dupl_tpu.engine.train import loss_weights

    x, cls_np, box_np = batch
    inputs = ref_oracle.nchw(x)
    cls_label = torch.tensor(cls_np)
    img_box = torch.tensor(box_np)
    mean = torch.tensor([0.485, 0.456, 0.406])[None, :, None, None]
    std = torch.tensor([0.229, 0.224, 0.225])[None, :, None, None]
    inputs_denorm = inputs * std + mean
    par = R.PAR.PAR(dilations=list(cfg.par.dilations), num_iter=cfg.par.num_iter)
    ce = torch.nn.CrossEntropyLoss(ignore_index=255, reduction="none")
    scales = tuple(cfg.cam_scales)
    b = inputs.shape[0]
    grad_ctx = contextlib.nullcontext if with_grad else torch.no_grad

    # ---- pseudo-label stack: out of autograd, like the reference's no_grad
    with torch.no_grad():
        cams_1, cams_aux_1 = R.cam_helper.multi_scale_cam2_siamese(
            net, inputs=inputs, scales=scales, branch=1)
        cams_2, cams_aux_2 = R.cam_helper.multi_scale_cam2_siamese(
            net, inputs=inputs, scales=scales, branch=2)

    # ---- grad forward (train_final_voc.py:437)
    with grad_ctx():
        res = net(inputs)
        cls_1, segs_1, fmap_1, cls_aux_1 = res["branch1"]
        cls_2, segs_2, fmap_2, cls_aux_2 = res["branch2"]

        cls_loss = (F.multilabel_soft_margin_loss(cls_1, cls_label)
                    + F.multilabel_soft_margin_loss(cls_aux_1, cls_label)
                    + F.multilabel_soft_margin_loss(cls_2, cls_label)
                    + F.multilabel_soft_margin_loss(cls_aux_2, cls_label))

    if n_iter < cfg.cam_iters:  # phase 1: static PTC thresholds
        with torch.no_grad():
            r1 = F.interpolate(cams_aux_1, size=fmap_1.shape[2:], mode="bilinear",
                               align_corners=False)
            _, pl1 = R.cam_helper.cam_to_label(
                r1, cls_label=cls_label, img_box=img_box, ignore_mid=True,
                bkg_thre=cfg.bkg_thre, high_thre=cfg.high_thre,
                low_thre=cfg.low_thre, ignore_index=255)
            r2 = F.interpolate(cams_aux_2, size=fmap_2.shape[2:], mode="bilinear",
                               align_corners=False)
            _, pl2 = R.cam_helper.cam_to_label(
                r2, cls_label=cls_label, img_box=img_box, ignore_mid=True,
                bkg_thre=cfg.bkg_thre, high_thre=cfg.high_thre,
                low_thre=cfg.low_thre, ignore_index=255)
            aff1 = R.cam_helper.label_to_aff_mask(pl1)
            aff2 = R.cam_helper.label_to_aff_mask(pl2)
        with grad_ctx():
            ptc = (R.losses.get_masked_ptc_loss(fmap_1, aff1)
                   + R.losses.get_masked_ptc_loss(fmap_2, aff2))
            seg = torch.zeros(())
            reg = torch.zeros(())
    else:
        with torch.no_grad():
            # cosine-descending per-class thresholds (train_final_voc.py:260-276)
            t = (n_iter - cfg.cam_iters) / (cfg.max_iters - cfg.cam_iters - 1)
            hstart = torch.full((len(cfg.high_thre_targets),), cfg.high_thre)
            htarget = torch.tensor(cfg.high_thre_targets)
            high_thres = hstart + (htarget - hstart) * (1 - torch.cos(torch.tensor(np.pi * t))) / 2
            high_b = torch.stack([
                torch.max(high_thres[torch.nonzero(cls_label[i]).squeeze(-1)])
                for i in range(b)])
            hmask = high_b[:, None, None, None].expand(b, 1, *inputs.shape[2:])

            r1 = F.interpolate(cams_aux_1, size=fmap_1.shape[2:], mode="bilinear",
                               align_corners=False)
            _, pl1 = R.cam_helper.cam_to_label_dynamic_cls(
                r1, cls_label=cls_label, img_box=img_box, ignore_mid=True,
                bkg_thre=cfg.bkg_thre, high_thre=high_b,
                low_thre=cfg.low_thre, ignore_index=255)
            r2 = F.interpolate(cams_aux_2, size=fmap_2.shape[2:], mode="bilinear",
                               align_corners=False)
            _, pl2 = R.cam_helper.cam_to_label_dynamic_cls(
                r2, cls_label=cls_label, img_box=img_box, ignore_mid=True,
                bkg_thre=cfg.bkg_thre, high_thre=high_b,
                low_thre=cfg.low_thre, ignore_index=255)
            aff1 = R.cam_helper.label_to_aff_mask(pl1)
            aff2 = R.cam_helper.label_to_aff_mask(pl2)

            rep = cls_label[:, :, None, None].expand(-1, -1, *inputs.shape[2:])
            ref1 = R.cam_helper.refine_cams_with_dynamic_thres(
                par, inputs_denorm, cams=cams_1 * rep, cls_labels=cls_label,
                high_thre_map=hmask, low_thre=cfg.low_thre, ignore_index=255,
                img_box=img_box)
            ref2 = R.cam_helper.refine_cams_with_dynamic_thres(
                par, inputs_denorm, cams=cams_2 * rep, cls_labels=cls_label,
                high_thre_map=hmask, low_thre=cfg.low_thre, ignore_index=255,
                img_box=img_box)

        with grad_ctx():
            ptc = (R.losses.get_masked_ptc_loss(fmap_1, aff1)
                   + R.losses.get_masked_ptc_loss(fmap_2, aff2))
            su1 = F.interpolate(segs_1, size=ref1.shape[1:], mode="bilinear",
                                align_corners=False)
            su2 = F.interpolate(segs_2, size=ref2.shape[1:], mode="bilinear",
                                align_corners=False)

        if n_iter < cfg.gmm_iters:  # phase 2
            with grad_ctx():
                seg = (R.losses.get_seg_loss(su1, ref2.long())
                       + R.losses.get_seg_loss(su2, ref1.long()))
            reg = torch.zeros(())
            gmm_fired = False
        else:  # phase 3: GMM filtering + consistency reg (voc:358-447)
            with torch.no_grad():
                l1 = ce(su1.detach(), ref1.long())
                l2 = ce(su2.detach(), ref2.long())
                roi1 = (ref1 != 0) & (ref1 != 255)
                roi2 = (ref2 != 0) & (ref2 != 255)
                gmm_fired = False
                for i in range(b):
                    for lm, roi, ref in ((l1, roi1, ref1), (l2, roi2, ref2)):
                        vals = lm[i][roi[i]]
                        vals = vals[vals > cfg.gmm.loss_floor]
                        if vals.numel() > cfg.gmm.min_pixels:
                            g = GaussianMixture(n_components=2, max_iter=10,
                                                tol=1e-2, reg_covar=5e-4,
                                                random_state=0)
                            g.fit(vals[:, None].numpy())
                            if abs(g.means_[0, 0] - g.means_[1, 0]) > cfg.gmm.valid_thre:
                                gmm_fired = True
                                ni = g.means_.argmax()
                                prob = g.predict_proba(
                                    lm[i].reshape(-1, 1).numpy())
                                noise = torch.tensor(
                                    prob[:, ni] > cfg.gmm.gamma
                                ).reshape(ref.shape[1:])
                                noise = noise & (ref[i] != 0)
                                ref[i][noise] = 255
            with grad_ctx():
                seg = (R.losses.get_seg_loss(su1, ref2.long())
                       + R.losses.get_seg_loss(su2, ref1.long()))

                # strong view = n=0 RandAugment = pure hflip at 0.75 scale
                # (imutils.py:305-317 + model_dupl.py:194-206)
                x_aug = torch.flip(inputs, dims=[3])
                x_aug = F.interpolate(x_aug, scale_factor=cfg.aug_downscale,
                                      mode="bilinear", align_corners=False)
                _, sa1, _, _ = net.branch1(x_aug)
                _, sa2, _, _ = net.branch2(x_aug)
                sa1 = F.interpolate(torch.flip(sa1, dims=[3]),
                                    size=inputs.shape[2:], mode="bilinear",
                                    align_corners=False)
                sa2 = F.interpolate(torch.flip(sa2, dims=[3]),
                                    size=inputs.shape[2:], mode="bilinear",
                                    align_corners=False)
            with torch.no_grad():
                ps1 = su1.detach().max(1)[1]
                ps2 = su2.detach().max(1)[1]
                cm1 = torch.softmax(su1.detach(), dim=1).max(1)[0]
                cm2 = torch.softmax(su2.detach(), dim=1).max(1)[0]
                un1 = (ref2 == 255) & (cm1 > cfg.reg_conf_thre)
                un2 = (ref1 == 255) & (cm2 > cfg.reg_conf_thre)
                ps1[~un1] = 255
                ps2[~un2] = 255
            with grad_ctx():
                reg = torch.zeros(())
                if un1.sum() > 0:
                    reg = reg + ce(sa1, ps1).sum() / un1.sum()
                if un2.sum() > 0:
                    reg = reg + ce(sa2, ps2).sum() / un2.sum()

    with grad_ctx():
        f1 = fmap_1.reshape(fmap_1.shape[0], fmap_1.shape[1], -1)
        f2 = fmap_2.reshape(fmap_2.shape[0], fmap_2.shape[1], -1)
        cos = torch.nn.CosineSimilarity(dim=-1, eps=1e-6)
        sim = (1 + cos(f1.detach(), f2).mean()) + (1 + cos(f2.detach(), f1).mean())

    out = {"cls_loss": float(cls_loss), "ptc_loss": float(ptc),
           "seg_loss": float(seg), "sim_loss": float(sim), "reg_loss": float(reg)}
    if n_iter >= cfg.gmm_iters:
        out["gmm_fired"] = gmm_fired

    if with_grad:
        w = loss_weights(cfg, n_iter)
        total = (w.cls * cls_loss + w.ptc * ptc + w.seg * seg
                 + w.sim * sim + w.reg * reg)
        net.zero_grad(set_to_none=True)
        if optim is not None:
            optim.zero_grad(set_to_none=True)
        total.backward()
        out["grads"] = ref_oracle.convert_siamese_grads(net)
        out["total"] = float(total)
        if optim is not None:
            optim.step()
    return out


@pytest.mark.parametrize("step", [100, 3000, 9000])
def test_train_step_loss_parity(R, step):
    """One full train step per curriculum phase: every loss term matches the
    reference step (train_final_voc.py:174-472) on identical weights + batch."""
    from dupl_tpu.config import GmmConfig, ModelConfig, voc_config
    from dupl_tpu.engine.train import Trainer, TrainState

    net, model, params = make_pair(R, seed=7)
    cfg = voc_config(
        model=ModelConfig(backbone=TINY_JAX, compute_dtype="float32"),
        aug_n=0,  # strong aug degenerates to hflip — deterministic co-run
        cam_iters=2000, gmm_iters=8000, max_iters=20000,
    )
    batch_np = rand_batch(b=2, size=64, seed=8)

    t_losses = _torch_step(R, net, batch_np, cfg, n_iter=step)

    trainer = Trainer(cfg, model=model)
    x, cls, box = batch_np
    jbatch = {"image": jnp.asarray(x), "cls_label": jnp.asarray(cls),
              "img_box": jnp.asarray(box)}
    state = trainer.init_state(jax.random.PRNGKey(0), jbatch["image"][:1])
    state = TrainState(params, state.opt_state, jnp.int32(step), state.rng)
    _, metrics = trainer.train_step(state, jbatch)

    for key in ("cls_loss", "ptc_loss", "seg_loss", "sim_loss", "reg_loss"):
        ref_v, jax_v = t_losses[key], float(metrics[key])
        tol = 2e-3 * max(1.0, abs(ref_v))
        if key in ("seg_loss", "reg_loss") and t_losses.get("gmm_fired"):
            tol = 0.05 * max(1.0, abs(ref_v))  # sklearn vs masked-EM noise masks
        assert abs(ref_v - jax_v) <= tol, (
            f"step {step} {key}: torch {ref_v:.6f} vs jax {jax_v:.6f}")


# ---------------------------------------------------------------------------
# (d2) gradient- and update-level parity (VERDICT r2 item 1)
# ---------------------------------------------------------------------------

def _grad_cfg(phase_step):
    """Tiny VOC recipe for autograd co-runs.  GMM is pinned OFF via an
    unreachable ``min_pixels`` (both sides gate on it) so phase-3 gradients
    are compared on identical noise masks — sklearn-vs-EM mask parity is
    covered separately by test_train_step_loss_parity.  LR/warmup are scaled
    so updates are large enough to measure (both optimizers start their
    schedule at count 0, so LRs agree step-for-step)."""
    from dupl_tpu.config import GmmConfig, ModelConfig, OptimConfig, voc_config

    return voc_config(
        model=ModelConfig(backbone=TINY_JAX, compute_dtype="float32"),
        optim=OptimConfig(lr=1e-3, warmup_iters=2, warmup_ratio=0.1),
        gmm=GmmConfig(min_pixels=10**9),
        aug_n=0,
        cam_iters=2000, gmm_iters=8000, max_iters=20000,
    )


def _flat_with_paths(tree):
    import jax.tree_util as jtu
    leaves = jtu.tree_flatten_with_path(tree)[0]
    return {jtu.keystr(p): np.asarray(v) for p, v in leaves}


def _assert_tree_close(jtree, ttree, rel, skip=(), what=""):
    """Leaf-by-leaf: |j - t| <= rel * max|t| per leaf (global-scale floor for
    all-zero leaves such as phase-gated heads)."""
    jf, tf = _flat_with_paths(jtree), _flat_with_paths(ttree)
    assert jf.keys() == tf.keys()
    gscale = max(np.abs(t).max() for t in tf.values())
    for k in sorted(jf):
        if any(s in k for s in skip):
            continue
        scale = max(np.abs(tf[k]).max(), 1e-3 * gscale)
        np.testing.assert_allclose(
            jf[k], tf[k], atol=rel * scale, rtol=0,
            err_msg=f"{what} leaf {k} (scale {scale:.3e})")


@pytest.mark.parametrize("step", [100, 3000, 9000])
def test_gradient_parity(R, step):
    """jax.value_and_grad through the full phase loss stack vs the reference's
    ``loss.backward()`` (train_final_voc.py:470) on identical weights+batch:
    every parameter's gradient, leaf-by-leaf.  Catches wrong vjps (PTC Gram,
    fg/bg-balanced seg CE, stop-gradient placements, the strong-aug branch)
    that are invisible to loss-value comparison."""
    from dupl_tpu.engine.train import Trainer, TrainState, loss_weights

    net, model, params = make_pair(R, seed=11)
    cfg = _grad_cfg(step)
    batch_np = rand_batch(b=2, size=64, seed=12)

    t_out = _torch_step(R, net, batch_np, cfg, n_iter=step, with_grad=True)

    trainer = Trainer(cfg, model=model)
    x, cls, box = batch_np
    jbatch = {"image": jnp.asarray(x), "cls_label": jnp.asarray(cls),
              "img_box": jnp.asarray(box)}
    state = trainer.init_state(jax.random.PRNGKey(0), jbatch["image"][:1])
    state = TrainState(params, state.opt_state, jnp.int32(step), state.rng)
    grads, metrics = trainer.grad_step(state, jbatch, step=step)

    # anchor: the weighted totals agree
    w = loss_weights(cfg, step)
    j_total = float(w.cls * metrics["cls_loss"] + w.ptc * metrics["ptc_loss"]
                    + w.seg * metrics["seg_loss"] + w.sim * metrics["sim_loss"]
                    + w.reg * metrics["reg_loss"])
    assert abs(j_total - t_out["total"]) <= 2e-3 * max(1.0, abs(t_out["total"]))

    # pos_embed is frozen in torch (requires_grad=False -> zeros through the
    # bridge) but receives a (discarded-by-multiplier-0) gradient in optax
    _assert_tree_close(grads, t_out["grads"], rel=5e-3,
                       skip=("pos_embed",), what=f"grad step={step}")


@pytest.mark.parametrize("step", [100, 3000, 9000])
def test_update_parity(R, step):
    """Three consecutive optimizer updates per phase: PolyWarmupAdamW
    (utils/optimizer.py:51-68, 4 groups, 10x head LR, train_helper.py:21-53)
    vs the optax chain, driven by IDENTICAL (bridged torch) gradients each
    step so the update *rule* — schedule, group multipliers, decoupled decay,
    per-param bias correction, and the skip-params-without-grads semantics
    (decoder during warm-up) — is isolated from fp32 gradient noise.
    Gradient agreement itself is test_gradient_parity's job."""
    import optax
    from dupl_tpu.engine.train import Trainer, TrainState, phase_of

    net, model, params0 = make_pair(R, seed=13)
    cfg = _grad_cfg(step)
    optim = ref_oracle.make_poly_warmup_adamw(R, net, cfg.optim, cfg.max_iters)

    trainer = Trainer(cfg, model=model)
    x0 = rand_batch(b=2, size=64, seed=20)[0]
    trainer.init_state(jax.random.PRNGKey(0), jnp.asarray(x0)[:1])
    params = params0
    opt_state = trainer.tx.init(params)
    p_init = _flat_with_paths(params0)

    for k in range(3):
        batch_np = rand_batch(b=2, size=64, seed=30 + k)
        t_out = _torch_step(R, net, batch_np, cfg, n_iter=step + k,
                            with_grad=True, optim=optim)

        tx = (trainer.tx_warmup if phase_of(cfg, step + k) == "warmup"
              else trainer.tx)
        updates, opt_state = tx.update(t_out["grads"], opt_state, params)
        params = optax.apply_updates(params, updates)

        t_params = _flat_with_paths(ref_oracle.convert_siamese_state(net))
        j_params = _flat_with_paths(params)
        gscale = max(np.abs(t_params[key] - p_init[key]).max()
                     for key in t_params)
        assert gscale > 0, "updates vanished — test is vacuous"
        for key in sorted(j_params):
            dj = j_params[key] - p_init[key]
            dt = t_params[key] - p_init[key]
            # torch computes sqrt(nu)/sqrt(bc2), optax sqrt(nu/bc2): few-ulp
            # rounding differences; anything semantic (group, decay, bias
            # correction, schedule) moves updates by >=1% of scale
            scale = max(np.abs(dt).max(), 1e-3 * gscale)
            np.testing.assert_allclose(
                dj, dt, atol=5e-3 * scale, rtol=0,
                err_msg=f"update {k + 1} @ step {step + k} leaf {key} "
                        f"(update scale {scale:.3e})")


# ---------------------------------------------------------------------------
# (d3) 20-step co-training trajectory (VERDICT r2 item 2)
# ---------------------------------------------------------------------------

def test_cotraining_trajectory(R):
    """Both sides actually TRAIN for 20 steps from identical weights on
    identical batches — torch ``loss.backward(); PolyWarmupAdamW.step()``
    (train_final_voc.py:470-472) vs the jitted phase steps + optax — across
    all three phase boundaries (warmup 0-4, seg 5-11, full 12-19).  The loss
    curves must track within 1e-2 relative at every step, and the final
    param deltas must agree at the norm level.

    GMM is pinned OFF via min_pixels (both sides honor it): sklearn-EM vs
    masked-EM noise masks are only approximately equal, and a single
    flipped ignore-pixel would contaminate the deterministic comparison —
    GMM numeric parity is covered by test_train_step_loss_parity[9000].
    Strong aug is the n=0 (pure hflip) limit on both sides."""
    import optax
    from dupl_tpu.config import GmmConfig, ModelConfig, OptimConfig, voc_config
    from dupl_tpu.engine.train import Trainer, TrainState, loss_weights

    net, model, params0 = make_pair(R, seed=17)
    cfg = voc_config(
        model=ModelConfig(backbone=TINY_JAX, compute_dtype="float32"),
        optim=OptimConfig(lr=1e-4, warmup_iters=3, warmup_ratio=0.1),
        gmm=GmmConfig(min_pixels=10**9),
        aug_n=0,
        cam_iters=5, gmm_iters=12, max_iters=20,
    )
    optim = ref_oracle.make_poly_warmup_adamw(R, net, cfg.optim, cfg.max_iters)

    trainer = Trainer(cfg, model=model)
    x0 = rand_batch(b=2, size=64, seed=100)[0]
    state = trainer.init_state(jax.random.PRNGKey(0), jnp.asarray(x0)[:1])
    # host snapshot first: the jitted steps donate the state, deleting the
    # original param buffers after step 1
    p_init = _flat_with_paths(params0)
    params_dev = jax.tree.map(jnp.array, params0)
    state = TrainState(params_dev, trainer.tx.init(params_dev), jnp.int32(0),
                       state.rng)

    keys = ("cls_loss", "ptc_loss", "seg_loss", "sim_loss", "reg_loss")
    max_rel = 0.0
    for k in range(cfg.max_iters):
        batch_np = rand_batch(b=2, size=64, seed=100 + k)
        t_out = _torch_step(R, net, batch_np, cfg, n_iter=k,
                            with_grad=True, optim=optim)
        x, cls, box = batch_np
        jbatch = {"image": jnp.asarray(x), "cls_label": jnp.asarray(cls),
                  "img_box": jnp.asarray(box)}
        state, metrics = trainer.train_step(state, jbatch, step=k)

        w = loss_weights(cfg, k)
        j_total = float(w.cls * metrics["cls_loss"] + w.ptc * metrics["ptc_loss"]
                        + w.seg * metrics["seg_loss"] + w.sim * metrics["sim_loss"]
                        + w.reg * metrics["reg_loss"])
        rel = abs(j_total - t_out["total"]) / max(1.0, abs(t_out["total"]))
        max_rel = max(max_rel, rel)
        assert rel < 1e-2, (
            f"step {k}: total torch {t_out['total']:.6f} vs jax "
            f"{j_total:.6f} (rel {rel:.2e})")
        for key in keys:
            relk = abs(float(metrics[key]) - t_out[key]) / max(
                1.0, abs(t_out[key]))
            assert relk < 1e-2, (
                f"step {k} {key}: torch {t_out[key]:.6f} vs jax "
                f"{float(metrics[key]):.6f}")

    # final params: 20 steps of independently-computed fp32 grads accumulate
    # noise that Adam AMPLIFIES early on (update ~ g/sqrt(nu): with nu built
    # from 1-20 samples, a small relative grad difference moves the
    # normalised update much more) — measured ~13% on the worst leaf
    # (encoder norm.bias) with all 20 loss values tracking <1e-2.  The 0.2
    # bound is still sharply discriminative: any *semantic* divergence
    # (wrong group multiplier = 10x, decay, schedule, bias correction)
    # shifts deltas by >=100%.
    tp = _flat_with_paths(ref_oracle.convert_siamese_state(net))
    jp = _flat_with_paths(state.params)
    gscale = max(np.linalg.norm(tp[key] - p_init[key]) for key in tp)
    for key in sorted(jp):
        dj = jp[key] - p_init[key]
        dt = tp[key] - p_init[key]
        nref = max(np.linalg.norm(dt), 1e-3 * gscale)
        nerr = np.linalg.norm(dj - dt)
        assert nerr <= 0.2 * nref, (
            f"final params leaf {key}: |Δjax-Δtorch| {nerr:.3e} vs "
            f"0.2*|Δtorch| {nref:.3e}")


# ---------------------------------------------------------------------------
# (d4) COCO train step, all four phases (VERDICT r2 item 6)
# ---------------------------------------------------------------------------

def _torch_step_coco(R, net, batch, cfg, n_iter, with_grad=False, optim=None):
    """The reference COCO train-step loss stack (train_final_coco.py:174-448)
    co-run on the reference's own helpers: 81 classes, the 8k-12k
    ``seg_static`` window (aux-CAM + refine_cams_with_bkg_v2, :312-321),
    ``cam_to_label_dynamic_cls`` PTC thresholds, the aux->main refine switch
    at 12k, GMM + consistency from ``gmm_iters``.

    The 8k-12k "negative-offset cosine" (:240-242, ``n_iter - 12000`` < 0):
    ``cosine_descent`` CLAMPS negative steps to ``max_thres``
    (utils/train_helper.py:341-342), so the window's per-sample dynamic
    threshold is uniformly ``high_thre`` — semantically identical to a static
    threshold, which is exactly how the repo's ``seg_static`` phase computes
    it.  Strong aug is the n=0 (pure hflip) limit."""
    import contextlib
    import torch.nn.functional as F
    from sklearn.mixture import GaussianMixture
    from dupl_tpu.engine.train import loss_weights

    x, cls_np, box_np = batch
    inputs = ref_oracle.nchw(x)
    cls_label = torch.tensor(cls_np)
    img_box = torch.tensor(box_np)
    par = R.PAR.PAR(dilations=list(cfg.par.dilations), num_iter=cfg.par.num_iter)
    ce = torch.nn.CrossEntropyLoss(ignore_index=255, reduction="none")
    scales = tuple(cfg.cam_scales)
    b = inputs.shape[0]
    grad_ctx = contextlib.nullcontext if with_grad else torch.no_grad
    switch = cfg.refine_switch_iters

    if n_iter < cfg.cam_iters:  # warm-up: cls (+ sim, weight 0) only (:190-236)
        with grad_ctx():
            res = net(inputs)
            cls_1, segs_1, fmap_1, cls_aux_1 = res["branch1"]
            cls_2, segs_2, fmap_2, cls_aux_2 = res["branch2"]
            cls_loss = (F.multilabel_soft_margin_loss(cls_1, cls_label)
                        + F.multilabel_soft_margin_loss(cls_aux_1, cls_label)
                        + F.multilabel_soft_margin_loss(cls_2, cls_label)
                        + F.multilabel_soft_margin_loss(cls_aux_2, cls_label))
            ptc = torch.ones(())   # placeholders, weight 0 (:216-221)
            seg = torch.ones(())
            reg = torch.zeros(())
    else:
        with torch.no_grad():
            # clamped cosine thresholds from the 12k switch (:240-252)
            hstart = torch.full((len(cfg.high_thre_targets),), cfg.high_thre)
            htarget = torch.tensor(cfg.high_thre_targets)
            hthres = torch.tensor(np.asarray(R_cosine(
                hstart.numpy(), htarget.numpy(), n_iter - switch,
                cfg.max_iters - switch), np.float32))
            high_b = torch.stack([
                torch.max(hthres[torch.nonzero(cls_label[i]).squeeze(-1)])
                for i in range(b)])
            hmask = high_b[:, None, None, None] * torch.ones(
                (b, 1, *inputs.shape[2:]))

            cams_1, cams_aux_1 = R.cam_helper.multi_scale_cam2_siamese(
                net, inputs=inputs, scales=scales, branch=1)
            cams_2, cams_aux_2 = R.cam_helper.multi_scale_cam2_siamese(
                net, inputs=inputs, scales=scales, branch=2)

        with grad_ctx():
            res = net(inputs)
            cls_1, segs_1, fmap_1, cls_aux_1 = res["branch1"]
            cls_2, segs_2, fmap_2, cls_aux_2 = res["branch2"]
            cls_loss = (F.multilabel_soft_margin_loss(cls_1, cls_label)
                        + F.multilabel_soft_margin_loss(cls_aux_1, cls_label)
                        + F.multilabel_soft_margin_loss(cls_2, cls_label)
                        + F.multilabel_soft_margin_loss(cls_aux_2, cls_label))

        with torch.no_grad():
            # PTC: dynamic-cls thresholds on aux CAMs (:287-307)
            r1 = F.interpolate(cams_aux_1, size=fmap_1.shape[2:],
                               mode="bilinear", align_corners=False)
            _, pl1 = R.cam_helper.cam_to_label_dynamic_cls(
                r1.detach(), cls_label=cls_label, img_box=img_box,
                ignore_mid=True, bkg_thre=cfg.bkg_thre, high_thre=high_b,
                low_thre=cfg.low_thre, ignore_index=255)
            r2 = F.interpolate(cams_aux_2, size=fmap_2.shape[2:],
                               mode="bilinear", align_corners=False)
            _, pl2 = R.cam_helper.cam_to_label_dynamic_cls(
                r2.detach(), cls_label=cls_label, img_box=img_box,
                ignore_mid=True, bkg_thre=cfg.bkg_thre, high_thre=high_b,
                low_thre=cfg.low_thre, ignore_index=255)
            aff1 = R.cam_helper.label_to_aff_mask(pl1)
            aff2 = R.cam_helper.label_to_aff_mask(pl2)

            # refinement: aux CAM + static thresholds before the switch,
            # main CAM + dynamic mask after (:309-333)
            rep = cls_label[:, :, None, None].expand(-1, -1, *inputs.shape[2:])
            mean = torch.tensor([0.485, 0.456, 0.406])[None, :, None, None]
            std = torch.tensor([0.229, 0.224, 0.225])[None, :, None, None]
            inputs_denorm = inputs * std + mean
            if n_iter <= switch:
                ref1 = R.cam_helper.refine_cams_with_bkg_v2(
                    par, inputs_denorm, cams=cams_aux_1 * rep,
                    cls_labels=cls_label, high_thre=cfg.high_thre,
                    low_thre=cfg.low_thre, ignore_index=255, img_box=img_box)
                ref2 = R.cam_helper.refine_cams_with_bkg_v2(
                    par, inputs_denorm, cams=cams_aux_2 * rep,
                    cls_labels=cls_label, high_thre=cfg.high_thre,
                    low_thre=cfg.low_thre, ignore_index=255, img_box=img_box)
            else:
                ref1 = R.cam_helper.refine_cams_with_dynamic_thres(
                    par, inputs_denorm, cams=cams_1 * rep, cls_labels=cls_label,
                    high_thre_map=hmask, low_thre=cfg.low_thre,
                    ignore_index=255, img_box=img_box)
                ref2 = R.cam_helper.refine_cams_with_dynamic_thres(
                    par, inputs_denorm, cams=cams_2 * rep, cls_labels=cls_label,
                    high_thre_map=hmask, low_thre=cfg.low_thre,
                    ignore_index=255, img_box=img_box)

        with grad_ctx():
            ptc = (R.losses.get_masked_ptc_loss(fmap_1, aff1)
                   + R.losses.get_masked_ptc_loss(fmap_2, aff2))
            su1 = F.interpolate(segs_1, size=ref1.shape[1:], mode="bilinear",
                                align_corners=False)
            su2 = F.interpolate(segs_2, size=ref2.shape[1:], mode="bilinear",
                                align_corners=False)

        if n_iter < cfg.gmm_iters:  # direct cross supervision (:339-346)
            with grad_ctx():
                seg = (R.losses.get_seg_loss(su1, ref2.long())
                       + R.losses.get_seg_loss(su2, ref1.long()))
            reg = torch.zeros(())
        else:  # GMM filtering + consistency (:348-432)
            with torch.no_grad():
                ref1_pre, ref2_pre = ref1.clone(), ref2.clone()
                l1 = ce(su1.detach(), ref1.long())
                l2 = ce(su2.detach(), ref2.long())
                roi1 = (ref1 != 0) & (ref1 != 255)
                roi2 = (ref2 != 0) & (ref2 != 255)
                for i in range(b):
                    for lm, roi, ref in ((l1, roi1, ref1), (l2, roi2, ref2)):
                        vals = lm[i][roi[i]]
                        vals = vals[vals > cfg.gmm.loss_floor]
                        if vals.numel() > cfg.gmm.min_pixels:
                            g = GaussianMixture(n_components=2, max_iter=10,
                                                tol=1e-2, reg_covar=5e-4,
                                                random_state=0)
                            g.fit(vals[:, None].numpy())
                            if abs(g.means_[0, 0] - g.means_[1, 0]) > cfg.gmm.valid_thre:
                                ni = g.means_.argmax()
                                prob = g.predict_proba(
                                    lm[i].reshape(-1, 1).numpy())
                                noise = torch.tensor(
                                    prob[:, ni] > cfg.gmm.gamma
                                ).reshape(ref.shape[1:])
                                noise = noise & (ref[i] != 0)
                                ref[i][noise] = 255
            with grad_ctx():
                seg = (R.losses.get_seg_loss(su1, ref2.long())
                       + R.losses.get_seg_loss(su2, ref1.long()))
                # strong view = hflip at 0.75 scale through need_sp
                x_aug = torch.flip(inputs, dims=[3])
                x_aug = F.interpolate(x_aug, scale_factor=cfg.aug_downscale,
                                      mode="bilinear", align_corners=False)
                _, sa1, _, _ = net.branch1(x_aug)
                _, sa2, _, _ = net.branch2(x_aug)
                sa1 = F.interpolate(torch.flip(sa1, dims=[3]),
                                    size=inputs.shape[2:], mode="bilinear",
                                    align_corners=False)
                sa2 = F.interpolate(torch.flip(sa2, dims=[3]),
                                    size=inputs.shape[2:], mode="bilinear",
                                    align_corners=False)
            with torch.no_grad():
                ps1 = su1.detach().max(1)[1]
                ps2 = su2.detach().max(1)[1]
                cm1 = torch.softmax(su1.detach(), dim=1).max(1)[0]
                cm2 = torch.softmax(su2.detach(), dim=1).max(1)[0]
                un1 = (ref2 == 255) & (cm1 > cfg.reg_conf_thre)
                un2 = (ref1 == 255) & (cm2 > cfg.reg_conf_thre)
                ps1[~un1] = 255
                ps2[~un2] = 255
            with grad_ctx():
                reg = torch.zeros(())
                if un1.sum() > 0:
                    reg = reg + ce(sa1, ps1).sum() / un1.sum()
                if un2.sum() > 0:
                    reg = reg + ce(sa2, ps2).sum() / un2.sum()

    with grad_ctx():
        f1 = fmap_1.reshape(fmap_1.shape[0], fmap_1.shape[1], -1)
        f2 = fmap_2.reshape(fmap_2.shape[0], fmap_2.shape[1], -1)
        cos = torch.nn.CosineSimilarity(dim=-1, eps=1e-6)
        sim = (1 + cos(f1.detach(), f2).mean()) + (1 + cos(f2.detach(), f1).mean())

    out = {"cls_loss": float(cls_loss), "ptc_loss": float(ptc),
           "seg_loss": float(seg), "sim_loss": float(sim),
           "reg_loss": float(reg)}
    if n_iter >= cfg.gmm_iters:
        # GMM noise masks per branch: the pixels the filter flipped to 255
        # (their own refined labels before vs after the sklearn loop)
        out["refined"] = np.stack([ref1_pre.numpy(), ref2_pre.numpy()])
        out["noise_masks"] = np.stack([
            ((ref1 == 255) & (ref1_pre != 255)).numpy(),
            ((ref2 == 255) & (ref2_pre != 255)).numpy()])
    if with_grad:
        w = loss_weights(cfg, n_iter)
        total = (w.cls * cls_loss + w.ptc * ptc + w.seg * seg
                 + w.sim * sim + w.reg * reg)
        net.zero_grad(set_to_none=True)
        if optim is not None:
            optim.zero_grad(set_to_none=True)
        total.backward()
        out["grads"] = ref_oracle.convert_siamese_grads(net)
        out["total"] = float(total)
        if optim is not None:
            optim.step()
    return out


def R_cosine(start, target, step, num_steps):
    """The reference's host cosine_descent (utils/train_helper.py:340-349)
    incl. the negative-step clamp."""
    if step < 0:
        return start
    if step >= num_steps:
        return target
    t = step / (num_steps - 1)
    return start + (target - start) * (1 - np.cos(np.pi * t)) / 2


def _coco_cfg():
    from dupl_tpu.config import ModelConfig, coco_config

    return coco_config(
        model=ModelConfig(backbone=TINY_JAX, num_classes=81, aux_layer=9,
                          compute_dtype="float32"),
        aug_n=0,  # strong aug degenerates to hflip — deterministic co-run
    )


@pytest.mark.parametrize("step", [100, 9000, 20000, 40000])
def test_coco_train_step_loss_parity(R, step):
    """One full COCO train step per curriculum phase — warm-up (<8k),
    seg_static (8k-12k aux-CAM window), seg (12k-32k dynamic), full (GMM +
    consistency) — every loss term matches train_final_coco.py:174-448 on
    identical weights + batch at 81 classes, aux_layer=9 (:148)."""
    from dupl_tpu.engine.train import Trainer, TrainState

    net, model, params = make_pair(R, num_classes=81, aux_layer=9, seed=21)
    cfg = _coco_cfg()
    batch_np = rand_batch(b=2, size=64, num_fg=80, seed=22)

    t_losses = _torch_step_coco(R, net, batch_np, cfg, n_iter=step)

    trainer = Trainer(cfg, model=model)
    x, cls, box = batch_np
    jbatch = {"image": jnp.asarray(x), "cls_label": jnp.asarray(cls),
              "img_box": jnp.asarray(box)}
    state = trainer.init_state(jax.random.PRNGKey(0), jbatch["image"][:1])
    state = TrainState(params, state.opt_state, jnp.int32(step), state.rng)
    _, metrics = trainer.train_step(state, jbatch)

    for key in ("cls_loss", "ptc_loss", "seg_loss", "sim_loss", "reg_loss"):
        if step < cfg.cam_iters and key in ("ptc_loss", "seg_loss"):
            continue  # reference warm-up placeholders (torch.ones, :216-221)
        ref_v, jax_v = t_losses[key], float(metrics[key])
        tol = 2e-3 * max(1.0, abs(ref_v))
        if key in ("seg_loss", "reg_loss") and step >= cfg.gmm_iters:
            tol = 0.05 * max(1.0, abs(ref_v))  # sklearn vs masked-EM
        assert abs(ref_v - jax_v) <= tol, (
            f"step {step} {key}: torch {ref_v:.6f} vs jax {jax_v:.6f}")


@pytest.mark.parametrize("step", [9000, 20000, 40000])
def test_coco_gradient_parity(R, step):
    """Gradient-level parity through every COCO-unique compute branch at 81
    classes (VERDICT r3 item 3): the 8k-12k seg_static path (aux-CAM
    refinement + dynamic-cls PTC with clamped thresholds, step 9000), the
    12k-32k seg path (main-CAM dynamic refinement, train_final_coco.py:
    322-333, step 20000) and the >32k full path (consistency branch +
    GMM-gated seg loss, :339-432, step 40000).  GMM is pinned OFF via an
    unreachable min_pixels (both sides gate on it) so phase-gradient
    comparison runs on identical noise masks; the GMM-active regime is
    covered statistically by test_coco_gmm_cotraining_mask_agreement."""
    from dupl_tpu.config import GmmConfig
    import dataclasses
    from dupl_tpu.engine.train import Trainer, TrainState, loss_weights

    net, model, params = make_pair(R, num_classes=81, aux_layer=9, seed=23)
    cfg = dataclasses.replace(_coco_cfg(), gmm=GmmConfig(min_pixels=10**9))
    batch_np = rand_batch(b=2, size=64, num_fg=80, seed=24)

    t_out = _torch_step_coco(R, net, batch_np, cfg, n_iter=step,
                             with_grad=True)

    trainer = Trainer(cfg, model=model)
    x, cls, box = batch_np
    jbatch = {"image": jnp.asarray(x), "cls_label": jnp.asarray(cls),
              "img_box": jnp.asarray(box)}
    state = trainer.init_state(jax.random.PRNGKey(0), jbatch["image"][:1])
    state = TrainState(params, state.opt_state, jnp.int32(step), state.rng)
    grads, metrics = trainer.grad_step(state, jbatch, step=step)

    w = loss_weights(cfg, step)
    j_total = float(w.cls * metrics["cls_loss"] + w.ptc * metrics["ptc_loss"]
                    + w.seg * metrics["seg_loss"] + w.sim * metrics["sim_loss"]
                    + w.reg * metrics["reg_loss"])
    assert abs(j_total - t_out["total"]) <= 2e-3 * max(1.0, abs(t_out["total"]))
    _assert_tree_close(grads, t_out["grads"], rel=5e-3,
                       skip=("pos_embed",), what=f"coco grad step={step}")


@pytest.mark.slow
def test_coco_gmm_cotraining_mask_agreement(R):
    """5-step co-training stretch in the GMM-ACTIVE regime (VERDICT r3
    item 3b): both sides actually train (torch PolyWarmupAdamW vs the jitted
    full-phase step) from identical weights on identical batches, with the
    noise filter firing — sklearn GaussianMixture(random_state=0,
    train_final_coco.py:355-394) against the on-device masked EM.  Bitwise
    mask parity is impossible (different EM trajectories); the bounds are
    STATISTICAL, over the refined-foreground ROI, and measure two different
    things: STEP 0 runs on bit-identical weights, so its >=99% is pure GMM
    fidelity (fit_gmm2's sklearn-faithful tol freeze puts the fit params
    within ~1e-3 of sklearn's — on identical CE data the masks overlap
    99.9%).  Steps >=1 additionally carry k compounded INDEPENDENT optimizer
    steps of fp divergence (grads match to 5e-3 rel; Adam amplifies), read
    out at the gamma=0.95 posterior boundary, which in this fixture sits in
    a dense CE region (overlapping modes at ~4.4/4.8, sigma 0.2 — real
    step-32k CE distributions separate clean ~0.3 from noisy ~3.0 far more);
    those steps are bounded at >=97% each and >=98.5% on aggregate, with the
    refined labels >=99.5% and the losses tracking within 5% every step.

    The GMM gates are loosened (min_pixels, valid_thre) on BOTH sides and
    the decoders' output convs are scaled up so the CE map is BIMODAL like
    the real step-32k regime (a random-init decoder yields CE ~= ln(81)
    everywhere — a single collapsed mode the filter correctly ignores) —
    a non-vacuity assert checks pixels were actually flipped."""
    import dataclasses
    from dupl_tpu.config import GmmConfig
    from dupl_tpu.engine.train import Trainer, TrainState, loss_weights

    from dupl_tpu.config import OptimConfig

    net, model, params0 = make_pair(R, num_classes=81, aux_layer=9, seed=31)
    with torch.no_grad():  # confident decoder -> clean/noisy CE separation
        net.branch1.decoder.conv8.weight *= 40.0
        net.branch2.decoder.conv8.weight *= 40.0
    params0 = ref_oracle.convert_siamese_state(net)
    # lr/10 on BOTH sides: the 40x decoder scaling that creates the bimodal
    # CE also multiplies how fast independent-optimizer fp divergence moves
    # the CE map; the recipe LR drifts the gamma-boundary band by step 4
    # more than the agreement statistic can resolve.  The GMM mechanics
    # under test are LR-independent.
    cfg = dataclasses.replace(
        _coco_cfg(), optim=OptimConfig(lr=6e-6),
        gmm=GmmConfig(min_pixels=64, valid_thre=0.0))
    optim = ref_oracle.make_poly_warmup_adamw(R, net, cfg.optim, cfg.max_iters)

    trainer = Trainer(cfg, model=model)
    x0 = rand_batch(b=2, size=64, num_fg=80, seed=200)[0]
    state = trainer.init_state(jax.random.PRNGKey(0), jnp.asarray(x0)[:1])
    params_dev = jax.tree.map(jnp.array, params0)
    state = TrainState(params_dev, trainer.tx.init(params_dev), jnp.int32(0),
                       state.rng)

    step0 = cfg.gmm_iters  # the full phase begins here (:339)
    flipped = 0
    agrees = []
    for k in range(5):
        n_iter = step0 + k
        batch_np = rand_batch(b=2, size=64, num_fg=80, seed=200 + k)
        x, cls, box = batch_np
        jbatch = {"image": jnp.asarray(x), "cls_label": jnp.asarray(cls),
                  "img_box": jnp.asarray(box)}

        # jax-side masks BEFORE the update (same params the step consumes)
        refined_j, filtered_j = trainer.full_phase_labels(
            state.params, jbatch, n_iter)
        mask_j = np.asarray((filtered_j == 255) & (refined_j != 255))
        refined_j = np.asarray(refined_j)

        t_out = _torch_step_coco(R, net, batch_np, cfg, n_iter=n_iter,
                                 with_grad=True, optim=optim)
        state, metrics = trainer.train_step(state, jbatch, step=n_iter)

        # the refined labels themselves are deterministic -> near-identical;
        # the masks (EM-dependent) are compared over the shared fg ROI
        roi = (t_out["refined"] != 0) & (t_out["refined"] != 255)
        lbl_agree = (refined_j == t_out["refined"]).mean()
        assert lbl_agree >= 0.995, f"step {k}: refined labels {lbl_agree:.4f}"
        agree = (mask_j == t_out["noise_masks"])[roi].mean()
        bound = 0.99 if k == 0 else 0.97  # see docstring
        assert agree >= bound, f"step {k}: noise-mask agreement {agree:.4f}"
        agrees.append(agree)
        flipped += int(t_out["noise_masks"].sum())

        w = loss_weights(cfg, n_iter)
        j_total = float(w.cls * metrics["cls_loss"]
                        + w.ptc * metrics["ptc_loss"]
                        + w.seg * metrics["seg_loss"]
                        + w.sim * metrics["sim_loss"]
                        + w.reg * metrics["reg_loss"])
        rel = abs(j_total - t_out["total"]) / max(1.0, abs(t_out["total"]))
        assert rel < 0.05, f"step {k}: total rel {rel:.3f}"

    assert flipped > 0, "GMM never fired — the stretch is vacuous"
    mean_agree = float(np.mean(agrees))
    assert mean_agree >= 0.985, f"stretch mean agreement {mean_agree:.4f}"
    print("noise-mask agreement per step:",
          " ".join(f"{a:.4f}" for a in agrees))


@pytest.mark.parametrize("step", [9000, 20000, 40000])
def test_coco_update_parity(R, step):
    """Three consecutive optimizer updates per COCO phase branch: the
    reference PolyWarmupAdamW over the 80k-iter COCO schedule
    (train_final_coco.py uses the same utils/optimizer.py:51-68 rule and
    group multipliers as VOC, with COCO's lr/max_iters) vs the optax chain,
    driven by IDENTICAL (bridged torch) gradients each step so the update
    rule is isolated from fp32 gradient noise — the COCO counterpart of
    test_update_parity, completing the COCO rung of the verification ladder
    (loss -> grads -> updates)."""
    import dataclasses
    import optax
    from dupl_tpu.config import GmmConfig
    from dupl_tpu.engine.train import Trainer, phase_of

    net, model, params0 = make_pair(R, num_classes=81, aux_layer=9, seed=29)
    cfg = dataclasses.replace(_coco_cfg(), gmm=GmmConfig(min_pixels=10**9))
    optim = ref_oracle.make_poly_warmup_adamw(R, net, cfg.optim, cfg.max_iters)

    trainer = Trainer(cfg, model=model)
    x0 = rand_batch(b=2, size=64, num_fg=80, seed=40)[0]
    trainer.init_state(jax.random.PRNGKey(0), jnp.asarray(x0)[:1])
    params = params0
    opt_state = trainer.tx.init(params)
    # Fast-forward BOTH schedules to the phase step (a fresh optimizer sits
    # at global_step 0, i.e. warmup lr ~= lr*1e-6 — updates there are
    # denormal-scale dust).  Per-param Adam counts (bias correction) start
    # at 0 on both sides, exactly like a mid-run phase entry for leaves the
    # previous phase never touched.
    optim.global_step = step
    opt_state = opt_state._replace(step=jnp.int32(step))
    p_init = _flat_with_paths(params0)

    for k in range(3):
        batch_np = rand_batch(b=2, size=64, num_fg=80, seed=50 + k)
        t_out = _torch_step_coco(R, net, batch_np, cfg, n_iter=step + k,
                                 with_grad=True, optim=optim)

        tx = (trainer.tx_warmup if phase_of(cfg, step + k) == "warmup"
              else trainer.tx)
        updates, opt_state = tx.update(t_out["grads"], opt_state, params)
        params = optax.apply_updates(params, updates)

        t_params = _flat_with_paths(ref_oracle.convert_siamese_state(net))
        j_params = _flat_with_paths(params)
        gscale = max(np.abs(t_params[key] - p_init[key]).max()
                     for key in t_params)
        assert gscale > 0, "updates vanished — test is vacuous"
        for key in sorted(j_params):
            dj = j_params[key] - p_init[key]
            dt = t_params[key] - p_init[key]
            scale = max(np.abs(dt).max(), 1e-3 * gscale)
            np.testing.assert_allclose(
                dj, dt, atol=5e-3 * scale, rtol=0,
                err_msg=f"coco update {k + 1} @ step {step + k} leaf {key} "
                        f"(update scale {scale:.3e})")


# ---------------------------------------------------------------------------
# (e) eval multi-scale merge
# ---------------------------------------------------------------------------

def test_eval_msc_merge_parity(R):
    """VOC eval merge — flip-sum per scale, max over scales
    (tools/eval_seg_voc.py:56-77) — on identical weights."""
    from dupl_tpu.engine.eval_seg import msc_seg_logits

    net, model, params = make_pair(R, seed=9)
    x, _, _ = rand_batch(b=1, size=64, seed=10)
    scales = (1.0, 1.5, 1.25)

    ti = ref_oracle.nchw(x)
    seg_list = []
    with torch.no_grad():
        for sc in scales:
            _h, _w = int(64 * sc), int(64 * sc)
            import torch.nn.functional as F
            _in = F.interpolate(ti, size=[_h, _w], mode="bilinear",
                                align_corners=False)
            cat = torch.cat([_in, _in.flip(-1)], dim=0)
            _, segs, _, _ = net.branch1(cat)
            segs = F.interpolate(segs, size=(64, 64), mode="bilinear",
                                 align_corners=False)
            seg_list.append(segs[:1] + segs[1:].flip(-1))
    t_merged = torch.stack(seg_list).max(0)[0]

    p0 = model.branch(params, 0)
    j_merged = msc_seg_logits(
        lambda z: model.module.apply(p0, z).seg,
        jnp.asarray(x), (64, 64), scales, merge="max")
    np.testing.assert_allclose(
        np.asarray(j_merged), ref_oracle.nhwc(t_merged), atol=2e-3)
