"""Loss parity against torch-CPU oracles (reference semantics:
model/losses.py, train_final_voc.py:210-216,438-447)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from dupl_tpu.ops import losses


def test_multilabel_soft_margin(rng):
    logits = rng.randn(4, 20).astype(np.float32)
    targets = (rng.rand(4, 20) > 0.7).astype(np.float32)
    ours = float(losses.multilabel_soft_margin_loss(logits, targets))
    ref = float(tF.multilabel_soft_margin_loss(torch.tensor(logits), torch.tensor(targets)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_cross_entropy_map_ignore(rng):
    logits = rng.randn(2, 8, 8, 21).astype(np.float32)
    labels = rng.randint(0, 21, size=(2, 8, 8))
    labels[0, :2] = 255
    ours = np.asarray(losses.cross_entropy_map(logits, labels, 255))
    ref = tF.cross_entropy(
        torch.tensor(logits).permute(0, 3, 1, 2),
        torch.tensor(labels, dtype=torch.long),
        ignore_index=255, reduction="none",
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_seg_loss_fg_bg_balance(rng):
    """get_seg_loss averages CE separately over bg and fg pixels then means."""
    logits = rng.randn(2, 8, 8, 21).astype(np.float32)
    labels = rng.randint(0, 21, size=(2, 8, 8))
    labels[1, 4:] = 255
    ours = float(losses.seg_loss(logits, labels, 255))

    tl = torch.tensor(logits).permute(0, 3, 1, 2)
    lab = torch.tensor(labels, dtype=torch.long)
    ce = torch.nn.CrossEntropyLoss(ignore_index=255, reduction="none")
    bg = lab.clone(); bg[lab != 0] = 255
    fg = lab.clone(); fg[lab == 0] = 255
    bg_loss = ce(tl, bg).sum() / ((bg != 255).sum() + 1e-6)
    fg_loss = ce(tl, fg).sum() / ((fg != 255).sum() + 1e-6)
    ref = float(0.5 * (bg_loss + fg_loss))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_masked_ptc_loss(rng):
    """model/losses.py:6-21 — |cos| Gram pulled to 1 on pos pairs / 0 on neg."""
    fmap = rng.randn(2, 4, 4, 16).astype(np.float32)
    mask = rng.choice([0, 1, 255], size=(2, 16, 16)).astype(np.int64)
    ours = float(losses.masked_ptc_loss(fmap, mask))

    t = torch.tensor(fmap).permute(0, 3, 1, 2).reshape(2, 16, 16)
    x = tF.normalize(t, p=2, dim=1, eps=1e-8)
    gram = torch.abs(torch.matmul(x.transpose(1, 2), x))
    tm = torch.tensor(mask)
    pos, neg = tm == 1, tm == 0
    ref = float(
        0.5 * (1 - (pos * gram).sum() / (pos.sum() + 1))
        + 0.5 * (neg * gram).sum() / (neg.sum() + 1)
    )
    assert ours == pytest.approx(ref, rel=1e-4)


def test_discrepancy_loss(rng):
    a = rng.randn(2, 4, 4, 8).astype(np.float32)
    b = rng.randn(2, 4, 4, 8).astype(np.float32)
    ours = float(losses.discrepancy_loss(a, b))
    ta = torch.tensor(a).permute(0, 3, 1, 2).reshape(2, 8, -1)
    tb = torch.tensor(b).permute(0, 3, 1, 2).reshape(2, 8, -1)
    cos = torch.nn.CosineSimilarity(dim=-1, eps=1e-6)
    ref = float(1 + cos(ta, tb).mean())
    assert ours == pytest.approx(ref, rel=1e-5)
