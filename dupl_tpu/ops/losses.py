"""Loss functions.

Semantics match the reference exactly (model/losses.py, train_final_voc.py);
layout is NHWC / (B, H, W, C) and everything is mask-based so the whole loss
stack stays inside one jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def multilabel_soft_margin_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """torch ``F.multilabel_soft_margin_loss`` parity: per-sample mean over
    classes of -[y*log σ(x) + (1-y)*log σ(-x)], then mean over batch.

    Used for the image-level classification loss (train_final_voc.py:210-216).
    """
    # log σ(x) = -softplus(-x); log σ(-x) = -softplus(x)
    loss = targets * jax.nn.softplus(-logits) + (1.0 - targets) * jax.nn.softplus(logits)
    return jnp.mean(jnp.mean(loss, axis=-1))


def cross_entropy_map(logits: jax.Array, labels: jax.Array, ignore_index: int = 255) -> jax.Array:
    """Per-pixel CE with ignore_index semantics of ``nn.CrossEntropyLoss(
    reduction='none')``: ignored pixels contribute exactly 0.

    logits: (..., C); labels: (...) int. Returns (...) float32 map."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    # Streaming form: ce = logsumexp(x) - x[label].  log_softmax would
    # materialise the full (..., C) normalised map — on TPU a class-minor
    # tensor lane-pads C -> 128 (5.8x at C=22), and the extra padded
    # write+read passes measured 33 ms/branch at (8, 448, 448, 22); this form
    # only *reads* the logits (reductions + one gather).  Identical value and
    # vjp (softmax - onehot) to the log_softmax formulation.
    x = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(x, axis=-1)
    # one-hot compare-and-reduce instead of take_along_axis: a gather on the
    # lane (class) dim lowers to per-element dynamic slices on TPU and was
    # the actual 30 ms — the compare fuses into a single vectorised read of x
    onehot = (safe_labels[..., None] ==
              jnp.arange(x.shape[-1], dtype=jnp.int32)).astype(x.dtype)
    picked = jnp.sum(x * onehot, axis=-1)
    return jnp.where(valid, lse - picked, 0.0)


def seg_loss(logits: jax.Array, labels: jax.Array, ignore_index: int = 255) -> jax.Array:
    """Background/foreground-balanced CE (reference: model/losses.py:24-39):
    CE averaged separately over background pixels and foreground pixels
    (each sum / (count + 1e-6)), then the two means averaged."""
    ce = cross_entropy_map(logits, labels, ignore_index)
    valid = labels != ignore_index
    bg = valid & (labels == 0)
    fg = valid & (labels != 0)
    bg_loss = jnp.sum(jnp.where(bg, ce, 0.0)) / (jnp.sum(bg) + 1e-6)
    fg_loss = jnp.sum(jnp.where(fg, ce, 0.0)) / (jnp.sum(fg) + 1e-6)
    return 0.5 * (bg_loss + fg_loss)


def masked_ptc_loss(fmap: jax.Array, aff_mask: jax.Array) -> jax.Array:
    """Pixel-token-contrast loss (reference: model/losses.py:6-21).

    fmap: (B, H, W, C) feature map; aff_mask: (B, HW, HW) int with values
    {1: positive pair, 0: negative pair, 255: ignore}.

    |cosine-similarity| Gram matrix of L2-normalised per-pixel features, pulled
    toward 1 on positive pairs and toward 0 on negative pairs.  The Gram matmul
    is the MXU-heavy part — keep it a single (B, HW, C) x (B, C, HW) batched dot.
    """
    b, h, w, c = fmap.shape
    x = fmap.reshape(b, h * w, c).astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    gram = jnp.abs(jnp.einsum("bic,bjc->bij", x, x, preferred_element_type=jnp.float32))
    pos = (aff_mask == 1).astype(jnp.float32)
    neg = (aff_mask == 0).astype(jnp.float32)
    pos_term = jnp.sum(pos * gram) / (jnp.sum(pos) + 1.0)
    neg_term = jnp.sum(neg * gram) / (jnp.sum(neg) + 1.0)
    return 0.5 * (1.0 - pos_term) + 0.5 * neg_term


def discrepancy_loss(fmap_a: jax.Array, fmap_b: jax.Array, eps: float = 1e-6) -> jax.Array:
    """One direction of the dual-student discrepancy loss
    (train_final_voc.py:438-447): ``1 + mean cos(stop_grad(a), b)`` where the
    cosine runs over the flattened spatial axis per (sample, channel)."""
    b, h, w, c = fmap_a.shape
    a = jax.lax.stop_gradient(fmap_a).reshape(b, h * w, c).astype(jnp.float32)
    bb = fmap_b.reshape(b, h * w, c).astype(jnp.float32)
    # torch CosineSimilarity(dim=-1, eps): denom = max(||a||*||b||, eps)
    num = jnp.sum(a * bb, axis=1)
    denom = jnp.maximum(jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(bb, axis=1), eps)
    return 1.0 + jnp.mean(num / denom)
