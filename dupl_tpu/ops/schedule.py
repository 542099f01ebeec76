"""Learning-rate and threshold schedules."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def poly_warmup_schedule(
    step,
    *,
    base_lr: float,
    warmup_iters: int,
    warmup_ratio: float,
    max_iters: int,
    power: float,
):
    """PolyWarmupAdamW LR rule (reference: utils/optimizer.py:51-68):
    linear warmup of the multiplier from ``warmup_ratio`` to 1 over
    ``warmup_iters`` steps, then ``(1 - step/max_iters) ** power`` decay.
    ``step`` counts completed optimizer steps starting at 0."""
    step = jnp.asarray(step, jnp.float32)
    # algebraically 1 - (1 - t)(1 - r); this form avoids f32 cancellation
    warm = warmup_ratio + (step / warmup_iters) * (1.0 - warmup_ratio)
    poly = (1.0 - step / max_iters) ** power
    mult = jnp.where(step < warmup_iters, warm, poly)
    # past max_iters (which the reference never evaluates — its loop stops)
    # the poly base goes negative and a fractional power would produce NaN;
    # clip to the decay's own limit at t -> T, which is 0
    mult = jnp.where(step >= max_iters, 0.0, mult)
    return base_lr * mult


def cosine_descent(max_thres, min_thres, step, num_steps):
    """Cosine interpolation from ``max_thres`` to ``min_thres`` over
    ``num_steps`` (reference: utils/train_helper.py:340-349; note the
    ``(num_steps - 1)`` denominator).  Works on scalars or arrays and on traced
    ``step`` values."""
    max_thres = jnp.asarray(max_thres, jnp.float32)
    min_thres = jnp.asarray(min_thres, jnp.float32)
    step = jnp.asarray(step, jnp.float32)
    t = step / (num_steps - 1)
    w = max_thres + (min_thres - max_thres) * (1.0 - jnp.cos(jnp.pi * t)) / 2.0
    w = jnp.where(step < 0, max_thres, w)
    return jnp.where(step >= num_steps, min_thres, w)


def per_sample_high_thre(high_thres: jax.Array, cls_label: jax.Array) -> jax.Array:
    """Per-sample dynamic high threshold: max of the per-class scheduled
    thresholds over the classes present in the image
    (reference: train_final_voc.py:269-275)."""
    present = cls_label > 0
    masked = jnp.where(present, high_thres[None, :], -jnp.inf)
    return jnp.max(masked, axis=-1)
