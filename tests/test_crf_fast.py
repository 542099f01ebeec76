"""Fast (pivot-lattice) CRF mode agrees with the full mode and the native
oracle on cleaned labels."""

import numpy as np
import jax.numpy as jnp

from dupl_tpu.ops import crf as crf_ops
from tests.test_crf import _synthetic_case


def test_fast_mode_label_agreement(rng):
    img, probs, gt = _synthetic_case(rng)
    args = (jnp.asarray(img[None], jnp.float32) / 255.0,
            jnp.asarray(probs.transpose(1, 2, 0)[None]))
    full = np.asarray(crf_ops.mean_field_crf(
        *args, downsample=8, row_chunk=8))[0].argmax(-1)
    fast = np.asarray(crf_ops.mean_field_crf(
        *args, downsample=8, row_chunk=8, fast=True))[0].argmax(-1)
    assert (full == fast).mean() > 0.98
    assert (fast == gt).mean() > 0.99
