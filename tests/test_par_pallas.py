"""Pallas PAR kernel parity vs the XLA formulation (interpret mode on CPU;
the same kernel compiles natively on TPU)."""

import numpy as np
import jax.numpy as jnp

from dupl_tpu.ops import par as par_ops
from dupl_tpu.ops.par_pallas import propagate_pallas

DIL = (1, 2, 4, 8, 12, 24)


def test_pallas_propagate_matches_xla(rng):
    b, h, w, c = 2, 48, 48, 21
    masks = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    imgs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    aff = par_ops.rgb_affinity(imgs, DIL)
    ref = par_ops.propagate(masks, aff, DIL, 3)
    out = propagate_pallas(masks, aff, DIL, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_propagate_channel_padding(rng):
    """Channel counts that don't divide the tile still round-trip."""
    b, h, w, c = 1, 32, 32, 5
    masks = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    imgs = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    aff = par_ops.rgb_affinity(imgs, (1, 2))
    ref = par_ops.propagate(masks, aff, (1, 2), 2)
    out = propagate_pallas(masks, aff, (1, 2), 2, channel_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
