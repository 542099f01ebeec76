"""PAR parity against a direct torch re-derivation of model/PAR.py semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF
import jax.numpy as jnp

from dupl_tpu.ops import par as par_ops

DILATIONS = (1, 2, 4, 8, 12, 24)


def _torch_par(imgs, masks, dilations=DILATIONS, num_iter=3, w1=0.3, w2=0.01):
    """Independent torch oracle implementing the PAR math from the paper /
    reference description: 48 dilated neighbors (replicate pad), rgb affinity
    softmax + w2 * position softmax, iterative propagation."""
    def neighbors(x):
        b, c, h, w = x.shape
        outs = []
        for d in dilations:
            xp = tF.pad(x, [d] * 4, mode="replicate")
            for dy, dx in [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                           (1, -1), (1, 0), (1, 1)]:
                # dilated one-hot conv on a d-padded input samples at
                # (ky-1)*d, (kx-1)*d relative to the center (PAR.py:39-49)
                outs.append(xp[:, :, d + dy * d: d + dy * d + h,
                               d + dx * d: d + dx * d + w])
        return torch.stack(outs, dim=2)  # (b, c, 48, h, w)

    imgs = torch.tensor(imgs)
    masks = torch.tensor(masks)
    n = neighbors(imgs)
    center = imgs.unsqueeze(2)
    std = n.std(dim=2, keepdim=True)  # unbiased
    aff = -(torch.abs(n - center) / (std + 1e-8) / w1) ** 2
    aff = aff.mean(dim=1, keepdim=True)
    aff = torch.softmax(aff, dim=2)

    dist = []
    for d in dilations:
        for diag in [True, False, True, False, False, True, False, True]:
            dist.append((np.sqrt(2.0) if diag else 1.0) * d)
    dist = torch.tensor(dist, dtype=torch.float32).view(1, 1, -1, 1, 1)
    pos_std = dist.expand(imgs.shape[0], 1, -1, imgs.shape[2], imgs.shape[3]).std(
        dim=2, keepdim=True)
    pos_aff = torch.softmax(-(dist / (pos_std + 1e-8) / w1) ** 2, dim=2)
    aff = aff + w2 * pos_aff

    for _ in range(num_iter):
        masks = (neighbors(masks) * aff).sum(2)
    return masks.numpy()


def test_position_affinity_constant():
    pa = np.asarray(par_ops.position_affinity(DILATIONS))
    assert pa.shape == (48,)
    assert pa.sum() == pytest.approx(0.01, rel=1e-4)


def test_par_refine_matches_torch(rng):
    b, h, w = 2, 20, 24
    imgs = rng.rand(b, 3, h, w).astype(np.float32)
    masks = rng.rand(b, 5, h, w).astype(np.float32)

    ref = _torch_par(imgs, masks, num_iter=3)
    ours = par_ops.par_refine(
        jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        jnp.asarray(masks.transpose(0, 2, 3, 1)),
        dilations=DILATIONS, num_iter=3,
    )
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_propagation_conserves_softmax_mass(rng):
    """Affinity rows sum to 1 + w2; uniform masks stay near-uniform."""
    imgs = rng.rand(1, 16, 16, 3).astype(np.float32)
    masks = np.full((1, 16, 16, 4), 0.25, np.float32)
    out = np.asarray(par_ops.par_refine(jnp.asarray(imgs), jnp.asarray(masks), num_iter=1))
    np.testing.assert_allclose(out, 0.25 * 1.01, rtol=1e-5)
