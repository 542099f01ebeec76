"""utils/flops.py: XLA cost-model FLOPs + MFU accounting (the bench MFU line)."""

import types

import jax
import jax.numpy as jnp
import numpy as np

from dupl_tpu.utils import flops as flops_utils


def test_compiled_flops_matches_matmul_model():
    n = 256

    @jax.jit
    def f(a, b):
        return a @ b

    a = jnp.zeros((n, n), jnp.float32)
    got = flops_utils.compiled_flops(f, a, a)
    # CPU backend exposes the cost model; 2*n^3 MACs-as-flops for a matmul
    if got is None:
        import pytest
        pytest.skip("backend exposes no cost model")
    assert abs(got - 2 * n**3) / (2 * n**3) < 0.2, got


def test_peak_probe_and_mfu():
    dev = types.SimpleNamespace(device_kind="TPU v5 lite")
    peak = flops_utils.peak_flops_per_chip(dev)
    assert peak == 197e12
    # v5p must not match the shorter "v5" entry
    assert flops_utils.peak_flops_per_chip(
        types.SimpleNamespace(device_kind="TPU v5p")) == 459e12
    assert flops_utils.peak_flops_per_chip(
        types.SimpleNamespace(device_kind="cpu")) is None

    # mfu = flops * calls / s / peak
    got = flops_utils.mfu(197e12 / 2, 2, 1.0, dev)
    assert np.isclose(got, 1.0)
    assert flops_utils.mfu(None, 1, 1.0, dev) is None
    assert flops_utils.mfu(1e12, 1, 1.0,
                           types.SimpleNamespace(device_kind="cpu")) is None
