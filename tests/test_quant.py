"""Dynamic int8 GEMM path: numerical closeness to the float path and
checkpoint interoperability."""

import numpy as np
import jax
import jax.numpy as jnp

from dupl_tpu.config import ModelConfig
from dupl_tpu.models.network import DualStudent
from dupl_tpu.ops.quant import quantized_matmul


def test_quantized_matmul_close(rng):
    x = rng.randn(64, 128).astype(np.float32)
    w = (rng.randn(128, 96) * 0.05).astype(np.float32)
    ref = x @ w
    out = np.asarray(quantized_matmul(jnp.asarray(x), jnp.asarray(w)))
    rel = np.abs(out - ref) / (np.abs(ref).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()


def test_quantized_model_matches_float(rng):
    cfg_f = ModelConfig(backbone="test_tiny_patch16", compute_dtype="float32")
    cfg_q = ModelConfig(backbone="test_tiny_patch16", compute_dtype="float32",
                        quantized_inference=True)
    m_f, m_q = DualStudent(cfg_f), DualStudent(cfg_q)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    params = m_f.init(jax.random.PRNGKey(0), x[:1])  # same tree for both

    cam_f, _ = m_f.cam_only(params, x)
    cam_q, _ = m_q.cam_only(params, x)
    cam_f, cam_q = np.asarray(cam_f), np.asarray(cam_q)
    # per-pixel argmax (the CAM label) should be overwhelmingly preserved
    agree = (cam_f.argmax(-1) == cam_q.argmax(-1)).mean()
    assert agree > 0.9, agree
    corr = np.corrcoef(cam_f.ravel(), cam_q.ravel())[0, 1]
    assert corr > 0.99, corr
