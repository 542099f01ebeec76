"""exp-attention Pallas kernel vs reference attention (interpret mode on CPU).

The kernel skips the softmax max-subtraction (safe: ViT logits ≪ the fp32 exp
overflow bound) and keeps K/V VMEM-resident; its outputs must match
``jax.nn.dot_product_attention`` to bf16 tolerance, including under vmap (the
dual-student branch axis) and through gradients (the custom-vjp recompute)."""

import numpy as np
import jax
import jax.numpy as jnp

from dupl_tpu.ops import attention as attn


def _dpa(q, k, v, scale):
    return jax.nn.dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        scale=scale)


def test_exp_attention_matches_dpa(rng):
    b, n, h, d = 2, 150, 3, 32  # n not a multiple of 128: exercises padding
    q = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)
    out = attn.exp_attention(q, k, v, scale=d ** -0.5, interpret=True)
    ref = _dpa(q, k, v, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_exp_attention_under_vmap(rng):
    """The dual-student wrapper vmaps over a leading branch axis."""
    nb, b, n, h, d = 2, 2, 130, 2, 32
    q = jnp.asarray(rng.randn(nb, b, n, h, d), jnp.float32)
    out = jax.vmap(lambda x: attn.exp_attention(
        x, x, x, scale=d ** -0.5, interpret=True))(q)
    ref = jax.vmap(lambda x: _dpa(x, x, x, d ** -0.5))(q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_exp_attention_grad(rng):
    """custom-vjp backward (XLA recompute) matches the dpa gradient."""
    b, n, h, d = 1, 64, 2, 16
    q = jnp.asarray(rng.randn(b, n, h, d) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(b, n, h, d) * 0.5, jnp.float32)
    v = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(attn.exp_attention(q, k, v, scale=d ** -0.5,
                                          interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_dpa(q, k, v, d ** -0.5) ** 2)

    g = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-2, rtol=5e-2)


def test_exp_attention_clamp_no_overflow(rng):
    """Logits beyond the clamp neither overflow nor NaN."""
    b, n, h, d = 1, 130, 1, 32
    q = jnp.asarray(rng.randn(b, n, h, d) * 30.0, jnp.float32)
    out = attn.exp_attention(q, q, q, scale=1.0, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_bwd_matches_ref_vjp(rng):
    """The fused Pallas backward must match the XLA recompute vjp it replaces
    (same clamp, same zero-padding algebra), including at non-128 lengths."""
    bh, n, d = 3, 150, 32
    q = jnp.asarray(rng.randn(bh, n, d) * 0.4, jnp.bfloat16)
    k = jnp.asarray(rng.randn(bh, n, d) * 0.4, jnp.bfloat16)
    v = jnp.asarray(rng.randn(bh, n, d), jnp.bfloat16)
    g = jnp.asarray(rng.randn(bh, n, d), jnp.float32)

    fused = attn._exp_attention_bwd_fused(q, k, v, g, interpret=True)
    _, vjp = jax.vjp(attn._exp_attention_ref, q, k, v)
    ref = vjp(g)
    for a, b_ in zip(fused, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            atol=5e-2, rtol=5e-2)


def test_bwd_fallback_beyond_ceiling(rng):
    """Above _BWD_MAX_SEQ padded tokens the backward falls back to the XLA
    recompute (kernel VMEM ceiling); gradients stay finite and correct."""
    b, n, h, d = 1, attn._BWD_MAX_SEQ + 10, 1, 16
    q = jnp.asarray(rng.randn(b, n, h, d) * 0.3, jnp.float32)

    def loss(x):
        return jnp.sum(attn.exp_attention(x, x, x, scale=d ** -0.5,
                                          interpret=True) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g, np.float32)).all()
