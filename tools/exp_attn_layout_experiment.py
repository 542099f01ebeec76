"""Microbench: exp-attention with BlockSpec-native (B, N, H, D) layout vs the
current pre-transposed (BH, N, D) form.

The current path pays HBM passes for to_bhnd transposes of q/k/v, the output
back-transpose, and the pads.  The layout variant reads q/v blocks straight
out of the (B, N, H, D) array with index maps (grid (b, h, i)), writes the
output in (B, N, H, D), and folds the q·scale multiply into the kernel; only
K still rides pre-transposed (B, H, D, N) (in-kernel transposes are slow).

Measured END TO END from the (B, N, H, D) tensors a QKV projection naturally
produces, including every layout/pad op each variant needs.

Usage: python tools/exp_attn_layout_experiment.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dupl_tpu.utils.cache import enable_compilation_cache
from dupl_tpu.ops.attention import (_exp_attention_bhnd, _pad_to, _block_q,
                                    _LOGIT_CLAMP)

enable_compilation_cache()


def _kernel_bnhd(q_ref, kt_ref, v_ref, o_ref, *, n_pad: int, scale: float):
    q = (q_ref[0, :, 0] * scale).astype(jnp.bfloat16)    # (bq, D)
    kt = kt_ref[0, 0]                                    # (D, Np)
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    e = jnp.exp(jnp.minimum(s, _LOGIT_CLAMP))
    denom = jnp.sum(e, axis=1, keepdims=True) - float(n_pad)
    pv = jax.lax.dot_general(e.astype(jnp.bfloat16), v_ref[0, :, 0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0, :, 0] = (pv / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def exp_attention_bnhd(q, k, v, scale=0.125):
    """q, k, v: (B, N, H, D) bf16 -> (B, N, H, D) bf16."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = q.shape
    np_ = _pad_to(n, 128)
    bq = min(_block_q(np_), np_)

    def padn(x):
        return jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0), (0, 0)))

    qp, vp = padn(q), padn(v)
    # (B, H, D, Np): one fused transpose+pad of k
    ktp = jnp.pad(k.transpose(0, 2, 3, 1), ((0, 0), (0, 0), (0, 0),
                                            (0, np_ - n)))
    out = pl.pallas_call(
        functools.partial(_kernel_bnhd, n_pad=np_ - n, scale=scale),
        grid=(b, h, np_ // bq),
        in_specs=[
            pl.BlockSpec((1, bq, 1, d), lambda b, h, i: (b, i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, np_), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, 1, d), lambda b, h, i: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, 1, d), lambda b, h, i: (b, i, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, h, d), jnp.bfloat16),
    )(qp, ktp, vp)
    return out[:, :n]


@functools.partial(jax.jit, static_argnames=("scale",))
def exp_attention_current(q, k, v, scale=0.125):
    """The live path from (B, N, H, D): transpose to (BH, N, D), kernel,
    transpose back."""
    b, n, h, d = q.shape

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    out = _exp_attention_bhnd((to_bhnd(q) * scale).astype(jnp.bfloat16),
                              to_bhnd(k), to_bhnd(v))
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def sync(x):
    return np.asarray(x.ravel()[0])


def bench(fn, *args, iters=8, inner=4):
    sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(inner)]
        sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    print(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    for n in (197, 785, 1765):
        b, h, d = 64, 12, 64
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16)

        ta = bench(exp_attention_current, q, k, v)
        tb = bench(exp_attention_bnhd, q, k, v)
        a = np.asarray(exp_attention_current(q, k, v), np.float32)
        bb = np.asarray(exp_attention_bnhd(q, k, v), np.float32)
        rel = np.max(np.abs(a - bb)) / max(1e-6, np.max(np.abs(a)))
        print(f"N={n}: current {ta*1e3:7.2f} ms | bnhd {tb*1e3:7.2f} ms "
              f"({ta/tb:.2f}x)  max-rel-diff {rel:.2e}")


if __name__ == "__main__":
    main()
