"""Microbench: exp-attention kernel variants on the live chip.

Variant A (current): denominator via VPU row-sum of the fp32 score matrix.
Variant B (ones-column): V is augmented with a ones column so ONE MXU matmul
``e @ [V | 1]`` produces both the numerator and the row sums — the full
VPU reduction pass over the (bq, N) fp32 scores disappears.  The denominator
is then built from bf16-rounded e, i.e. the SAME rounding the numerator
already gets, so the ratio is arguably more self-consistent than the mixed
fp32-denom/bf16-numer form.  Interpret-mode check: identical max-rel error vs
an fp32 reference as the current kernel (3.6e-3 @197 / 3.4e-3 @785).

Usage: python tools/exp_attn_experiment.py
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


def _exp_attn_kernel_ones(q_ref, kt_ref, v1_ref, o_ref):
    q = q_ref[0]                                   # (bq, D) bf16, pre-scaled
    kt = kt_ref[0]                                 # (D, Np) bf16
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    e = jnp.exp(jnp.minimum(s, _LOGIT_CLAMP)).astype(jnp.bfloat16)
    pv1 = jax.lax.dot_general(e, v1_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    d = v1_ref.shape[-1] - 1
    # NO n_pad correction: the padded V *rows* are zero INCLUDING the ones
    # column, so padded keys contribute e·0 = 0 to the denominator (unlike
    # the current kernel's fp32 row-sum over e, which does see them).
    o_ref[0] = (pv1[:, :d] / pv1[:, d:d + 1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def exp_attention_ones(q, k, v):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n, d = q.shape
    np_ = _pad_to(n, 128)
    bq = _block_q(np_)

    qp = jnp.pad(q, ((0, 0), (0, np_ - n), (0, 0)))
    ktp = jnp.pad(k.transpose(0, 2, 1), ((0, 0), (0, 0), (0, np_ - n)))
    # ones column appended to V; padded rows stay zero (ones column
    # included), so padded keys drop out of numerator AND denominator
    ones = jnp.ones((bh, n, 1), v.dtype)
    v1 = jnp.pad(jnp.concatenate([v, ones], axis=-1),
                 ((0, 0), (0, np_ - n), (0, 0)))
    d1 = d + 1

    out = pl.pallas_call(
        _exp_attn_kernel_ones,
        grid=(bh, np_ // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, np_), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, d1), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, np_, d), jnp.bfloat16),
    )(qp, ktp, v1)
    return out[:, :n]


def sync(x):
    return np.asarray(x.ravel()[0])


def bench(fn, *args, iters=20):
    sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    # the three live CAM shapes at inference batch 16 (x2 flip x2 branch
    # folded into batch): seqs = 64, heads = 12
    for n in (197, 785, 1765):
        bh = 64 * 12
        kq, kk, kv = jax.random.split(key, 3)
        q = (jax.random.normal(kq, (bh, n, 64), jnp.bfloat16) * 0.125)
        k = jax.random.normal(kk, (bh, n, 64), jnp.bfloat16)
        v = jax.random.normal(kv, (bh, n, 64), jnp.bfloat16)

        ta = bench(lambda q, k, v: _exp_attention_bhnd(q, k, v), q, k, v)
        tb = bench(exp_attention_ones, q, k, v)
        a = np.asarray(_exp_attention_bhnd(q, k, v), np.float32)
        b = np.asarray(exp_attention_ones(q, k, v), np.float32)
        rel = np.max(np.abs(a - b)) / max(1e-6, np.max(np.abs(a)))
        print(f"N={n}: current {ta*1e3:7.2f} ms | ones-col {tb*1e3:7.2f} ms "
              f"({ta/tb:.2f}x)  max-rel-diff {rel:.2e}")


if __name__ == "__main__":
    main()
