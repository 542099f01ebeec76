"""Microbench: CRF full-res kernel-apply formulations on the live chip.

Shapes are the fast-CRF final slice at batch 16, 448², s=8 pivots:
basis (N=200704, 11), coef (11, Ns=3136), vals (Ns, 22).

Variants:
  xla      — the lax.map tile loop from ops/crf.py (row_chunk=56)
  pallas   — ops/crf_pallas.kernel_apply at several block_rows
  pallas16 — same but scores/exp in bf16 (halved VMEM tile, maybe 2x exp)

Usage: python tools/crf_apply_experiment.py
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
from dupl_tpu.ops.crf_pallas import kernel_apply, _pad_to

enable_compilation_cache()

H = W = 448
S = 8
NS = (H // S) * (W // S)
N = H * W
B = 16
V = 22


@jax.jit
def xla_apply(basis, coef, logc, vals):
    def one(basis, coef, logc, vals):
        def tile_fn(bt):
            logk = jnp.dot(bt, coef, preferred_element_type=jnp.float32)
            k = jnp.exp(jnp.minimum(logk, logc[None, :])).astype(jnp.bfloat16)
            return jnp.dot(k, vals.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        bt = basis.reshape(8, (H // 8) * W, 11)
        return jax.lax.map(tile_fn, bt).reshape(N, -1)

    return jax.vmap(one, in_axes=(0, 0, 0, 0))(basis, coef, logc, vals)


def _kernel16(basis_ref, coef_ref, logc_ref, vals_ref, out_ref):
    bt = basis_ref[0]
    s = jax.lax.dot_general(bt, coef_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    k = jnp.exp(jnp.minimum(s, logc_ref[0]).astype(jnp.bfloat16))
    out_ref[0] = jax.lax.dot_general(
        k, vals_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def pallas16(basis, coef, logc, vals, block_rows=512):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = basis.shape[-2:]
    ns, v = vals.shape[-2:]
    np_ = _pad_to(n, block_rows)
    nsp = _pad_to(ns, 128)
    dp = _pad_to(d, 8)
    vp = _pad_to(v, 128)

    def one(basis, coef, logc, vals):
        basis_p = jnp.pad(basis, ((0, np_ - n), (0, dp - d)))
        coef_p = jnp.pad(coef, ((0, dp - d), (0, nsp - ns)))
        logc_p = jnp.pad(logc, (0, nsp - ns), constant_values=-jnp.inf)[None]
        vals_p = jnp.pad(vals.astype(jnp.bfloat16),
                         ((0, nsp - ns), (0, vp - v)))
        out = pl.pallas_call(
            _kernel16,
            grid=(np_ // block_rows,),
            in_specs=[
                pl.BlockSpec((1, block_rows, dp), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, dp, nsp), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nsp), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nsp, vp), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_rows, vp), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, np_, vp), jnp.float32),
        )(basis_p[None], coef_p[None], logc_p[None], vals_p[None])
        return out[0, :n, :v]

    return jax.vmap(one)(basis, coef, logc, vals)


def sync(x):
    return np.asarray(x.ravel()[0])


def bench(fn, *args, iters=10):
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
    ks = jax.random.split(key, 4)
    basis = jax.random.normal(ks[0], (B, N, 11), jnp.float32)
    coef = jax.random.normal(ks[1], (B, 11, NS), jnp.float32) * 0.1
    logc = -jnp.abs(jax.random.normal(ks[2], (B, NS), jnp.float32))
    vals = jax.random.normal(ks[3], (B, NS, V), jnp.float32)

    t = bench(xla_apply, basis, coef, logc, vals)
    print(f"xla tile loop (row_chunk 56):        {t*1e3:7.1f} ms")
    ref = np.asarray(xla_apply(basis, coef, logc, vals))

    for br in (512,):
        fn = jax.jit(functools.partial(
            jax.vmap(lambda b, c, l, v: kernel_apply(b, c, l, v,
                                                     block_rows=br))))
        t = bench(fn, basis, coef, logc, vals)
        got = np.asarray(fn(basis, coef, logc, vals))
        rel = np.max(np.abs(got - ref)) / max(1e-6, np.max(np.abs(ref)))
        print(f"pallas f32 exp, block_rows={br:5d}:   {t*1e3:7.1f} ms  "
              f"max-rel {rel:.1e}")

    for br in (512, 1024):
        fn = functools.partial(pallas16, block_rows=br)
        t = bench(fn, basis, coef, logc, vals)
        got = np.asarray(fn(basis, coef, logc, vals))
        rel = np.max(np.abs(got - ref)) / max(1e-6, np.max(np.abs(ref)))
        print(f"pallas bf16 exp, block_rows={br:5d}:  {t*1e3:7.1f} ms  "
              f"max-rel {rel:.1e}")


if __name__ == "__main__":
    main()
