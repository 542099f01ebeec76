"""Dissect the cam_only encoder pass: where does the time beyond the GEMM
roofline go?  Times each stage as an enqueue-loop (10 dispatches, one sync) so
the ~30 ms relay dispatch floor amortises away.

Usage: python tools/encoder_dissect.py [--seqs 64] [--size 448]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=64)
    ap.add_argument("--size", type=int, default=448)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dupl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from dupl_tpu.config import ModelConfig
    from dupl_tpu.models.network import Student
    from dupl_tpu.models.vit import Attention, Block, Mlp

    print(f"backend={jax.default_backend()}")
    cfg = ModelConfig(backbone="deit_base_patch16", gelu_approximate=True,
                      stream_dtype="bfloat16")
    student = Student(cfg)
    hw = args.size
    n_tok = (hw // 16) ** 2 + 1
    x = jax.random.normal(jax.random.PRNGKey(0), (args.seqs, hw, hw, 3),
                          jnp.float32)
    params = student.init(jax.random.PRNGKey(1), x[:1])

    def bench(fn, *fargs):
        np.asarray(jax.tree.leaves(fn(*fargs))[0].ravel()[0])
        t0 = time.perf_counter()
        outs = [fn(*fargs) for _ in range(args.iters)]
        np.asarray(jax.tree.leaves(outs[-1])[0].ravel()[0])
        return (time.perf_counter() - t0) / args.iters

    # full cam_only
    f_full = jax.jit(lambda p, x: student.apply(p, x, method=Student.cam_only))
    t_full = bench(f_full, params, x)
    print(f"cam_only full ({args.seqs} seqs, {n_tok} tok): {t_full*1e3:.1f} ms")

    # encoder only (drop the cam head)
    f_enc = jax.jit(lambda p, x: student.apply(p, x, method=Student._features))
    t_enc = bench(f_enc, params, x)
    print(f"  encoder (_features): {t_enc*1e3:.1f} ms "
          f"(cam head +{(t_full-t_enc)*1e3:.1f} ms)")

    # blocks only, on pre-built tokens
    tokens = jax.random.normal(jax.random.PRNGKey(2),
                               (args.seqs, n_tok, 768), jnp.bfloat16)
    blk = Block(768, 12, 4.0, jnp.bfloat16, True, stream_dtype=jnp.bfloat16)
    pb = blk.init(jax.random.PRNGKey(3), tokens)

    @jax.jit
    def twelve_blocks(pb, t):
        def body(t, _):
            return blk.apply(pb, t), None
        return jax.lax.scan(body, t, None, length=12)[0]

    t_blocks = bench(twelve_blocks, pb, tokens)
    print(f"  12x Block (scan, same params): {t_blocks*1e3:.1f} ms "
          f"(embed/LN/interp delta {(t_enc-t_blocks)*1e3:+.1f} ms)")

    # attention vs mlp split
    attn = Attention(768, 12, jnp.bfloat16)
    pa = attn.init(jax.random.PRNGKey(4), tokens)

    @jax.jit
    def twelve_attn(pa, t):
        def body(t, _):
            return attn.apply(pa, t).astype(t.dtype), None
        return jax.lax.scan(body, t, None, length=12)[0]

    t_attn = bench(twelve_attn, pa, tokens)
    print(f"  12x Attention(+qkv/proj): {t_attn*1e3:.1f} ms")

    mlp = Mlp(3072, 768, jnp.bfloat16, True)
    pm = mlp.init(jax.random.PRNGKey(5), tokens)

    @jax.jit
    def twelve_mlp(pm, t):
        def body(t, _):
            return mlp.apply(pm, t).astype(t.dtype), None
        return jax.lax.scan(body, t, None, length=12)[0]

    t_mlp = bench(twelve_mlp, pm, tokens)
    # MLP GEMM roofline: 2 matmuls 768x3072, bf16 peak ~122 TF measured
    fl = 2 * 2 * args.seqs * n_tok * 768 * 3072
    print(f"  12x Mlp: {t_mlp*1e3:.1f} ms (roofline {12*fl/122e12*1e3:.1f} ms)"
          f"  [blocks - attn - mlp = {(t_blocks-t_attn-t_mlp)*1e3:+.1f} ms "
          f"LN/residual]")

    # attention: kernel alone on pre-shaped q/k/v
    from dupl_tpu.ops.attention import exp_attention
    q = jax.random.normal(jax.random.PRNGKey(6),
                          (args.seqs, n_tok, 12, 64), jnp.bfloat16)

    @jax.jit
    def twelve_kernels(q):
        def body(t, _):
            return exp_attention(t, t, t, scale=0.125), None
        return jax.lax.scan(body, q, None, length=12)[0]

    t_kern = bench(twelve_kernels, q)
    qkv_fl = 2 * 4 * args.seqs * n_tok * 768 * 768
    print(f"  12x exp_attention kernel(+layout): {t_kern*1e3:.1f} ms "
          f"(qkv+proj roofline {12*qkv_fl/122e12*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
