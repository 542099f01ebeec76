"""Raw VPU transcendental throughput on the live chip: exp variants over a
VMEM-resident tile inside a Pallas kernel (isolates the op from HBM).

Each kernel does ITER passes of y = f(x) over a (512, 1024) f32/bf16 tile, so
the measured time is ~pure VPU issue rate.

Usage: python tools/exp_rate_experiment.py
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

enable_compilation_cache()

ROWS, COLS, ITER = 512, 1024, 4096


def _mk_kernel(fn):
    def kernel(x_ref, o_ref):
        def body(i, acc):
            return acc + fn(x_ref[0] + acc * 1e-9)
        o_ref[0] = jax.lax.fori_loop(0, ITER, body, jnp.zeros_like(x_ref[0]))
    return kernel


@functools.partial(jax.jit, static_argnames=("name",))
def run(x, name):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fns = {
        "exp": jnp.exp,
        "exp2": jnp.exp2,
        "exp_min": lambda v: jnp.exp(jnp.minimum(v, 60.0)),
        "tanh": jnp.tanh,
        "mul": lambda v: v * 1.0001,
    }
    return pl.pallas_call(
        _mk_kernel(fns[name]),
        grid=(1,),
        in_specs=[pl.BlockSpec((1, ROWS, COLS), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ROWS, COLS), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, ROWS, COLS), x.dtype),
    )(x[None])


def main():
    print(f"backend={jax.default_backend()}")
    for dtype in (jnp.float32, jnp.bfloat16):
        x = (jax.random.normal(jax.random.PRNGKey(0), (ROWS, COLS)) - 1.0
             ).astype(dtype)
        for name in ("mul", "exp", "exp2", "exp_min", "tanh"):
            f = functools.partial(run, name=name)
            np.asarray(f(x).ravel()[0])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [f(x) for _ in range(4)]
                np.asarray(outs[-1].ravel()[0])
                best = min(best, (time.perf_counter() - t0) / 4)
            n_ops = ROWS * COLS * ITER
            print(f"{np.dtype(dtype).name:8s} {name:8s}: {best*1e3:7.2f} ms "
                  f"-> {n_ops/best/1e9:7.1f} Gop/s")


if __name__ == "__main__":
    main()
