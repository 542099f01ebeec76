"""Locate the 81-class cost inside the fast CRF (COCO perf, round 3)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from dupl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from dupl_tpu.ops import crf as crf_ops

    b, hw = 16, 448
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(b, hw, hw, 3).astype(np.float32))

    def timeit(fn, *a, iters=3):
        def sync(x):
            return np.asarray(jax.tree.leaves(x)[0].ravel()[0])
        sync(fn(*a))
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter(); sync(fn(*a)); best = min(best, time.perf_counter()-t0)
        return best

    for c in (21, 32, 81):
        p = jax.nn.softmax(jnp.asarray(rs.rand(b, hw, hw, c).astype(np.float32)), -1)
        for pos_w in (1.0, 0.0):
            fn = jax.jit(lambda i, q, pw=pos_w: crf_ops.mean_field_crf(
                i, q, fast=True, return_logits=True, pos_w=pw))
            dt = timeit(fn, img, p)
            print(f"C={c:3d} pos_w={pos_w}: {dt*1e3:.1f} ms")

if __name__ == "__main__":
    main()
