import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from dupl_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from dupl_tpu.config import voc_config, ModelConfig
from dupl_tpu.data.pipeline import synthetic_batch
from dupl_tpu.engine.train import Trainer
from dupl_tpu.ops import augment as augment_ops
from dupl_tpu.ops import image as image_ops

cfg = voc_config(model=ModelConfig(backbone="deit_base_patch16",
                                   cam_stream_dtype="bfloat16"),
                 cam_merge_downscale=2)
trainer = Trainer(cfg)
b = 8
batch = {k: jnp.asarray(v) for k, v in synthetic_batch(b, crop=448).items()}
rng = jax.random.PRNGKey(0)
state = trainer.init_state(rng, batch["image"][:1])


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timeit(fn, *args, iters=6):
    sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


inputs, cls_label, img_box = batch["image"], batch["cls_label"], batch["img_box"]
denorm = jax.jit(image_ops.denormalize)(inputs)

msc = jax.jit(lambda p, x: trainer._multi_scale_cams(p, x))
dt = timeit(msc, state.params, inputs)
print(f"train MSC (6 fwd, full-res merge + aux): {dt*1e3:.1f} ms")
cams, cams_aux = msc(state.params, inputs)

aug = jax.jit(lambda r, x: augment_ops.strong_augment(r, x, cfg.aug_n, cfg.aug_m))
dt = timeit(aug, rng, denorm)
print(f"strong augment: {dt*1e3:.1f} ms")

ref = jax.jit(lambda c, d, cl, ib: trainer._refine(c, d, cl, ib, high_thre=cfg.high_thre))
dt = timeit(ref, cams, denorm, cls_label, img_box)
print(f"refine: {dt*1e3:.1f} ms")

ptc = jax.jit(lambda ca, cl, ib: trainer._ptc_targets(ca, cl, ib, 28, high_thre=None, dynamic=False))
dt = timeit(ptc, cams_aux, cls_label, img_box)
print(f"ptc targets: {dt*1e3:.1f} ms")


# gradient step alone (phase-1 losses on precomputed aff): approximates fwd/bwd
aff = ptc(cams_aux, cls_label, img_box)
import optax
from dupl_tpu.ops import losses as loss_ops

@jax.jit
def grad_step(params, aff):
    def loss_fn(p):
        out = trainer.model.apply(p, inputs)
        cls_l, ptc_l, sim_l = trainer._common_losses(out, cls_label, aff)
        segs_up = image_ops.resize_bilinear(out.seg, (448, 448), batch_dims=2)
        seg_l = loss_ops.seg_loss(segs_up[0], jnp.zeros((b, 448, 448), jnp.int32), 255)
        return cls_l + 0.2 * ptc_l + 0.1 * sim_l + 0.2 * seg_l
    return jax.grad(loss_fn)(params)

dt = timeit(grad_step, state.params, aff)
print(f"dual fwd/bwd + losses: {dt*1e3:.1f} ms")


# --- the unmeasured tail: GMM filter, optimizer update, and the full fused step
from dupl_tpu.ops import gmm as gmm_ops
from dupl_tpu.ops import losses as loss_ops2

refined = ref(cams, denorm, cls_label, img_box)
segs = jnp.zeros((2, b, 448, 448, cfg.num_classes), jnp.float32)

@jax.jit
def gmm_step(segs, refined):
    def filter_branch(k):
        ce = loss_ops2.cross_entropy_map(segs[k], refined[k], cfg.ignore_index)
        return gmm_ops.gmm_filter_labels(
            ce, refined[k], num_iter=cfg.gmm.num_iter,
            reg_covar=cfg.gmm.reg_covar, loss_floor=cfg.gmm.loss_floor,
            min_pixels=cfg.gmm.min_pixels, valid_thre=cfg.gmm.valid_thre,
            gamma=cfg.gmm.gamma, ignore_index=cfg.ignore_index)
    return jnp.stack([filter_branch(0), filter_branch(1)])

dt = timeit(gmm_step, segs, refined)
print(f"GMM filter (CE map + EM, 2 branches): {dt*1e3:.1f} ms")

grads = jax.tree.map(jnp.zeros_like, state.params)

@jax.jit
def opt_step(state, grads):
    return trainer._apply_updates(state, grads)

dt = timeit(opt_step, state, grads)
print(f"optimizer update (AdamW 2x86M): {dt*1e3:.1f} ms")

from dupl_tpu.engine.train import loss_weights
w = jnp.asarray(loss_weights(cfg, cfg.gmm_iters + 1))
# non-donating jit for repeat timing (the live step donates state)
full = jax.jit(trainer._step_full)
dt = timeit(full, state, batch, w)
print(f"full fused phase-3 step: {dt*1e3:.1f} ms -> {1/dt:.2f} it/s")
