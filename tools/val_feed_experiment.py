"""A/B: Validator throughput over the relay with f32 vs uint8 image wire.

The validator protocol (validate_siamase, train_helper.py:90-185) uploads
each val image to the device before the fixed-448 resize; at native VOC
sizes the f32 wire is ~2.25 MB/image vs 0.56 MB for uint8
(ops.image.prepare_inputs normalises on device, <=1 ulp).  Run on the
remote-relay chip this isolates the H2D share of the val loop.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from dupl_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from dupl_tpu.config import voc_config, ModelConfig
from dupl_tpu.engine.train import Trainer
from dupl_tpu.engine.validate import Validator


class SynthValDataset:
    """Fixed-size synthetic val set (one shape: 375x500, the VOC mode)."""

    def __init__(self, n=24, nc=21, dtype="float32"):
        self.n, self.nc, self.dtype = n, nc, dtype

    def __len__(self):
        return self.n

    def __getitem__(self, i, seed=None):
        from dupl_tpu.data.transforms import normalize_img
        rs = np.random.RandomState(i)
        raw = rs.randint(0, 255, (375, 500, 3)).astype(np.uint8)
        label = rs.randint(0, self.nc, (375, 500)).astype(np.int32)
        cls_label = np.zeros(self.nc - 1, np.float32)
        cls_label[rs.randint(0, self.nc - 1, 3)] = 1
        img = raw if self.dtype == "uint8" else normalize_img(raw)
        return {"name": f"i{i}", "image": img, "raw_image": raw,
                "label": label, "cls_label": cls_label}


cfg = voc_config(model=ModelConfig(backbone="deit_base_patch16"))
trainer = Trainer(cfg)
params = trainer.model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 448, 448, 3), jnp.float32))
v = Validator(cfg, trainer.model)
for dtype in ("float32", "uint8"):
    ds = SynthValDataset(dtype=dtype)
    v.run(params, ds, max_images=8)  # warm compiles
    t0 = time.perf_counter()
    v.run(params, ds)
    dt = time.perf_counter() - t0
    print(f"validator wire={dtype}: {len(ds)/dt:.2f} img/s "
          f"({dt/len(ds)*1e3:.0f} ms/img)")
