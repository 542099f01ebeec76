"""Student and dual-student models (reference: model/model_dupl.py).

The reference's ``siamese_network`` holds two independent ``network`` branches
and dispatches on mode flags (``val`` / ``cam_only`` / ``need_sp`` /
``branch``).  TPU-native redesign: one :class:`Student` module, two parameter
pytrees **stacked on a leading branch axis**, and ``jax.vmap`` over that axis —
XLA compiles both students into one batched program, so the "two branches" cost
one kernel launch sequence and the MXU sees doubled batch instead of two small
matmuls (SURVEY.md §7 "Dual students become a stacked leading axis").

Mode flags become separate apply methods (each jitted call site compiles only
what it needs):

* ``Student.__call__``       -> (cls, seg, fmap, cls_aux)  [model_dupl.py:69-106]
* ``Student.cam_only``       -> (cam, cam_aux), stop-gradiented [model_dupl.py:81-84]
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dupl_tpu.config import ModelConfig
from dupl_tpu.models.decoder import LargeFOV
from dupl_tpu.models.vit import ViT, VIT_CONFIGS


class StudentOut(NamedTuple):
    cls: jax.Array       # (B, C_fg) image-level logits
    seg: jax.Array       # (B, h, w, C) patch-res segmentation logits
    fmap: jax.Array      # (B, h, w, D) post-norm patch features
    cls_aux: jax.Array   # (B, C_fg) aux-layer image-level logits


class Student(nn.Module):
    """One WSSS student: ViT encoder, LargeFOV seg decoder on last-layer patch
    tokens, and GMP 1x1-conv classifiers on main and aux tokens."""

    cfg: ModelConfig

    def setup(self):
        spec = VIT_CONFIGS[self.cfg.backbone]
        dtype = jnp.dtype(self.cfg.compute_dtype)
        self.encoder = ViT(spec, aux_layer=self.cfg.aux_layer, dtype=dtype,
                           gelu_approximate=self.cfg.gelu_approximate,
                           quant=self.cfg.quantized_inference,
                           remat=self.cfg.remat,
                           stream_dtype=jnp.dtype(self.cfg.stream_dtype),
                           name="encoder")
        self.decoder = LargeFOV(
            self.cfg.num_classes, self.cfg.decoder_dim, self.cfg.decoder_dilation,
            dtype=dtype, name="decoder",
        )
        # 1x1 conv == Dense over the channel axis; bias-free like the reference
        # (model_dupl.py:26-32).
        self.classifier = nn.Dense(self.cfg.num_fg, use_bias=False, name="classifier")
        self.aux_classifier = nn.Dense(self.cfg.num_fg, use_bias=False, name="aux_classifier")

    def _features(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b, hh, ww, _ = x.shape
        p = self.cfg.patch_size
        h, w = hh // p, ww // p
        _, tokens, aux_tokens = self.encoder(x)
        d = tokens.shape[-1]
        return tokens.reshape(b, h, w, d), aux_tokens.reshape(b, h, w, d)

    def __call__(self, x: jax.Array) -> StudentOut:
        fmap, aux = self._features(x)
        seg = self.decoder(fmap)
        # GMP pooling (model_dupl.py:20,88-92: adaptive_max_pool2d to 1x1)
        cls = self.classifier(jnp.max(fmap, axis=(1, 2)))
        cls_aux = self.aux_classifier(jnp.max(aux, axis=(1, 2)))
        return StudentOut(cls, seg, fmap, cls_aux)

    def cam_only(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """CAM = classifier weights applied per-pixel to the feature map,
        detached (model_dupl.py:81-84).  Returns (cam, cam_aux) at patch res."""
        fmap, aux = self._features(x)
        cam = self.classifier(fmap)
        cam_aux = self.aux_classifier(aux)
        return jax.lax.stop_gradient(cam), jax.lax.stop_gradient(cam_aux)

    def forward_with_cams(self, x: jax.Array):
        """Fused inference forward: one encoder pass yields the full head
        outputs AND the per-pixel CAMs (identical to running ``__call__`` and
        ``cam_only`` separately — they share features exactly).  Used by the
        inference pipeline so the scale-1.0 CAM pass is free."""
        fmap, aux = self._features(x)
        seg = self.decoder(fmap)
        cls = self.classifier(jnp.max(fmap, axis=(1, 2)))
        cls_aux = self.aux_classifier(jnp.max(aux, axis=(1, 2)))
        cam = jax.lax.stop_gradient(self.classifier(fmap))
        cam_aux = jax.lax.stop_gradient(self.aux_classifier(aux))
        return StudentOut(cls, seg, fmap, cls_aux), cam, cam_aux


class DualStudent:
    """Two independent students as one branch-stacked parameter pytree.

    ``params`` everywhere below is a pytree whose leaves have a leading axis of
    size 2 (branch).  ``apply``/``cam_only`` vmap over it; ``branch`` slices it.
    Replaces ``siamese_network`` (model_dupl.py:109-214)."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.module = Student(cfg)

    def init(self, rng: jax.Array, sample: jax.Array):
        """Init two independent branches and stack them.

        One jitted program (eager init dispatches hundreds of tiny ops —
        minutes through a remote-relay backend), traced at a minimal spatial
        size: every parameter shape is independent of the input resolution,
        and the small trace keeps the init compile seconds-fast."""
        p = self.cfg.patch_size
        small = jnp.zeros((1, 2 * p, 2 * p, sample.shape[-1]), sample.dtype)

        def _init(rng):
            r1, r2 = jax.random.split(rng)
            p1 = self.module.init(r1, small)
            p2 = self.module.init(r2, small)
            return jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)

        return jax.jit(_init)(rng)

    # -- batched-over-branches calls ------------------------------------------
    def apply(self, params, x: jax.Array) -> StudentOut:
        """Both branches on the same batch: leaves of the result gain a leading
        branch axis of size 2."""
        return jax.vmap(self.module.apply, in_axes=(0, None))(params, x)

    def cam_only(self, params, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return jax.vmap(
            lambda p, xx: self.module.apply(p, xx, method=Student.cam_only),
            in_axes=(0, None),
        )(params, x)

    # -- single-branch calls ---------------------------------------------------
    @staticmethod
    def branch(params, i: int):
        return jax.tree.map(lambda a: a[i], params)

    def apply_branch(self, params, i: int, x: jax.Array) -> StudentOut:
        return self.module.apply(self.branch(params, i), x)

    def cam_only_branch(self, params, i: int, x: jax.Array):
        return self.module.apply(self.branch(params, i), x, method=Student.cam_only)
