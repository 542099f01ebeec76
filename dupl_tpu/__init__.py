"""dupl_tpu — a TPU-native (JAX/XLA/Pallas) weakly-supervised semantic segmentation
framework with the capabilities of DuPL (CVPR 2024, reference: Wu0409/DuPL).

DuPL trains semantic segmentation models from image-level labels only: two ViT
"students" co-generate Class Activation Maps, refine them into pixel pseudo-labels
with pixel-adaptive refinement (PAR), filter noisy pixels with per-image GMMs fit on
the CE-loss distribution, and cross-supervise each other's segmentation decoder.

Design stance (not a port): the entire training step — both students' forward/backward,
multi-scale CAM, PAR, GMM filtering and pseudo-label logic — is a single jitted,
mesh-shardable function.  The reference's per-image host loops (sklearn GMM, PIL
augmentation, pydensecrf) are batched device code here.
"""

__version__ = "0.1.0"

from dupl_tpu.config import TrainConfig, voc_config, coco_config  # noqa: F401
