from dupl_tpu.models.vit import ViT, VIT_CONFIGS  # noqa: F401
from dupl_tpu.models.network import Student, DualStudent  # noqa: F401
