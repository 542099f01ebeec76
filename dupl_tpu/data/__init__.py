from dupl_tpu.data import transforms  # noqa: F401
from dupl_tpu.data.voc import VocClsDataset, VocSegDataset, VOC_CLASS_LIST  # noqa: F401
from dupl_tpu.data.coco import CocoClsDataset, CocoSegDataset  # noqa: F401
from dupl_tpu.data.pipeline import PrefetchLoader, synthetic_batch  # noqa: F401
