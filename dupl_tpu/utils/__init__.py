from dupl_tpu.utils import logging as logging_utils  # noqa: F401
from dupl_tpu.utils import metrics  # noqa: F401
