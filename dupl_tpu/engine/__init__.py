from dupl_tpu.engine import (checkpoint, eval_seg, export, optimizer, serve,  # noqa: F401
                             train, validate)
