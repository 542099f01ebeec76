from dupl_tpu.engine import checkpoint, eval_seg, optimizer, train, validate  # noqa: F401
