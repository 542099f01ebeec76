from dupl_tpu.ops import cam, gmm, image, losses, par, schedule  # noqa: F401
