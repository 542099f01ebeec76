from dupl_tpu.ops import (  # noqa: F401
    attention, augment, cam, crf, crf_native, gmm, image, losses, par,
    par_pallas, schedule,
)
