"""ctypes bridge to the native permutohedral DenseCRF
(native/densecrf: C++ mean-field with Gaussian + bilateral kernels — the
algorithm the reference uses via pydensecrf, utils/dcrf.py:42-68).

The shared library is built on demand with g++ and cached next to the
sources.  The ctypes call releases the GIL, so a thread pool gives the same
multi-core fan-out as the reference's joblib CRF driver
(tools/eval_seg_voc.py:145-147) without process overhead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import numpy as np

from dupl_tpu.config import CrfConfig

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "densecrf")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdensecrf.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    srcs = [os.path.join(_NATIVE_DIR, f) for f in ("densecrf.cc", "permutohedral.cc")]
    if os.path.exists(_LIB_PATH) and all(
        os.path.getmtime(_LIB_PATH) >= os.path.getmtime(s) for s in srcs
    ):
        return
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
         "-o", _LIB_PATH] + srcs,
        check=True, cwd=_NATIVE_DIR, capture_output=True,
    )


def _get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.dense_crf_inference.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.dense_crf_inference.restype = None
            _lib = lib
        return _lib


class DenseCRF:
    """Drop-in equivalent of the reference's ``DenseCRF`` callable
    (utils/dcrf.py:42-68): ``crf(image_hwc_uint8, probs_chw) -> marginals_chw``."""

    def __init__(self, iter_max=10, pos_w=1.0, pos_xy_std=1.0,
                 bi_w=4.0, bi_xy_std=121.0, bi_rgb_std=5.0):
        self.iter_max = iter_max
        self.pos_w = pos_w
        self.pos_xy_std = pos_xy_std
        self.bi_w = bi_w
        self.bi_xy_std = bi_xy_std
        self.bi_rgb_std = bi_rgb_std

    @classmethod
    def from_config(cls, cfg: CrfConfig) -> "DenseCRF":
        return cls(cfg.iter_max, cfg.pos_w, cfg.pos_xy_std,
                   cfg.bi_w, cfg.bi_xy_std, cfg.bi_rgb_std)

    def __call__(self, image: np.ndarray, probmap: np.ndarray) -> np.ndarray:
        c, h, w = probmap.shape
        assert image.shape == (h, w, 3), (image.shape, probmap.shape)
        probs = np.ascontiguousarray(probmap, np.float32)
        img = np.ascontiguousarray(image, np.uint8)
        out = np.empty_like(probs)
        lib = _get_lib()
        lib.dense_crf_inference(
            probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            h, w, c, self.iter_max,
            self.pos_w, self.pos_xy_std,
            self.bi_w, self.bi_xy_std, self.bi_rgb_std,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out


def crf_batch(images: Sequence[np.ndarray], probmaps: Sequence[np.ndarray],
              cfg: CrfConfig, workers: Optional[int] = None):
    """Threaded fan-out over images (GIL released inside the native call)."""
    crf = DenseCRF.from_config(cfg)
    workers = workers or max(1, int(os.cpu_count() * 0.8))
    with ThreadPoolExecutor(workers) as ex:
        return list(ex.map(crf, images, probmaps))
