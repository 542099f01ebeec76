"""TensorBoard logging (reference: tensorboardX calls in
train_final_voc.py:113,493-508 — loss scalars, eval scores, jet CAM overlay
grids).  Uses whatever SummaryWriter backend is available; degrades to a
no-op so training never depends on it."""

from __future__ import annotations

import numpy as np


class TbWriter:
    def __init__(self, log_dir):
        self._w = None
        if log_dir is None:  # non-primary multihost processes
            return
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            self._w = SummaryWriter(log_dir=log_dir)
        except Exception:
            try:
                from tensorboardX import SummaryWriter  # type: ignore
                self._w = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._w = None

    @property
    def enabled(self) -> bool:
        return self._w is not None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def image(self, tag: str, img_hwc: np.ndarray, step: int) -> None:
        if self._w is not None:
            self._w.add_image(tag, np.asarray(img_hwc), step, dataformats="HWC")

    def close(self) -> None:
        if self._w is not None:
            self._w.close()


def image_grid(images01: np.ndarray, nrow: int = 2) -> np.ndarray:
    """(B, H, W, 3) [0,1] -> one uint8 grid image (torchvision.make_grid
    analogue for the reference's "CAM/inputs" panel, imutils.py:255-257)."""
    b, h, w, _ = images01.shape
    rows = -(-b // nrow)
    grid = np.zeros((rows * h, nrow * w, 3), np.float32)
    for i in range(b):
        r, c = divmod(i, nrow)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = images01[i]
    return (np.clip(grid, 0, 1) * 255).astype(np.uint8)


def cam_overlay_grid(images01: np.ndarray, cams: np.ndarray,
                     nrow: int = 2) -> np.ndarray:
    """Jet-colormap CAM overlay grid (reference: utils/imutils.py:255-267).

    images01: (B, H, W, 3) in [0,1]; cams: (B, h, w, C) — the per-pixel max
    over classes is colormapped and alpha-blended 50/50.  CAMs at a coarser
    resolution than the images (e.g. merged at PAR resolution under
    ``cam_merge_downscale``) are nearest-upsampled to the image grid."""
    import matplotlib.cm as cm

    b, h, w, _ = images01.shape
    ch, cw = cams.shape[1:3]
    if (ch, cw) != (h, w):
        iy = (np.arange(h) * ch) // h
        ix = (np.arange(w) * cw) // w
        cams = cams[:, iy][:, :, ix]
    cam_max = np.clip(cams.max(-1), 0, 1)
    heat = cm.jet(cam_max)[..., :3]
    blend = (0.5 * heat + 0.5 * images01)
    rows = -(-b // nrow)
    grid = np.zeros((rows * h, nrow * w, 3), np.float32)
    for i in range(b):
        r, c = divmod(i, nrow)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = blend[i]
    return (grid * 255).astype(np.uint8)
