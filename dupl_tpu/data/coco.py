"""MS COCO 2014 datasets with VOC-style masks (reference: datasets/coco.py).

Same structure as the VOC datasets; COCO specifics: 81 classes, images split
across ``train2014``/``val2014`` subdirectories keyed by the name prefix
(coco.py:61-71), grayscale JPEGs promoted to 3 channels
(``robust_read_image``, coco.py:24-28), masks under
``SegmentationClass/{train2014,val2014}``.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image

from dupl_tpu.data import transforms
from dupl_tpu.data.voc import load_cls_labels, onehot_from_mask


def _subdir(name: str) -> str:
    return "train2014" if "train" in name else "val2014"


def default_label_folder(root_dir: str) -> str:
    """Mask root when --label-folder is omitted: the ``SegmentationClass``
    sibling of the image root (the reference's layout, README.md:62-74).
    Shared with the record packer so packed and directory feeds read the
    same masks."""
    return os.path.join(os.path.dirname(root_dir.rstrip("/")),
                        "SegmentationClass")


class CocoDatasetBase:
    def __init__(self, root_dir: str, name_list_dir: str, split: str,
                 label_folder: Optional[str] = None):
        self.root_dir = root_dir
        self.label_folder = label_folder or default_label_folder(root_dir)
        self.name_list = [
            x.strip() for x in open(os.path.join(name_list_dir, split + ".txt"))
            if x.strip()
        ]

    def __len__(self):
        return len(self.name_list)

    def read_image(self, name: str) -> np.ndarray:
        path = os.path.join(self.root_dir, _subdir(name), name + ".jpg")
        # robust to grayscale JPEGs (coco.py:24-28)
        return np.asarray(Image.open(path).convert("RGB"))

    def read_label(self, name: str) -> np.ndarray:
        path = os.path.join(self.label_folder, _subdir(name), name + ".png")
        return np.asarray(Image.open(path))

    def image_size(self, idx: int) -> Tuple[int, int]:
        """(h, w) from the JPEG header — no pixel decode (shape bucketing)."""
        name = self.name_list[idx]
        with Image.open(os.path.join(self.root_dir, _subdir(name), name + ".jpg")) as im:
            w, h = im.size
        return (h, w)


class CocoClsDataset(CocoDatasetBase):
    def __init__(self, root_dir: str, name_list_dir: str, split: str = "train",
                 crop_size: int = 448, rescale_range: Tuple[float, float] = (0.5, 2.0),
                 img_fliplr: bool = True, num_classes: int = 81,
                 ignore_index: int = 255, aug: bool = True,
                 label_folder: Optional[str] = None,
                 transfer_dtype: str = "float32"):
        super().__init__(root_dir, name_list_dir, split, label_folder)
        self.crop_size = crop_size
        self.rescale_range = rescale_range
        self.img_fliplr = img_fliplr
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.aug = aug
        self.transfer_dtype = transfer_dtype
        try:
            self.label_list = load_cls_labels(name_list_dir)
        except FileNotFoundError:
            # cls_labels_onehot.npy may be regenerated from the masks
            # (it is stripped from the reference snapshot); fall back lazily.
            self.label_list = None

    def __getitem__(self, idx: int, seed: Optional[int] = None) -> Dict:
        name = self.name_list[idx]
        image = self.read_image(name)
        rng = random.Random(seed)
        if self.label_list is not None:
            cls_label = np.asarray(self.label_list[name], np.float32)
        else:
            cls_label = onehot_from_mask(
                self.read_label(name), self.num_classes, self.ignore_index)
        if self.aug:
            image, img_box = transforms.train_transform(
                image, self.crop_size, self.rescale_range, rng,
                fliplr=self.img_fliplr, ignore_index=self.ignore_index,
                transfer_dtype=self.transfer_dtype,
            )
        else:
            image = transforms.normalize_img(image)
            img_box = np.asarray([0, image.shape[0], 0, image.shape[1]], np.int32)
        return {"name": name, "image": image, "cls_label": cls_label, "img_box": img_box}


class CocoSegDataset(CocoDatasetBase):
    def __init__(self, root_dir: str, name_list_dir: str, split: str = "val_part",
                 stage: str = "val", num_classes: int = 81, ignore_index: int = 255,
                 label_folder: Optional[str] = None,
                 transfer_dtype: str = "float32"):
        super().__init__(root_dir, name_list_dir, split, label_folder)
        self.stage = stage
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.transfer_dtype = transfer_dtype

    def __getitem__(self, idx: int, seed: Optional[int] = None) -> Dict:
        name = self.name_list[idx]
        image = self.read_image(name)
        label = self.read_label(name) if self.stage != "test" else image[:, :, 0]
        cls_label = onehot_from_mask(label, self.num_classes, self.ignore_index)
        return {
            "name": name,
            "image": (image if self.transfer_dtype == "uint8"
                      else transforms.normalize_img(image)),
            "raw_image": image,
            "label": label.astype(np.int32),
            "cls_label": cls_label,
        }
