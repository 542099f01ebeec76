"""Packed-record input format (``.duplrec``): one shard file instead of
O(100k) tiny JPEGs/PNGs.

The reference (and our directory datasets, ``data/voc.py`` /
``data/coco.py``, mirroring ``datasets/voc.py:24-62``) reads every sample as
two small files plus a side ``cls_labels_onehot.npy``.  That layout is fine
on a local SSD but is the classic production input-pipeline bottleneck on
network filesystems (one metadata round-trip + open per tiny file).  A
production TPU feed reads a few large sequential shards (ArrayRecord/
TFRecord-style).  ``.duplrec`` is the minimal such format for this workload:

    DUPLREC1 | uint64 LE json_len | JSON index | blob section

The JSON index holds, per sample: name, (offset, length) of the encoded
image bytes, optionally (offset, length) of the encoded mask bytes, the
(h, w) image size (so shape bucketing never touches the blobs), and
optionally the image-level one-hot label.  Blobs are the **original encoded
file bytes** (JPEG/PNG, no re-encode, no decode at pack time), so packed
and directory datasets are pixel-identical by construction.

Reads go through one shared ``os.pread`` file descriptor — positionless and
thread-safe, so all :class:`~dupl_tpu.data.pipeline.PrefetchLoader` workers
share it with zero locking.

``RecordVocClsDataset`` etc. subclass the directory datasets and override
only the IO methods; the transform/augment/``__getitem__`` logic — and
therefore the (seed, epoch, idx) determinism contract — is inherited
unchanged.
"""

from __future__ import annotations

import glob
import io
import json
import os
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from dupl_tpu.data import coco as coco_data
from dupl_tpu.data import voc as voc_data

MAGIC = b"DUPLREC1"


def pack_records(out_path: str, names: Sequence[str],
                 image_paths: Sequence[str],
                 label_paths: Optional[Sequence[Optional[str]]] = None,
                 cls_labels: Optional[Dict[str, np.ndarray]] = None) -> dict:
    """Write a ``.duplrec`` shard.  Blobs are raw file bytes (no re-encode).

    Returns the index dict (sans offsets) for logging/tests."""
    if label_paths is None:
        label_paths = [None] * len(names)
    if len(image_paths) != len(names) or len(label_paths) != len(names):
        raise ValueError("names/image_paths/label_paths length mismatch")

    # blobs stream to a sidecar file (a full COCO split is ~13 GB — far too
    # large to accumulate in memory) and are spliced after the index, whose
    # length is only known once every entry is measured
    entries: List[dict] = []
    tmp = out_path + ".blobs.tmp"
    try:
        with open(tmp, "wb") as blobs:
            for name, ipath, lpath in zip(names, image_paths, label_paths):
                with open(ipath, "rb") as f:
                    ib = f.read()
                with Image.open(io.BytesIO(ib)) as im:
                    w, h = im.size
                e: dict = {"name": name, "image": [blobs.tell(), len(ib)],
                           "size": [h, w]}
                blobs.write(ib)
                if lpath is not None:
                    with open(lpath, "rb") as f:
                        lb = f.read()
                    e["label"] = [blobs.tell(), len(lb)]
                    blobs.write(lb)
                if cls_labels is not None:
                    e["cls"] = np.asarray(cls_labels[name], np.float32).tolist()
                entries.append(e)

        index = {"format": "duplrec/1", "count": len(entries),
                 "entries": entries}
        blob = json.dumps(index).encode("utf-8")
        with open(out_path, "wb") as f, open(tmp, "rb") as blobs:
            f.write(MAGIC)
            f.write(struct.pack("<Q", len(blob)))
            f.write(blob)
            while True:
                chunk = blobs.read(1 << 24)
                if not chunk:
                    break
                f.write(chunk)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return index


def _sharded(out_path: str, shards: int):
    """['x-00000-of-00004.duplrec', ...] split paths for ``shards`` > 1."""
    if shards <= 1:
        return [out_path]
    stem, ext = os.path.splitext(out_path)
    return [f"{stem}-{i:05d}-of-{shards:05d}{ext}" for i in range(shards)]


def _pack_split(out_path: str, shards: int, names, img, lab, cls):
    paths = _sharded(out_path, shards)
    bounds = np.linspace(0, len(names), len(paths) + 1).astype(int)
    for p, lo, hi in zip(paths, bounds[:-1], bounds[1:]):
        pack_records(p, names[lo:hi], img[lo:hi],
                     None if lab is None else lab[lo:hi], cls)
    return len(names)


def pack_voc(root_dir: str, name_list_dir: str, split: str, out_path: str, *,
             with_labels: bool = True, with_cls: bool = True,
             shards: int = 1) -> int:
    """Pack a VOC split (JPEGImages + SegmentationClassAug +
    cls_labels_onehot.npy).  ``shards`` > 1 writes contiguous
    ``-NNNNN-of-NNNNN`` pieces (parallel-packable, read back with a glob).
    Returns the sample count."""
    names = voc_data.load_name_list(os.path.join(name_list_dir, split + ".txt"))
    img = [os.path.join(root_dir, "JPEGImages", n + ".jpg") for n in names]
    lab = ([os.path.join(root_dir, "SegmentationClassAug", n + ".png")
            for n in names] if with_labels else None)
    cls = voc_data.load_cls_labels(name_list_dir) if with_cls else None
    return _pack_split(out_path, shards, names, img, lab, cls)


def pack_coco(root_dir: str, name_list_dir: str, split: str, out_path: str, *,
              label_folder: Optional[str] = None,
              with_labels: bool = True, with_cls: bool = True,
              shards: int = 1) -> int:
    """Pack a COCO split (train2014/val2014 subdirs keyed by name prefix,
    coco.py:61-71 semantics via :func:`coco_data._subdir`)."""
    names = voc_data.load_name_list(os.path.join(name_list_dir, split + ".txt"))
    label_folder = label_folder or coco_data.default_label_folder(root_dir)
    img = [os.path.join(root_dir, coco_data._subdir(n), n + ".jpg")
           for n in names]
    lab = ([os.path.join(label_folder, coco_data._subdir(n), n + ".png")
            for n in names] if with_labels else None)
    cls = None
    if with_cls:
        try:
            cls = voc_data.load_cls_labels(name_list_dir)
        except FileNotFoundError:
            cls = None  # regenerable from masks; datasets fall back lazily
    return _pack_split(out_path, shards, names, img, lab, cls)


class RecordStore:
    """Read side: parse the index once, then positionless ``os.pread`` blob
    reads shared across loader worker threads.

    ``path`` may be a single shard, a glob (``voc-*.duplrec``), or a list of
    shard paths — multi-shard splits (packed in parallel with
    ``tools/pack_records.py --shards N``) present as one concatenated
    dataset in shard order."""

    def __init__(self, path):
        if isinstance(path, str):
            # a literal path wins over glob interpretation, so files whose
            # names happen to contain metacharacters ('voc[2012].duplrec')
            # still open
            if os.path.exists(path):
                paths = [path]
            elif any(c in path for c in "*?["):
                paths = sorted(glob.glob(path))
                if not paths:
                    raise FileNotFoundError(f"no shards match {path!r}")
            else:
                raise FileNotFoundError(path)
        else:
            paths = list(path)
        self.path = paths[0] if len(paths) == 1 else f"{paths[0]} (+{len(paths) - 1})"
        self.entries: List[dict] = []
        self._fds: List[int] = []
        for shard_i, p in enumerate(paths):
            with open(p, "rb") as f:
                magic = f.read(len(MAGIC))
                if magic != MAGIC:
                    raise ValueError(
                        f"{p}: not a duplrec shard (magic {magic!r})")
                (n,) = struct.unpack("<Q", f.read(8))
                index = json.loads(f.read(n).decode("utf-8"))
                blob0 = f.tell()
            self._fds.append(os.open(p, os.O_RDONLY))
            for e in index["entries"]:
                e["_shard"] = shard_i
                e["_blob0"] = blob0
                self.entries.append(e)
        self.names: List[str] = [e["name"] for e in self.entries]
        self.sizes: List[Tuple[int, int]] = [tuple(e["size"]) for e in self.entries]
        self._by_name = {e["name"]: e for e in self.entries}
        if len(self._by_name) != len(self.entries):
            # e.g. a glob that matches both a monolithic shard and sharded
            # pieces of the same split: the dataset would silently double-
            # count every sample, with name-keyed reads resolving to
            # whichever shard parsed last
            dupes = len(self.entries) - len(self._by_name)
            raise ValueError(
                f"{self.path}: {dupes} duplicate sample name(s) across "
                "shards — the path/glob matches overlapping packings of "
                "the same split")
        n_lab = sum("label" in e for e in self.entries)
        if n_lab and n_lab != len(self.entries):
            # same load-time loudness as the cls check below: a mixed
            # with_labels set would otherwise die mid-run on the first
            # unlucky sample's KeyError
            raise ValueError(
                f"{self.path}: {n_lab}/{len(self.entries)} samples carry a "
                "mask — shards were packed with inconsistent with_labels; "
                "re-pack the split uniformly")
        self.cls_labels: Optional[Dict[str, np.ndarray]] = None
        n_cls = sum("cls" in e for e in self.entries)
        if n_cls and n_cls != len(self.entries):
            # mixed shards (some packed --no-cls) would either crash on a
            # raw KeyError or silently drop the packed labels depending on
            # shard order — fail loudly instead
            raise ValueError(
                f"{self.path}: {n_cls}/{len(self.entries)} samples carry a "
                "cls label — shards were packed with inconsistent with_cls; "
                "re-pack the split uniformly")
        if n_cls:
            self.cls_labels = {e["name"]: np.asarray(e["cls"], np.float32)
                               for e in self.entries}

    def __len__(self):
        return len(self.entries)

    def __del__(self):
        try:  # datasets hold the store for their lifetime; release the
            self.close()  # per-shard fds when the store itself is collected
        except Exception:
            pass

    def _read(self, e: dict, span) -> bytes:
        off, length = span
        return os.pread(self._fds[e["_shard"]], length, e["_blob0"] + off)

    def image_bytes(self, name: str) -> bytes:
        e = self._by_name[name]
        return self._read(e, e["image"])

    def label_bytes(self, name: str) -> bytes:
        e = self._by_name[name]
        if "label" not in e:
            raise KeyError(f"{self.path}: no mask packed for {name!r} "
                           "(packed with with_labels=False?)")
        return self._read(e, e["label"])

    def decode_image(self, name: str) -> np.ndarray:
        # .convert("RGB") = the directory datasets' grayscale promotion
        # (coco robust_read_image / voc read_image)
        return np.asarray(Image.open(io.BytesIO(self.image_bytes(name))).convert("RGB"))

    def decode_label(self, name: str) -> np.ndarray:
        return np.asarray(Image.open(io.BytesIO(self.label_bytes(name))))

    def close(self):
        for fd in self._fds:
            os.close(fd)
        self._fds = []


class _RecordIO:
    """Mixin replacing a directory dataset's three IO methods with store
    reads.  MRO puts this before the dataset class, so the inherited
    ``__getitem__`` (transforms, determinism contract) calls into the store."""

    _store: RecordStore

    def read_image(self, name: str) -> np.ndarray:
        return self._store.decode_image(name)

    def read_label(self, name: str) -> np.ndarray:
        return self._store.decode_label(name)

    def image_size(self, idx: int) -> Tuple[int, int]:
        return self._store.sizes[idx]


class RecordVocClsDataset(_RecordIO, voc_data.VocClsDataset):
    def __init__(self, record_path: str, *, crop_size: int = 448,
                 rescale_range: Tuple[float, float] = (0.5, 2.0),
                 img_fliplr: bool = True, num_classes: int = 21,
                 ignore_index: int = 255, aug: bool = True,
                 transfer_dtype: str = "float32"):
        self._store = RecordStore(record_path)
        if self._store.cls_labels is None:
            raise ValueError(f"{record_path} was packed without cls labels; "
                             "the training dataset needs them (pack with "
                             "with_cls=True)")
        self.name_list = list(self._store.names)
        self.label_list = self._store.cls_labels
        self.crop_size = crop_size
        self.rescale_range = rescale_range
        self.img_fliplr = img_fliplr
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.aug = aug
        self.transfer_dtype = transfer_dtype


class RecordVocSegDataset(_RecordIO, voc_data.VocSegDataset):
    def __init__(self, record_path: str, *, stage: str = "val",
                 num_classes: int = 21, ignore_index: int = 255,
                 transfer_dtype: str = "float32"):
        self._store = RecordStore(record_path)
        self.name_list = list(self._store.names)
        self.stage = stage
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.transfer_dtype = transfer_dtype


class RecordCocoClsDataset(_RecordIO, coco_data.CocoClsDataset):
    def __init__(self, record_path: str, *, crop_size: int = 448,
                 rescale_range: Tuple[float, float] = (0.5, 2.0),
                 img_fliplr: bool = True, num_classes: int = 81,
                 ignore_index: int = 255, aug: bool = True,
                 transfer_dtype: str = "float32"):
        self._store = RecordStore(record_path)
        self.name_list = list(self._store.names)
        # may be None: CocoClsDataset.__getitem__ then derives the one-hot
        # from the packed mask (the same lazy fallback as the directory path)
        self.label_list = self._store.cls_labels
        self.crop_size = crop_size
        self.rescale_range = rescale_range
        self.img_fliplr = img_fliplr
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.aug = aug
        self.transfer_dtype = transfer_dtype


class RecordCocoSegDataset(_RecordIO, coco_data.CocoSegDataset):
    def __init__(self, record_path: str, *, stage: str = "val",
                 num_classes: int = 81, ignore_index: int = 255,
                 transfer_dtype: str = "float32"):
        self._store = RecordStore(record_path)
        self.name_list = list(self._store.names)
        self.stage = stage
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.transfer_dtype = transfer_dtype
