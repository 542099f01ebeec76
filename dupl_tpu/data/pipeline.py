"""Host input pipeline: threaded decode/augment workers feeding fixed-shape
device batches.

Replaces the reference's torch ``DataLoader(num_workers=10, prefetch_factor=4)``
+ ``DistributedSampler`` (train_final_voc.py:127-141).  Fixed shapes are a hard
requirement on TPU (one XLA compilation per shape); the train crop is always
``crop_size`` so batches are naturally static.  Sharding across hosts is by
strided name-list split, like the reference eval sharding
(tools/eval_seg_coco_ddp.py:240-242).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            out[key] = vals  # names stay a list
        else:
            out[key] = np.stack(vals)
    return out


class PrefetchLoader:
    """Infinite shuffled batch stream with worker threads.

    Per-epoch reshuffle with a fresh seed mirrors the reference's random
    ``set_epoch`` reseed on loader exhaustion (train_final_voc.py:179-184).
    Deterministic given ``seed``: sample augmentation randomness is derived
    from (seed, epoch, index).
    """

    def __init__(self, dataset, batch_size: int, *, seed: int = 0,
                 num_workers: int = 8, prefetch: int = 4, shard: int = 0,
                 num_shards: int = 1, shuffle: bool = True, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.shard = shard
        self.num_shards = num_shards
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._stop = threading.Event()
        self._batches: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._threads: List[threading.Thread] = []

    def _index_stream(self) -> Iterator[tuple]:
        epoch = 0
        n = len(self.dataset)
        while not self._stop.is_set():
            order = np.arange(n)
            if self.shuffle:
                order = np.random.RandomState(self.seed + epoch).permutation(n)
            order = order[self.shard::self.num_shards]
            limit = (len(order) // self.batch_size) * self.batch_size if self.drop_last else len(order)
            for i in order[:limit]:
                yield int(i), epoch
            epoch += 1

    def _producer(self):
        sample_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)

        def worker():
            while not self._stop.is_set():
                item = sample_q.get()
                if item is None:
                    return
                slot, idx, epoch, bucket, lock, counter = item
                sample = self.dataset.__getitem__(
                    idx, seed=hash((self.seed, epoch, idx)) & 0x7FFFFFFF
                )
                with lock:
                    bucket[slot] = sample
                    counter[0] += 1
                    if counter[0] == self.batch_size:
                        self._batches.put(collate(bucket))

        for _ in range(self.num_workers):
            t = threading.Thread(target=worker, daemon=True)
            t.start()
            self._threads.append(t)

        stream = self._index_stream()
        try:
            while not self._stop.is_set():
                bucket: List[Optional[Dict]] = [None] * self.batch_size
                lock = threading.Lock()
                counter = [0]
                for slot in range(self.batch_size):
                    idx, epoch = next(stream)
                    sample_q.put((slot, idx, epoch, bucket, lock, counter))
        finally:
            for _ in self._threads:
                sample_q.put(None)

    def __iter__(self):
        threading.Thread(target=self._producer, daemon=True).start()
        while not self._stop.is_set():
            yield self._batches.get()

    def stop(self):
        self._stop.set()


def synthetic_batch(batch: int, crop: int = 448, num_fg: int = 20,
                    seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic fake train batch for tests/benchmarks: piecewise-constant
    color blobs (so PAR/CRF affinities are non-trivial) + multi-hot labels."""
    rs = np.random.RandomState(seed)
    blocks = rs.rand(batch, 8, 8, 3).astype(np.float32)
    image01 = np.kron(blocks, np.ones((1, crop // 8, crop // 8, 1), np.float32))
    image01 += rs.rand(batch, crop, crop, 3).astype(np.float32) * 0.05
    image01 = np.clip(image01, 0, 1)
    mean = np.asarray((0.485, 0.456, 0.406), np.float32)
    std = np.asarray((0.229, 0.224, 0.225), np.float32)
    image = (image01 - mean) / std
    cls_label = (rs.rand(batch, num_fg) > 0.85).astype(np.float32)
    cls_label[np.arange(batch), rs.randint(0, num_fg, batch)] = 1
    img_box = np.tile(np.asarray([[16, crop - 16, 8, crop - 8]], np.int32), (batch, 1))
    return {"image": image, "cls_label": cls_label, "img_box": img_box}
