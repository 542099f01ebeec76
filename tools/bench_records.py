"""Input-feed throughput: directory tree vs packed .duplrec shard.

Synthesizes an N-image VOC-layout tree (tools/make_fake_voc.py scenes),
packs it, and measures PrefetchLoader samples/s over both backends with the
same worker count and augmentation settings.  On local SSD the two are
close (decode dominates); the packed format's structural win — one open +
pread versus a metadata round-trip + open per tiny file — scales with
filesystem latency, which is why production network-FS feeds use packed
shards.  This harness keeps the local-disk cost/no-cost claim measured.
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(ds, batch, workers, n_batches, seed=0):
    from dupl_tpu.data.pipeline import PrefetchLoader

    loader = PrefetchLoader(ds, batch_size=batch, seed=seed,
                            num_workers=workers)
    it = iter(loader)
    next(it)  # warm the worker pool before timing
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    loader.stop()
    return batch * n_batches / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-images", type=int, default=512)
    p.add_argument("--size", type=int, default=192)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--batches", type=int, default=40)
    p.add_argument("--crop-size", type=int, default=192)
    p.add_argument("--keep", default=None,
                   help="directory to build in (default: a temp dir)")
    args = p.parse_args()

    from tools.make_fake_voc import make_tree
    from dupl_tpu.data.records import RecordVocClsDataset, pack_voc
    from dupl_tpu.data.voc import VocClsDataset

    work = args.keep or tempfile.mkdtemp(prefix="duplrec_bench_")
    tree = os.path.join(work, "voc")
    try:
        if not os.path.isdir(tree):
            make_tree(tree, n=args.n_images, size=args.size)
        lists = os.path.join(tree, "lists")
        shard = os.path.join(work, "train.duplrec")
        t0 = time.perf_counter()
        pack_voc(tree, lists, "train_aug", shard)
        pack_s = time.perf_counter() - t0

        kw = dict(batch=args.batch, workers=args.workers,
                  n_batches=args.batches)
        r_dir = measure(VocClsDataset(tree, lists, "train_aug",
                                      crop_size=args.crop_size), **kw)
        r_rec = measure(RecordVocClsDataset(shard,
                                            crop_size=args.crop_size), **kw)
        size_mb = os.path.getsize(shard) / 1e6
        print(f"{args.n_images} images @{args.size}px, batch {args.batch}, "
              f"{args.workers} workers, {args.batches} batches")
        print(f"pack: {pack_s:.2f} s ({size_mb:.1f} MB shard)")
        print(f"directory tree: {r_dir:.1f} samples/s")
        print(f"packed shard:   {r_rec:.1f} samples/s "
              f"({(r_rec / r_dir - 1) * 100:+.1f}%)")
    finally:
        if args.keep is None:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
