"""Packed-record input format (data/records.py): the .duplrec shard must be
sample-for-sample pixel-identical to the directory datasets it packs, across
VOC/COCO, cls/seg, and through the PrefetchLoader."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_data import fake_voc, fake_coco  # noqa: F401 — fixtures


def _assert_samples_equal(a, b):
    assert a.keys() == b.keys()
    for k in a:
        if isinstance(a[k], str):
            assert a[k] == b[k]
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_voc_cls_records_match_directory(fake_voc, tmp_path):  # noqa: F811
    from dupl_tpu.data.records import RecordVocClsDataset, pack_voc
    from dupl_tpu.data.voc import VocClsDataset

    root, lists = fake_voc
    shard = str(tmp_path / "voc_train.duplrec")
    n = pack_voc(root, lists, "train_aug", shard)
    assert n == 8

    dir_ds = VocClsDataset(root, lists, "train_aug", crop_size=64)
    rec_ds = RecordVocClsDataset(shard, crop_size=64)
    assert len(rec_ds) == len(dir_ds) == 8
    assert rec_ds.name_list == dir_ds.name_list
    for i in range(len(dir_ds)):
        # identical seed -> identical augmentation stream -> identical pixels
        _assert_samples_equal(dir_ds.__getitem__(i, seed=77 + i),
                              rec_ds.__getitem__(i, seed=77 + i))
        assert rec_ds.image_size(i) == dir_ds.image_size(i)


def test_voc_seg_records_match_directory(fake_voc, tmp_path):  # noqa: F811
    from dupl_tpu.data.records import RecordVocSegDataset, pack_voc
    from dupl_tpu.data.voc import VocSegDataset

    root, lists = fake_voc
    shard = str(tmp_path / "voc_val.duplrec")
    pack_voc(root, lists, "val", shard)
    dir_ds = VocSegDataset(root, lists, "val", transfer_dtype="uint8")
    rec_ds = RecordVocSegDataset(shard, transfer_dtype="uint8")
    for i in range(len(dir_ds)):
        _assert_samples_equal(dir_ds[i], rec_ds[i])


def test_coco_records_match_directory(fake_coco, tmp_path):  # noqa: F811
    from dupl_tpu.data.coco import CocoClsDataset, CocoSegDataset
    from dupl_tpu.data.records import (RecordCocoClsDataset,
                                       RecordCocoSegDataset, pack_coco)

    root, lists = fake_coco
    tr = str(tmp_path / "coco_train.duplrec")
    va = str(tmp_path / "coco_val.duplrec")
    pack_coco(root, lists, "train", tr)
    pack_coco(root, lists, "val_part", va)

    dir_tr = CocoClsDataset(root, lists, "train", crop_size=64)
    rec_tr = RecordCocoClsDataset(tr, crop_size=64)
    for i in range(len(dir_tr)):
        _assert_samples_equal(dir_tr.__getitem__(i, seed=3 + i),
                              rec_tr.__getitem__(i, seed=3 + i))

    # the grayscale val jpeg exercises the robust-read promotion through the
    # packed path (raw bytes are packed, so the decode is byte-identical)
    dir_va = CocoSegDataset(root, lists, "val_part")
    rec_va = RecordCocoSegDataset(va)
    for i in range(len(dir_va)):
        _assert_samples_equal(dir_va[i], rec_va[i])


def test_coco_records_cls_fallback_from_masks(fake_coco, tmp_path):  # noqa: F811
    """A shard packed without the one-hot table must fall back to deriving
    labels from the packed masks (CocoClsDataset's lazy path)."""
    from dupl_tpu.data.coco import CocoClsDataset
    from dupl_tpu.data.records import RecordCocoClsDataset, pack_coco

    root, lists = fake_coco
    shard = str(tmp_path / "coco_nocls.duplrec")
    pack_coco(root, lists, "train", shard, with_cls=False)
    rec = RecordCocoClsDataset(shard, crop_size=64)
    assert rec.label_list is None
    ref = CocoClsDataset(root, lists, "train", crop_size=64)
    for i in range(len(ref)):
        np.testing.assert_array_equal(
            rec.__getitem__(i, seed=1)["cls_label"],
            ref.__getitem__(i, seed=1)["cls_label"])


def test_records_through_prefetch_loader(fake_voc, tmp_path):  # noqa: F811
    """Batch k is a pure function of (seed, k) regardless of the storage
    backend: loader-over-records == loader-over-directory, bitwise."""
    from dupl_tpu.data.pipeline import PrefetchLoader
    from dupl_tpu.data.records import RecordVocClsDataset, pack_voc
    from dupl_tpu.data.voc import VocClsDataset

    root, lists = fake_voc
    shard = str(tmp_path / "voc_loader.duplrec")
    pack_voc(root, lists, "train_aug", shard)

    def take(ds, k=3):
        loader = PrefetchLoader(ds, batch_size=4, seed=11, num_workers=2)
        it = iter(loader)
        batches = [next(it) for _ in range(k)]
        loader.stop()
        return batches

    for a, b in zip(take(VocClsDataset(root, lists, "train_aug", crop_size=64)),
                    take(RecordVocClsDataset(shard, crop_size=64))):
        _assert_samples_equal(a, b)


def test_sharded_pack_and_glob_read(fake_voc, tmp_path):  # noqa: F811
    """--shards N packing: three shard files read back through a glob must
    present the same dataset, in the same order, as the single shard."""
    from dupl_tpu.data.records import RecordStore, RecordVocClsDataset, pack_voc
    from dupl_tpu.data.voc import VocClsDataset

    root, lists = fake_voc
    single = str(tmp_path / "one.duplrec")
    pack_voc(root, lists, "train_aug", single)
    sharded = str(tmp_path / "many.duplrec")
    n = pack_voc(root, lists, "train_aug", sharded, shards=3)
    assert n == 8
    pieces = sorted(os.listdir(tmp_path))
    assert "many-00000-of-00003.duplrec" in pieces
    assert "many-00002-of-00003.duplrec" in pieces

    st1 = RecordStore(single)
    stm = RecordStore(str(tmp_path / "many-*.duplrec"))
    assert stm.names == st1.names and stm.sizes == st1.sizes

    dir_ds = VocClsDataset(root, lists, "train_aug", crop_size=64)
    rec_ds = RecordVocClsDataset(str(tmp_path / "many-*.duplrec"), crop_size=64)
    for i in range(len(dir_ds)):
        _assert_samples_equal(dir_ds.__getitem__(i, seed=9 + i),
                              rec_ds.__getitem__(i, seed=9 + i))

    with pytest.raises(FileNotFoundError, match="no shards match"):
        RecordStore(str(tmp_path / "absent-*.duplrec"))


def test_inconsistent_and_overlapping_shards_rejected(fake_voc, tmp_path):  # noqa: F811
    """Load-time loudness for malformed shard sets: inconsistent with_cls,
    inconsistent with_labels, and overlapping packings (duplicate names)
    must all fail at RecordStore construction, not mid-run."""
    from dupl_tpu.data.records import RecordStore, pack_records, pack_voc
    from dupl_tpu.data.voc import load_name_list

    root, lists = fake_voc
    names = load_name_list(os.path.join(lists, "train_aug.txt"))
    img = [os.path.join(root, "JPEGImages", n + ".jpg") for n in names]
    lab = [os.path.join(root, "SegmentationClassAug", n + ".png")
           for n in names]
    cls = {n: np.zeros(20, np.float32) for n in names}

    # disjoint halves, one packed with cls labels and masks, one without
    a = str(tmp_path / "a.duplrec")
    b_nocls = str(tmp_path / "b_nocls.duplrec")
    b_nolab = str(tmp_path / "b_nolab.duplrec")
    pack_records(a, names[:4], img[:4], lab[:4], cls)
    pack_records(b_nocls, names[4:], img[4:], lab[4:], None)
    pack_records(b_nolab, names[4:], img[4:], None, cls)

    with pytest.raises(ValueError, match="inconsistent with_cls"):
        RecordStore([a, b_nocls])
    with pytest.raises(ValueError, match="inconsistent with_cls"):
        RecordStore([b_nocls, a])  # order-independent
    with pytest.raises(ValueError, match="inconsistent with_labels"):
        RecordStore([a, b_nolab])

    # overlapping packings of the same split (monolithic + sharded in one
    # glob) double-count samples — rejected by the duplicate-name guard
    full = str(tmp_path / "full.duplrec")
    pack_voc(root, lists, "train_aug", full)
    with pytest.raises(ValueError, match="duplicate sample name"):
        RecordStore([full, a])


def test_record_store_rejects_garbage_and_guards(tmp_path):
    from dupl_tpu.data.records import (RecordStore, RecordVocClsDataset,
                                       pack_records)

    junk = str(tmp_path / "junk.duplrec")
    with open(junk, "wb") as f:
        f.write(b"NOTAREC!" + b"\0" * 16)
    with pytest.raises(ValueError, match="not a duplrec shard"):
        RecordStore(junk)

    # mask-less + cls-less shard: seg access and cls-training must both fail
    # with clear messages
    img = tmp_path / "img.jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img)
    bare = str(tmp_path / "bare.duplrec")
    pack_records(bare, ["a"], [str(img)])
    store = RecordStore(bare)
    assert store.sizes == [(8, 8)]
    np.testing.assert_array_equal(store.decode_image("a"),
                                  np.asarray(Image.open(img).convert("RGB")))
    with pytest.raises(KeyError, match="no mask packed"):
        store.label_bytes("a")
    with pytest.raises(ValueError, match="without cls labels"):
        RecordVocClsDataset(bare)


@pytest.mark.slow
def test_train_cli_records_matches_directory(tmp_path):
    """tools/train.py --train-records/--val-records end-to-end: a 4-iter
    tiny run fed from packed shards must export bitwise-identical weights to
    the directory-fed run (batch k is a pure function of (seed, k) and the
    record datasets are pixel-identical)."""
    import glob
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from make_fake_voc import make_tree

    tree = str(tmp_path / "voc")
    make_tree(tree, n=8, size=96)
    from dupl_tpu.data.records import pack_voc
    tr = str(tmp_path / "train.duplrec")
    va = str(tmp_path / "val.duplrec")
    pack_voc(tree, os.path.join(tree, "lists"), "train_aug", tr)
    pack_voc(tree, os.path.join(tree, "lists"), "val", va)

    env = dict(os.environ)
    for k in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS", "XLA_FLAGS"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "2"
    base = [sys.executable, os.path.join(repo, "tools", "train.py"),
            "--dataset", "voc", "--backbone", "test_tiny_patch16",
            "--crop-size", "64", "--max-iters", "4", "--cam-iters", "2",
            "--gmm-iters", "3", "--eval-iters", "4", "--log-iters", "2",
            "--samples-per-device", "1", "--num-workers", "2",
            "--cam-stream-dtype", "float32"]

    def run(extra, work_dir):
        r = subprocess.run(base + ["--work-dir", work_dir] + extra, env=env,
                           capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
        (w,) = glob.glob(os.path.join(work_dir, "*", "checkpoints",
                                      "weights.npz"))
        return dict(np.load(w))

    w_dir = run(["--data-folder", tree,
                 "--list-folder", os.path.join(tree, "lists")],
                str(tmp_path / "run_dir"))
    w_rec = run(["--train-records", tr, "--val-records", va],
                str(tmp_path / "run_rec"))
    assert w_dir.keys() == w_rec.keys()
    for k in w_dir:
        np.testing.assert_array_equal(w_dir[k], w_rec[k], err_msg=k)

    # the machine-readable metrics log rides along: train lines at every
    # log_iters boundary + a val line at eval_iters
    import json

    (mpath,) = glob.glob(str(tmp_path / "run_rec" / "*" / "metrics.jsonl"))
    recs = [json.loads(l) for l in open(mpath)]
    train = [r for r in recs if r["event"] == "train"]
    val = [r for r in recs if r["event"] == "val"]
    assert [r["step"] for r in train] == [2, 4] and len(val) == 1
    assert {"lr", "phase", "loss", "cls_loss"} <= set(train[0])
    assert {"seg_1_miou", "cls_f1_1"} <= set(val[0])


@pytest.mark.slow
def test_eval_cli_sharded_merge_matches_full(tmp_path):
    """tools/eval_seg.py --save-hists per shard + --merge-hists must print
    the same global per-branch mIoUs (and branch pick) as the unsharded
    run — the reference's gather-then-pick protocol, CLI end to end."""
    import re
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from make_fake_voc import make_tree

    import jax
    import jax.numpy as jnp
    from dupl_tpu.config import ModelConfig, DataConfig, voc_config
    from dupl_tpu.engine import checkpoint as ckpt
    from dupl_tpu.models.network import DualStudent

    tree = str(tmp_path / "voc")
    make_tree(tree, n=6, size=96)
    cfg = voc_config(model=ModelConfig(backbone="test_tiny_patch16",
                                       compute_dtype="float32"),
                     data=DataConfig(crop_size=64))
    model = DualStudent(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    wpath = str(tmp_path / "w.npz")
    ckpt.export_weights(wpath, params)

    env = dict(os.environ)
    for k in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS", "XLA_FLAGS"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    base = [sys.executable, os.path.join(repo, "tools", "eval_seg.py"),
            "--dataset", "voc", "--weights", wpath,
            "--data-folder", tree, "--list-folder",
            os.path.join(tree, "lists"), "--backbone", "test_tiny_patch16",
            "--crop-size", "64", "--crf", "none", "--batch-size", "2"]

    def run(extra):
        r = subprocess.run(extra, env=env, capture_output=True, text=True,
                           timeout=900)
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
        return r.stdout + r.stderr

    full = run(base)
    for i in range(2):
        run(base + ["--shard", str(i), "--num-shards", "2",
                    "--save-hists", str(tmp_path / f"s{i}.npz")])
    merged = run([sys.executable, os.path.join(repo, "tools", "eval_seg.py"),
                  "--merge-hists", str(tmp_path / "s0.npz"),
                  str(tmp_path / "s1.npz")])

    def mious(text):
        for line in text.splitlines():
            if line.strip().startswith("mIoU"):
                return re.findall(r"[\d.]+", line)
        return []

    assert mious(full) and mious(full)[:2] == mious(merged)[:2], (full, merged)
    # the console logger dual-emits lines; the picked branch is one value
    (b_full,) = set(re.findall(r"-> branch (\d)", full))
    (b_merged,) = set(re.findall(r"-> branch (\d)", merged))
    assert b_full == b_merged


@pytest.mark.slow
def test_eval_cli_records_matches_directory(tmp_path):
    """tools/eval_seg.py --records: identical scores + identical branch pick
    to the directory-fed run on the same shard contents."""
    import re
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    from make_fake_voc import make_tree

    import jax
    import jax.numpy as jnp
    from dupl_tpu.config import ModelConfig, DataConfig, voc_config
    from dupl_tpu.engine import checkpoint as ckpt
    from dupl_tpu.models.network import DualStudent

    tree = str(tmp_path / "voc")
    make_tree(tree, n=6, size=96)
    from dupl_tpu.data.records import pack_voc
    shard = str(tmp_path / "val.duplrec")
    pack_voc(tree, os.path.join(tree, "lists"), "val", shard)

    cfg = voc_config(model=ModelConfig(backbone="test_tiny_patch16",
                                       compute_dtype="float32"),
                     data=DataConfig(crop_size=64))
    model = DualStudent(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    wpath = str(tmp_path / "w.npz")
    ckpt.export_weights(wpath, params)

    env = dict(os.environ)
    for k in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS", "XLA_FLAGS"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    base = [sys.executable, os.path.join(repo, "tools", "eval_seg.py"),
            "--dataset", "voc", "--weights", wpath,
            "--backbone", "test_tiny_patch16", "--crop-size", "64",
            "--crf", "none", "--batch-size", "2"]

    def run(extra):
        r = subprocess.run(base + extra, env=env, capture_output=True,
                           text=True, timeout=900)
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
        return re.findall(r"mIoU\S*\s+[\d.]+", r.stdout + r.stderr), r.stdout

    s_dir, out_dir = run(["--data-folder", tree,
                          "--list-folder", os.path.join(tree, "lists")])
    s_rec, out_rec = run(["--records", shard])
    assert s_dir and s_dir == s_rec, (out_dir, out_rec)


def test_pack_records_cli(fake_voc, tmp_path):  # noqa: F811
    """tools/pack_records.py end-to-end via its main()."""
    from tools import pack_records as cli

    root, lists = fake_voc
    out = str(tmp_path / "cli.duplrec")
    argv = sys.argv
    sys.argv = ["pack_records.py", "--dataset", "voc", "--data-folder", root,
                "--list-folder", lists, "--split", "val", "--out", out]
    try:
        cli.main()
    finally:
        sys.argv = argv
    from dupl_tpu.data.records import RecordStore
    assert len(RecordStore(out)) == 8
