"""tools/convert_test_seg.py: class-index PNGs -> VOC-palette PNGs for the
official test server (reference: tools/convert_test_seg.py:1-58)."""

import os
import subprocess
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_test_seg_cli(tmp_path):
    from dupl_tpu.utils.colormap import voc_colormap

    src = tmp_path / "preds"
    dst = tmp_path / "rgb"
    os.makedirs(src)
    rs = np.random.RandomState(0)
    labels = {}
    for name in ("2007_000001", "2007_000002"):
        lab = rs.randint(0, 21, (33, 47)).astype(np.uint8)
        labels[name] = lab
        Image.fromarray(lab).save(src / f"{name}.png")
    (src / "notes.txt").write_text("ignored")  # non-PNGs skipped

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_test_seg.py"),
         "--dir", str(src), "--target-dir", str(dst)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "converted 2 masks" in r.stdout

    cmap = voc_colormap()
    for name, lab in labels.items():
        out = Image.open(dst / f"{name}.png")
        # indexed-palette PNG: class ids survive round-trip, palette = VOC
        assert out.mode == "P"
        np.testing.assert_array_equal(np.asarray(out), lab)
        np.testing.assert_array_equal(
            np.asarray(out.convert("RGB")), cmap[lab])
