"""CLI smoke for tools/infer_cam.py (the reference's tools/infer_cam_voc.py
ships broken — wrong import, duplicate flag, undefined args; ours must
actually run): overlays written, mIoU line printed, exit 0."""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_infer_cam_cli_smoke(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_fake_voc import make_tree

    import jax
    import jax.numpy as jnp
    from dupl_tpu.config import ModelConfig, DataConfig, voc_config
    from dupl_tpu.engine import checkpoint as ckpt
    from dupl_tpu.models.network import DualStudent

    tree = str(tmp_path / "voc")
    make_tree(tree, n=4, size=96)

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
    out_dir = str(tmp_path / "cams")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "infer_cam.py"),
         "--data-folder", tree, "--list-folder", os.path.join(tree, "lists"),
         "--weights", wpath, "--out-dir", out_dir,
         "--backbone", "test_tiny_patch16", "--crop-size", "64",
         "--branch", "2", "--max-images", "3"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "CAM-label mIoU:" in r.stdout
    overlays = glob.glob(os.path.join(out_dir, "*.jpg"))
    assert len(overlays) == 3
    from PIL import Image
    arr = np.asarray(Image.open(overlays[0]))
    assert arr.ndim == 3 and arr.shape[2] == 3 and arr.std() > 0
