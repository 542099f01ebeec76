"""CLI wiring smoke for the deployment pair: tools/export_model.py seals a
tiny servable, tools/serve.py serves it over a real socket, a client gets a
palette PNG back at native resolution."""

import io
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_export_then_serve_cli(tmp_path):
    from dupl_tpu.config import ModelConfig, DataConfig, voc_config
    from dupl_tpu.engine import checkpoint as ckpt
    from dupl_tpu.models.network import DualStudent

    cfg = voc_config(
        model=ModelConfig(backbone="test_tiny_patch16",
                          compute_dtype="float32"),
        data=DataConfig(crop_size=64))
    model = DualStudent(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    wpath = str(tmp_path / "w.npz")
    ckpt.export_weights(wpath, params)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # tools re-assert this over sitecustomize
    art = str(tmp_path / "tiny.duplsrv")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         "--weights", wpath, "--out", art, "--backbone", "test_tiny_patch16",
         "--crop-size", "64", "--batch-size", "2", "--branch", "1",
         "--scales", "1.0"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(art) and "crop_size: 64" in r.stdout

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "serve.py"),
         "--artifact", art, "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=REPO)
    try:
        line = ""
        deadline = time.monotonic() + 300
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if "serving on" in line:
                break
            assert proc.poll() is None, proc.stderr.read()[-2000:]
        assert "serving on" in line, "server never announced its port"
        url = line.split("serving on ")[1].split()[0]

        from PIL import Image

        img = np.random.RandomState(0).randint(
            0, 255, (40, 56, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        req = urllib.request.Request(url + "/v1/segment", data=buf.getvalue(),
                                     method="POST",
                                     headers={"Content-Type": "image/png"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = Image.open(io.BytesIO(resp.read()))
        assert out.mode == "P" and out.size == (56, 40)
        assert np.asarray(out).max() < 21

        # graceful drain: SIGTERM (the deployment stop signal) must shut the
        # server down cleanly, not kill it mid-request-loop
        proc.terminate()
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)
