"""tools/train.py --resume end-to-end: a run that is interrupted after its
last checkpoint and resumed must (a) land on bitwise-identical weights to an
uninterrupted run (order-exact data fast-forward), and (b) leave
metrics.jsonl single-valued per step (post-checkpoint lines from the
interrupted run are truncated on resume)."""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    for k in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS", "XLA_FLAGS"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "2"
    return env


def _cmd(tree, work_dir, max_iters, resume=False):
    c = [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--dataset", "voc", "--data-folder", tree,
         "--list-folder", os.path.join(tree, "lists"),
         "--work-dir", work_dir, "--backbone", "test_tiny_patch16",
         "--crop-size", "64", "--max-iters", str(max_iters),
         "--cam-iters", "2", "--gmm-iters", "3", "--eval-iters", "3",
         "--log-iters", "2", "--samples-per-device", "1",
         "--num-workers", "2", "--cam-stream-dtype", "float32"]
    return c + (["--resume"] if resume else [])


def _run(args):
    r = subprocess.run(args, env=_env(), capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]


def _weights(pattern):
    (w,) = glob.glob(pattern)
    return dict(np.load(w))


def test_sigterm_checkpoints_and_resumes(tmp_path):
    """Preemption safety: SIGTERM mid-run must checkpoint and exit 0 (the
    spot-VM grace-window contract), and --resume must pick up from exactly
    that step."""
    import signal
    import time

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_fake_voc import make_tree

    tree = str(tmp_path / "voc")
    make_tree(tree, n=8, size=96)
    root = str(tmp_path / "run")

    proc = subprocess.Popen(_cmd(tree, root, 400), env=_env(),
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    # wait until training is demonstrably under way (first logged step)
    deadline = time.monotonic() + 600
    run_dir = None
    log_text = ""
    while time.monotonic() < deadline:
        runs = glob.glob(os.path.join(root, "*"))
        if runs:
            run_dir = runs[0]
            lp = os.path.join(run_dir, "train.log")
            if os.path.exists(lp):
                log_text = open(lp).read()
                if "Iter: " in log_text:
                    break
        assert proc.poll() is None, proc.stdout.read()[-3000:]
        time.sleep(0.5)
    assert run_dir and "Iter: " in log_text, "training never logged a step"

    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-3000:]

    # a full-state checkpoint exists at the preemption step
    steps = [int(os.path.basename(p).split("_")[1]) for p in
             glob.glob(os.path.join(run_dir, "checkpoints", "step_*"))]
    assert steps, out[-3000:]
    s = max(steps)
    assert 0 < s < 400
    recs = [json.loads(l) for l in
            open(os.path.join(run_dir, "metrics.jsonl"))]
    assert any(r["event"] == "preempted" and r["step"] == s for r in recs)

    # resume completes from exactly that step
    r = subprocess.run(_cmd(tree, run_dir, s + 2, resume=True), env=_env(),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    log_text = open(os.path.join(run_dir, "train.log")).read()
    assert f"resumed from step {s}" in log_text


def test_resume_cli_order_exact_and_metrics_truncation(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_fake_voc import make_tree

    tree = str(tmp_path / "voc")
    make_tree(tree, n=8, size=96)

    # oracle: 6 uninterrupted iters (evals/ckpts at 3 and 6)
    clean_dir = str(tmp_path / "clean")
    _run(_cmd(tree, clean_dir, 6))
    w_clean = _weights(os.path.join(clean_dir, "*", "checkpoints",
                                    "weights.npz"))

    # "interrupted" run: stops at 5 — last checkpoint is step 3, so steps
    # 4-5 are lost work past the checkpoint; then resume IN PLACE
    # (--work-dir points at the run dir, the --resume contract) to 6
    int_root = str(tmp_path / "interrupted")
    _run(_cmd(tree, int_root, 5))
    (run_dir,) = glob.glob(os.path.join(int_root, "*"))
    mpath = os.path.join(run_dir, "metrics.jsonl")
    pre = [json.loads(l) for l in open(mpath)]
    assert [r["step"] for r in pre if r["event"] == "train"] == [2, 4]

    _run(_cmd(tree, run_dir, 6, resume=True))
    # resume restored step 3, truncated the stale step-4 line (written after
    # the checkpoint), re-ran 4-6 — one line per step, no duplicates
    post = [json.loads(l) for l in open(mpath)]
    train_steps = [r["step"] for r in post if r["event"] == "train"]
    assert train_steps == [2, 4, 6], train_steps

    w_resumed = _weights(os.path.join(run_dir, "checkpoints", "weights.npz"))
    assert w_clean.keys() == w_resumed.keys()
    for k in w_clean:
        np.testing.assert_array_equal(w_clean[k], w_resumed[k], err_msg=k)
