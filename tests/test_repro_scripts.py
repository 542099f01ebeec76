"""CI lock for the one-command repro scripts' --dry-run paths.

`tools/repro_coco.sh --dry-run` exercises the full COCO CLI wiring end to
end on synthetic data: fake-tree build (incl. a grayscale jpeg), tools/
train.py across ALL FOUR curriculum phases (warmup / seg_static / seg /
full, crossing the 12k-analogue aux->main refine switch), the sharded
offline eval driver with device CRF, and palette conversion.  The VOC twin
(`tools/repro_voc.sh --dry-run`) shares every stage implementation and its
train/eval/infer stages are covered by test_multihost / test_eval /
test_smoke_train, so only the COCO script runs here (the suite already
spends ~40 min).

Regression this guards (round 4): the dry run once inherited the ambient
``JAX_PLATFORMS=axon`` through a ``":-cpu"`` shell default and silently
grabbed the remote TPU relay — hanging forever at the first array
materialisation when the relay was wedged.  The scripts now hard-force the
CPU backend and the tools re-assert the env var over any sitecustomize
platform selection (utils/platform.py).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_repro_coco_dry_run(tmp_path):
    env = dict(os.environ)
    env["TMPDIR"] = str(tmp_path)
    # the script must run on CPU even when the ambient env says otherwise
    env["JAX_PLATFORMS"] = "axon"
    r = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "repro_coco.sh"), "--dry-run"],
        capture_output=True, text=True, timeout=1500, env=env, cwd=REPO)
    sys.stdout.write(r.stdout[-2000:])
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0
    work = tmp_path / "repro_coco_dry"
    assert (work / "seg_preds_palette").is_dir()
    assert list(work.glob("run/*/checkpoints/weights.npz"))
    log = next(work.glob("run/*/train.log")).read_text()
    for phase in ("warmup", "seg_static", "phase: seg;", "full"):
        assert phase in log, f"phase {phase!r} never logged"
    assert "CpuDevice" in log, "dry run must not grab the TPU relay"
