"""Multi-host training-path integration (VERDICT r3 missing 4 / next 4).

Two REAL processes (subprocesses of this test, CPU backend, 2 virtual
devices each) run ``tools/train.py --multihost`` end-to-end: cluster init
via ``jax.distributed.initialize``, the 4-device global mesh, the loader's
``shard=process_index`` split, global-batch assembly through
``jax.make_array_from_process_local_data`` (parallel/mesh.py:shard_batch),
the collective orbax save and the rank-0 export/validation — then the
exported weights are compared against a single-process 4-device run on the
same global batch stream.  A second arm adds ``--fsdp``: params + Adam
moments shard over the data axis ACROSS processes, exercising the sharded
collective save and the ``multihost_utils.process_allgather`` that rebuilds
full params for the rank-0 export/validation.

The loader's per-global-batch contiguous shard slices (data/pipeline.py:
_epoch_order) make the global batch stream invariant to process count, so
the runs execute the same math; the only remaining difference is
collective-reduction scheduling (in-process vs gloo cross-process psum),
which the comparison bounds at float32 reduction-order noise.

The subprocesses strip the axon sitecustomize (PYTHONPATH): its TPU plugin
pins jax.process_count() to 1 even after a successful distributed init,
which silently degrades a CPU multi-process run to two disjoint programs.
"""

import glob
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _base_env(num_devices: int) -> dict:
    env = dict(os.environ)
    for k in ("PYTHONPATH", "PALLAS_AXON_POOL_IPS", "XLA_FLAGS",
              "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = str(num_devices)
    env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    return env


def _train_cmd(tree: str, work_dir: str) -> list:
    return [
        sys.executable, os.path.join(REPO, "tools", "train.py"),
        "--dataset", "voc", "--data-folder", tree,
        "--list-folder", os.path.join(tree, "lists"),
        "--work-dir", work_dir, "--backbone", "test_tiny_patch16",
        "--crop-size", "64", "--max-iters", "4", "--cam-iters", "2",
        "--gmm-iters", "3", "--eval-iters", "4", "--log-iters", "2",
        "--samples-per-device", "1", "--num-workers", "2",
        "--cam-stream-dtype", "float32",
    ]


def _weights(work_dir: str) -> dict:
    paths = glob.glob(os.path.join(work_dir, "*", "checkpoints", "weights.npz"))
    assert len(paths) == 1, paths
    return dict(np.load(paths[0]))


def _run_two_process(tree: str, work_dir: str, extra: list) -> list:
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = _base_env(2)
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            _train_cmd(tree, work_dir) + ["--multihost"] + extra, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    return outs


def _assert_weights_match(w_single: dict, w_multi: dict, label: str,
                          tol: float = 1e-5, atol_floor: float = 1e-7) -> None:
    """Per-leaf: |a-b|.max() <= max(tol * |a|.max(), atol_floor).

    The relative term covers pretrained-scale leaves (they move ~lr << their
    own scale, so even diverged trajectories keep them equal to ~1e-5 rel);
    ``atol_floor`` covers near-zero leaves (a zero-init bias after 4
    warmup-lr steps has |w| ~ 5e-7, where fp-dust absolute diffs read as
    percent-level "relative" error under per-leaf normalisation).  A
    semantic shard error (wrong slice, zeroed shard, wrong group) corrupts
    large leaves at >=1e-2 of scale — far outside both terms."""
    assert set(w_single) == set(w_multi)
    worst = 0.0
    for k in sorted(w_single):
        a, b = w_single[k], w_multi[k]
        diff_abs = float(np.abs(a - b).max())
        bound = max(tol * float(np.abs(a).max()), atol_floor)
        worst = max(worst, diff_abs / bound * tol)
        assert diff_abs <= bound, (label, k, diff_abs, bound)
    # visibility: how close to bitwise the runs actually were
    print(f"max normalised param diff single-vs-{label}: {worst:.2e}")


_LOSS_RE = r"cls: ([0-9.]+) \| ptc: ([0-9.]+) \| seg: ([0-9.]+) \| sim: ([0-9.]+)"


def _loss_curve(work_dir: str) -> list:
    import re

    logs = glob.glob(os.path.join(work_dir, "*", "train.log"))
    assert len(logs) == 1
    return [tuple(map(float, m)) for m in
            re.findall(_LOSS_RE, open(logs[0]).read())]


def _assert_losses_track(single_dir_curve: list, multi_curve: list,
                         label: str, rel: float = 2e-2) -> None:
    """Loss curves within ``rel`` at every logged step.  Looser than the
    weight check by design: ptc/seg targets are threshold-banded, so ~1-ulp
    forward differences from a different SPMD partitioning flip a few
    banding pixels and move those loss terms by O(0.5%) legitimately."""
    assert len(single_dir_curve) == len(multi_curve) and single_dir_curve
    for i, (s, m) in enumerate(zip(single_dir_curve, multi_curve)):
        for name, sv, mv in zip(("cls", "ptc", "seg", "sim"), s, m):
            assert abs(sv - mv) <= rel * max(1.0, abs(sv)), (
                label, f"log {i}", name, sv, mv)


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_fake_voc import make_tree

    tree = str(tmp_path_factory.mktemp("mh") / "voc")
    make_tree(tree, n=8, size=96)
    return tree


@pytest.fixture(scope="module")
def single_run(voc_tree, tmp_path_factory):
    """Single process, 4 local devices (mesh data=4, global batch 4) — the
    oracle both multi-process arms compare against.  Returns (weights,
    loss curve, run dir)."""
    single_dir = str(tmp_path_factory.mktemp("mh") / "single")
    r = subprocess.run(_train_cmd(voc_tree, single_dir), env=_base_env(4),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    return _weights(single_dir), _loss_curve(single_dir), single_dir


def test_multihost_two_process_matches_single(voc_tree, single_run, tmp_path):
    multi_dir = str(tmp_path / "multi")
    _run_two_process(voc_tree, multi_dir, extra=[])
    w_single, curve_single, _ = single_run
    _assert_weights_match(w_single, _weights(multi_dir), "multihost")
    _assert_losses_track(curve_single, _loss_curve(multi_dir), "multihost")

    # the multihost run's validation + export came from process 0 only
    logs = glob.glob(os.path.join(multi_dir, "*", "train.log"))
    assert len(logs) == 1
    assert "validating at iter 4" in open(logs[0]).read()


def test_multihost_fsdp_matches_single(voc_tree, single_run, tmp_path):
    """ZeRO-style FSDP across processes: every param/moment leaf is sharded
    over the data axis spanning BOTH hosts, the orbax save is collective
    over non-addressable shards, and the rank-0 export/validation rebuilds
    full params via multihost_utils.process_allgather(tiled=True)
    (tools/train.py — this test caught the missing tiled flag).

    Unlike the replicated arm (bitwise-equal losses in practice), fsdp
    REPARTITIONS the program: XLA's SPMD pass produces ~1-ulp forward
    differences, which flip a few threshold-banded ptc/seg target pixels,
    so the trajectories legitimately diverge at the per-step UPDATE scale
    (~lr; measured 4.4e-7 absolute on zero-init biases over 4 steps).  The
    contract asserted here: losses track within 2%, pretrained-scale leaves
    agree to 2e-4 relative, near-zero leaves to a 5e-6 absolute floor
    (~10x the measured drift, ~1000x below any semantic shard error)."""
    multi_dir = str(tmp_path / "multi_fsdp")
    _run_two_process(voc_tree, multi_dir, extra=["--fsdp"])
    w_single, curve_single, _ = single_run
    _assert_weights_match(w_single, _weights(multi_dir), "multihost-fsdp",
                          tol=2e-4, atol_floor=5e-6)
    _assert_losses_track(curve_single, _loss_curve(multi_dir),
                         "multihost-fsdp")
    logs = glob.glob(os.path.join(multi_dir, "*", "train.log"))
    assert len(logs) == 1
    assert "validating at iter 4" in open(logs[0]).read()
