"""Golden trajectory: a deterministic tiny-model run reproduces its recorded
loss curve (the reference's analogue is its committed train logs,
SURVEY.md §4).

NOTE: this is a DRIFT DETECTOR, not parity evidence — it compares the repo
against its own recorded outputs (self-referential by construction).  The
reference-anchored evidence lives in tests/test_reference_parity.py (loss /
gradient / update / trajectory / validator / offline-protocol co-runs
against the live torch reference); see PARITY.md's verification ladder.
Guards the method's numerics across refactors.

Regenerate after an *intentional* semantic change with:
    python tests/test_golden_trajectory.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    # regeneration must run on the same platform the test suite uses (the
    # conftest forces CPU; outside pytest the ambient axon backend would be
    # picked — and hangs when the relay is down)
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from dupl_tpu.config import GmmConfig, ModelConfig, OptimConfig, ParConfig, voc_config
from dupl_tpu.data.pipeline import synthetic_batch
from dupl_tpu.engine.train import Trainer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_trajectory.json")


def _run(steps=6):
    cfg = voc_config(
        model=ModelConfig(backbone="test_tiny_patch16", compute_dtype="float32"),
        optim=OptimConfig(lr=1e-4, warmup_iters=2, warmup_ratio=0.1),
        par=ParConfig(num_iter=2),
        gmm=GmmConfig(min_pixels=10),
        cam_iters=2, gmm_iters=4, max_iters=20,
    )
    trainer = Trainer(cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(2, crop=64).items()}
    state = trainer.init_state(jax.random.PRNGKey(42), batch["image"][:1])
    track = []
    for _ in range(steps):
        state, m = trainer.train_step(state, batch)
        track.append({k: float(v) for k, v in m.items()})
    return track


def test_matches_golden():
    if not os.path.exists(GOLDEN):
        import pytest
        pytest.skip("no golden file recorded")
    golden = json.load(open(GOLDEN))
    got = _run(len(golden))
    for step, (g, o) in enumerate(zip(golden, got)):
        for key in ("loss", "cls_loss", "ptc_loss", "seg_loss", "sim_loss"):
            assert abs(o[key] - g[key]) <= 1e-3 + 1e-3 * abs(g[key]), (
                step, key, g[key], o[key])


if __name__ == "__main__":
    json.dump(_run(), open(GOLDEN, "w"), indent=1)
    print(f"wrote {GOLDEN}")
