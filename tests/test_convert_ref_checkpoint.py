"""Reference-trained-checkpoint converter (.pth -> weights.npz) acceptance.

The converter (tools/convert_ref_checkpoint.py) must take exactly what the
reference publishes — ``torch.save(model.state_dict())`` of the (possibly
DDP ``module.``-wrapped) ``siamese_network`` (train_final_voc.py:513-519) —
and produce an ``.npz`` that ``tools/eval_seg.py --weights`` loads into
the SAME numerics the live-module bridge (tests/ref_oracle.py) produces.

Acceptance per VERDICT r3 item 1: save a random-init reference siamese
state dict to disk (both ``module.``-wrapped and plain), convert, and assert
:class:`SegEvaluator` scores equal the torch co-run eval on the same
synthetic set.
"""

import os
import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import ref_oracle
from test_eval_protocol_corun import (  # noqa: F401  (shared co-run rig)
    TINY_JAX, BlobSegDataset, _torch_validate_voc, make_pair)

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(ref_oracle.REFERENCE_ROOT),
        reason="reference not present"),
    pytest.mark.slow,
]


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def test_convert_ref_checkpoint_end_to_end(tmp_path):
    from dupl_tpu.config import DataConfig, ModelConfig, voc_config
    from dupl_tpu.engine import checkpoint as ckpt
    from dupl_tpu.engine.eval_seg import SegEvaluator
    from tools.convert_ref_checkpoint import convert

    R = ref_oracle.load_reference()
    net, model, live_params = make_pair(R, num_classes=21, seed=11)

    # The two on-disk layouts the reference produces: plain state_dict and
    # the DDP-wrapped one (every key 'module.'-prefixed).
    state = net.state_dict()
    plain_pth = tmp_path / "plain.pth"
    ddp_pth = tmp_path / "ddp.pth"
    torch.save(state, plain_pth)
    torch.save({"module." + k: v for k, v in state.items()}, ddp_pth)

    outs = []
    for pth in (plain_pth, ddp_pth):
        npz = tmp_path / (pth.stem + ".npz")
        convert(str(pth), str(npz), verbose=False)
        outs.append(npz)

    # Bitwise: the file-based bridge == the live-module bridge the whole
    # parity suite is built on.
    want = _flat(jax.tree.map(np.asarray, live_params))
    for npz in outs:
        got = dict(np.load(npz))
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)

    # End-to-end: eval_seg.py's exact load path (template init +
    # load_weights) scores identically to the reference's own eval driver
    # on the same synthetic set.
    ds = BlobSegDataset(n=3, num_classes=21, seed=4)
    samples = [ds[i] for i in range(len(ds))]
    scales = (1.0, 1.5, 1.25)
    t1, t2, _ = _torch_validate_voc(R, net, samples, scales)

    cfg = voc_config(model=ModelConfig(backbone=TINY_JAX,
                                       compute_dtype="float32"),
                     data=DataConfig(crop_size=64))
    import jax.numpy as jnp
    sample = jnp.zeros((1, cfg.data.crop_size, cfg.data.crop_size, 3),
                       jnp.float32)
    template = model.init(jax.random.PRNGKey(0), sample)
    params = ckpt.load_weights(str(outs[1]), template)

    ev = SegEvaluator(cfg, model, scales=scales, merge="max",
                      input_mode="native")
    res = ev.run(params, ds, batch_size=1, crf="none")
    assert abs(res["seg_score_1"]["miou"] - t1["miou"]) < 1e-3
    assert abs(res["seg_score_2"]["miou"] - t2["miou"]) < 1e-3
    assert res["branch"] == (1 if t1["miou"] > t2["miou"] else 2)


def test_convert_rejects_non_siamese(tmp_path):
    """A plain encoder checkpoint (the DeiT pretraining layout) must raise a
    clear error, not silently produce garbage."""
    from dupl_tpu.models.pretrained import convert_siamese_state_dict

    with pytest.raises(ValueError, match="branch1"):
        convert_siamese_state_dict({"cls_token": np.zeros((1, 1, 8))})
