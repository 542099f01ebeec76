"""Driver contract: __graft_entry__ exposes entry() and dryrun_multichip()."""

import jax


def test_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)  # 2x2 dp x tp mesh on virtual CPU devices


def test_entry_signature():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)  # traces without running the model
    cls_shape, seg_shape = out
    assert cls_shape.shape == (2, 1, 20)
    assert seg_shape.shape == (2, 1, 28, 28, 21)
