"""Convert a reference-TRAINED DuPL checkpoint (.pth) to eval weights (.npz).

The reference publishes trained ``dupl_voc.pth`` / ``dupl_coco.pth``
checkpoints (README.md:139-144) saved as ``torch.save(model.state_dict())``
of the DDP-wrapped siamese network (train_final_voc.py:513-519); its eval
loads them with ``module.``-prefix stripping (tools/eval_seg_voc.py:172-177).

This tool performs the same load, converts through the layout bridge proven
by the parity suite (dupl_tpu/models/pretrained.py:convert_siamese_state_dict
— the same code path tests/ref_oracle.py co-runs), and writes a weights-only
``.npz`` loadable by ``tools/eval_seg.py --weights``.  That makes the
72.2-mIoU north-star check a one-command evaluation of the authors' released
weights:

    python tools/convert_ref_checkpoint.py --input dupl_voc.pth --output w.npz
    python tools/eval_seg.py --dataset voc --data-folder ... --weights w.npz \
        --input-mode native --crf native
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert(input_path: str, output_path: str, verbose: bool = True) -> dict:
    from dupl_tpu.engine.checkpoint import export_weights
    from dupl_tpu.models.pretrained import load_reference_checkpoint

    variables = load_reference_checkpoint(input_path)
    export_weights(output_path, variables)
    if verbose:
        import numpy as np
        enc = variables["params"]["encoder"]
        depth = sum(1 for k in enc if k.startswith("block"))
        n_params = sum(np.asarray(x).size for x in
                       _leaves(variables)) // 2  # per branch
        cls = variables["params"]["classifier"]["kernel"].shape[1] + 1
        print(f"converted {input_path} -> {output_path}: "
              f"2 branches x {n_params / 1e6:.1f}M params, "
              f"depth {depth}, {cls} classes")
    return variables


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input", required=True,
                   help="reference siamese .pth (torch state_dict, "
                        "module.-prefixed or plain)")
    p.add_argument("--output", required=True, help="weights .npz to write")
    args = p.parse_args()
    convert(args.input, args.output)


if __name__ == "__main__":
    main()
