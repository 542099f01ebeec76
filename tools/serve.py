"""Segmentation serving daemon (engine/serve.py).

    # from a sealed artifact (tools/export_model.py):
    python tools/serve.py --artifact dupl_voc.duplsrv --port 8000
    # or live from training weights:
    python tools/serve.py --weights ckpt/weights.npz --dataset voc --port 8000

    curl -s -X POST --data-binary @image.jpg -H 'Content-Type: image/jpeg' \
        http://127.0.0.1:8000/v1/segment > pred.png

``POST /v1/segment`` takes a PNG/JPEG (or ``application/x-npy`` HxWx3 uint8)
body and answers an indexed-palette PNG label map at the image's native
resolution (``Accept: application/x-npy`` for the raw uint8 array).
Concurrent requests micro-batch onto one device program (bounded-delay
batcher, ``--max-batch-delay-ms``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dupl_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    from dupl_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact", help=".duplsrv file from tools/export_model.py")
    src.add_argument("--weights", help="weights .npz (live mode)")
    p.add_argument("--dataset", choices=["voc", "coco"], default="voc",
                   help="config for --weights live mode")
    p.add_argument("--backbone", default=None)
    p.add_argument("--branch", default="ensemble")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch-delay-ms", type=float, default=10.0)
    args = p.parse_args()

    from dupl_tpu.engine.serve import Batcher, InferenceSession, make_http_server

    if args.artifact:
        session = InferenceSession.from_artifact(args.artifact)
    else:
        import dataclasses as dc

        from dupl_tpu.config import voc_config, coco_config

        cfg = voc_config() if args.dataset == "voc" else coco_config()
        if args.backbone:
            cfg = dc.replace(cfg, model=dc.replace(cfg.model,
                                                   backbone=args.backbone))
        branch = args.branch if args.branch == "ensemble" else int(args.branch)
        session = InferenceSession.from_weights(
            cfg, args.weights, batch_size=args.batch_size, branch=branch,
            merge="max" if args.dataset == "voc" else "sum")

    # warm the compile before accepting traffic
    import numpy as np

    session.predict([np.zeros((64, 64, 3), np.uint8)])

    batcher = Batcher(session, max_delay_s=args.max_batch_delay_ms / 1e3)
    server = make_http_server(batcher, args.host, args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(batch {session.batch_size}, crop {session.crop_size}, "
          f"{session.num_classes} classes)")

    # graceful SIGTERM (deployment stop signal): shutdown() must run off the
    # serve_forever thread or it deadlocks, hence the helper thread; the
    # finally block then fails queued requests fast via batcher.close()
    import signal
    import threading

    signal.signal(signal.SIGTERM, lambda *a: threading.Thread(
        target=server.shutdown, daemon=True).start())
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.close()


if __name__ == "__main__":
    main()
