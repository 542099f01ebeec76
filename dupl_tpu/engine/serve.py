"""Batched segmentation serving: micro-batching queue + stdlib HTTP front.

The deployable complement to ``engine/export.py``: load a ``.duplsrv``
artifact (or live weights) and serve ``POST /v1/segment`` requests.  Requests
are decoded on worker threads, micro-batched up to the program's compiled
batch size (a bounded-delay batcher — the standard accelerator-serving
pattern: one device program in flight, arrivals within ``max_delay_s`` ride
the same dispatch), and answered as an indexed-palette PNG or a raw ``.npy``
label map at the request's native resolution.

No framework dependencies beyond the stdlib + PIL: the device program is the
sealed artifact, so this module never imports model code when serving from a
file.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError
from concurrent.futures import TimeoutError as FuturesTimeoutError
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional, Sequence

import numpy as np

from dupl_tpu.utils import colormap

# Reject request bodies above this size (448^2 RGB float64 .npy is ~4.8 MB;
# 64 MB leaves generous headroom for large PNGs without letting a single
# request exhaust host memory).
MAX_BODY_BYTES = 64 * 1024 * 1024


class InferenceSession:
    """Wraps the compiled serving program behind a plain
    ``list[np.ndarray HxWx3 uint8] -> list[np.ndarray HxW uint8]`` call.

    Host-side contract handling: per-image PIL bilinear resize to the
    program's square crop, zero-pad the batch to the compiled batch size,
    nearest-resize each label map back to its native resolution (labels are
    categorical — nearest is the only sane interpolation)."""

    def __init__(self, run_batch: Callable[[np.ndarray], np.ndarray], *,
                 batch_size: int, crop_size: int, num_classes: int,
                 meta: Optional[dict] = None):
        self._run = run_batch
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.num_classes = num_classes
        self.meta = dict(meta or {})

    # -- constructors ----------------------------------------------------------
    @classmethod
    def from_artifact(cls, path: str) -> "InferenceSession":
        from dupl_tpu.engine.export import load_artifact

        exp, meta = load_artifact(path)
        if meta.get("kind", "segmentation") == "pseudo_labeler":
            raise ValueError(
                f"{path} is a pseudo_labeler artifact ((images, cls_label, "
                "img_box) signature); the segmentation server cannot serve "
                "it — export with engine.export.export_serving instead")
        if not meta.get("bake_params", True):
            raise ValueError(
                f"{path} was exported with bake_params=False (a (params, "
                "images) signature); serve it with from_exported(exp, params)")
        import jax

        n_dev = int(meta.get("num_devices", 1))
        if n_dev > len(jax.devices()):
            raise ValueError(
                f"{path} was exported mesh-sharded over {n_dev} devices "
                f"(mesh={meta.get('mesh')}); this host has only "
                f"{len(jax.devices())} — re-export for this topology")
        call = jax.jit(exp.call)
        return cls(lambda imgs: np.asarray(call(imgs)),
                   batch_size=meta["batch_size"], crop_size=meta["crop_size"],
                   num_classes=meta["num_classes"], meta=meta)

    @classmethod
    def from_weights(cls, cfg, weights_path: str, *, batch_size: int = 8,
                     scales: Sequence[float] = (1.0, 1.5, 1.25),
                     merge: str = "max", branch="ensemble",
                     crf: bool = True) -> "InferenceSession":
        """Live mode: jit the serving fn directly from a weights ``.npz``
        (no artifact file; same program the exporter seals)."""
        import jax
        import jax.numpy as jnp

        from dupl_tpu.engine import checkpoint as ckpt
        from dupl_tpu.engine.export import make_serving_fn
        from dupl_tpu.models.network import DualStudent

        model = DualStudent(cfg.model)
        sample = jnp.zeros((1, cfg.data.crop_size, cfg.data.crop_size, 3),
                           jnp.float32)
        template = model.init(jax.random.PRNGKey(0), sample)
        params = ckpt.load_weights(weights_path, template)
        fn = jax.jit(make_serving_fn(cfg, model, scales=scales, merge=merge,
                                     branch=branch, crf=crf))
        meta = {"branch": branch, "crf": crf, "scales": list(scales),
                "merge": merge, "live": True}
        return cls(lambda imgs: np.asarray(fn(params, imgs)),
                   batch_size=batch_size, crop_size=cfg.data.crop_size,
                   num_classes=cfg.num_classes, meta=meta)

    # -- inference -------------------------------------------------------------
    def predict(self, images: List[np.ndarray]) -> List[np.ndarray]:
        if len(images) > self.batch_size:
            out: List[np.ndarray] = []
            for lo in range(0, len(images), self.batch_size):
                out.extend(self.predict(images[lo:lo + self.batch_size]))
            return out
        from PIL import Image

        s = self.crop_size
        batch = np.zeros((self.batch_size, s, s, 3), np.uint8)
        for i, img in enumerate(images):
            if img.ndim != 3 or img.shape[-1] != 3 or img.dtype != np.uint8:
                raise ValueError(
                    f"image {i}: want HxWx3 uint8, got {img.shape} {img.dtype}")
            batch[i] = np.asarray(
                Image.fromarray(img).resize((s, s), Image.BILINEAR))
        labels = self._run(batch)
        out = []
        for i, img in enumerate(images):
            h, w = img.shape[:2]
            lab = Image.fromarray(labels[i]).resize((w, h), Image.NEAREST)
            out.append(np.asarray(lab, np.uint8))
        return out


class Batcher:
    """Bounded-delay micro-batching: requests enqueue individually; one worker
    drains up to ``session.batch_size`` of them per device dispatch, waiting
    at most ``max_delay_s`` after the first arrival for co-riders."""

    def __init__(self, session: InferenceSession, max_delay_s: float = 0.01):
        self.session = session
        self.max_delay_s = max_delay_s
        self._q: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._stop = threading.Event()
        # dispatch-level counters for the /metrics endpoint
        self._stats_lock = threading.Lock()
        self._stats = {"dispatches": 0, "samples": 0, "failed_dispatches": 0,
                       "dispatch_seconds": 0.0}
        self._worker.start()

    def stats(self) -> dict:
        with self._stats_lock:
            s = dict(self._stats)
        d = max(1, s["dispatches"])
        s["avg_batch"] = round(s["samples"] / d, 3)
        s["avg_dispatch_ms"] = round(1e3 * s["dispatch_seconds"] / d, 3)
        return s

    def submit(self, image: np.ndarray) -> "Future[np.ndarray]":
        fut: "Future[np.ndarray]" = Future()
        if self._stop.is_set():
            # a handler thread racing shutdown must fail fast, not enqueue
            # into a queue nobody drains and hang in result(timeout=300)
            fut.set_exception(RuntimeError("batcher closed"))
            return fut
        self._q.put((image, fut))
        if self._stop.is_set() and not fut.done():
            # close() may have drained the queue between the check above and
            # the put; nobody will process the item now — fail it (races
            # close()'s own drain benignly: whoever sets first wins)
            try:
                fut.set_exception(RuntimeError("batcher closed"))
            except InvalidStateError:
                pass
        return fut

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)
        self._worker.join(timeout=5)
        # fail any requests still queued so their waiters don't hang until
        # the HTTP timeout
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item[1].done():
                item[1].set_exception(RuntimeError("batcher closed"))
        # a worker that outlived the join (wedged in inference) must find a
        # sentinel when it comes back, not block on the drained queue
        self._q.put(None)

    def _loop(self) -> None:
        while not self._stop.is_set():
            first = self._q.get()
            if first is None:
                continue
            items = [first]
            deadline = time.monotonic() + self.max_delay_s
            while len(items) < self.session.batch_size:
                try:
                    nxt = self._q.get(
                        timeout=max(0.0, deadline - time.monotonic()))
                except queue.Empty:
                    break
                if nxt is None:
                    break
                items.append(nxt)
            t0 = time.monotonic()
            try:
                preds = self.session.predict([im for im, _ in items])
                err = None
            except Exception as exc:
                preds, err = None, exc

            # account the dispatch BEFORE resolving futures: a client whose
            # response just completed must see its dispatch in /metrics
            with self._stats_lock:
                self._stats["dispatches"] += 1
                self._stats["samples"] += len(items)
                self._stats["dispatch_seconds"] += time.monotonic() - t0
                if err is not None:
                    self._stats["failed_dispatches"] += 1

            if err is None:
                for (_, fut), pred in zip(items, preds):
                    fut.set_result(pred)
            else:  # propagate to every waiter
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(err)


def _decode_image(body: bytes, content_type: str) -> np.ndarray:
    if content_type == "application/x-npy":
        arr = np.load(io.BytesIO(body), allow_pickle=False)
        # strict: a silent cast would truncate float [0,1] images to all
        # zeros (or wrap large ints mod 256) and serve garbage with a 200
        if arr.dtype != np.uint8:
            raise ValueError(
                f"x-npy body must be uint8, got {arr.dtype} — scale to "
                "[0,255] and cast client-side")
        img = arr
    else:
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
    # validate the contract HERE, before the request joins a micro-batch: a
    # malformed image failing inside the batched predict() would poison
    # every co-riding request's future with its error
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"want HxWx3 RGB, got shape {img.shape}")
    return img


def _encode_png(label: np.ndarray) -> bytes:
    from PIL import Image

    img = Image.fromarray(label.astype(np.uint8), mode="P")
    img.putpalette(colormap.voc_colormap().reshape(-1).tolist())
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def make_http_server(batcher: Batcher, host: str = "127.0.0.1",
                     port: int = 0) -> ThreadingHTTPServer:
    """HTTP front: ``GET /healthz`` -> metadata JSON; ``POST /v1/segment``
    (image/png, image/jpeg or application/x-npy body) -> indexed-palette PNG,
    or the raw uint8 label map as ``.npy`` under ``Accept: application/x-npy``.
    Returns the (not yet serving) ThreadingHTTPServer; callers drive
    ``serve_forever`` on their own thread."""
    session = batcher.session
    # request-level counters (handler threads); dispatch-level live in the
    # batcher — GET /metrics merges both
    req_lock = threading.Lock()
    req_stats = {"requests": 0, "responses_2xx": 0, "responses_4xx": 0,
                 "responses_5xx": 0}

    def _count(code: int) -> None:
        with req_lock:
            req_stats["requests"] += 1
            bucket = ("responses_2xx" if code < 400 else
                      "responses_4xx" if code < 500 else "responses_5xx")
            req_stats[bucket] += 1

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default; fronting logs belong
            pass                    # to the deployment, not the framework

        def _json(self, code: int, obj: dict) -> None:
            blob = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def _json_counted(self, code: int, obj: dict) -> None:
            _count(code)
            self._json(code, obj)

        def do_GET(self):
            # GETs count too — "requests" means total HTTP traffic, not just
            # segment posts (a 404 probe is a 4xx either way)
            if self.path == "/healthz":
                self._json_counted(200, {"status": "ok",
                                         "batch_size": session.batch_size,
                                         "crop_size": session.crop_size,
                                         "num_classes": session.num_classes,
                                         **session.meta})
            elif self.path == "/metrics":
                with req_lock:
                    merged = dict(req_stats)
                self._json_counted(200, {**merged, **batcher.stats()})
            else:
                self._json_counted(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/v1/segment":
                self._json_counted(404, {"error": "unknown path"})
                return
            # client-side errors (bad body / undecodable image) -> 400;
            # server-side inference failures -> 500; batcher timeout -> 504
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n < 0:
                    # read(-1) would buffer until EOF, bypassing the cap
                    self._json_counted(
                        400, {"error": f"invalid Content-Length {n}"})
                    return
                if n > MAX_BODY_BYTES:
                    self._json_counted(
                        413, {"error": f"body {n} bytes exceeds "
                                       f"limit {MAX_BODY_BYTES}"})
                    return
                img = _decode_image(self.rfile.read(n),
                                    self.headers.get("Content-Type", ""))
            except Exception as exc:
                self._json_counted(
                    400, {"error": f"{type(exc).__name__}: {exc}"})
                return
            try:
                pred = batcher.submit(img).result(timeout=300)
            except (TimeoutError, FuturesTimeoutError) as exc:
                # concurrent.futures.TimeoutError only aliases the builtin
                # from Python 3.11; catch both for the 3.10 floor
                self._json_counted(
                    504, {"error": f"inference timed out: {exc}"})
                return
            except Exception as exc:
                # ValueError from predict() means the request violated the
                # program's input contract (shape/dtype) — still the client
                code = 400 if isinstance(exc, ValueError) else 500
                self._json_counted(
                    code, {"error": f"{type(exc).__name__}: {exc}"})
                return
            try:
                if self.headers.get("Accept") == "application/x-npy":
                    buf = io.BytesIO()
                    np.save(buf, pred)
                    blob, ctype = buf.getvalue(), "application/x-npy"
                else:
                    blob, ctype = _encode_png(pred), "image/png"
            except Exception as exc:  # encode failure must still be counted
                self._json_counted(
                    500, {"error": f"encode: {type(exc).__name__}: {exc}"})
                return
            # counted at send time; a client that disconnects mid-write is
            # still a served 2xx from the server's accounting perspective
            _count(200)
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

    return ThreadingHTTPServer((host, port), Handler)
