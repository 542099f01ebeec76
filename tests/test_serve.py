"""Serving runtime (engine/serve.py): session contract, micro-batcher,
HTTP front — driven end-to-end over a real socket."""

import io
import threading
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dupl_tpu.config import ModelConfig, DataConfig, voc_config
from dupl_tpu.engine import checkpoint as ckpt
from dupl_tpu.engine.export import export_serving, save_artifact
from dupl_tpu.engine.serve import Batcher, InferenceSession, make_http_server
from dupl_tpu.models.network import DualStudent


def _fake_session(batch_size=4, crop=32, nc=21):
    """Deterministic stand-in program: label = mean pixel % nc (checkable
    through resizes)."""
    calls = []

    def run(batch):
        calls.append(batch.shape[0])
        return (batch.mean(axis=(1, 2, 3)).astype(np.int32) % nc)[
            :, None, None].astype(np.uint8) * np.ones((crop, crop), np.uint8)

    s = InferenceSession(run, batch_size=batch_size, crop_size=crop,
                         num_classes=nc)
    return s, calls


def test_session_resizes_and_pads():
    s, calls = _fake_session()
    imgs = [np.full((40, 56, 3), v, np.uint8) for v in (10, 20, 30)]
    preds = s.predict(imgs)
    assert calls == [4]  # one dispatch, padded to the compiled batch size
    for img, pred, v in zip(imgs, preds, (10, 20, 30)):
        assert pred.shape == img.shape[:2] and pred.dtype == np.uint8
        assert (pred == v % 21).all()


def test_session_splits_oversize_requests():
    s, calls = _fake_session(batch_size=2)
    preds = s.predict([np.zeros((8, 8, 3), np.uint8)] * 5)
    assert len(preds) == 5 and calls == [2, 2, 2]  # last dispatch padded


def test_session_rejects_bad_input():
    s, _ = _fake_session()
    with pytest.raises(ValueError, match="HxWx3 uint8"):
        s.predict([np.zeros((8, 8), np.uint8)])


def test_batcher_coalesces_and_propagates_errors():
    s, calls = _fake_session(batch_size=8)
    b = Batcher(s, max_delay_s=0.05)
    futs = [b.submit(np.full((16, 16, 3), v, np.uint8))
            for v in (5, 6, 7, 8)]
    res = [f.result(timeout=10) for f in futs]
    for v, r in zip((5, 6, 7, 8), res):
        assert (r == v % 21).all()
    assert len(calls) <= 2  # coalesced into at most 2 dispatches, not 4

    bad = b.submit(np.zeros((4, 4), np.uint8))  # wrong rank -> exception
    with pytest.raises(ValueError):
        bad.result(timeout=10)
    b.close()


def _post(url, body, ctype, accept=None):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype,
                                          **({"Accept": accept} if accept else {})})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.headers.get("Content-Type"), r.read()


@pytest.fixture()
def http_server():
    s, _ = _fake_session()
    b = Batcher(s, max_delay_s=0.005)
    srv = make_http_server(b, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    b.close()


def test_http_segment_npy_and_png(http_server):
    import json

    with urllib.request.urlopen(http_server + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["crop_size"] == 32

    img = np.full((24, 40, 3), 9, np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    ctype, body = _post(http_server + "/v1/segment", buf.getvalue(),
                        "application/x-npy", accept="application/x-npy")
    assert ctype == "application/x-npy"
    pred = np.load(io.BytesIO(body))
    assert pred.shape == (24, 40) and (pred == 9).all()

    from PIL import Image

    pbuf = io.BytesIO()
    Image.fromarray(img).save(pbuf, format="PNG")
    ctype, body = _post(http_server + "/v1/segment", pbuf.getvalue(),
                        "image/png")
    assert ctype == "image/png"
    out = Image.open(io.BytesIO(body))
    assert out.mode == "P" and out.size == (40, 24)
    assert (np.asarray(out) == 9).all()


def test_http_metrics_endpoint(http_server):
    """GET /metrics: request counters (by status class) merged with the
    batcher's dispatch stats."""
    import json

    img = np.full((16, 16, 3), 3, np.uint8)
    buf = io.BytesIO()
    np.save(buf, img)
    _post(http_server + "/v1/segment", buf.getvalue(), "application/x-npy",
          accept="application/x-npy")
    req = urllib.request.Request(http_server + "/v1/segment",
                                 data=b"garbage", method="POST",
                                 headers={"Content-Type": "image/png"})
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(req, timeout=30)

    with urllib.request.urlopen(http_server + "/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["requests"] >= 2
    assert m["responses_2xx"] >= 1 and m["responses_4xx"] >= 1
    assert m["dispatches"] >= 1 and m["samples"] >= 1
    assert m["avg_batch"] >= 1 and m["avg_dispatch_ms"] >= 0
    assert m["failed_dispatches"] == 0


def test_http_bad_body_is_400(http_server):
    req = urllib.request.Request(http_server + "/v1/segment",
                                 data=b"not an image", method="POST",
                                 headers={"Content-Type": "image/png"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_session_from_artifact_real_model(tmp_path):
    """The full deployment path on a tiny model: export -> artifact ->
    InferenceSession -> native-resolution prediction."""
    cfg = voc_config(
        model=ModelConfig(backbone="test_tiny_patch16",
                          compute_dtype="float32"),
        data=DataConfig(crop_size=64),
    )
    model = DualStudent(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    exp, meta = export_serving(cfg, model, params, batch_size=2,
                               scales=(1.0,), crf=False)
    path = str(tmp_path / "m.duplsrv")
    save_artifact(path, exp, meta)
    session = InferenceSession.from_artifact(path)
    rs = np.random.RandomState(1)
    img = rs.randint(0, 255, (50, 70, 3)).astype(np.uint8)
    (pred,) = session.predict([img])
    assert pred.shape == (50, 70) and pred.dtype == np.uint8
    assert pred.max() < cfg.num_classes


def test_from_artifact_rejects_wrong_kind_and_topology(tmp_path):
    """Load-time contract checks: a pseudo_labeler artifact (3-arg
    signature) and a mesh wider than this host must fail at load with a
    clear message, not with an opaque arity/sharding error on the first
    request."""
    cfg = voc_config(
        model=ModelConfig(backbone="test_tiny_patch16",
                          compute_dtype="float32"),
        data=DataConfig(crop_size=64),
    )
    model = DualStudent(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    exp, meta = export_serving(cfg, model, params, batch_size=2,
                               scales=(1.0,), crf=False)

    p1 = str(tmp_path / "pl.duplsrv")
    save_artifact(p1, exp, {**meta, "kind": "pseudo_labeler"})
    with pytest.raises(ValueError, match="pseudo_labeler"):
        InferenceSession.from_artifact(p1)

    p2 = str(tmp_path / "wide.duplsrv")
    save_artifact(p2, exp, {**meta, "num_devices": 4096,
                            "mesh": {"data": 4096}})
    with pytest.raises(ValueError, match="4096 devices"):
        InferenceSession.from_artifact(p2)


def test_batcher_close_fails_pending_requests():
    """Requests still queued when the batcher shuts down must get an
    exception immediately, not hang until the HTTP timeout."""
    started = threading.Event()
    release = threading.Event()

    def run(batch):
        started.set()
        release.wait(timeout=10)
        return np.zeros((batch.shape[0], 16, 16), np.uint8)

    s = InferenceSession(run, batch_size=1, crop_size=16, num_classes=21)
    b = Batcher(s, max_delay_s=0.001)
    img = np.zeros((16, 16, 3), np.uint8)
    first = b.submit(img)          # occupies the worker inside run()
    started.wait(timeout=10)
    pending = b.submit(img)        # still queued behind it
    # close while the worker is wedged in run(): the join times out and the
    # drain must fail the queued request without waiting on the worker
    b.close()
    with pytest.raises(RuntimeError, match="batcher closed"):
        pending.result(timeout=10)
    # submits racing shutdown fail fast instead of enqueueing into the
    # drained queue and hanging until the HTTP timeout
    late = b.submit(img)
    with pytest.raises(RuntimeError, match="batcher closed"):
        late.result(timeout=10)
    release.set()                  # let the wedged worker finish `first`
    assert first.result(timeout=10).shape == (16, 16)


def test_http_oversized_body_is_413(http_server, monkeypatch):
    from dupl_tpu.engine import serve as serve_mod

    monkeypatch.setattr(serve_mod, "MAX_BODY_BYTES", 16)
    req = urllib.request.Request(http_server + "/v1/segment",
                                 data=b"x" * 64, method="POST",
                                 headers={"Content-Type": "image/png"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 413


def test_http_rejects_negative_content_length_and_nonuint8_npy(http_server):
    """Body-cap bypass via Content-Length: -1 -> 400 (never read-to-EOF);
    float .npy must be rejected, not silently truncated to zeros."""
    req = urllib.request.Request(http_server + "/v1/segment", data=b"x",
                                 method="POST",
                                 headers={"Content-Type": "image/png"})
    req.add_unredirected_header("Content-Length", "-1")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400

    buf = io.BytesIO()
    np.save(buf, np.zeros((8, 8, 3), np.float32))
    req = urllib.request.Request(http_server + "/v1/segment",
                                 data=buf.getvalue(), method="POST",
                                 headers={"Content-Type": "application/x-npy"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    assert "uint8" in ei.value.read().decode()


def test_http_malformed_request_does_not_poison_cobatched(http_server):
    """A 2-D .npy must 400 at decode time, BEFORE joining a micro-batch —
    a valid request sent immediately after must still succeed."""
    buf = io.BytesIO()
    np.save(buf, np.zeros((8, 8), np.uint8))  # wrong rank
    req = urllib.request.Request(http_server + "/v1/segment",
                                 data=buf.getvalue(), method="POST",
                                 headers={"Content-Type": "application/x-npy"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400

    good = io.BytesIO()
    np.save(good, np.full((16, 16, 3), 7, np.uint8))
    ctype, body = _post(http_server + "/v1/segment", good.getvalue(),
                        "application/x-npy", accept="application/x-npy")
    assert (np.load(io.BytesIO(body)) == 7 % 21).all()


def test_http_inference_failure_is_500():
    """Server-side inference errors must surface as 5xx, not 400."""
    def run(batch):
        raise RuntimeError("device fell over")

    s = InferenceSession(run, batch_size=2, crop_size=16, num_classes=21)
    b = Batcher(s, max_delay_s=0.005)
    srv = make_http_server(b, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        img = np.zeros((16, 16, 3), np.uint8)
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_address[1]}/v1/segment",
            data=buf.getvalue(), method="POST",
            headers={"Content-Type": "application/x-npy"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 500
    finally:
        srv.shutdown()
        b.close()


def test_session_from_weights_live(tmp_path):
    cfg = voc_config(
        model=ModelConfig(backbone="test_tiny_patch16",
                          compute_dtype="float32"),
        data=DataConfig(crop_size=64),
    )
    model = DualStudent(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    wpath = str(tmp_path / "w.npz")
    ckpt.export_weights(wpath, params)
    session = InferenceSession.from_weights(cfg, wpath, batch_size=2,
                                            scales=(1.0,), crf=False)
    img = np.zeros((64, 64, 3), np.uint8)
    (pred,) = session.predict([img])
    assert pred.shape == (64, 64)
