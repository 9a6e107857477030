"""Serving surface: dynamic batcher semantics + HTTP end-to-end on the CPU
backend (synthetic data, U_Net config — same environment as test_tools.py)."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from mde_tpu.tools.serve import DynamicBatcher, _buckets, build_service, make_handler


def test_bucket_ladder():
    assert _buckets(8) == (1, 2, 4, 8)
    assert _buckets(6) == (1, 2, 4, 6)
    assert _buckets(1) == (1,)


def test_dynamic_batcher_coalesces_and_pads():
    """Deterministic coalescing: the first call blocks the batcher thread in
    predict while three more requests queue; the second device step must then
    collect all three at once (already enqueued when its window opens), padded
    to the 4-bucket."""
    seen = []
    gate = threading.Event()
    first_entered = threading.Event()

    def predict_many(batch):
        if not seen:
            first_entered.set()
            assert gate.wait(10.0)
        seen.append(batch.copy())
        return batch[..., 0, 0, 0].astype(np.float32) * 2.0  # per-row marker

    b = DynamicBatcher(predict_many, max_batch=4, window_ms=50.0)
    try:
        results = {}

        def call(v):
            img = np.full((2, 3, 3), v, np.uint8)
            results[v] = b.submit(img)

        t0 = threading.Thread(target=call, args=(10,))
        t0.start()
        assert first_entered.wait(10.0)  # batcher is now blocked mid-predict
        rest = [threading.Thread(target=call, args=(v,)) for v in (20, 30, 40)]
        for t in rest:
            t.start()
        import time

        time.sleep(0.2)  # let the three requests reach the queue
        gate.set()
        t0.join(10.0)
        for t in rest:
            t.join(10.0)

        assert results[10] == (20.0, 1)
        for v in (20, 30, 40):
            depth, coalesced = results[v]
            assert depth == 2.0 * v
            assert coalesced == 3
        assert len(seen) == 2
        assert seen[0].shape[0] == 1  # first request alone
        assert seen[1].shape[0] == 4  # 3 requests padded to the 4-bucket
        assert not seen[1][3].any()  # zero padding
        assert b.stats == {"requests": 4, "device_steps": 2, "max_coalesced": 3}
    finally:
        b.close()


def test_dynamic_batcher_pipelines_dispatch_before_fetch():
    """With an async dispatch/fetch pair, the batcher must dispatch batch k+1
    BEFORE fetching batch k's results (double-buffering: the device never
    idles between coalesced steps). Sequencing is made deterministic by
    blocking inside the first dispatch until the second request is queued."""
    import time

    order = []
    first_in_dispatch = threading.Event()
    second_queued = threading.Event()

    def dispatch(batch):
        v = float(batch[0, 0, 0, 0])
        order.append(("dispatch", v))
        if len(order) == 1:
            first_in_dispatch.set()
            assert second_queued.wait(10.0)
        return batch[:, 0, 0, 0].astype(np.float32)

    def fetch(handle):
        order.append(("fetch", float(handle[0])))
        return handle

    def boom(batch):  # sync path must not be used when the pair is given
        raise AssertionError("predict_many called despite dispatch/fetch")

    b = DynamicBatcher(boom, max_batch=1, window_ms=20.0,
                       predict_dispatch=dispatch, predict_fetch=fetch)
    try:
        results = {}

        def call(v):
            results[v] = b.submit(np.full((2, 3, 3), v, np.uint8))

        t1 = threading.Thread(target=call, args=(1,))
        t1.start()
        assert first_in_dispatch.wait(10.0)
        t2 = threading.Thread(target=call, args=(2,))
        t2.start()
        time.sleep(0.2)  # let request 2 reach the queue
        second_queued.set()
        t1.join(10.0)
        t2.join(10.0)
        assert order == [
            ("dispatch", 1.0), ("dispatch", 2.0), ("fetch", 1.0), ("fetch", 2.0),
        ], order
        assert results[1] == (1.0, 1) and results[2] == (2.0, 1)
    finally:
        b.close()


def test_dynamic_batcher_validates_items():
    """One bad request must fail alone at submit() — never inside a coalesced
    device batch where it would poison innocent waiters — and a float image
    must not be silently value-truncated into the uint8 batch."""
    b = DynamicBatcher(lambda batch: batch[:, 0, 0, 0].astype(np.float32),
                       max_batch=2, window_ms=1.0, item_shape=(2, 3, 3))
    try:
        with pytest.raises(ValueError, match="shape"):
            b.submit(np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(ValueError, match="dtype"):
            b.submit(np.zeros((2, 3, 3), np.float32))
        assert b.stats["requests"] == 0  # rejected before ever reaching a step
        depth, _ = b.submit(np.full((2, 3, 3), 7, np.uint8))
        assert depth == 7.0
    finally:
        b.close()


def test_dynamic_batcher_survives_allocation_failure():
    """An exception before the predict call (here: a submit bypassing
    validation with a non-array) must fail its waiters, not kill the batcher
    thread — later requests still get served."""
    b = DynamicBatcher(lambda batch: batch[:, 0, 0, 0].astype(np.float32),
                       max_batch=2, window_ms=1.0)
    try:
        from mde_tpu.tools.serve import _Item

        item = _Item(object())  # no .shape: allocation in _flush raises
        b._q.put(item)
        assert item.event.wait(10.0)
        assert item.error is not None
        depth, _ = b.submit(np.full((2, 3, 3), 5, np.uint8))
        assert depth == 5.0  # thread alive
    finally:
        b.close()


def test_dynamic_batcher_propagates_errors():
    def predict_many(batch):
        raise RuntimeError("device on fire")

    b = DynamicBatcher(predict_many, max_batch=2, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            b.submit(np.zeros((2, 2, 3), np.uint8))
        # the batcher thread survives an erroring step
        with pytest.raises(RuntimeError):
            b.submit(np.zeros((2, 2, 3), np.uint8))
    finally:
        b.close()


@pytest.fixture(scope="module")
def serve_env(tmp_path_factory):
    from mde_tpu.core import config as config_lib
    from mde_tpu.data import synthetic

    root = tmp_path_factory.mktemp("serve")
    data = root / "data"
    synthetic.generate(str(data), n_train=4, n_test=2, size=(64, 96))
    cfg_path = root / "config.yaml"
    cfg_path.write_text(
        f"""
paths:
  data_dir: {data}
  results_dir: {root}/results
  predictions_dir: {root}/predictions
experiment:
  model_name: serve_unet
  wandb_disable: True
training:
  n_epoch: 1
  batch_size: 4
model:
  model_type: U_Net
  dinov2_type: null
framework:
  input_size: [64, 96]
  native_size: [64, 96]
  num_workers: 1
  mesh: {{data: -1, model: 1}}
"""
    )
    cfg = config_lib.load(str(cfg_path))
    # no trained checkpoint in this fixture: the refuse-to-serve guard is
    # exercised in test_build_service_refuses_missing_checkpoint
    service = build_service(cfg, max_batch=4, window_ms=5.0, warmup=True,
                            allow_uninitialized=True)
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield service, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    server.server_close()
    service.close()


def _post(url, body):
    req = urllib.request.Request(url + "/predict", data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def test_serve_http_png_and_npy(serve_env):
    service, url = serve_env
    rng = np.random.default_rng(0)

    # PNG at a non-native size: host-resized to native before the device path.
    from PIL import Image

    img = rng.integers(0, 255, (50, 70, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    status, body, headers = _post(url, buf.getvalue())
    assert status == 200, body
    depth = np.load(io.BytesIO(body))
    assert depth.shape == tuple(service.native)
    assert depth.dtype == np.float32
    assert int(headers["X-Batch-Size"]) >= 1

    # .npy payload at native size.
    buf = io.BytesIO()
    np.save(buf, rng.integers(0, 255, (64, 96, 3), np.uint8))
    status, body, _ = _post(url, buf.getvalue())
    assert status == 200, body
    assert np.load(io.BytesIO(body)).shape == tuple(service.native)

    # Bad payload -> 400, server keeps serving.
    status, body, _ = _post(url, b"definitely not an image")
    assert status == 400
    assert b"unsupported payload" in body

    # Non-uint8 .npy (the classic normalized-float client mistake): a clean
    # 400, never a silent truncate-to-garbage 200.
    buf = io.BytesIO()
    np.save(buf, rng.uniform(0, 1, (64, 96, 3)).astype(np.float32))
    status, body, _ = _post(url, buf.getvalue())
    assert status == 400
    assert b"uint8" in body

    # Corrupt PNG (magic ok, truncated stream): a clean 400, not a dropped
    # connection from an uncaught PIL OSError.
    status, body, _ = _post(url, b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    assert status == 400
    assert b"could not decode" in body

    # Hostile Content-Length -> 413 before the body is buffered.
    import http.client

    host, port = url.replace("http://", "").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    conn.putrequest("POST", "/predict")
    conn.putheader("Content-Length", str(1 << 34))
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_build_service_refuses_missing_checkpoint(tmp_path):
    from mde_tpu.core import config as config_lib
    from mde_tpu.data import synthetic

    data = tmp_path / "data"
    synthetic.generate(str(data), n_train=2, n_test=1, size=(32, 48))
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(
        f"""
paths:
  data_dir: {data}
  results_dir: {tmp_path}/results
  predictions_dir: {tmp_path}/predictions
experiment:
  model_name: no_such_run
  wandb_disable: True
training:
  n_epoch: 1
  batch_size: 2
model:
  model_type: U_Net
  dinov2_type: null
framework:
  input_size: [32, 48]
  native_size: [32, 48]
  num_workers: 1
  mesh: {{data: 1, model: 1}}
"""
    )
    cfg = config_lib.load(str(cfg_path))
    with pytest.raises(FileNotFoundError, match="refusing to serve"):
        build_service(cfg, max_batch=1, warmup=False)


def test_serve_healthz_and_concurrency(serve_env):
    service, url = serve_env
    with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
        before = json.loads(resp.read())["stats"]["requests"]
    rng = np.random.default_rng(1)
    payloads = []
    for _ in range(4):
        buf = io.BytesIO()
        np.save(buf, rng.integers(0, 255, (64, 96, 3), np.uint8))
        payloads.append(buf.getvalue())

    results = [None] * 4

    def call(i):
        results[i] = _post(url, payloads[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60.0)
    for status, body, _ in results:
        assert status == 200
        assert np.load(io.BytesIO(body)).shape == tuple(service.native)

    with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"
    assert health["model"] == "serve_unet"
    assert health["buckets"] == [1, 2, 4]
    # self-contained: only count this test's own 4 requests (warmup and
    # sibling tests excluded by the before/after delta)
    assert health["stats"]["requests"] - before == 4
    assert health["stats"]["device_steps"] >= 1
