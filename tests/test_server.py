"""HTTP prediction endpoint (``fall_multimodal_tpu/server.py``).

A live ``PredictionServer`` on an ephemeral localhost port, driven with
stdlib urllib: health, single-window and batch predict, probabilities,
concurrent requests, and every 4xx validation path.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.data import make_synthetic, split_dataset, to_device
from fall_multimodal_tpu.serve import Predictor
from fall_multimodal_tpu.server import make_server
from fall_multimodal_tpu.train.cv import run_fold
from fall_multimodal_tpu.utils.checkpoint import Checkpointer


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    cfg = load_config(preset_path("bilstm"),
                      overrides={"data.num_classes": 3, "data.sensor_dim": 6})
    data = make_synthetic(n_windows=96, num_classes=3, sensor_dim=6,
                          noise=0.05, windows_per_video=8, seed=0)
    splits = {k: to_device(v) for k, v in split_dataset(data, seed=1).items()}
    ckpt_dir = str(tmp_path_factory.mktemp("server") / "ckpt")
    run_fold(cfg, splits, epochs=2, checkpointer=Checkpointer(ckpt_dir))
    pred = Predictor.from_checkpoint(
        cfg, ckpt_dir, data.features[:2], data.sensors[:2], batch_size=8,
    )
    srv = make_server(pred, port=0).start()   # ephemeral port
    yield srv, pred, data
    srv.close()


def _get(srv, path):
    with urllib.request.urlopen(f"http://{srv.host}:{srv.port}{path}") as r:
        return r.status, json.loads(r.read())


def _post(srv, path, payload):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(served):
    srv, pred, _ = served
    status, body = _get(srv, "/healthz")
    assert status == 200
    assert body["status"] == "ok"
    assert body["model"] == "bilstm"
    assert body["num_classes"] == 3
    assert body["requires_sensor"] is True


def test_predict_batch_matches_library(served):
    srv, pred, data = served
    n = 12
    status, body = _post(srv, "/v1/predict", {
        "skeleton": data.features[:n].tolist(),
        "sensor": data.sensors[:n].tolist(),
        "proba": True,
    })
    assert status == 200 and body["n"] == n
    expect = pred.predict_proba(data.features[:n], data.sensors[:n])
    assert body["predictions"] == expect.argmax(-1).tolist()
    np.testing.assert_allclose(
        np.asarray(body["probabilities"]), expect, atol=1e-5
    )


def test_predict_single_window_convenience(served):
    srv, pred, data = served
    status, body = _post(srv, "/v1/predict", {
        "skeleton": data.features[0].tolist(),      # (T, V, C), no batch dim
        "sensor": data.sensors[0].tolist(),         # (T, S)
    })
    assert status == 200 and body["n"] == 1
    expect = pred.predict(data.features[:1], data.sensors[:1])
    assert body["predictions"] == expect.tolist()


def test_predict_concurrent_requests(served):
    srv, pred, data = served
    results = {}

    def hit(i):
        results[i] = _post(srv, "/v1/predict", {
            "skeleton": data.features[i:i + 2].tolist(),
            "sensor": data.sensors[i:i + 2].tolist(),
        })

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (status, body) in results.items():
        assert status == 200
        expect = pred.predict(data.features[i:i + 2], data.sensors[i:i + 2])
        assert body["predictions"] == expect.tolist()


def test_validation_errors(served):
    srv, _, data = served
    # bad JSON
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/v1/predict", data=b"{not json",
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400

    # missing skeleton
    status, body = _post(srv, "/v1/predict", {"sensor": [[0.0]]})
    assert status == 400 and "skeleton" in body["error"]

    # wrong window shape
    status, body = _post(srv, "/v1/predict", {
        "skeleton": np.zeros((2, 10, 14, 3)).tolist(),
        "sensor": data.sensors[:2].tolist(),
    })
    assert status == 400 and "(30, 14, 3)" in body["error"]

    # ragged arrays
    status, body = _post(srv, "/v1/predict", {
        "skeleton": [[0.0, 1.0], [0.0]],
    })
    assert status == 400 and "ragged" in body["error"]

    # sensor omitted for a sensor-consuming model -> predictor refuses
    status, body = _post(srv, "/v1/predict", {
        "skeleton": data.features[:2].tolist(),
    })
    assert status == 400 and "sensor" in body["error"]

    # wrong sensor trailing shape must be a 400 naming the expected dims,
    # not an exception escaping the handler as a connection reset
    status, body = _post(srv, "/v1/predict", {
        "skeleton": data.features[:2].tolist(),
        "sensor": np.zeros((2, 30, 5)).tolist(),    # model wants (30, 6)
    })
    assert status == 400 and "(30, 6)" in body["error"]

    # sensor/skeleton window-count mismatch: must be rejected BEFORE the
    # coalescing queue (two mismatched requests can make group totals
    # match and silently misalign innocent peers' sensor rows)
    status, body = _post(srv, "/v1/predict", {
        "skeleton": data.features[:2].tolist(),
        "sensor": data.sensors[:3].tolist(),
    })
    assert status == 400 and "counts must match" in body["error"]

    # unknown routes
    status, body = _get_error(srv, "/nope")
    assert status == 404
    status, body = _post(srv, "/v2/predict", {"skeleton": []})
    assert status == 404


def _get_error(srv, path):
    try:
        with urllib.request.urlopen(f"http://{srv.host}:{srv.port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


# --------------------------------------------------------------- batcher


class _SlowFakePredictor:
    """Predictor stand-in whose forward blocks on an event — lets the test
    pile requests up deterministically while the dispatcher is busy."""

    batch_size = 8
    requires_sensor = False

    def __init__(self):
        self.gate = threading.Event()
        self.calls = []          # list of skeleton batch sizes per call

    def predict_proba(self, skeleton, sensor):
        self.gate.wait()
        self.calls.append(len(skeleton))
        # rows identify their input so fan-out order is checkable
        return np.stack([[w.sum(), float(len(skeleton))] for w in skeleton])


def test_batcher_coalesces_queued_requests():
    from fall_multimodal_tpu.server import RequestBatcher

    fake = _SlowFakePredictor()
    batcher = RequestBatcher(fake)
    windows = [np.full((2, 3), i, np.float32) for i in range(4)]
    results = {}

    def hit(i):
        results[i] = batcher.submit(windows[i][None], None)

    # request 0 occupies the dispatcher (gate closed); 1..3 queue behind it
    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    threads[0].start()
    while not batcher.stats()["device_calls"]:       # 0 is in-flight
        time.sleep(0.001)
    for t in threads[1:]:
        t.start()
    while batcher.stats()["requests"] < 4:           # 1..3 enqueued
        time.sleep(0.001)
    fake.gate.set()
    for t in threads:
        t.join()

    # request 0 ran alone; 1..3 coalesced into ONE device call of 3 windows
    assert fake.calls == [1, 3]
    stats = batcher.stats()
    assert stats == {"requests": 4, "device_calls": 2,
                     "max_coalesced_requests": 3}
    # each request got ITS OWN row back (sum identifies the window)
    for i in range(4):
        np.testing.assert_allclose(results[i][0, 0], windows[i].sum())
    batcher.close()


def test_batcher_respects_compiled_batch_cap():
    from fall_multimodal_tpu.server import RequestBatcher

    fake = _SlowFakePredictor()                       # batch_size = 8
    batcher = RequestBatcher(fake)
    results = {}

    def hit(i, n):
        results[i] = batcher.submit(np.full((n, 3), i, np.float32), None)

    # 0 occupies the device; then 5+5+2 windows queue: the cap packs
    # 5 with 2 (7 <= 8) only if order allowed — it takes in FIFO order,
    # so the first call is 5 alone (5+5 > 8), then 5+2 coalesce
    threads = [threading.Thread(target=hit, args=(0, 1))]
    threads[0].start()
    while not batcher.stats()["device_calls"]:
        time.sleep(0.001)
    for i, n in [(1, 5), (2, 5), (3, 2)]:
        t = threading.Thread(target=hit, args=(i, n))
        t.start()
        threads.append(t)
        while batcher.stats()["requests"] < i + 1:
            time.sleep(0.001)
    fake.gate.set()
    for t in threads:
        t.join()
    assert fake.calls == [1, 5, 7]
    for i, n in [(0, 1), (1, 5), (2, 5), (3, 2)]:
        assert results[i].shape[0] == n
    batcher.close()


def test_batcher_fans_out_forward_errors():
    from fall_multimodal_tpu.server import RequestBatcher

    class _Boom:
        batch_size = 8
        requires_sensor = False

        def predict_proba(self, skeleton, sensor):
            raise ValueError("bad windows")

    batcher = RequestBatcher(_Boom())
    # forward failures surface wrapped (per-request instance) but keep the
    # original type and message in the text
    with pytest.raises(RuntimeError, match="ValueError: bad windows"):
        batcher.submit(np.zeros((1, 3), np.float32), None)
    # the dispatcher survives a failing group and keeps serving
    with pytest.raises(RuntimeError, match="bad windows"):
        batcher.submit(np.zeros((1, 3), np.float32), None)
    batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        batcher.submit(np.zeros((1, 3), np.float32), None)


def test_batcher_error_instances_are_per_request():
    """A failing coalesced group hands each request its OWN exception
    object — re-raising one shared instance in N threads mutates a shared
    traceback and cross-blames requests."""
    from fall_multimodal_tpu.server import RequestBatcher

    class _SlowBoom:
        batch_size = 8
        requires_sensor = False

        def __init__(self):
            self.gate = threading.Event()

        def predict_proba(self, skeleton, sensor):
            self.gate.wait()
            raise ValueError("bad windows")

    fake = _SlowBoom()
    batcher = RequestBatcher(fake)
    errors = {}

    def hit(i):
        try:
            batcher.submit(np.zeros((1, 3), np.float32), None)
        except RuntimeError as e:
            errors[i] = e

    threads = [threading.Thread(target=hit, args=(0,))]
    threads[0].start()
    while not batcher.stats()["device_calls"]:       # 0 is in-flight
        time.sleep(0.001)
    for i in (1, 2):                                  # 1..2 coalesce behind
        t = threading.Thread(target=hit, args=(i,))
        t.start()
        threads.append(t)
        while batcher.stats()["requests"] < i + 1:
            time.sleep(0.001)
    fake.gate.set()
    for t in threads:
        t.join()
    assert set(errors) == {0, 1, 2}
    assert errors[1] is not errors[2]                 # same group, own instance
    for e in errors.values():
        assert "bad windows" in str(e)
    batcher.close()


def test_batcher_submit_validates_sensor_invariants():
    """The cross-stream invariants are enforced BEFORE enqueueing, so a
    malformed request can never misalign a coalesced group's sensor rows."""
    from fall_multimodal_tpu.server import RequestBatcher

    class _NeedsSensor:
        batch_size = 8
        requires_sensor = True

        def predict_proba(self, skeleton, sensor):
            return np.zeros((len(skeleton), 2), np.float32)

    batcher = RequestBatcher(_NeedsSensor())
    with pytest.raises(ValueError, match="requires a sensor"):
        batcher.submit(np.zeros((2, 3), np.float32), None)
    with pytest.raises(ValueError, match="counts must match"):
        batcher.submit(np.zeros((2, 3), np.float32),
                       np.zeros((3, 4), np.float32))
    batcher.close()


def test_healthz_reports_batching_stats(served):
    srv, pred, data = served
    _post(srv, "/v1/predict", {
        "skeleton": data.features[:2].tolist(),
        "sensor": data.sensors[:2].tolist(),
    })
    status, body = _get(srv, "/healthz")
    assert status == 200
    stats = body["batching"]
    assert stats["requests"] >= 1
    assert 1 <= stats["device_calls"] <= stats["requests"]


def test_batcher_records_queue_wait_and_service_timings():
    """Tail-latency attribution (round 5): every request leaves one
    (queue_wait_ms, service_ms) pair behind; peers of one coalesced call
    share the service time, and a request that queued behind an in-flight
    forward records a positive wait."""
    from fall_multimodal_tpu.server import RequestBatcher

    fake = _SlowFakePredictor()
    batcher = RequestBatcher(fake)
    windows = [np.full((2, 3), i, np.float32) for i in range(3)]
    threads = [
        threading.Thread(target=batcher.submit, args=(windows[i][None], None))
        for i in range(3)
    ]
    threads[0].start()
    while not batcher.stats()["device_calls"]:
        time.sleep(0.001)
    for t in threads[1:]:
        t.start()
    while batcher.stats()["requests"] < 3:
        time.sleep(0.001)
    time.sleep(0.02)                      # measurable queue wait for 1..2
    fake.gate.set()
    for t in threads:
        t.join()

    timings = batcher.drain_timings()
    assert len(timings) == 3
    assert all(qw >= 0 and sv >= 0 for qw, sv in timings)
    # requests 1..2 waited behind request 0's in-flight forward
    waits = sorted(qw for qw, _ in timings)
    assert waits[-1] >= 15.0
    # draining empties the buffer
    assert batcher.drain_timings() == []
    batcher.close()
