"""HTTP serving daemon: API round-trips, dynamic batching, error paths."""

import base64
import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from openset_imagenet_tpu import train as engine
from tests.test_engine import tiny_cfg, write_protocol_csvs


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_http")
    write_protocol_csvs(root)
    cfg = tiny_cfg(root, "entropic", epochs=1)
    engine.worker(cfg)
    return root, cfg


@pytest.fixture(scope="module")
def predictor(trained):
    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, cfg = trained
    return OpenSetPredictor(cfg.output_directory / "entropic_best.pth",
                            n_classes=3, variant="tiny", image_size=32)


@pytest.fixture()
def server(predictor):
    from openset_imagenet_tpu.serve import PredictionServer

    srv = PredictionServer(("127.0.0.1", 0), predictor,
                           max_batch=8, window_ms=0.0).start()
    yield srv
    srv.close()


def _url(server, path):
    host, port = server.server_address[:2]
    return f"http://{host}:{port}{path}"


def _jpeg_bytes(seed: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (32, 32, 3), np.uint8)).save(
        buf, format="JPEG")
    return buf.getvalue()


def _post(server, body, content_type="application/octet-stream",
          path="/v1/predict"):
    req = urllib.request.Request(
        _url(server, path), data=body, method="POST",
        headers={"Content-Type": content_type})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def _predictor_reference(predictor, blob):
    """What the offline predictor says about the same bytes."""
    from openset_imagenet_tpu.serve import decode_to_input

    img = decode_to_input(blob, predictor.image_size)
    pred, score = predictor.predict(img[None])
    return int(pred[0]), float(score[0])


def test_healthz_reports_operating_point(server, predictor):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        info = json.loads(r.read())
    batcher = info.pop("batcher")
    assert info == {
        "status": "ok", "n_classes": 3, "image_size": 32,
        "threshold": predictor.threshold, "mode": "softmax",
        "has_background": False,
    }
    # Liveness block: idle daemon -> no forward in flight, not wedged.
    assert batcher["wedged"] is False
    assert batcher["inflight_forward_s"] is None
    assert batcher["queue_depth"] == 0


def test_single_image_matches_offline_predictor(server, predictor):
    blob = _jpeg_bytes(0)
    out = _post(server, blob, "image/jpeg")
    want_pred, want_score = _predictor_reference(predictor, blob)
    assert out["prediction"] == want_pred
    assert out["rejected"] is False
    assert abs(out["score"] - want_score) < 1e-6
    assert "features" not in out

    # ?features=1 returns the deep-feature vector of the serving forward.
    out = _post(server, blob, "image/jpeg", path="/v1/predict?features=1")
    assert len(out["features"]) == 3
    img = __import__(
        "openset_imagenet_tpu.serve", fromlist=["decode_to_input"]
    ).decode_to_input(blob, predictor.image_size)
    _, _, feats = predictor.predict(img[None], return_features=True)
    np.testing.assert_allclose(out["features"], feats[0], rtol=1e-5,
                               atol=1e-7)


def test_json_batch_matches_offline_predictor(server, predictor):
    blobs = [_jpeg_bytes(i) for i in range(3)]
    body = json.dumps(
        {"images": [base64.b64encode(b).decode() for b in blobs]}).encode()
    out = _post(server, body, "application/json")
    assert len(out["results"]) == 3
    for blob, row in zip(blobs, out["results"]):
        want_pred, want_score = _predictor_reference(predictor, blob)
        assert row["prediction"] == want_pred
        assert abs(row["score"] - want_score) < 1e-6


def test_rejection_is_served(predictor):
    """A threshold no softmax can reach marks everything rejected (-1)."""
    from openset_imagenet_tpu.serve import PredictionServer

    old = predictor.threshold
    predictor.threshold = 1.1
    srv = PredictionServer(("127.0.0.1", 0), predictor,
                           max_batch=4, window_ms=0.0).start()
    try:
        out = _post(srv, _jpeg_bytes(1), "image/jpeg")
        assert out["prediction"] == -1
        assert out["rejected"] is True
    finally:
        srv.close()
        predictor.threshold = old


def test_error_paths(server):
    # Undecodable image -> 400 with a JSON error body.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, b"not an image at all", "image/jpeg")
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())

    # Bad JSON / bad base64 -> 400.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, b"{broken", "application/json")
    assert e.value.code == 400
    body = json.dumps({"images": ["!!!not-base64!!!"]}).encode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, body, "application/json")
    assert e.value.code == 400

    # Unknown route -> 404; empty body -> 400.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, _jpeg_bytes(0), "image/jpeg", path="/nope")
    assert e.value.code == 404
    req = urllib.request.Request(_url(server, "/v1/predict"), data=b"",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400

    # Errors are counted, and the batcher still serves afterwards.
    with urllib.request.urlopen(_url(server, "/stats"), timeout=30) as r:
        assert json.loads(r.read())["errors"] >= 4
    assert "prediction" in _post(server, _jpeg_bytes(2), "image/jpeg")


def test_oversized_body_closes_keepalive_connection(server, monkeypatch):
    """413 without reading the body must drop the connection: leaving
    the unread bytes on a keep-alive socket would make the next request
    parse the image payload as an HTTP request line."""
    import socket

    from openset_imagenet_tpu import serve as serve_mod

    monkeypatch.setattr(serve_mod, "MAX_BODY_BYTES", 64)
    host, port = server.server_address[:2]
    body = b"\xff" * 256  # > patched cap, never read by the server
    head = (f"POST /v1/predict HTTP/1.1\r\nHost: {host}\r\n"
            f"Content-Type: image/jpeg\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
    with socket.create_connection((host, port), timeout=30) as s:
        s.sendall(head + body)
        s.settimeout(30)
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = s.recv(4096)
            assert chunk, f"connection died before a status line: {data!r}"
            data += chunk
        assert b" 413 " in data.split(b"\r\n", 1)[0]
        # The server must now close (EOF or reset) rather than try to
        # parse the 256 unread body bytes as a second request.
        try:
            while s.recv(4096):
                pass
        except ConnectionError:
            pass


def test_json_batch_image_count_is_capped(server, monkeypatch):
    from openset_imagenet_tpu import serve as serve_mod

    monkeypatch.setattr(serve_mod, "MAX_IMAGES_PER_REQUEST", 4)
    blob64 = base64.b64encode(_jpeg_bytes(0)).decode()
    body = json.dumps({"images": [blob64] * 5}).encode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, body, "application/json")
    assert e.value.code == 413
    assert "limit is 4" in json.loads(e.value.read())["error"]
    # At the cap it still serves.
    body = json.dumps({"images": [blob64] * 4}).encode()
    assert len(_post(server, body, "application/json")["results"]) == 4


def test_submit_after_close_raises_not_hangs(predictor):
    from openset_imagenet_tpu.serve import DynamicBatcher

    b = DynamicBatcher(predictor, max_batch=4, window_ms=0.0)
    b.close()
    with pytest.raises(RuntimeError, match="shutting down"):
        b.submit_many([np.zeros((32, 32, 3), np.uint8)])
    b.close()  # idempotent


def test_stats_reset_zeroes_counters():
    from openset_imagenet_tpu.serve import ServerStats

    st = ServerStats()
    st.count_request(3)
    st.count_batch(3)
    st.count_error()
    st.reset()
    snap = st.snapshot()
    assert all(v == 0 for v in snap.values())


def test_dynamic_batching_coalesces_concurrent_requests(predictor):
    """Concurrent requests share device forwards: batches < images, and
    every response still matches the offline predictor."""
    from openset_imagenet_tpu.serve import PredictionServer

    srv = PredictionServer(("127.0.0.1", 0), predictor,
                           max_batch=8, window_ms=250.0).start()
    try:
        blobs = [_jpeg_bytes(i) for i in range(8)]
        want = [_predictor_reference(predictor, b) for b in blobs]
        results = [None] * len(blobs)

        def hit(i):
            results[i] = _post(srv, blobs[i], "image/jpeg")

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(len(blobs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for got, (pred, score) in zip(results, want):
            assert got["prediction"] == pred
            assert abs(got["score"] - score) < 1e-6
        stats = srv.batcher.stats.snapshot()
        assert stats["images"] == len(blobs)
        assert stats["batches"] < len(blobs)  # coalescing happened
        assert stats["mean_batch"] > 1.0
    finally:
        srv.close()


def test_connection_burst_survives_listen_backlog(predictor):
    """64 simultaneous connects: socketserver's default backlog of 5
    would reset most of them (found by tools/bench_serve.py on-chip);
    PredictionServer.request_queue_size must absorb the burst."""
    from openset_imagenet_tpu.serve import PredictionServer

    srv = PredictionServer(("127.0.0.1", 0), predictor,
                           max_batch=8, window_ms=0.0).start()
    barrier = threading.Barrier(64)
    errors = []

    def hit(i):
        try:
            barrier.wait(timeout=60)
            _post(srv, _jpeg_bytes(i), "image/jpeg")
        except Exception as exc:
            errors.append(exc)

    try:
        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(64)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:3]
        assert srv.batcher.stats.snapshot()["images"] == 64
    finally:
        srv.close()


def test_batcher_clamps_to_fixed_batch_artifact():
    """A fixed-batch artifact bounds the coalesced batch size."""
    from openset_imagenet_tpu.serve import DynamicBatcher

    class Fixed:
        _fixed_batch = 4

        def predict(self, images, return_features=False):
            n = len(images)
            return (np.zeros(n, int), np.ones(n, np.float32),
                    np.zeros((n, 3), np.float32))

    b = DynamicBatcher(Fixed(), max_batch=64, window_ms=0.0)
    try:
        assert b.max_batch == 4
        out = b.submit_many([np.zeros((8, 8, 3), np.uint8)] * 6)
        assert len(out) == 6
        assert b.stats.snapshot()["max_batch"] <= 4
    finally:
        b.close()


def test_batcher_propagates_predict_errors_and_recovers():
    from openset_imagenet_tpu.serve import DynamicBatcher

    class Flaky:
        calls = 0

        def predict(self, images, return_features=False):
            Flaky.calls += 1
            if Flaky.calls == 1:
                raise RuntimeError("boom")
            n = len(images)
            return (np.zeros(n, int), np.ones(n, np.float32),
                    np.zeros((n, 2), np.float32))

    b = DynamicBatcher(Flaky(), max_batch=4, window_ms=0.0)
    try:
        img = np.zeros((8, 8, 3), np.uint8)
        with pytest.raises(RuntimeError, match="boom"):
            b.submit_many([img])
        assert b.submit_many([img])[0][0] == 0  # next batch still serves
    finally:
        b.close()
    with pytest.raises(RuntimeError, match="shutting down"):
        b.submit_many([np.zeros((8, 8, 3), np.uint8)])


def test_wedged_device_thread_degrades_healthz_and_bounds_waits():
    """VERDICT round-4 #5: a forward that never returns must not hang
    every handler thread while healthz keeps answering ok.  With a
    deliberately-hung predictor, requests fail bounded (503-mapped
    PredictionTimeout) and /healthz flips to 503 status=wedged; once the
    forward completes, health recovers."""
    from openset_imagenet_tpu.serve import (DynamicBatcher,
                                            PredictionTimeout,
                                            PredictionServer)

    release = threading.Event()

    class Hung:
        # The geometry attributes healthz/decode read off a predictor.
        n_classes = 2
        image_size = 32
        threshold = None
        mode = "softmax"
        has_background = False
        calls = 0

        # First call succeeds (a warmed daemon has completed forwards
        # before traffic; the FIRST forward gets the compile grace, see
        # test_first_forward_gets_compile_grace); the wedge happens on a
        # later forward, as it would in production.
        def predict(self, images, return_features=False):
            Hung.calls += 1
            if Hung.calls > 1:
                assert release.wait(30), "test deadlock"
            n = len(images)
            return (np.zeros(n, int), np.ones(n, np.float32),
                    np.zeros((n, 2), np.float32))

    srv = PredictionServer(("127.0.0.1", 0), Hung(), max_batch=4,
                           window_ms=0.0, request_timeout_s=0.5).start()
    try:
        img = np.zeros((8, 8, 3), np.uint8)
        srv.batcher.submit_many([img])   # completes: grace consumed
        t0 = time.monotonic()
        with pytest.raises(PredictionTimeout, match="did not complete"):
            srv.batcher.submit_many([img])
        assert time.monotonic() - t0 < 5.0, "wait was not bounded"
        # The forward is still wedged: give the age check a margin past
        # the timeout, then the probe must be non-200 with diagnostics.
        time.sleep(0.2)
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(_url(srv, "/healthz"), timeout=30)
        assert err.value.code == 503
        info = json.loads(err.value.read())
        assert info["status"] == "wedged"
        assert info["batcher"]["wedged"] is True
        assert info["batcher"]["inflight_forward_s"] > 0.5
        # An HTTP request also fails bounded with 503, not a hang.
        req = urllib.request.Request(
            _url(srv, "/v1/predict"), data=_jpeg_bytes(0), method="POST",
            headers={"Content-Type": "image/jpeg"})
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=30)
        assert err.value.code == 503
        assert "timed out" in json.loads(err.value.read())["error"]
        # Unwedge: the device thread finishes, health recovers.
        release.set()
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(_url(srv, "/healthz"),
                                            timeout=30) as r:
                    info = json.loads(r.read())
                break
            except urllib.error.HTTPError:
                time.sleep(0.05)
        assert info["status"] == "ok"
        assert info["batcher"]["wedged"] is False
        assert info["batcher"]["last_forward_age_s"] is not None
    finally:
        release.set()
        srv.close()


def test_close_with_wedged_forward_returns_bounded():
    """SIGTERM shutdown of a daemon whose forward is wedged must exit:
    close() abandons the (daemonic) batcher thread after a bounded join
    instead of blocking forever on it."""
    from openset_imagenet_tpu.serve import DynamicBatcher, PredictionTimeout

    release = threading.Event()

    class Hung:
        calls = 0

        def predict(self, images, return_features=False):
            Hung.calls += 1
            if Hung.calls > 1:
                release.wait(60)
            n = len(images)
            return (np.zeros(n, int), np.ones(n, np.float32),
                    np.zeros((n, 2), np.float32))

    b = DynamicBatcher(Hung(), max_batch=4, window_ms=0.0,
                       request_timeout_s=0.3)
    try:
        b.submit_many([np.zeros((8, 8, 3), np.uint8)])  # grace consumed
        with pytest.raises(PredictionTimeout):
            b.submit_many([np.zeros((8, 8, 3), np.uint8)])
        t0 = time.monotonic()
        b.close()   # grace = 0.3 + 5.0 s
        assert time.monotonic() - t0 < 30.0
    finally:
        release.set()


def test_first_forward_gets_compile_grace(monkeypatch):
    """A --no-warmup daemon's first forward legitimately contains the
    whole-model XLA compile; it must NOT be 503'd/flagged wedged by the
    30s request budget (that would put a restart-supervised daemon into
    a permanent compile->kill loop).  The first forward gets the grace
    floor; once one forward completed, the normal timeout applies."""
    from openset_imagenet_tpu.serve import DynamicBatcher

    class SlowFirst:
        calls = 0

        def predict(self, images, return_features=False):
            SlowFirst.calls += 1
            if SlowFirst.calls == 1:
                time.sleep(0.8)       # "compile" > request_timeout
            n = len(images)
            return (np.zeros(n, int), np.ones(n, np.float32),
                    np.zeros((n, 2), np.float32))

    monkeypatch.setattr(DynamicBatcher, "FIRST_FORWARD_GRACE_S", 5.0)
    b = DynamicBatcher(SlowFirst(), max_batch=4, window_ms=0.0,
                       request_timeout_s=0.3)
    try:
        assert b._effective_timeout() == 5.0
        # During the slow first forward the probe must NOT say wedged.
        done = {}

        def submit():
            done["out"] = b.submit_many([np.zeros((8, 8, 3), np.uint8)])

        t = threading.Thread(target=submit)
        t.start()
        time.sleep(0.5)               # inside the slow first forward
        assert b.health()["wedged"] is False
        t.join(10)
        assert done["out"][0][0] == 0  # succeeded despite 0.8s > 0.3s
        # Grace is consumed: the budget is the plain timeout now.
        assert b._effective_timeout() == 0.3
    finally:
        b.close()


def test_compile_grace_tracks_the_bucket_ladder():
    """The grace predicate is the predictor's warm-bucket ladder, not
    "first forward only": a --no-warmup daemon compiles once PER BUCKET,
    so the grace must survive earlier completed forwards while any
    bucket is cold, and a fully-warmed ladder (the default daemon) gets
    plain-timeout wedge detection from request 1."""
    from openset_imagenet_tpu.serve import DynamicBatcher

    class Ladder:
        warm = False

        def buckets_compiled_up_to(self, max_batch):
            return Ladder.warm

        def predict(self, images, return_features=False):
            n = len(images)
            return (np.zeros(n, int), np.ones(n, np.float32),
                    np.zeros((n, 2), np.float32))

    b = DynamicBatcher(Ladder(), max_batch=8, window_ms=0.0,
                       request_timeout_s=0.3)
    try:
        assert b._effective_timeout() == b.FIRST_FORWARD_GRACE_S
        # A completed forward does NOT consume the grace while the
        # ladder stays cold (later buckets still compile).
        b.submit_many([np.zeros((8, 8, 3), np.uint8)])
        assert b._effective_timeout() == b.FIRST_FORWARD_GRACE_S
        # Ladder warm -> plain timeout, regardless of forward history.
        Ladder.warm = True
        assert b._effective_timeout() == 0.3
    finally:
        b.close()


def test_warmed_predictor_reports_ladder_compiled(predictor):
    """The real predictor's bucket tracking: cold at construction, warm
    after warmup(max_batch) — the serving daemon's default path gets
    immediate wedge detection."""
    import copy

    p = copy.copy(predictor)
    p._warm_buckets = set()
    assert not p.buckets_compiled_up_to(8)
    p.warmup(8)
    assert p.buckets_compiled_up_to(8)
    # ... but a larger, never-compiled bucket still reads cold.
    assert not p.buckets_compiled_up_to(64)
    # A plain predict() records its own bucket, but the LADDER check
    # stays cold while any smaller bucket is uncompiled — a later
    # single-image request would still compile bucket 1, so the daemon
    # must keep the grace.
    p2 = copy.copy(predictor)
    p2._warm_buckets = set()
    p2.predict(np.zeros((2, 32, 32, 3), np.uint8))
    assert 2 in p2._warm_buckets
    assert not p2.buckets_compiled_up_to(2)
    p2.predict(np.zeros((1, 32, 32, 3), np.uint8))
    assert p2.buckets_compiled_up_to(2)


def test_request_timeout_zero_waits_forever():
    """request_timeout_s=0/None keeps the pre-round-5 unbounded wait
    (opt-in): a slow forward completes and the request succeeds."""
    from openset_imagenet_tpu.serve import DynamicBatcher

    class Slow:
        def predict(self, images, return_features=False):
            time.sleep(0.3)
            n = len(images)
            return (np.zeros(n, int), np.ones(n, np.float32),
                    np.zeros((n, 2), np.float32))

    b = DynamicBatcher(Slow(), max_batch=4, window_ms=0.0,
                       request_timeout_s=0)
    try:
        assert b.request_timeout is None
        out = b.submit_many([np.zeros((8, 8, 3), np.uint8)])
        assert out[0][0] == 0
    finally:
        b.close()


def test_serve_cli_args():
    from openset_imagenet_tpu.script.serve import get_args

    args = get_args(["model.pth", "auto", "--port", "0",
                     "--batch-window-ms", "5"])
    assert args.n_classes is None
    assert args.batch_window_ms == 5.0
    with pytest.raises(SystemExit):
        get_args(["model.pth", "3", "--gpu", "0", "--devices", "2"])
    with pytest.raises(SystemExit):
        get_args(["model.pth", "3", "--threshold-at-fpr", "0.01"])
    with pytest.raises(SystemExit):
        get_args(["model.pth", "3", "--compile-cache", "d",
                  "--no-compile-cache"])


def test_daemon_over_device_mesh_matches_single_device(trained, predictor):
    """Data-parallel serving through the daemon: an 8-device mesh
    predictor behind HTTP returns exactly the single-device answers
    (the batcher's coalesced batches pad to the mesh's bucket unit)."""
    from openset_imagenet_tpu.inference import OpenSetPredictor
    from openset_imagenet_tpu.parallel.mesh import make_mesh
    from openset_imagenet_tpu.serve import PredictionServer

    root, cfg = trained
    sharded = OpenSetPredictor(cfg.output_directory / "entropic_best.pth",
                               n_classes=3, variant="tiny", image_size=32,
                               mesh=make_mesh(num_devices=8))
    srv = PredictionServer(("127.0.0.1", 0), sharded,
                           max_batch=8, window_ms=100.0).start()
    try:
        blobs = [_jpeg_bytes(i) for i in range(5)]  # ragged vs 8 devices
        results = [None] * len(blobs)

        def hit(i):
            results[i] = _post(srv, blobs[i], "image/jpeg")

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(len(blobs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for blob, got in zip(blobs, results):
            pred, score = _predictor_reference(predictor, blob)
            assert got["prediction"] == pred
            assert abs(got["score"] - score) < 1e-5
        assert srv.batcher.stats.snapshot()["batches"] < len(blobs)
    finally:
        srv.close()


def test_serve_cli_end_to_end(trained):
    """The daemon's full lifecycle through the console entry point:
    start -> healthz -> predict -> SIGTERM -> clean exit 0."""
    import os
    import re
    import signal
    import subprocess
    import sys

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    env = {**os.environ, "OSI_JAX_PLATFORM": "cpu"}
    proc = subprocess.Popen(
        [sys.executable, "-m", "openset_imagenet_tpu.script.serve",
         str(ckpt), "auto", "--port", "0", "--model-variant", "tiny",
         "--image-size", "32", "--max-batch", "4", "--host", "127.0.0.1"],
        env=env, stderr=subprocess.PIPE, text=True)
    lines = []
    try:
        url = None
        while True:  # start-up log line carries the bound port
            line = proc.stderr.readline()
            if not line:
                pytest.fail("server exited before start-up:\n"
                            + "".join(lines))
            lines.append(line)
            m = re.search(r"http://127\.0\.0\.1:(\d+)", line)
            if m:
                url = f"http://127.0.0.1:{m.group(1)}"
                break
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
        req = urllib.request.Request(
            url + "/v1/predict", data=_jpeg_bytes(3), method="POST",
            headers={"Content-Type": "image/jpeg"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["prediction"] in (0, 1, 2)
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
        proc.stderr.close()
    assert proc.returncode == 0


def test_decode_to_input_matches_eval_geometry(trained, tmp_path):
    """Served bytes decode exactly like the evaluation reader reads the
    same file from disk (shorter-side resize + center crop)."""
    from PIL import Image

    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.serve import decode_to_input

    rng = np.random.default_rng(7)
    path = tmp_path / "img.jpg"
    Image.fromarray(rng.integers(0, 256, (48, 40, 3), np.uint8)).save(
        path, format="JPEG", quality=95)
    reader = engine._make_reader(
        NameSpace({"data": {"reader": "auto"}, "seed": 0}), crop=32)
    if hasattr(reader, "read_batch"):
        want = reader.read_batch([str(path)], [None])[0]
    else:
        want = reader(str(path), None)
    got = decode_to_input(path.read_bytes(), 32)
    np.testing.assert_array_equal(got, want)


def test_int8_predictor_behind_daemon_matches_offline(trained):
    """An int8-optimized predictor serves through the daemon with the
    same decisions as offline int8 prediction; the serve CLI enforces
    the --optimize int8 <-> --calibration-images contract."""
    from openset_imagenet_tpu.inference import OpenSetPredictor
    from openset_imagenet_tpu.serve import PredictionServer

    root, cfg = trained
    rng = np.random.default_rng(31)
    calib = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    quant = OpenSetPredictor(cfg.output_directory / "entropic_best.pth",
                             n_classes=3, variant="tiny", image_size=32,
                             optimize="int8", calibration=calib)
    srv = PredictionServer(("127.0.0.1", 0), quant,
                           max_batch=8, window_ms=0.0).start()
    try:
        blob = _jpeg_bytes(5)
        out = _post(srv, blob, "image/jpeg")
        want_pred, want_score = _predictor_reference(quant, blob)
        assert out["prediction"] == want_pred
        assert abs(out["score"] - want_score) < 1e-6
    finally:
        srv.close()


def test_serve_cli_int8_arg_contract():
    from openset_imagenet_tpu.script.serve import get_args

    with pytest.raises(SystemExit):
        get_args(["ck.pth", "3", "--optimize", "int8"])
    with pytest.raises(SystemExit):
        get_args(["ck.pth", "3", "--calibration-images", "x/"])
    args = get_args(["ck.pth", "3", "--optimize", "int8",
                     "--calibration-images", "x/"])
    assert args.optimize == "int8"
