"""Online serving daemon: HTTP API + dynamic batching over the predictor.

Beyond the reference's inventory (it stops at offline score extraction,
reference ``script/evaluate.py:82-149``): this module turns
:class:`~openset_imagenet_tpu.inference.OpenSetPredictor` into a
long-running prediction service.  Design:

* **One device thread.**  Every forward runs on the single batcher
  thread, so the jitted program is dispatched from one place — HTTP
  handler threads only decode and wait.  (JAX dispatch is not designed
  for concurrent same-program callers; the queue *is* the lock.)
* **Dynamic batching.**  Requests arriving within ``window_ms`` of each
  other coalesce into one padded forward (the predictor's power-of-two
  bucketing keeps the set of compiled programs small; see
  ``OpenSetPredictor._bucket``).  A single request never waits longer
  than the window; a full batch dispatches immediately.  This is the
  TPU-shaped answer to request-level concurrency: the MXU wants batches,
  not a stream of batch-1 forwards.
* **stdlib only.**  ``http.server.ThreadingHTTPServer`` + ``json`` +
  ``base64`` — no web framework to pin, nothing to install on the
  serving host.

API (all responses JSON):

* ``GET /healthz``  -> ``{"status": "ok", model geometry + operating
  point}`` — readiness probe.
* ``GET /stats``    -> request/image/batch/error counters (mean batch
  size = images/batches shows whether coalescing is happening).
* ``POST /v1/predict`` with a raw image body (any ``Content-Type``
  except ``application/json``) -> one result object; with a JSON body
  ``{"images": ["<base64>", ...]}`` -> ``{"results": [...]}``.
  A result is ``{"prediction": int, "score": float, "rejected": bool}``
  (+ ``"features"`` with ``?features=1``); rejected samples carry the
  protocol's ``-1`` convention (reference ``protocol.py:192-204``).

Decode parity: request bytes go through the SAME fused native
decode -> shorter-side resize -> center-crop path as evaluation
(``native/jpeg.py``), with the PIL replay fallback for non-JPEG or
damaged inputs — a served prediction is bitwise the prediction the
evaluate CLI would produce for the same file.
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlsplit

import numpy as np

MAX_BODY_BYTES = 128 * 1024 * 1024  # reject absurd uploads before reading
# Decoded images are held in host RAM between decode and forward; cap the
# per-request count so one well-formed JSON batch cannot exhaust memory
# (1024 x 224x224x3 uint8 ~= 154 MB decoded).
MAX_IMAGES_PER_REQUEST = 1024


def decode_many_to_input(blobs, image_size: int,
                         resize: Optional[int] = None) -> list:
    """Decode a bulk request's blobs with the C++ thread pool.

    One GIL-free ``osi_decode_batch_mem`` call decodes every JPEG in the
    request concurrently (the bulk endpoint is host-decode-bound on real
    serving hosts); blobs the native decoder rejects (non-JPEG, CMYK,
    damaged) fall back per-blob to :func:`decode_to_input`'s PIL replay,
    so results are element-wise identical to the single-image path.
    Raises ``ValueError`` if any blob is undecodable by both.
    """
    from .native.jpeg import decode_batch_mem
    from .train import _resize_for_crop

    if resize is None:
        resize = _resize_for_crop(image_size)
    if len(blobs) > 1:
        images, ok = decode_batch_mem(blobs, resize, image_size)
        if images is not None:
            return [images[i] if ok[i]
                    else decode_to_input(blobs[i], image_size, resize)
                    for i in range(len(blobs))]
    return [decode_to_input(b, image_size, resize) for b in blobs]


def decode_to_input(data: bytes, image_size: int,
                    resize: Optional[int] = None) -> np.ndarray:
    """Request bytes -> the model's ``uint8 [H, W, 3]`` eval input.

    Same geometry as the evaluation pipeline: shorter-side resize (the
    train-time 256/224 ratio, ``train._resize_for_crop``) then center
    crop.  Native fused JPEG path first, PIL replay for everything else
    (PNG/BMP/WebP/CMYK/progressive); raises ``ValueError`` on bytes no
    decoder accepts.
    """
    from .native.jpeg import decode_resize_crop, pil_replay
    from .train import _resize_for_crop

    if resize is None:
        resize = _resize_for_crop(image_size)
    out = decode_resize_crop(data, resize, image_size)
    if out is not None:
        return out
    try:
        return pil_replay(data, resize, image_size)
    except Exception as exc:
        raise ValueError(f"undecodable image: {exc}") from exc


class ServerStats:
    """Lock-protected serving counters (read back via ``GET /stats``)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = 0
        self.images = 0
        self.batches = 0
        self.errors = 0
        self.max_batch = 0

    def count_request(self, images: int = 1) -> None:
        with self._lock:
            self.requests += 1
            self.images += images

    def count_batch(self, size: int) -> None:
        with self._lock:
            self.batches += 1
            self.max_batch = max(self.max_batch, size)

    def count_error(self) -> None:
        with self._lock:
            self.errors += 1

    def reset(self) -> None:
        """Zero every counter (benchmarks reset between warm-up and
        timed load so ``mean_batch`` reflects only the measured run)."""
        with self._lock:
            self.requests = self.images = 0
            self.batches = self.errors = self.max_batch = 0

    def snapshot(self) -> dict:
        with self._lock:
            batches = self.batches
            return {
                "requests": self.requests,
                "images": self.images,
                "batches": batches,
                "errors": self.errors,
                "max_batch": self.max_batch,
                "mean_batch": (self.images / batches) if batches else 0.0,
            }


class PredictionTimeout(RuntimeError):
    """A request waited longer than the server's bounded-wait budget.

    Raised by :meth:`DynamicBatcher.submit_many`; the HTTP layer maps it
    to ``503`` so a wedged device thread degrades to fast failures
    instead of hanging every handler thread forever (this environment
    can wedge a TPU chip's claim — liveness must not depend on the
    forward ever returning).
    """


class _Pending:
    __slots__ = ("image", "event", "result", "error")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None


class DynamicBatcher:
    """Coalesce concurrent prediction requests into padded device batches.

    ``submit_many`` enqueues decoded images and blocks until the batcher
    thread has run them; images from different HTTP requests landing
    within ``window_ms`` share one forward.  ``window_ms=0`` never
    waits — it drains whatever is already queued (still coalescing
    truly-simultaneous arrivals, adding zero latency).
    """

    _SHUTDOWN = object()

    # While the predictor's bucket ladder is still COLD anywhere, waits
    # and the wedge check use this floor instead of request_timeout: a
    # cold bucket's first forward legitimately contains a whole-model
    # XLA compile (every bucket compiles separately under --no-warmup),
    # which can far exceed a 30 s request budget — timing it out would
    # 503 the request, flip /healthz to "wedged", and put a
    # restart-supervised daemon into a permanent compile -> kill ->
    # compile loop (the persistent cache only fills AFTER a compile
    # completes).  Warmed-up daemons (the default) start with the whole
    # ladder compiled, so wedge detection runs at the plain timeout from
    # the very first request.
    FIRST_FORWARD_GRACE_S = 600.0

    def __init__(self, predictor, max_batch: int = 64,
                 window_ms: float = 2.0,
                 request_timeout_s: Optional[float] = 30.0):
        fixed = getattr(predictor, "_fixed_batch", None)
        if fixed is not None:
            # Fixed-batch artifacts accept exactly one shape; never
            # assemble a batch the exported program cannot take.
            max_batch = min(int(max_batch), int(fixed))
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._predictor = predictor
        self.max_batch = int(max_batch)
        self.window = max(0.0, float(window_ms)) / 1000.0
        # None/0 = wait forever (the pre-round-5 behavior, opt-in only).
        self.request_timeout = (float(request_timeout_s)
                                if request_timeout_s else None)
        self.stats = ServerStats()
        self._q: "queue.Queue" = queue.Queue()
        self._closed = threading.Event()
        # Liveness bookkeeping (read by /healthz): when the current
        # forward started (None = device thread idle/waiting) and when
        # the last one completed.  Guarded by _health_lock — the batcher
        # thread writes, handler threads read.
        self._health_lock = threading.Lock()
        self._forward_started: Optional[float] = None
        self._last_forward_done: Optional[float] = None
        # Serialises enqueues against close(): the shutdown sentinel is
        # guaranteed to land AFTER every accepted request's pendings, so
        # nothing the batcher thread ever dequeues post-sentinel is a
        # live request (submit_many after close raises instead).
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="osi-serve-batcher")
        self._thread.start()

    # -- client side --------------------------------------------------------
    def submit_many(self, images) -> list:
        """Blocking: returns ``[(prediction, score, features), ...]``.

        Waits at most ``request_timeout_s`` (wall clock, across the whole
        request) for the batcher thread; raises
        :class:`PredictionTimeout` after that.  The timed-out images may
        still be forwarded later — the device thread is not interrupted
        (interrupting a dispatched XLA program is not safe) — but no
        handler thread ever blocks unboundedly on it.
        """
        pendings = [_Pending(np.asarray(img, np.uint8)) for img in images]
        with self._submit_lock:
            if self._closed.is_set():
                raise RuntimeError("server is shutting down")
            for p in pendings:
                self._q.put(p)
        budget = self._effective_timeout()
        deadline = time.monotonic() + budget if budget else None
        results = []
        for p in pendings:
            if deadline is None:
                p.event.wait()
            elif not p.event.wait(max(0.0, deadline - time.monotonic())):
                raise PredictionTimeout(
                    f"prediction did not complete within {budget:.0f}s "
                    f"(device thread "
                    f"{'wedged mid-forward' if self.forward_age() is not None else 'backlogged'}; "
                    f"queue depth {self.queue_depth()})")
            if p.error is not None:
                raise p.error
            results.append(p.result)
        return results

    def _effective_timeout(self) -> Optional[float]:
        """request_timeout, floored to the compile grace while a long
        forward could legitimately be compiling (FIRST_FORWARD_GRACE_S)."""
        if not self.request_timeout:
            return None
        if self._maybe_compiling():
            return max(self.request_timeout, self.FIRST_FORWARD_GRACE_S)
        return self.request_timeout

    def _maybe_compiling(self) -> bool:
        """Could a long in-flight forward legitimately be an XLA compile?

        Ground truth is the predictor's warm-bucket ladder
        (:meth:`OpenSetPredictor.buckets_compiled_up_to`): any cold
        bucket up to ``max_batch`` means the next forward may compile
        (--no-warmup daemons compile once PER BUCKET, not just on the
        first request), while a fully warm ladder — the default, warmup
        runs before traffic — cannot compile, so wedge detection gets
        the plain timeout from request 1.  Predictor objects without
        bucket tracking fall back to "until the first successful
        forward".
        """
        check = getattr(self._predictor, "buckets_compiled_up_to", None)
        if check is not None:
            return not check(self.max_batch)
        return self.last_forward_age() is None

    # -- liveness (read by /healthz) ----------------------------------------
    def queue_depth(self) -> int:
        """Images waiting in the queue (excludes the batch in flight)."""
        return self._q.qsize()

    def forward_age(self) -> Optional[float]:
        """Seconds the CURRENT forward has been running; None when idle."""
        with self._health_lock:
            if self._forward_started is None:
                return None
            return time.monotonic() - self._forward_started

    def last_forward_age(self) -> Optional[float]:
        """Seconds since the last SUCCESSFUL forward; None before any.
        (Thread liveness is tracked by :meth:`forward_age`; this feeds
        the compile-grace fallback and the healthz diagnostics, where a
        fast-failing batch must not count as proof of a completed
        compile.)"""
        with self._health_lock:
            if self._last_forward_done is None:
                return None
            return time.monotonic() - self._last_forward_done

    def health(self) -> dict:
        """Batcher liveness snapshot.  ``wedged`` goes true when one
        forward has been running longer than the effective timeout (the
        first forward gets the compile grace) — an idle daemon (no
        traffic) is always healthy."""
        # Budget BEFORE forward age: if the in-flight (grace-covered)
        # forward completes between the two reads, fwd comes back None
        # and wedged stays false — sampling fwd first could pair a
        # mid-compile age with the post-compile plain budget and report
        # a spurious wedge.
        budget = self._effective_timeout()
        fwd = self.forward_age()
        last = self.last_forward_age()
        wedged = bool(budget and fwd is not None and fwd > budget)
        return {"queue_depth": self.queue_depth(),
                "inflight_forward_s": round(fwd, 3) if fwd is not None
                else None,
                "last_forward_age_s": round(last, 3) if last is not None
                else None,
                "wedged": wedged}

    def close(self) -> None:
        with self._submit_lock:
            if self._closed.is_set():
                return
            self._closed.set()
            self._q.put(self._SHUTDOWN)
        # A wedged forward would hold the (daemonic) batcher thread
        # forever; bound the join so SIGTERM shutdown of a wedged daemon
        # exits instead of hanging — the drain below still fail-fasts
        # every queued request either way.
        grace = (self.request_timeout or 30.0) + 5.0
        self._thread.join(timeout=grace)
        if self._thread.is_alive():
            import logging
            logging.getLogger(__name__).warning(
                "batcher thread still running %.0fs after shutdown "
                "(wedged forward?); abandoning it — daemon threads die "
                "with the process", grace)
        # Defensive: fail-fast anything still queued (cannot happen with
        # the submit lock honoured, but an abandoned pending would hang
        # its handler thread forever).
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is self._SHUTDOWN:
                # The submit lock guarantees the sentinel is LAST — but
                # an abandoned (slow, not dead) batcher thread that
                # finishes its forward later still needs it to exit
                # instead of blocking on q.get() forever.
                self._q.put(item)
                break
            if isinstance(item, _Pending):
                item.error = RuntimeError("server is shutting down")
                item.event.set()

    # -- device side --------------------------------------------------------
    def _gather(self, first) -> Optional[list]:
        """First queue item -> a batch (None on shutdown sentinel)."""
        if first is self._SHUTDOWN:
            return None
        batch = [first]
        deadline = time.monotonic() + self.window
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            try:
                item = (self._q.get_nowait() if timeout <= 0
                        else self._q.get(timeout=timeout))
            except queue.Empty:
                break
            if item is self._SHUTDOWN:
                # Serve what we have; the sentinel comes back around for
                # the next loop iteration to exit on.
                self._q.put(self._SHUTDOWN)
                break
            batch.append(item)
        return batch

    def _run(self) -> None:
        while True:
            batch = self._gather(self._q.get())
            if batch is None:
                return
            try:
                images = np.stack([p.image for p in batch])
                with self._health_lock:
                    self._forward_started = time.monotonic()
                preds, scores, feats = self._predictor.predict(
                    images, return_features=True)
                for i, p in enumerate(batch):
                    p.result = (int(preds[i]), float(scores[i]),
                                np.asarray(feats[i]))
            except BaseException as exc:
                for p in batch:
                    p.error = exc
            else:
                self.stats.count_batch(len(batch))
                # Success-only: a batch that errored out FAST (decode
                # shape mismatch, transient device error) has not proven
                # a compile happened — the fallback compile-grace
                # heuristic must not be consumed by it.
                with self._health_lock:
                    self._last_forward_done = time.monotonic()
            finally:
                with self._health_lock:
                    self._forward_started = None
                for p in batch:
                    p.event.set()


class _Handler(BaseHTTPRequestHandler):
    server_version = "osi-serve/1.0"
    protocol_version = "HTTP/1.1"

    # The default handler prints every request to stderr; serving logs go
    # through the framework logger at debug level instead.
    def log_message(self, fmt, *args):  # noqa: A002 - stdlib signature
        self.server.log.debug("%s %s" % (self.address_string(),
                                         fmt % args))

    # -- plumbing -----------------------------------------------------------
    def _send_json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, message: str) -> None:
        self.server.batcher.stats.count_error()
        self._send_json(code, {"error": message})

    # -- routes -------------------------------------------------------------
    def do_GET(self):  # noqa: N802 - stdlib casing
        path = urlsplit(self.path).path
        if path == "/healthz":
            p = self.server.predictor
            health = self.server.batcher.health()
            # Liveness, not just readiness: a wedged device thread (one
            # forward running past the request timeout) flips the probe
            # non-200 so orchestrators restart the daemon instead of
            # routing traffic into hung handler threads.
            wedged = health["wedged"]
            self._send_json(503 if wedged else 200, {
                "status": "wedged" if wedged else "ok",
                "n_classes": p.n_classes,
                "image_size": p.image_size,
                "threshold": p.threshold,
                "mode": p.mode,
                "has_background": p.has_background,
                "batcher": health,
            })
        elif path == "/stats":
            self._send_json(200, self.server.batcher.stats.snapshot())
        else:
            self._error(404, f"no such route: {path}")

    def do_POST(self):  # noqa: N802 - stdlib casing
        url = urlsplit(self.path)
        if url.path not in ("/v1/predict", "/predict"):
            self._error(404, f"no such route: {url.path}")
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
        except ValueError:
            # Responding without reading the body would leave its bytes
            # on the keep-alive socket to be parsed as the next request
            # line; drop the connection on every pre-read error path.
            self.close_connection = True
            self._error(400, "bad Content-Length")
            return
        if length <= 0:
            self.close_connection = True
            self._error(400, "empty request body")
            return
        if length > MAX_BODY_BYTES:
            self.close_connection = True
            self._error(413, f"body exceeds {MAX_BODY_BYTES} bytes")
            return
        body = self.rfile.read(length)
        query = parse_qs(url.query)
        want_features = query.get("features", ["0"])[-1].lower() in (
            "1", "true", "yes")
        ctype = self.headers.get("Content-Type", "").split(";")[0].strip()

        batched = ctype == "application/json"
        if batched:
            try:
                payload = json.loads(body)
                blobs = [base64.b64decode(b, validate=True)
                         for b in payload["images"]]
            except Exception as exc:
                self._error(400, f"bad JSON request: {exc}")
                return
            if len(blobs) > MAX_IMAGES_PER_REQUEST:
                self._error(413, f"request carries {len(blobs)} images; "
                                 f"limit is {MAX_IMAGES_PER_REQUEST}")
                return
        else:
            blobs = [body]
        try:
            images = decode_many_to_input(
                blobs, self.server.predictor.image_size, self.server.resize)
        except ValueError as exc:
            self._error(400, str(exc))
            return

        self.server.batcher.stats.count_request(len(images))
        try:
            results = self.server.batcher.submit_many(images)
        except PredictionTimeout as exc:
            self._error(503, f"prediction timed out: {exc}")
            return
        except Exception as exc:
            self._error(500, f"prediction failed: {exc}")
            return
        out = []
        for pred, score, feats in results:
            row = {"prediction": pred, "score": score,
                   "rejected": pred == -1}
            if want_features:
                row["features"] = [float(v) for v in feats]
            out.append(row)
        self._send_json(200, {"results": out} if batched else out[0])


class PredictionServer(ThreadingHTTPServer):
    """HTTP serving daemon around an :class:`OpenSetPredictor`.

    ``with PredictionServer(("127.0.0.1", 0), predictor) as srv:`` —
    ``srv.server_address`` carries the bound port; drive traffic, then
    ``srv.close()`` (or exit the ``with`` block after ``shutdown()``).
    Handler threads are daemonic: a hung client never blocks shutdown.
    """

    daemon_threads = True
    # socketserver's default listen backlog is 5: a burst of simultaneous
    # connects (exactly the load dynamic batching exists for) would get
    # connection-reset before the accept loop ever saw them.
    request_queue_size = 128

    def __init__(self, address, predictor, max_batch: int = 64,
                 window_ms: float = 2.0,
                 request_timeout_s: Optional[float] = 30.0):
        from .logger import configure_logger
        from .train import _resize_for_crop

        self.predictor = predictor
        self.resize = _resize_for_crop(predictor.image_size)
        self.log = configure_logger()
        self._serve_thread: Optional[threading.Thread] = None
        # Bind first: a port-in-use failure must not leak a batcher thread.
        super().__init__(address, _Handler)
        self.batcher = DynamicBatcher(predictor, max_batch=max_batch,
                                      window_ms=window_ms,
                                      request_timeout_s=request_timeout_s)

    def start(self) -> "PredictionServer":
        """Serve in a background thread (the CLI's and tests' mode —
        the caller's thread stays free for signal handling / asserts)."""
        self._serve_thread = threading.Thread(
            target=self.serve_forever, daemon=True, name="osi-serve-http")
        self._serve_thread.start()
        return self

    def close(self) -> None:
        """Stop accepting, drain the batcher, release the socket.

        ``BaseServer.shutdown()`` blocks until a running ``serve_forever``
        loop exits, so it is only issued when :meth:`start` launched one —
        a constructed-but-never-started server closes without deadlock.
        """
        if self._serve_thread is not None and self._serve_thread.is_alive():
            self.shutdown()
            self._serve_thread.join()
        if getattr(self, "batcher", None) is not None:  # init may have raised
            self.batcher.close()
        self.server_close()
