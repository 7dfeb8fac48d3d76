"""HTTP serving daemon benchmark: throughput vs client concurrency.

End-to-end measurement of ``serve_imagenet``'s machinery on the real
chip (or CPU with ``OSI_JAX_PLATFORM=cpu``): a PredictionServer on
loopback, K client threads each POSTing its share of in-memory JPEGs
sequentially (a closed-loop load generator).  With one client the
daemon degenerates to latency-bound batch-1 forwards; with concurrent
clients the dynamic batcher coalesces requests into padded device
batches — the measured ``mean_batch`` shows exactly how much.

Through the dev tunnel both the per-dispatch round-trip (~10s of ms)
and the host->device transfer (~42 MB/s) are part of every request, so
absolute numbers here are LOWER bounds on production throughput; the
concurrency-scaling *ratio* is the portable result.

Prints one JSON line per client count plus a summary line.
"""

import argparse
import io
import json
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np


def make_blobs(n_images: int, size: int, rng) -> list:
    from PIL import Image

    blobs = []
    for _ in range(n_images):
        color = rng.integers(0, 256, 3)
        arr = np.clip(rng.normal(0, 18, (size, size, 3)) + color, 0, 255)
        buf = io.BytesIO()
        Image.fromarray(arr.astype(np.uint8)).save(buf, format="JPEG",
                                                   quality=92)
        blobs.append(buf.getvalue())
    return blobs


def make_checkpoint(root: Path, n_classes: int, variant: str,
                    image_size: int) -> Path:
    import jax
    import optax

    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.checkpoint import save_checkpoint
    from openset_imagenet_tpu.config import NameSpace

    cfg = NameSpace({"model": {"variant": variant}, "seed": 0, "data": {}})
    model = engine.build_model(cfg, n_classes)
    state = engine.create_state(model, jax.random.PRNGKey(0),
                                optax.identity(), image_size=image_size)
    ck = root / "bench_curr.pth"
    save_checkpoint(ck, state, epoch=0, best_score=0.0)
    return ck


def run_load(server, blobs, n_clients: int,
             request_batch: int = 1) -> dict:
    """Closed-loop: each client POSTs its share sequentially.

    ``request_batch > 1`` switches clients to the JSON bulk endpoint
    (``{"images": [<base64>, ...]}``, N images per POST) — the
    amortised-round-trip mode a throughput-oriented client would use.
    """
    import base64

    host, port = server.server_address[:2]
    url = f"http://{host}:{port}/v1/predict"
    shares = [blobs[i::n_clients] for i in range(n_clients)]
    errors = []
    latencies = []  # per-request wall seconds; list.append is GIL-atomic

    def post(data, content_type):
        req = urllib.request.Request(
            url, data=data, method="POST",
            headers={"Content-Type": content_type})
        t_req = time.perf_counter()
        with urllib.request.urlopen(req, timeout=600) as resp:
            json.loads(resp.read())
        latencies.append(time.perf_counter() - t_req)

    def client(share):
        try:
            if request_batch <= 1:
                for blob in share:
                    post(blob, "image/jpeg")
            else:
                for i in range(0, len(share), request_batch):
                    chunk = share[i:i + request_batch]
                    body = json.dumps({"images": [
                        base64.b64encode(b).decode() for b in chunk
                    ]}).encode()
                    post(body, "application/json")
        except Exception as exc:  # surfaces in the summary, fails the run
            errors.append(exc)

    threads = [threading.Thread(target=client, args=(s,)) for s in shares]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errors:
        raise errors[0]
    stats = server.batcher.stats.snapshot()
    lat_ms = np.sort(np.array(latencies)) * 1e3
    return {"clients": n_clients, "images": len(blobs), "seconds": dt,
            "imgs_per_sec": len(blobs) / dt,
            "latency_ms_p50": float(np.percentile(lat_ms, 50)),
            "latency_ms_p95": float(np.percentile(lat_ms, 95)),
            "latency_ms_p99": float(np.percentile(lat_ms, 99)),
            "mean_batch": stats["mean_batch"],
            "max_batch": stats["max_batch"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", default="1,4,16",
                    help="comma list of concurrent client counts")
    ap.add_argument("--images", type=int, default=256,
                    help="total images per load point")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--source-size", type=int, default=256)
    ap.add_argument("--n-classes", type=int, default=116)
    ap.add_argument("--variant", default="resnet50")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--window-ms", default="5",
                    help="coalescing window in ms; a comma list sweeps "
                         "windows at each client count")
    ap.add_argument("--request-batch", type=int, default=1,
                    help="images per POST: 1 = raw single-image bodies, "
                         ">1 = the JSON bulk endpoint")
    args = ap.parse_args()

    from openset_imagenet_tpu.inference import OpenSetPredictor
    from openset_imagenet_tpu.serve import PredictionServer

    rng = np.random.default_rng(0)
    blobs = make_blobs(args.images, args.source_size, rng)
    with tempfile.TemporaryDirectory() as td:
        ck = make_checkpoint(Path(td), args.n_classes, args.variant,
                             args.image_size)
        predictor = OpenSetPredictor(ck, n_classes=args.n_classes,
                                     variant=args.variant,
                                     image_size=args.image_size,
                                     threshold=0.5)
        print("warming up buckets ...", file=sys.stderr)
        predictor.warmup(args.max_batch)

        windows = [float(w) for w in str(args.window_ms).split(",")]
        results = []
        for n_clients in [int(c) for c in args.clients.split(",")]:
            for window_ms in windows:
                server = PredictionServer(("127.0.0.1", 0), predictor,
                                          max_batch=args.max_batch,
                                          window_ms=window_ms).start()
                try:
                    run_load(server, blobs[: max(8, args.images // 8)],
                             n_clients, args.request_batch)  # untimed ramp
                    # The ramp shares the server's counters; zero them so
                    # the reported mean_batch/max_batch cover only the
                    # timed run.
                    server.batcher.stats.reset()
                    res = run_load(server, blobs, n_clients,
                                   args.request_batch)
                finally:
                    server.close()
                res["window_ms"] = window_ms
                print(json.dumps(res))
                results.append(res)
        base = results[0]["imgs_per_sec"]
        best = max(results, key=lambda r: r["imgs_per_sec"])
        print(json.dumps({
            "summary": "serve_http",
            "image_size": args.image_size,
            "request_batch": args.request_batch,
            "best_imgs_per_sec": best["imgs_per_sec"],
            "best_clients": best["clients"],
            "best_window_ms": best["window_ms"],
            "scaling_vs_first": best["imgs_per_sec"] / base,
        }))


if __name__ == "__main__":
    main()
