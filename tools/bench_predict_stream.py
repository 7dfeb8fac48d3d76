"""Serving-path A/B: serial chunk loop vs pipelined predict_stream.

Measures end-to-end ``predict`` throughput (JPEG files on disk ->
predictions) for the same checkpoint and file set two ways:

* serial — the round-3 CLI behavior: decode chunk k to completion, then
  forward it (device idles during host decode);
* stream — ``OpenSetPredictor.predict_stream``: a producer thread decodes
  chunk k+1 while the device forwards chunk k and the main thread
  postprocesses chunk k-1 (VERDICT round-3 #3).

Run on the real chip (no env overrides) or CPU (OSI_JAX_PLATFORM=cpu).
Through the dev tunnel the host->device transfer (~42 MB/s) is part of
the overlapped region, so the stream's win here is a LOWER bound on the
production win (production PCIe makes the forward relatively cheaper and
decode relatively more dominant).

Prints one JSON line per arm plus a summary speedup line.
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def make_dataset(root: Path, n_images: int, size: int, rng) -> list:
    from PIL import Image

    paths = []
    for i in range(n_images):
        color = rng.integers(0, 256, 3)
        arr = np.clip(rng.normal(0, 18, (size, size, 3)) + color, 0, 255)
        p = root / f"img_{i:05d}.jpg"
        Image.fromarray(arr.astype(np.uint8)).save(p, quality=92)
        paths.append(str(p))
    return paths


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


def run_serial(pred, paths, batch_size):
    out = []
    for i in range(0, len(paths), batch_size):
        chunk = paths[i:i + batch_size]
        out.append(pred.predict(chunk))
    # predict() ends on np.asarray fetches — already synchronized.
    return out


def run_stream(pred, paths, batch_size):
    return [r[1:] for r in pred.predict_stream(paths,
                                               batch_size=batch_size)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--variant", default="resnet50")
    ap.add_argument("--classes", type=int, default=1000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory(prefix="osi_predbench_") as td:
        root = Path(td)
        paths = make_dataset(root, args.images, args.image_size, rng)
        ck = make_checkpoint(root, args.classes, args.variant,
                             args.image_size)

        from openset_imagenet_tpu.inference import OpenSetPredictor
        pred = OpenSetPredictor(ck, n_classes=args.classes,
                                variant=args.variant,
                                image_size=args.image_size)
        # One warm pass compiles both buckets and faults in the files.
        pred.warmup(max_batch=args.batch_size)
        run_serial(pred, paths[:2 * args.batch_size], args.batch_size)

        results = {}
        for name, fn in (("serial", run_serial), ("stream", run_stream)):
            rates = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                out = fn(pred, paths, args.batch_size)
                dt = time.perf_counter() - t0
                assert sum(len(r[0]) for r in out) == len(paths)
                rates.append(len(paths) / dt)
            results[name] = float(np.median(rates))
            print(json.dumps({"arm": name, "imgs_per_sec":
                              round(results[name], 1),
                              "images": args.images,
                              "batch_size": args.batch_size}), flush=True)

        print(json.dumps({
            "metric": "predict_stream_speedup",
            "value": round(results["stream"] / results["serial"], 3),
            "unit": "x vs serial",
            "serial_imgs_per_sec": round(results["serial"], 1),
            "stream_imgs_per_sec": round(results["stream"], 1),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
