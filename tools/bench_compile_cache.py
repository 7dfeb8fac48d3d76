"""Measure the persistent XLA compile cache the serving CLIs ship with
(VERDICT round-4 #4: the default-on ``--compile-cache`` claimed
"multi-minute cold start -> seconds" with no numbers behind it).

Three cold starts of each serving surface, in separate processes so
every run pays (or skips) real compiles:

* ``nocache``  — ``--no-compile-cache`` (every start recompiles),
* ``cold``     — cache ON, empty directory (recompiles AND writes),
* ``warm``     — cache ON, the directory the cold run just filled
                 (reads instead of compiling — the shipped default after
                 the first-ever start).

Surfaces:

* ``predict`` — ``predict_imagenet`` over 8 images (compiles the
  8-bucket forward); wall-clock to a written CSV.
* ``serve``   — ``serve_imagenet --max-batch 64`` with warmup (compiles
  the whole bucket ladder 1..64 — the claimed multi-program win);
  wall-clock from spawn to the first ``/healthz`` 200, then SIGTERM.

The model is an untrained production-geometry ResNet-50 checkpoint
written on the spot (XLA compile time does not depend on weight
values).  Run on the chip for the headline numbers; works on CPU too.

Usage:
    python tools/bench_compile_cache.py            # chip
    OSI_JAX_PLATFORM=cpu python tools/bench_compile_cache.py --variant tiny
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def make_fixture(work: Path, variant: str, image_size: int, n_classes: int):
    """Untrained checkpoint + a handful of JPEGs."""
    from PIL import Image

    import jax
    import optax

    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.checkpoint import save_checkpoint
    from openset_imagenet_tpu.config import NameSpace

    cfg = NameSpace({"model": {"variant": variant}, "seed": 0, "data": {}})
    model = engine.build_model(cfg, n_classes)
    state = engine.create_state(model, jax.random.PRNGKey(0),
                                optax.identity(), image_size=image_size)
    ckpt = work / "model_curr.pth"
    save_checkpoint(ckpt, state, 0, 0.0,
                    extra={"arch": {"variant": variant,
                                    "space_to_depth": False}})
    img_dir = work / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(
            0, 256, (image_size, image_size, 3), np.uint8)).save(
            img_dir / f"im{i}.jpg")
    return ckpt, img_dir


def run_predict(ckpt, img_dir, image_size, cache_args, env) -> float:
    out = str(Path(img_dir).parent / "preds.csv")
    t0 = time.time()
    subprocess.run(
        [sys.executable, "-m", "openset_imagenet_tpu.script.predict",
         str(ckpt), "auto", str(img_dir), "--image-size", str(image_size),
         "--batch-size", "8", "-o", out] + cache_args,
        check=True, env=env, capture_output=True, text=True)
    return time.time() - t0


def run_serve(ckpt, image_size, max_batch, cache_args, env) -> float:
    """Spawn the daemon, poll /healthz, SIGTERM (never hard-kill — a
    mid-execution kill wedges the chip's claim in this environment)."""
    port = _free_port()
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-m", "openset_imagenet_tpu.script.serve",
         str(ckpt), "auto", "--image-size", str(image_size),
         "--host", "127.0.0.1", "--port", str(port),
         "--max-batch", str(max_batch)] + cache_args,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    url = f"http://127.0.0.1:{port}/healthz"
    try:
        deadline = time.time() + 1800
        while time.time() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"daemon exited rc={proc.returncode}:\n"
                    + proc.stdout.read()[-3000:])
            try:
                with urllib.request.urlopen(url, timeout=2) as r:
                    if r.status == 200:
                        break
            except Exception:
                time.sleep(0.5)
        else:
            raise RuntimeError("daemon never became healthy")
        ready = time.time() - t0
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
    return ready


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="resnet50")
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--n-classes", type=int, default=116)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--skip-serve", action="store_true")
    args = ap.parse_args()
    image_size = args.image_size or (32 if args.variant == "tiny" else 224)

    with tempfile.TemporaryDirectory() as d:
        work = Path(d)
        ckpt, img_dir = make_fixture(work, args.variant, image_size,
                                     args.n_classes)
        cache_dir = work / "xla_cache"

        # Inherit the env (PYTHONPATH carries the TPU plugin site); only
        # the cache location differs per config.
        env = dict(os.environ)
        env.pop("OSI_COMPILE_CACHE", None)
        configs = [
            ("nocache", ["--no-compile-cache"]),
            ("cold", ["--compile-cache", str(cache_dir)]),
            ("warm", ["--compile-cache", str(cache_dir)]),
        ]

        results = {}
        for name, cache_args in configs:
            t = run_predict(ckpt, img_dir, image_size, cache_args, env)
            results[f"predict_{name}_s"] = round(t, 1)
            print(json.dumps({"surface": "predict", "config": name,
                              "seconds": round(t, 1)}), flush=True)

        if not args.skip_serve:
            serve_cache = work / "xla_cache_serve"
            for name, cache_args in [
                    ("nocache", ["--no-compile-cache"]),
                    ("cold", ["--compile-cache", str(serve_cache)]),
                    ("warm", ["--compile-cache", str(serve_cache)])]:
                t = run_serve(ckpt, image_size, args.max_batch,
                              cache_args, env)
                results[f"serve_{name}_s"] = round(t, 1)
                print(json.dumps({"surface": "serve", "config": name,
                                  "seconds": round(t, 1)}), flush=True)

        if results.get("predict_warm_s"):
            results["predict_speedup"] = round(
                results["predict_nocache_s"] / results["predict_warm_s"], 2)
        if results.get("serve_warm_s"):
            results["serve_speedup"] = round(
                results["serve_nocache_s"] / results["serve_warm_s"], 2)
        print(json.dumps({"variant": args.variant,
                          "image_size": image_size,
                          "max_batch": args.max_batch, **results}),
              flush=True)


if __name__ == "__main__":
    main()
