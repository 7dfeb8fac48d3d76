"""``serve_imagenet`` CLI: long-running HTTP prediction service.

Beyond the reference's inventory (its pipeline ends at offline arrays,
reference ``script/evaluate.py:82-149``): loads a trained checkpoint or
an exported ``.stablehlo`` bundle once, pre-compiles the serving batch
buckets, then serves open-set predictions over HTTP with dynamic
batching (:mod:`openset_imagenet_tpu.serve`).

The model/operating-point flags are the ``predict_imagenet`` set, so a
validated offline configuration transfers to the daemon verbatim::

    serve_imagenet entropic.stablehlo auto --port 8000
    curl -s -X POST --data-binary @img.jpg localhost:8000/v1/predict
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading

from .predict import _n_classes, calibrate_threshold


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "serve_imagenet",
        description="Serve open-set predictions over HTTP")
    parser.add_argument("checkpoint",
                        help="Trained checkpoint (.pth; native or "
                             "reference-torch format), or an exported "
                             ".stablehlo serving artifact")
    parser.add_argument("n_classes", type=_n_classes,
                        help="Logit dimensionality the model was trained "
                             "with, or 'auto' to read it from the "
                             "artifact's shapes / the checkpoint's "
                             "logits head")
    parser.add_argument("--host", default="127.0.0.1",
                        help="Bind address (default loopback; use "
                             "0.0.0.0 behind a real ingress only)")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-batch", type=int, default=64,
                        help="Largest coalesced device batch (clamped to "
                             "a fixed-batch artifact's exported size)")
    parser.add_argument("--batch-window-ms", type=float, default=2.0,
                        help="How long a lone request waits for "
                             "companions before dispatching (0 = never "
                             "wait; simultaneous arrivals still share a "
                             "forward)")
    parser.add_argument("--request-timeout", type=float, default=30.0,
                        metavar="SECONDS",
                        help="Bounded wait for a prediction; past it the "
                             "request fails 503 and /healthz reports the "
                             "device thread wedged (0 = wait forever; "
                             "the first-ever forward gets a 600s grace "
                             "floor so --no-warmup compiles are not "
                             "killed mid-flight)")
    parser.add_argument("--no-warmup", action="store_true",
                        help="Skip pre-compiling the batch buckets at "
                             "start-up (first requests then pay the XLA "
                             "compiles)")
    parser.add_argument("--threshold", "-t", type=float, default=None,
                        help="Rejection threshold; 0 disables rejection "
                             "(default: the artifact bundle's baked-in "
                             "threshold when serving one, else 0)")
    parser.add_argument("--threshold-at-fpr", type=float, default=None,
                        metavar="FPR",
                        help="Calibrate the rejection threshold from "
                             "--calibrate arrays (predict_imagenet "
                             "semantics)")
    parser.add_argument("--calibrate", metavar="ARR_NPZ", default=None,
                        help="evaluate_imagenet arrays whose negative/"
                             "unknown rows calibrate --threshold-at-fpr")
    parser.add_argument("--mode", choices=("softmax", "objectosphere"),
                        default=None)
    parser.add_argument("--background", default=None,
                        action=argparse.BooleanOptionalAction,
                        help="Garbage-regime checkpoint: exclude the "
                             "background column from the class decision")
    parser.add_argument("--model-variant", default=None,
                        help="Model architecture; default reads the "
                             "variant stored in the checkpoint "
                             "(resnet50 for checkpoints without "
                             "metadata, e.g. the reference's)")
    parser.add_argument("--image-size", type=int, default=None)
    parser.add_argument("--optimize", choices=("fold_bn", "int8"),
                        default=None,
                        help="Inference-graph optimization (checkpoints "
                             "only; exported artifacts bake theirs at "
                             "export time): fold_bn folds batch-norms "
                             "into the convs; int8 additionally "
                             "quantizes the block convs (+19-39%% "
                             "measured device throughput; needs "
                             "--calibration-images)")
    parser.add_argument("--calibration-images", nargs="+", metavar="SPEC",
                        default=None,
                        help="Activation-range calibration inputs for "
                             "--optimize int8: image files, directories, "
                             "or listings, drawn from the serving "
                             "distribution")
    parser.add_argument("--calibration-percentile", type=float,
                        default=None, metavar="PCT",
                        help="Clip each int8 activation scale to this "
                             "percentile of |activation| (e.g. 99.9) "
                             "instead of the abs-max — outlier-robust "
                             "calibration (values above the clip "
                             "saturate)")
    parser.add_argument("--gpu", "-g", type=int, nargs="?", default=None,
                        const=0,
                        help="Pin serving to this device index")
    parser.add_argument("--devices", "-d", type=int, default=None,
                        help="Data-parallel serving over the first N "
                             "local devices")
    parser.add_argument("--compile-cache", metavar="DIR", default=None,
                        help="Persistent XLA compilation cache directory "
                             "(default: ~/.cache/openset-imagenet-tpu/"
                             "xla) — daemon restarts skip the warmup "
                             "recompiles and go ready in seconds")
    parser.add_argument("--no-compile-cache", action="store_true",
                        help="Compile from scratch; write no cache")
    args = parser.parse_args(argv)
    if args.no_compile_cache and args.compile_cache is not None:
        parser.error("--compile-cache and --no-compile-cache are "
                     "mutually exclusive")
    if args.gpu is not None and args.devices is not None:
        parser.error("--gpu pins one device; --devices shards over "
                     "several — pass at most one of them")
    if args.threshold_at_fpr is not None:
        if args.calibrate is None:
            parser.error("--threshold-at-fpr needs --calibrate")
        if args.threshold is not None:
            parser.error("--threshold and --threshold-at-fpr are "
                         "mutually exclusive")
    elif args.calibrate is not None:
        parser.error("--calibrate does nothing without --threshold-at-fpr")
    if args.optimize == "int8" and args.calibration_images is None:
        parser.error("--optimize int8 needs --calibration-images "
                     "(no prediction inputs exist at daemon startup to "
                     "self-calibrate on)")
    if args.calibration_images is not None and args.optimize != "int8":
        parser.error("--calibration-images does nothing without "
                     "--optimize int8")
    if args.calibration_percentile is not None and args.optimize != "int8":
        parser.error("--calibration-percentile does nothing without "
                     "--optimize int8")
    return args


def main(argv=None):
    args = get_args(argv)
    if args.gpu is not None:
        from ..parallel.mesh import select_device
        import jax
        jax.config.update("jax_default_device",
                          select_device(args.gpu)[0])

    if not args.no_compile_cache:
        # Before the predictor: its construction + warmup trigger the
        # compiles this cache should capture across daemon restarts.
        from ..util import enable_compilation_cache, resolve_compile_cache
        enable_compilation_cache(resolve_compile_cache(args.compile_cache))

    from ..inference import OpenSetPredictor
    from ..logger import configure_logger
    from ..serve import PredictionServer

    log = configure_logger()
    mesh = None
    if args.devices is not None:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(num_devices=args.devices)
    calibration = None
    if args.optimize == "int8":
        import pathlib

        from .predict import collect_paths

        calibration = collect_paths(args.calibration_images,
                                    pathlib.Path("."))
        if not calibration:
            log.error("--calibration-images matched no images")
            return 1
        log.info(f"int8 calibration on {len(calibration)} images")
    predictor = OpenSetPredictor(
        args.checkpoint, n_classes=args.n_classes,
        variant=args.model_variant, image_size=args.image_size,
        threshold=args.threshold, mode=args.mode,
        has_background=args.background, mesh=mesh,
        optimize=args.optimize, calibration=calibration,
        calibration_percentile=args.calibration_percentile)
    if args.threshold_at_fpr is not None:
        predictor.threshold = calibrate_threshold(
            args.calibrate, args.threshold_at_fpr, predictor.mode,
            predictor.has_background)
        log.info(f"calibrated threshold {predictor.threshold:.6g} "
                 f"(FPR <= {args.threshold_at_fpr} on {args.calibrate})")
    if not args.no_warmup:
        log.info(f"warming up batch buckets to {args.max_batch} ...")
        predictor.warmup(args.max_batch)

    server = PredictionServer((args.host, args.port), predictor,
                              max_batch=args.max_batch,
                              window_ms=args.batch_window_ms,
                              request_timeout_s=args.request_timeout)
    stop = threading.Event()
    if threading.current_thread() is threading.main_thread():
        for sig in (signal.SIGINT, signal.SIGTERM):
            signal.signal(sig, lambda *_: stop.set())
    server.start()
    host, port = server.server_address[:2]
    log.info(f"serving {args.checkpoint} on http://{host}:{port} "
             f"(max_batch={server.batcher.max_batch}, "
             f"window={args.batch_window_ms}ms)")
    stop.wait()
    log.info("shutting down")
    server.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
