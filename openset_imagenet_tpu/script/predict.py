"""``predict_imagenet`` CLI: serving-side open-set classification.

Beyond the reference's inventory — the reference stops at offline score
extraction for evaluation (reference ``script/evaluate.py:82-149``); this
entry point is the deployment surface: load a trained ``_best``/``_curr``
checkpoint once (native msgpack or the reference's published torch
``.pth`` — auto-converted), then classify files, directories, or a CSV
listing of images with open-set rejection, writing a predictions CSV of
``path,prediction,score`` rows where rejected samples get class ``-1``
(the protocol's negative-label convention, reference
``protocol.py:192-204``).

Thin wrapper over :class:`openset_imagenet_tpu.inference.OpenSetPredictor`
(jitted forward, power-of-two batch bucketing, native batch decode).
"""

from __future__ import annotations

import argparse
import csv
import pathlib
import sys

IMAGE_SUFFIXES = (".jpeg", ".jpg", ".png", ".bmp", ".webp")


def _n_classes(value: str):
    """Positional n_classes: an int, or 'auto' (inferred from the
    artifact's shapes / the checkpoint's logits head)."""
    if value == "auto":
        return None
    return int(value)


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "predict_imagenet",
        description="Classify images with a trained open-set model")
    parser.add_argument("checkpoint",
                        help="Trained checkpoint (.pth; native or "
                             "reference-torch format), or an exported "
                             ".stablehlo serving artifact "
                             "(export_imagenet.py)")
    parser.add_argument("n_classes", type=_n_classes,
                        help="Logit dimensionality the model was trained "
                             "with (garbage models: known classes + 1 "
                             "background), or 'auto' to read it from an "
                             "exported artifact's shapes / the "
                             "checkpoint's logits head")
    parser.add_argument("images", nargs="+",
                        help="Image files, directories (searched "
                             "recursively), or .csv/.txt listings of "
                             "relative paths (protocol-CSV format works)")
    parser.add_argument("--imagenet-directory", default=".",
                        help="Root that listed/relative paths resolve "
                             "against")
    parser.add_argument("--threshold", "-t", type=float, default=None,
                        help="Rejection threshold; 0 disables rejection "
                             "(default: the artifact bundle's baked-in "
                             "threshold when serving one, else 0)")
    parser.add_argument("--threshold-at-fpr", type=float, default=None,
                        metavar="FPR",
                        help="Calibrate the rejection threshold so at "
                             "most this fraction of the calibration "
                             "set's unknowns is accepted (needs "
                             "--calibrate); mutually exclusive with "
                             "--threshold")
    parser.add_argument("--calibrate", metavar="ARR_NPZ", default=None,
                        help="evaluate_imagenet output arrays "
                             "(<loss>_val_arr.npz: gt/features/scores) "
                             "whose negative/unknown rows calibrate "
                             "--threshold-at-fpr")
    parser.add_argument("--mode", choices=("softmax", "objectosphere"),
                        default=None,
                        help="Rejection rule: max-softmax or "
                             "||feature||*score (reference "
                             "metrics.py:45-62; default: the bundle's "
                             "mode when serving an artifact, else "
                             "softmax)")
    parser.add_argument("--background", default=None,
                        action=argparse.BooleanOptionalAction,
                        help="Garbage-regime checkpoint: exclude the "
                             "background column from the class decision "
                             "(default: the bundle's flag when serving "
                             "an artifact, else off; --no-background "
                             "overrides a bundle)")
    parser.add_argument("--model-variant", default=None,
                        help="Model architecture; default reads the "
                             "variant stored in the checkpoint "
                             "(resnet50 for checkpoints without "
                             "metadata, e.g. the reference's)")
    parser.add_argument("--image-size", type=int, default=None,
                        help="Crop size the model expects (default: the "
                             "artifact's exported size when serving one, "
                             "else 224)")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--no-stream", action="store_true",
                        help="Serial chunk loop (decode, then forward) "
                             "instead of the default pipelined "
                             "predict_stream — escape hatch that keeps "
                             "everything on the calling thread")
    parser.add_argument("--output", "-o", default="-",
                        help="Predictions CSV path ('-' = stdout)")
    parser.add_argument("--features-output", metavar="NPZ", default=None,
                        help="Also save deep features + full softmax "
                             "scores as an .npz (keys: paths, features, "
                             "scores; row order matches the predictions "
                             "CSV) — the serving-side analogue of "
                             "evaluate_imagenet's arrays for downstream "
                             "open-set analysis")
    parser.add_argument("--optimize", choices=("fold_bn", "int8"),
                        default=None,
                        help="Inference-graph optimization (checkpoints "
                             "only): fold_bn folds every batch-norm into "
                             "the preceding convolution (bf16-rounding-"
                             "equal predictions from a leaner graph); "
                             "int8 additionally quantizes the block convs "
                             "to symmetric int8 (2x MXU rate, half the "
                             "activation HBM traffic, small quantization "
                             "noise on the scores)")
    parser.add_argument("--calibration-images", nargs="+", metavar="SPEC",
                        default=None,
                        help="Activation-range calibration inputs for "
                             "--optimize int8 (files/directories/listings "
                             "like the positional images). Default: "
                             "self-calibrate on the first 256 prediction "
                             "inputs")
    parser.add_argument("--calibration-percentile", type=float,
                        default=None, metavar="PCT",
                        help="Clip each int8 activation scale to this "
                             "percentile of |activation| (e.g. 99.9) "
                             "instead of the abs-max — outlier-robust "
                             "calibration (values above the clip "
                             "saturate)")
    parser.add_argument("--gpu", "-g", type=int, nargs="?", default=None,
                        const=0,
                        help="Pin inference to this device index")
    parser.add_argument("--devices", "-d", type=int, default=None,
                        help="Data-parallel serving: shard every batch "
                             "over the first N local devices (weights "
                             "replicated once). Mutually exclusive with "
                             "--gpu")
    parser.add_argument("--compile-cache", metavar="DIR", default=None,
                        help="Persistent XLA compilation cache directory "
                             "(default: ~/.cache/openset-imagenet-tpu/"
                             "xla) — repeat invocations skip the "
                             "multi-minute TPU compile")
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
            parser.error("--threshold-at-fpr needs --calibrate "
                         "(an evaluate_imagenet arrays .npz)")
        if args.threshold is not None:
            parser.error("--threshold and --threshold-at-fpr are "
                         "mutually exclusive")
    elif args.calibrate is not None:
        parser.error("--calibrate does nothing without --threshold-at-fpr")
    if args.calibration_images is not None and args.optimize != "int8":
        parser.error("--calibration-images does nothing without "
                     "--optimize int8")
    if args.calibration_percentile is not None and args.optimize != "int8":
        parser.error("--calibration-percentile does nothing without "
                     "--optimize int8")
    return args


def calibrate_threshold(arr_path, fpr_target: float, mode: str,
                        has_background: bool) -> float:
    """Derive the rejection threshold from evaluation arrays.

    Moved to :func:`openset_imagenet_tpu.inference.calibrate_threshold`
    (shared with ``export_imagenet --threshold-at-fpr``); this alias
    keeps the original import path working.
    """
    from ..inference import calibrate_threshold as impl

    return impl(arr_path, fpr_target, mode, has_background)


def collect_paths(specs, root: pathlib.Path):
    """Expand files / directories / listing files into image paths.

    Every returned path exists: a typo'd listing entry fails HERE with a
    clear error, not minutes later inside the batch decoder with a
    partial output CSV already written.
    """
    paths = []
    for spec in specs:
        p = pathlib.Path(spec)
        if not p.exists():
            p = root / spec
        if p.is_dir():
            found = sorted(q for q in p.rglob("*")
                           if q.suffix.lower() in IMAGE_SUFFIXES)
            paths.extend(str(q) for q in found)
        elif p.is_file() and p.suffix.lower() in (".csv", ".txt"):
            # csv.reader mirrors the quoting our own output writer emits,
            # so a predictions CSV (paths with commas are csv-quoted)
            # round-trips as an input listing; a leading header row equal
            # to the output header is skipped.
            with p.open(newline="") as f:
                rows = list(csv.reader(f))
            if rows and [c.strip() for c in rows[0][:3]] == [
                    "path", "prediction", "score"]:
                rows = rows[1:]
            for row in rows:
                rel = row[0].strip() if row else ""
                if not rel:
                    continue
                q = pathlib.Path(rel)
                if not q.is_absolute():
                    q = root / rel
                if not q.is_file():
                    raise FileNotFoundError(
                        f"listing {p}: no such image: {rel}")
                paths.append(str(q))
        elif p.is_file():
            paths.append(str(p))
        else:
            raise FileNotFoundError(f"no such image/directory/listing: "
                                    f"{spec}")
    return paths


def main(argv=None):
    args = get_args(argv)
    if args.gpu is not None:
        # Must pin before the first backend touch inside the predictor.
        from ..parallel.mesh import select_device
        import jax
        jax.config.update("jax_default_device",
                          select_device(args.gpu)[0])
    if not args.no_compile_cache:
        # Before the predictor: its construction triggers the first
        # compile this cache should capture.
        from ..util import enable_compilation_cache, resolve_compile_cache
        enable_compilation_cache(resolve_compile_cache(args.compile_cache))

    from ..inference import OpenSetPredictor
    from ..logger import configure_logger

    log = configure_logger()
    paths = collect_paths(args.images, pathlib.Path(args.imagenet_directory))
    if not paths:
        log.warning("no images found")
    mesh = None
    if paths and args.devices is not None:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(num_devices=args.devices)
    calibration = None
    if paths and args.optimize == "int8":
        if args.calibration_images is not None:
            calibration = collect_paths(
                args.calibration_images,
                pathlib.Path(args.imagenet_directory))
            if not calibration:
                log.error("--calibration-images matched no images")
                return 1
        else:
            # Self-calibration: abs-max activation ranges from the data
            # actually being served.
            calibration = paths[:256]
        log.info(f"int8 calibration on {len(calibration)} images")
    # Serving config left unset (None) resolves inside the predictor:
    # from the artifact bundle's sidecar when serving one, else to the
    # plain defaults (threshold 0 / softmax / no background / 224).
    predictor = (OpenSetPredictor(
        args.checkpoint, n_classes=args.n_classes,
        variant=args.model_variant, image_size=args.image_size,
        threshold=args.threshold, mode=args.mode,
        has_background=args.background, mesh=mesh,
        optimize=args.optimize, calibration=calibration,
        calibration_percentile=args.calibration_percentile)
        if paths else None)
    if predictor is not None and args.threshold_at_fpr is not None:
        # After construction so the calibration measure matches the
        # RESOLVED mode/background (which may come from the bundle).
        predictor.threshold = calibrate_threshold(
            args.calibrate, args.threshold_at_fpr, predictor.mode,
            predictor.has_background)
        log.info(f"calibrated threshold {predictor.threshold:.6g} "
                 f"(FPR <= {args.threshold_at_fpr} on {args.calibrate})")

    # An empty match still writes the header: rc 0 + a well-formed (empty)
    # predictions file, never a missing one.  Paths with commas are quoted
    # (csv module semantics) so rows always parse back to three fields.
    out = (sys.stdout if args.output == "-"
           else open(args.output, "w", encoding="utf-8", newline=""))
    try:
        writer = csv.writer(out, lineterminator="\n")
        writer.writerow(["path", "prediction", "score"])
        rejected = 0
        # Pipelined by default: decode of chunk k+1 overlaps the device
        # forward of chunk k (predict_stream); the serial chunk loop
        # (--no-stream) idles the device during host decode but avoids
        # the producer thread.
        arrays = args.features_output is not None

        def serial():
            for i in range(0, len(paths), args.batch_size):
                chunk = paths[i:i + args.batch_size]
                yield (chunk, *predictor.predict(chunk,
                                                 return_arrays=arrays))

        stream = () if not paths else (
            serial() if args.no_stream
            else predictor.predict_stream(paths,
                                          batch_size=args.batch_size,
                                          return_arrays=arrays))
        feat_chunks, score_chunks = [], []
        for chunk, pred, score, *rest in stream:
            rejected += int((pred == -1).sum())
            for p, c, s in zip(chunk, pred, score):
                writer.writerow([p, int(c), f"{float(s):.6f}"])
            out.flush()  # long runs stay tail-able / resumable
            if arrays:
                feat_chunks.append(rest[0])
                score_chunks.append(rest[1])
    finally:
        if out is not sys.stdout:
            out.close()
    if args.features_output is not None:
        import numpy as np

        empty_f = np.zeros((0, 0), np.float32)
        np.savez(args.features_output,
                 paths=np.asarray(paths),
                 features=(np.concatenate(feat_chunks) if feat_chunks
                           else empty_f),
                 scores=(np.concatenate(score_chunks) if score_chunks
                         else empty_f))
        log.info(f"saved features/scores -> {args.features_output}")
    log.info(f"predicted {len(paths)} images "
             f"({rejected} rejected as unknown)"
             + (f" -> {args.output}" if args.output != "-" else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
