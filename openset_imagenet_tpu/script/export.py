"""``export_imagenet`` CLI: package a trained model for deployment.

Beyond the reference's inventory (its pipeline ends at offline score
extraction, reference ``script/evaluate.py:82-149``): lowers the trained
two-head serving forward to a self-contained StableHLO artifact via
``jax.export`` — weights baked in, symbolic batch dimension, lowered
ahead-of-time for the requested platforms (default cpu+tpu).  The file
runs anywhere StableHLO runs, with or without this package:

    export_imagenet.py entropic_best.pth 1000 -o entropic.stablehlo
    # later, on the serving host:
    #   fn = openset_imagenet_tpu.export.load_serving("entropic.stablehlo")
    #   logits, features, scores = fn(images_uint8)

``--format savedmodel`` instead lowers the same forward through jax2tf
into a TF SavedModel directory for TF-Serving-style stacks (see
:mod:`openset_imagenet_tpu.tf_export`; needs tensorflow).

Thin wrapper over :mod:`openset_imagenet_tpu.export` /
:mod:`openset_imagenet_tpu.tf_export`.
"""

from __future__ import annotations

import argparse
import pathlib


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "export_imagenet",
        description="Export a trained open-set model to a portable "
                    "StableHLO serving artifact")
    parser.add_argument("checkpoint",
                        help="Trained checkpoint (.pth; native or "
                             "reference-torch format)")
    parser.add_argument("n_classes", type=int,
                        help="Logit dimensionality the model was trained "
                             "with (garbage models: known classes + 1 "
                             "background)")
    parser.add_argument("--output", "-o", default=None,
                        help="Artifact path (default: checkpoint name "
                             "with .stablehlo / .savedmodel)")
    parser.add_argument("--format", choices=("stablehlo", "savedmodel"),
                        default="stablehlo",
                        help="stablehlo (default): jax.export bundle for "
                             "jax/PJRT/IREE serving hosts; savedmodel: "
                             "TF SavedModel directory via jax2tf for "
                             "TF-Serving-style stacks (needs tensorflow; "
                             "--platforms does not apply — the TF "
                             "runtime owns placement)")
    parser.add_argument("--model-variant", default=None,
                        help="Model architecture; default reads the "
                             "variant stored in the checkpoint "
                             "(resnet50 for checkpoints without "
                             "metadata, e.g. the reference's)")
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--batch-size", type=int, default=None,
                        help="Fix the batch dimension (default: symbolic "
                             "— one artifact serves every batch size)")
    parser.add_argument("--platforms", nargs="+", default=["cpu", "tpu"],
                        choices=["cpu", "tpu", "cuda", "rocm"],
                        help="Lowering targets the artifact may run on "
                             "(ahead-of-time; exporting for tpu needs "
                             "no TPU)")
    parser.add_argument("--validate", action="store_true",
                        help="After writing, reload the artifact and "
                             "check it against the live forward on one "
                             "random batch (needs a local backend "
                             "matching one of --platforms)")
    parser.add_argument("--mode", choices=("softmax", "objectosphere"),
                        default="softmax",
                        help="Rejection rule baked into the bundle's "
                             "serving config (predict_imagenet uses it "
                             "unless overridden)")
    parser.add_argument("--background", action="store_true",
                        help="Garbage-regime checkpoint: record in the "
                             "bundle that the background column must be "
                             "excluded from the class decision")
    parser.add_argument("--threshold", "-t", type=float, default=0.0,
                        help="Rejection threshold baked into the bundle "
                             "(0 = no rejection)")
    parser.add_argument("--threshold-at-fpr", type=float, default=None,
                        metavar="FPR",
                        help="Calibrate the baked-in threshold so at "
                             "most this fraction of the calibration "
                             "set's unknowns is accepted (needs "
                             "--calibrate); mutually exclusive with "
                             "--threshold")
    parser.add_argument("--calibrate", metavar="ARR_NPZ", default=None,
                        help="evaluate_imagenet output arrays "
                             "(<loss>_val_arr.npz: gt/features/scores) "
                             "whose negative/unknown rows calibrate "
                             "--threshold-at-fpr")
    parser.add_argument("--optimize", choices=("fold_bn", "int8"),
                        default=None,
                        help="Bake an optimized inference graph into the "
                             "artifact: fold_bn folds batch-norms into "
                             "the convs; int8 additionally quantizes the "
                             "block convs (symmetric PTQ, +19-39%% "
                             "measured serving throughput on v5e; needs "
                             "--calibration-images). Scales are baked "
                             "in — the deployment site needs no "
                             "calibration data")
    parser.add_argument("--calibration-images", nargs="+", metavar="SPEC",
                        default=None,
                        help="Activation-range calibration inputs for "
                             "--optimize int8: image files, directories, "
                             "or listings, drawn from the serving "
                             "distribution (a few hundred is plenty)")
    parser.add_argument("--calibration-percentile", type=float,
                        default=None, metavar="PCT",
                        help="Clip each int8 activation scale to this "
                             "percentile of |activation| (e.g. 99.9) "
                             "instead of the abs-max — outlier-robust "
                             "calibration (values above the clip "
                             "saturate)")
    args = parser.parse_args(argv)
    if args.threshold_at_fpr is not None:
        if args.calibrate is None:
            parser.error("--threshold-at-fpr needs --calibrate "
                         "(an evaluate_imagenet arrays .npz)")
        if args.threshold:
            parser.error("--threshold and --threshold-at-fpr are "
                         "mutually exclusive")
    elif args.calibrate is not None:
        parser.error("--calibrate does nothing without --threshold-at-fpr")
    if args.optimize == "int8" and args.calibration_images is None:
        parser.error("--optimize int8 needs --calibration-images "
                     "(activation-range calibration inputs)")
    if args.calibration_images is not None and args.optimize != "int8":
        parser.error("--calibration-images does nothing without "
                     "--optimize int8")
    if args.calibration_percentile is not None and args.optimize != "int8":
        parser.error("--calibration-percentile does nothing without "
                     "--optimize int8")
    return args


def main(argv=None):
    args = get_args(argv)
    from ..export import (ARTIFACT_SUFFIX, assert_close_bf16,
                          build_serving_fn, export_forward, load_serving,
                          save_exported)
    from ..logger import configure_logger

    log = configure_logger()
    suffix = ARTIFACT_SUFFIX if args.format == "stablehlo" \
        else ".savedmodel"
    out = pathlib.Path(args.output) if args.output else \
        pathlib.Path(args.checkpoint).with_suffix(suffix)
    # Resolve the variant up front (explicit flag > checkpoint arch
    # metadata > resnet50) so the provenance sidecar records the
    # architecture actually built, not a null flag value.
    from ..checkpoint import resolve_model_cfg
    variant = resolve_model_cfg(args.checkpoint,
                                args.model_variant)["variant"]
    calibration = None
    if args.optimize == "int8":
        from .predict import collect_paths

        calibration = collect_paths(args.calibration_images,
                                    pathlib.Path("."))
        if not calibration:
            log.error("--calibration-images matched no images")
            return 1
        log.info(f"int8 calibration on {len(calibration)} images")
    # Built once; --validate reuses it (no second checkpoint read).
    live = build_serving_fn(args.checkpoint, args.n_classes,
                            variant=variant,
                            image_size=args.image_size,
                            optimize=args.optimize,
                            calibration=calibration,
                            calibration_percentile=args.calibration_percentile)
    if args.format == "stablehlo":
        exported = export_forward(live, image_size=args.image_size,
                                  batch_size=args.batch_size,
                                  platforms=args.platforms)
    threshold = args.threshold
    if args.threshold_at_fpr is not None:
        from ..inference import calibrate_threshold

        threshold = calibrate_threshold(args.calibrate,
                                        args.threshold_at_fpr,
                                        args.mode, args.background)
        log.info(f"calibrated threshold {threshold:.6g} "
                 f"(FPR <= {args.threshold_at_fpr} on {args.calibrate})")
    # Serving config + provenance: the sidecar makes the pair a
    # self-contained deployment bundle (predict_imagenet <artifact> auto
    # serves it with zero re-specified configuration).
    meta = {
        "format": 1,
        "n_classes": args.n_classes,
        "image_size": args.image_size,
        "variant": variant,
        "mode": args.mode,
        "has_background": bool(args.background),
        "threshold": float(threshold),
        "batch_size": args.batch_size,
        "source_checkpoint": pathlib.Path(args.checkpoint).name,
    }
    if args.optimize is not None:
        meta["optimize"] = args.optimize
    if args.format == "stablehlo":
        meta["platforms"] = list(args.platforms)
    if args.threshold_at_fpr is not None:
        meta["threshold_fpr_target"] = args.threshold_at_fpr
    if args.format == "stablehlo":
        save_exported(exported, out, meta=meta)
        size_mb = out.stat().st_size / 2**20
        log.info(f"wrote {out} ({size_mb:.1f} MiB, platforms="
                 f"{','.join(args.platforms)}, batch="
                 f"{args.batch_size or 'symbolic'}) + serving config "
                 f"{out.name}.json")
    else:
        from ..tf_export import METADATA_NAME, export_savedmodel

        export_savedmodel(live, out, image_size=args.image_size,
                          batch_size=args.batch_size, meta=meta)
        log.info(f"wrote SavedModel {out} (batch="
                 f"{args.batch_size or 'symbolic'}) + serving config "
                 f"{out.name}/{METADATA_NAME}")
    if args.validate:
        import numpy as np

        if args.format == "stablehlo":
            fn = load_serving(out)
        else:
            from ..tf_export import load_savedmodel

            fn = load_savedmodel(out)
        batch = args.batch_size or 2
        imgs = np.random.default_rng(0).integers(
            0, 256, (batch, args.image_size, args.image_size, 3),
            dtype=np.uint8)
        got = fn(imgs)
        want = live(imgs)
        for g, w, name in zip(got, want, ("logits", "features", "scores")):
            assert_close_bf16(g, w, name)
        log.info("validated: artifact matches the live forward "
                 "(bf16-level tolerance)")
    return str(out)


if __name__ == "__main__":
    main()
