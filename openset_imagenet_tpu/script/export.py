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

Thin wrapper over :mod:`openset_imagenet_tpu.export`.
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
                             "with .stablehlo)")
    parser.add_argument("--model-variant", default="resnet50")
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
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from ..export import (ARTIFACT_SUFFIX, assert_close_bf16,
                          build_serving_fn, export_forward, load_serving,
                          save_exported)
    from ..logger import configure_logger

    log = configure_logger()
    out = pathlib.Path(args.output) if args.output else \
        pathlib.Path(args.checkpoint).with_suffix(ARTIFACT_SUFFIX)
    # Built once; --validate reuses it (no second checkpoint read).
    live = build_serving_fn(args.checkpoint, args.n_classes,
                            variant=args.model_variant,
                            image_size=args.image_size)
    exported = export_forward(live, image_size=args.image_size,
                              batch_size=args.batch_size,
                              platforms=args.platforms)
    save_exported(exported, out)
    size_mb = out.stat().st_size / 2**20
    log.info(f"wrote {out} ({size_mb:.1f} MiB, platforms="
             f"{','.join(args.platforms)}, batch="
             f"{args.batch_size or 'symbolic'})")
    if args.validate:
        import numpy as np

        fn = load_serving(out)
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
