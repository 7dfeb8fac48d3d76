"""``evaluate_imagenet`` CLI: extract features/logits/scores to ``.npz``.

Parity with reference ``script/evaluate.py:15-149``: loads the ``_best`` or
``_curr`` checkpoint for a (loss, protocol) run, rebuilds the model with the
evaluation ``n_classes`` rule (garbage: ``label_count``; else
``label_count - 1``, reference ``script/evaluate.py:118-121``), runs the
val and test splits through the jitted forward step, and saves
``{loss}_{split}_arr{suffix}.npz`` archives of
``{gt, logits, features, scores}`` (reference ``script/evaluate.py:133-149``).

Note the reference quirk kept here: the val/test CSVs are loaded **without**
label surgery (negative labels stay −1/−2) except for garbage, where the
scores matrix simply has the extra background column.
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "evaluate_imagenet",
        description="Extract logits/features/scores for val+test")
    parser.add_argument("loss", choices=("entropic", "softmax", "garbage"),
                        help="Loss function used at training time")
    parser.add_argument("protocol", type=int, choices=(1, 2, 3),
                        help="Open-set protocol")
    parser.add_argument("--use-best", "-b", action="store_true",
                        help="Load the _best checkpoint instead of _curr")
    parser.add_argument("--gpu", "-g", type=int, nargs="?", default=None,
                        const=0, help="Pin evaluation to this device index "
                        "(single-device mesh); default uses all devices")
    parser.add_argument("--imagenet-directory",
                        default="/local/scratch/datasets/ImageNet/ILSVRC2012/",
                        help="ImageNet root directory")
    parser.add_argument("--protocol-directory", default="protocols",
                        help="Directory holding the p{}_{split}.csv files")
    parser.add_argument("--output-directory", "-o",
                        default="experiments/Protocol_{}",
                        help="Directory with checkpoints; receives the npz; "
                             "'{}' is replaced by the protocol number")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--workers", type=int, default=16)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--model-variant", default=None,
                        help="Model architecture; default reads the "
                             "variant stored in the checkpoint "
                             "(resnet50 for checkpoints without "
                             "metadata, e.g. the reference's)")
    parser.add_argument("--reader", default="auto",
                        choices=("auto", "native", "pil", "synthetic"))
    args = parser.parse_args(argv)
    try:
        args.output_directory = args.output_directory.format(args.protocol)
    except (IndexError, KeyError, ValueError):
        # Not a format template (stray/unmatched braces): use literally.
        pass
    return args


def main(argv=None):
    args = get_args(argv)
    # Multi-host: bring up jax.distributed (no-op single-process) BEFORE
    # the first backend touch below.
    from ..parallel.launch import maybe_initialize
    maybe_initialize()
    import jax

    from ..config import NameSpace
    from ..dataset import ImagenetDataset
    from ..logger import configure_logger
    from .. import train as engine
    from ..checkpoint import load_weights_any_format
    from ..parallel.mesh import (batch_sharding, data_mesh_for_batch,
                                 replicated)
    from ..pipeline import pipeline_from_dataset

    log = configure_logger()
    out_dir = pathlib.Path(args.output_directory)
    proto_dir = pathlib.Path(args.protocol_directory)
    suffix = "_best" if args.use_best else "_curr"

    # Datasets WITHOUT label surgery (reference script/evaluate.py:92-100).
    val_ds = ImagenetDataset(proto_dir / f"p{args.protocol}_val.csv",
                             args.imagenet_directory)
    test_ds = ImagenetDataset(proto_dir / f"p{args.protocol}_test.csv",
                              args.imagenet_directory)

    # Evaluation n_classes rule (reference script/evaluate.py:118-121):
    # garbage keeps the background class; others drop the -1 label column.
    if args.loss == "garbage":
        n_classes = val_ds.label_count
    else:
        n_classes = val_ds.label_count - 1

    if args.gpu is not None:
        from ..parallel.mesh import select_device
        mesh = data_mesh_for_batch(args.batch_size,
                                   devices=select_device(args.gpu))
    else:
        mesh = data_mesh_for_batch(args.batch_size)

    ckpt = out_dir / f"{args.loss}{suffix}.pth"
    # Rebuild the architecture the checkpoint was trained with (stored
    # arch metadata; explicit --model-variant wins, absent metadata
    # falls back to the reference's resnet50).
    from ..checkpoint import resolve_model_cfg
    cfg = NameSpace({"model": resolve_model_cfg(ckpt, args.model_variant),
                     "data": {"reader": args.reader},
                     "workers": args.workers,
                     "seed": 42})
    model = engine.build_model(cfg, n_classes)
    # Evaluation never steps the optimizer: identity avoids allocating
    # Adam moment buffers (~200 MB for ResNet-50) that restore_opt=False
    # would discard anyway.
    import optax
    state = engine.create_state(model, jax.random.PRNGKey(42),
                                optax.identity(),
                                image_size=args.image_size)
    # Accepts this framework's checkpoints AND the reference's published
    # torch checkpoints (auto-converted).
    state, start_epoch, best_score = load_weights_any_format(
        ckpt, state, model, image_size=args.image_size)
    state = jax.device_put(state, replicated(mesh))
    log.info(f"Loaded {ckpt} (epoch {start_epoch}, score {best_score:.3f})")

    forward = engine.make_forward_step(mesh)
    reader = engine._make_reader(cfg, crop=args.image_size)
    for split, ds in (("val", val_ds), ("test", test_ds)):
        pipe = pipeline_from_dataset(
            ds, args.batch_size, is_training=False, seed=42,
            num_workers=args.workers, reader=reader,
            sharding=batch_sharding(mesh),
            process_index=jax.process_index(),
            process_count=jax.process_count())
        gt, logits, features, scores = engine.get_arrays(
            state, pipe, forward_step=forward)
        pipe.close()
        file_path = out_dir / f"{args.loss}_{split}_arr{suffix}.npz"
        # get_arrays allgathers the full arrays to every process; only the
        # lead writes the (shared) output file.
        if jax.process_index() == 0:
            np.savez(file_path, gt=gt, logits=logits, features=features,
                     scores=scores)
            log.info(f"Target labels, logits, features and scores saved "
                     f"in: {file_path}")


if __name__ == "__main__":
    main()
