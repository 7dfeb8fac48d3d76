"""``train_imagenet`` CLI: train one (protocol, loss) run.

Parity with reference ``script/train.py:8-67``: positional YAML config +
protocol, ``-o/--output-directory``, ``-g/--gpu`` (pins the run's mesh to
one device index — the JAX equivalent of the reference's per-process GPU
selection), ``--nice`` process priority; the CLI overlays those fields onto
the loaded config and calls the engine worker.
"""

from __future__ import annotations

import argparse
import os
import pathlib

from ..config import load_yaml
from ..train import worker


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "train_imagenet",
        description="Train an open-set ImageNet model (TPU-native)")
    parser.add_argument("configuration", type=pathlib.Path,
                        help="Filename of the training configuration (YAML)")
    parser.add_argument("protocol", type=int, choices=(1, 2, 3),
                        help="Open-set protocol: 1, 2 or 3")
    parser.add_argument("-o", "--output-directory", default=".",
                        type=pathlib.Path,
                        help="Directory for trained models and logs")
    parser.add_argument("-g", "--gpu", type=int, nargs="?", default=None,
                        const=0,
                        help="Pin this run to one device index (its mesh "
                             "uses only that chip); omit to data-"
                             "parallelise over the whole mesh")
    parser.add_argument("--nice", type=int, default=20,
                        help="Process niceness (os.nice)")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    try:
        # Parity with the reference CLI: training runs niced by default
        # (os.nice(20) unless --nice overrides).
        os.nice(args.nice)
    except (OSError, AttributeError):
        pass
    cfg = load_yaml(args.configuration)
    if args.gpu is not None:
        cfg.gpu = args.gpu
    cfg.protocol = args.protocol
    cfg.output_directory = args.output_directory
    cfg.output_directory.mkdir(parents=True, exist_ok=True)
    worker(cfg)


if __name__ == "__main__":
    main()
