"""``train_imagenet_all`` CLI: the 3 losses x 3 protocols paper sweep.

Parity with reference ``script/train_all.py:14-118``: same flags
(``--protocols`` default ``(3, 1, 2)``, ``--loss-functions``,
``--output-directory`` default ``experiments``, ``--gpus``, ``--nice``,
``--continue-training``), same per-run behavior — materialise a mutated YAML
config per (protocol, loss) under ``Protocol_{p}/``, probe for
``{loss}_curr.pth`` when continuing, and launch one training subprocess per
run.

TPU-first scheduling: the reference round-robins subprocesses over GPU
indexes because each run owns one GPU.  On a TPU host every run owns the
whole mesh, so the default is a single sequential queue (runs already
data-parallelise over all chips); ``--gpus`` is still honoured for
compatibility and for multi-accelerator hosts where per-process device
isolation applies.
"""

from __future__ import annotations

import argparse
import multiprocessing.pool
import os
import pathlib
import subprocess
import sys


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "train_imagenet_all",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--configuration", type=pathlib.Path,
                        default=pathlib.Path("config/train.yaml"),
                        help="The configuration file defining the experiment")
    parser.add_argument("--protocols", type=int, choices=(1, 2, 3),
                        nargs="+", default=(3, 1, 2),
                        help="Protocols to execute")
    parser.add_argument("--loss-functions", "-l", nargs="+",
                        choices=("entropic", "softmax", "garbage"),
                        default=("entropic", "softmax", "garbage"),
                        help="Loss functions to train")
    parser.add_argument("--output-directory", "-o", type=pathlib.Path,
                        default="experiments",
                        help="Directory to save trained models")
    parser.add_argument("--gpus", "-g", type=int, nargs="+",
                        help="Device indexes for process-parallel runs; "
                             "omit for one sequential queue (typical on TPU)")
    parser.add_argument("--nice", type=int, default=20,
                        help="Process priority")
    parser.add_argument("--continue-training", "-c", action="store_true",
                        help="Resume runs whose _curr checkpoint exists")
    parser.add_argument("--dry-run", action="store_true",
                        help="Print the run commands without executing")
    args = parser.parse_args(argv)
    args.parallel = args.gpus is not None and len(args.gpus) > 1
    return args


def commands(args):
    """Per-queue lists of training commands (one queue per device)."""
    from ..config import load_yaml

    queue_idx = 0
    n_queues = len(args.gpus) if args.gpus is not None else 1
    queues = [[] for _ in range(n_queues)]
    for protocol in args.protocols:
        for loss_function in args.loss_functions:
            config = load_yaml(args.configuration)
            outdir = os.path.join(args.output_directory,
                                  f"Protocol_{protocol}")
            config.loss.type = loss_function
            config.name = loss_function
            config.parallel = args.parallel
            config.log_name = loss_function + ".log"
            if args.continue_training:
                checkpoint_file = os.path.join(outdir,
                                               loss_function + "_curr.pth")
                if os.path.exists(checkpoint_file):
                    config.checkpoint = checkpoint_file

            config_file = os.path.join(outdir, loss_function + ".yaml")
            os.makedirs(outdir, exist_ok=True)
            with open(config_file, "w") as f:
                f.write(config.dump())

            call = [sys.executable, "-m", "openset_imagenet_tpu.script.train",
                    config_file, str(protocol),
                    "--output-directory", outdir, "--nice", str(args.nice)]
            if args.gpus is not None:
                call += ["--gpu", str(args.gpus[queue_idx])]
                queues[queue_idx].append(call)
                queue_idx = (queue_idx + 1) % n_queues
            else:
                queues[0].append(call)
    return queues


def run_queue(queue):
    for call in queue:
        print("Running experiment: " + " ".join(call))
        subprocess.call(call)


def main(argv=None):
    args = get_args(argv)
    queues = commands(args)
    if args.dry_run:
        for queue in queues:
            for call in queue:
                print(" ".join(call))
        return
    if args.parallel:
        with multiprocessing.pool.ThreadPool(len(args.gpus)) as pool:
            pool.map(run_queue, queues)
    else:
        for queue in queues:
            run_queue(queue)


if __name__ == "__main__":
    main()
