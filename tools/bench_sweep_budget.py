"""Measured mini-sweep at production config (VERDICT round-4 #6).

BENCH.md's <24 h sweep projection was built from device throughput
alone; this tool (a) validates the ``train_imagenet_all`` sweep driver
end to end at PRODUCTION model config (ResNet-50, 224 px, ghost-64,
batch 256, pipeline-fed JPEG decode) on whatever backend it runs on,
and (b) measures every per-term cost the full budget needs:

* first-epoch wall (compile + warmup) vs steady-state epoch wall,
* per-epoch train time (``t:``) and validation time (``v:``) from the
  worker's own epoch log lines,
* pipeline-fed training throughput (imgs/s — on the dev tunnel this is
  host->device-bound at ~42 MB/s; on a real TPU host it is decode-bound
  at ~773 imgs/s/core),
* checkpoint overhead (async writer: the epoch loop cost is the
  snapshot dispatch only).

The dataset is the drive's synthetic color-class world re-rendered at
224 px through the REAL protocol builder, so the sweep exercises the
exact production path: protocols CSV -> native batch decode ->
masked-tail training -> per-epoch validation -> async checkpoints.

Usage (chip):
    python tools/bench_sweep_budget.py --train-n 120 --epochs 3
CPU smoke:
    OSI_JAX_PLATFORM=cpu python tools/bench_sweep_budget.py \
        --variant tiny --image-size 64 --batch 16 --train-n 12 --epochs 2
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from drive_cli import (DOG, KN_COLORS, NEGS, build_metadata,  # noqa: E402
                       leaf_color, run)


def build_imagenet_hires(root: Path, leaves, size: int, train_n: int,
                         val_n: int):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n in (("train", train_n), ("val", val_n)):
        for group in leaves.values():
            for wnid in group:
                d = root / split / wnid
                d.mkdir(parents=True)
                for k in range(n):
                    arr = np.clip(rng.normal(0, 18, (size, size, 3))
                                  + leaf_color(leaves, wnid), 0, 255)
                    Image.fromarray(arr.astype(np.uint8)).save(
                        d / f"{wnid}_{k}.JPEG", quality=92)


EPOCH_RE = re.compile(
    r"ep:(\d+) .*'imgs/s': ([\d.]+).* t:([\d.]+)s v:([\d.]+)s")


def parse_epochs(log_text: str):
    out = []
    for line in log_text.splitlines():
        m = EPOCH_RE.search(line)
        if m:
            out.append({"epoch": int(m.group(1)),
                        "imgs_per_s": float(m.group(2)),
                        "train_s": float(m.group(3)),
                        "val_s": float(m.group(4))})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="resnet50")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ghost", type=int, default=64)
    ap.add_argument("--train-n", type=int, default=120,
                    help="images per leaf class (12 leaves)")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--losses", nargs="+",
                    default=("entropic", "softmax", "garbage"))
    args = ap.parse_args()

    root = Path(tempfile.mkdtemp(prefix="osi_sweep_"))
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   str(ROOT / "tests" / ".jax_cache"))

    t0 = time.time()
    leaves = build_metadata(root / "meta")
    build_imagenet_hires(root, leaves, args.image_size, args.train_n,
                         max(args.train_n // 2, 4))
    data_s = time.time() - t0
    run("protocols", ["openset_imagenet_tpu.script.protocols",
                      "--protocols", "1",
                      "--imagenet-directory", root,
                      "--metadata-directory", root / "meta",
                      "--output-directory", root / "protocols"],
        env, root)
    n_train = len((root / "protocols" / "p1_train.csv")
                  .read_text().strip().splitlines())
    print(json.dumps({"setup_s": round(data_s, 1),
                      "n_train_rows": n_train}), flush=True)

    out_root = root / "experiments"
    cfg = f"""
name: sweep
checkpoint: null
log_name: sweep.log
train_mode: train
gpu: null
parallel: true
data:
  imagenet_path: {root}
  train_file: {root}/protocols/p{{}}_train.csv
  val_file: {root}/protocols/p{{}}_val.csv
  test_file: {root}/protocols/p{{}}_test.csv
  reader: native_batch
  image_size: {args.image_size}
seed: 42
batch_size: {args.batch}
epochs: {args.epochs}
workers: 2
patience: 0
loss:
  type: entropic
  w: 1.0
opt:
  type: adam
  lr: 0.001
  decay: 0
  gamma: 1
model:
  variant: {args.variant}
  bn_stats_rows: {args.ghost}
protocol: 1
output_directory: {out_root}
"""
    (root / "train.yaml").write_text(cfg)

    t0 = time.time()
    run("train_all", ["openset_imagenet_tpu.script.train_all",
                      "--configuration", root / "train.yaml",
                      "--protocols", "1",
                      "--loss-functions", *args.losses,
                      "--output-directory", out_root,
                      "--nice", "0"],
        env, root)
    sweep_wall = time.time() - t0

    budget = {"sweep_wall_s": round(sweep_wall, 1),
              "n_train_rows": n_train, "epochs": args.epochs,
              "losses": list(args.losses), "per_loss": {}}
    for loss in args.losses:
        log_file = out_root / "Protocol_1" / f"{loss}.log"
        epochs = parse_epochs(log_file.read_text())
        if not epochs:
            raise SystemExit(f"no epoch lines parsed from {log_file}")
        steady = epochs[1:] or epochs
        budget["per_loss"][loss] = {
            "first_epoch_s": round(epochs[0]["train_s"], 1),
            "steady_epoch_s": round(
                float(np.median([e["train_s"] for e in steady])), 1),
            "steady_imgs_per_s": round(
                float(np.median([e["imgs_per_s"] for e in steady])), 1),
            "steady_val_s": round(
                float(np.median([e["val_s"] for e in steady])), 1),
        }
        ckpt = out_root / "Protocol_1" / f"{loss}_curr.pth"
        if not ckpt.exists():
            raise SystemExit(f"sweep did not produce {ckpt}")
    print(json.dumps(budget), flush=True)

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
