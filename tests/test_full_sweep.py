"""Full paper suite at tiny scale: 3 losses x 3 protocols -> report.

Mirrors the reference's intended workflow end to end (SURVEY.md §3.2-3.4):
nine training runs into the ``Protocol_{p}`` layout, score extraction for
each, and one plot invocation producing the combined 3-protocol PDF and
LaTeX table.
"""

import csv
from pathlib import Path

import numpy as np
import pytest

from openset_imagenet_tpu.config import NameSpace
from openset_imagenet_tpu import train as engine
from tests.test_engine import tiny_cfg

LOSSES = ("softmax", "garbage", "entropic")
PROTOCOLS = (1, 2, 3)


def write_csvs(root: Path, protocol: int, n_known=3):
    rng = np.random.default_rng(protocol)
    for split in ("train", "val", "test"):
        low = -2 if split == "test" else -1
        rows = [(f"n/{split}_{i}_p{protocol}.JPEG",
                 int(rng.integers(low, n_known))) for i in range(24)]
        rows += [(f"n/{split}_x{c}_p{protocol}.JPEG", c)
                 for c in range(low, n_known)]
        with open(root / f"p{protocol}_{split}.csv", "w", newline="") as f:
            csv.writer(f).writerows(rows)


@pytest.mark.slow
def test_three_by_three_sweep_and_report(tmp_path, monkeypatch):
    from openset_imagenet_tpu.script.evaluate import main as evaluate_main
    from openset_imagenet_tpu.script.plot_all import main as plot_main

    for p in PROTOCOLS:
        write_csvs(tmp_path, p)

    exp = tmp_path / "experiments"
    for p in PROTOCOLS:
        for loss in LOSSES:
            cfg = tiny_cfg(tmp_path, loss, epochs=1)
            cfg.data.train_file = str(tmp_path / "p{}_train.csv")
            cfg.data.val_file = str(tmp_path / "p{}_val.csv")
            cfg.protocol = p
            cfg.output_directory = exp / f"Protocol_{p}"
            cfg.log_name = f"{loss}.log"
            engine.worker(cfg)
            evaluate_main([loss, str(p),
                           "--imagenet-directory", str(tmp_path),
                           "--protocol-directory", str(tmp_path),
                           "--output-directory",
                           str(exp / f"Protocol_{p}"),
                           "--batch-size", "8", "--workers", "2",
                           "--image-size", "32", "--model-variant", "tiny",
                           "--reader", "synthetic"])

    monkeypatch.chdir(tmp_path)
    plot_main(["--output-directory", str(exp),
               "--imagenet-directory", str(tmp_path),
               "--protocol-directory", str(tmp_path)])

    assert Path("Results_last.pdf").stat().st_size > 10000
    table = Path("Results_last.tex").read_text()
    assert table.count("\\\\") == 9      # one row per (protocol, loss)
    assert table.count("\\midrule") == 2  # separators between protocols
    for p in PROTOCOLS:
        assert f"$P_{p}$ - S &" in table
