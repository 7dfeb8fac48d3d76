"""Integration: train -> evaluate -> plot CLI chain on synthetic data.

Covers SURVEY.md call stacks 3.1/3.3/3.4 end to end, in process (no
subprocess so the virtual 8-device CPU platform from conftest applies).
"""

from pathlib import Path

import numpy as np
import pytest

from tests.test_engine import tiny_cfg, write_protocol_csvs


@pytest.fixture(scope="module")
def trained_runs(tmp_path_factory):
    """Train tiny models for all three losses into Protocol_1 layout."""
    from openset_imagenet_tpu import train as engine

    from openset_imagenet_tpu.script.evaluate import main as evaluate_main

    root = tmp_path_factory.mktemp("chain")
    write_protocol_csvs(root, n_train=32, n_val=24)
    out = root / "experiments" / "Protocol_1"
    for loss in ("softmax", "garbage", "entropic"):
        cfg = tiny_cfg(root, loss, epochs=1)
        cfg.output_directory = out
        cfg.log_name = f"{loss}.log"
        engine.worker(cfg)
        for extra in ([], ["--use-best"]):
            evaluate_main([loss, "1", *extra,
                           "--imagenet-directory", str(root),
                           "--protocol-directory", str(root),
                           "--output-directory", str(out),
                           "--batch-size", "8", "--workers", "2",
                           "--image-size", "32", "--model-variant", "tiny",
                           "--reader", "synthetic"])
    return root, out


def test_evaluate_cli(trained_runs):
    root, out = trained_runs
    for loss in ("softmax", "garbage", "entropic"):
        assert (out / f"{loss}_test_arr_best.npz").exists()
        for split in ("val", "test"):
            path = out / f"{loss}_{split}_arr_curr.npz"
            assert path.exists()
            arr = np.load(path)
            assert set(arr.files) == {"gt", "logits", "features", "scores"}
            n = len(arr["gt"])
            assert arr["scores"].shape[0] == n
            # Scores are softmax: rows sum to 1.
            np.testing.assert_allclose(arr["scores"].sum(1), 1.0, rtol=1e-4)
            # garbage keeps BG column: 3 knowns + BG = 4; others 3.
            expect_c = 4 if loss == "garbage" else 3
            assert arr["scores"].shape[1] == expect_c, loss


def test_plot_cli(trained_runs, tmp_path, monkeypatch):
    root, out = trained_runs
    from openset_imagenet_tpu.script.plot_all import main

    monkeypatch.chdir(tmp_path)
    main(["--protocols", "1",
          "--loss-functions", "softmax", "garbage", "entropic",
          "--labels", "S", "BG", "EOS",
          "--output-directory", str(out.parent),
          "--imagenet-directory", str(root),
          "--protocol-directory", str(root)])
    assert Path("Results_last.pdf").exists()
    table = Path("Results_last.tex").read_text()
    # One row per loss with 4 CCR columns + epoch + 2 confidences.
    assert table.count("\\\\") == 3
    assert "$P_1$ - S &" in table and "$P_1$ - EOS &" in table

    # Variants: best / linear / by-loss naming.
    main(["--protocols", "1", "--use-best",
          "--output-directory", str(out.parent),
          "--imagenet-directory", str(root),
          "--protocol-directory", str(root)])
    assert Path("Results_best.pdf").exists()
    main(["--protocols", "1", "--linear", "--sort-by-loss",
          "--output-directory", str(out.parent),
          "--imagenet-directory", str(root),
          "--protocol-directory", str(root)])
    assert Path("Results_linear_by_loss.pdf").exists()


def test_train_all_dry_run(trained_runs, tmp_path, monkeypatch):
    root, out = trained_runs
    from openset_imagenet_tpu.script.train_all import main

    cfg_file = root / "out" / "sweep.yaml"
    cfg_file.parent.mkdir(exist_ok=True)
    cfg = tiny_cfg(root, "entropic", epochs=1)
    cfg_file.write_text(cfg.dump())

    monkeypatch.chdir(tmp_path)
    main(["--configuration", str(cfg_file),
          "--protocols", "1", "--loss-functions", "softmax", "entropic",
          "--output-directory", str(tmp_path / "exp"), "--dry-run"])
    # Per-run configs materialised with mutated loss type.
    from openset_imagenet_tpu.config import load_yaml
    for loss in ("softmax", "entropic"):
        run_cfg = load_yaml(tmp_path / "exp" / "Protocol_1" / f"{loss}.yaml")
        assert run_cfg.loss.type == loss
        assert run_cfg.name == loss
        assert run_cfg.log_name == f"{loss}.log"


def test_train_all_continue_probes_checkpoint(trained_runs, tmp_path):
    root, out = trained_runs
    from openset_imagenet_tpu.script.train_all import main
    from openset_imagenet_tpu.config import load_yaml

    cfg_file = root / "out" / "sweep2.yaml"
    cfg_file.parent.mkdir(exist_ok=True)
    cfg = tiny_cfg(root, "entropic", epochs=1)
    cfg_file.write_text(cfg.dump())

    # out.parent is .../experiments which contains Protocol_1 with _curr.pth
    main(["--configuration", str(cfg_file),
          "--protocols", "1", "--loss-functions", "entropic",
          "--output-directory", str(out.parent),
          "--continue-training", "--dry-run"])
    run_cfg = load_yaml(out / "entropic.yaml")
    assert str(run_cfg.checkpoint).endswith("entropic_curr.pth")


def test_plot_cli_single_run_grid(trained_runs, tmp_path, monkeypatch):
    """1 protocol x 1 loss must not crash the legend placement."""
    root, out = trained_runs
    from openset_imagenet_tpu.script.plot_all import main

    monkeypatch.chdir(tmp_path)
    main(["--protocols", "1", "--loss-functions", "entropic",
          "--labels", "EOS",
          "--output-directory", str(out.parent),
          "--imagenet-directory", str(root),
          "--protocol-directory", str(root)])
    assert Path("Results_last.pdf").exists()
    assert Path("Results_last.tex").read_text().count("\\\\") == 1
