"""Deployment export: StableHLO artifact round-trip + CLI.

The artifact must reproduce the live serving forward (weights baked in),
serve multiple batch sizes from one file (symbolic batch), and refuse
shapes it was not exported for when the batch is fixed.
"""

import numpy as np
import pytest

from openset_imagenet_tpu import train as engine
from tests.test_engine import tiny_cfg, write_protocol_csvs

# bf16 model compute: two independently-compiled programs (the exported
# symbolic-batch module vs the live jit) agree only to bf16 precision —
# the scale-aware bound lives in export.assert_close_bf16.
from openset_imagenet_tpu.export import assert_close_bf16


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("export")
    write_protocol_csvs(root)
    cfg = tiny_cfg(root, "entropic", epochs=1)
    engine.worker(cfg)
    return cfg.output_directory / "entropic_best.pth"


def test_symbolic_export_roundtrip(trained, tmp_path):
    from openset_imagenet_tpu.export import (build_serving_fn,
                                             export_serving, load_serving,
                                             save_exported)

    exported = export_serving(trained, 3, variant="tiny", image_size=32)
    path = save_exported(exported, tmp_path / "m.stablehlo")
    assert path.stat().st_size > 0

    fn = load_serving(path)
    live = build_serving_fn(trained, 3, variant="tiny", image_size=32)
    rng = np.random.default_rng(0)
    # One artifact, two different batch sizes.
    for n in (2, 5):
        imgs = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
        got = fn(imgs)
        want = live(imgs)
        names = ("logits", "features", "scores")
        for g, w, name in zip(got, want, names, strict=True):
            assert np.asarray(g).shape == (n, 3)
            assert_close_bf16(g, w, name)


def test_exported_scores_match_predictor(trained, tmp_path):
    """The artifact's scores drive the same decisions as the predictor."""
    from openset_imagenet_tpu.export import (export_serving, load_serving,
                                             save_exported)
    from openset_imagenet_tpu.inference import OpenSetPredictor

    fn = load_serving(save_exported(
        export_serving(trained, 3, variant="tiny", image_size=32),
        tmp_path / "m.stablehlo"))
    pred = OpenSetPredictor(trained, n_classes=3, variant="tiny",
                            image_size=32)
    imgs = np.random.default_rng(1).integers(
        0, 256, (4, 32, 32, 3), dtype=np.uint8)
    _, _, scores = fn(imgs)
    classes, conf = pred.predict(imgs)
    np.testing.assert_array_equal(np.argmax(np.asarray(scores), -1),
                                  classes)
    assert_close_bf16(np.max(np.asarray(scores), -1), conf, "conf")


def test_assert_close_bf16_bound():
    """Scale-aware: 1% of (1 + max|want|); NaNs and big diffs fail."""
    want = np.array([10.0, -5.0])
    assert_close_bf16(want + 0.05, want)              # within 1% of 11
    with pytest.raises(AssertionError, match="bf16"):
        assert_close_bf16(want + 0.2, want)
    with pytest.raises(AssertionError):
        assert_close_bf16(np.array([np.nan, 0.0]), want)
    # Small-scale outputs (scores) get the absolute floor, not 1% rel.
    assert_close_bf16(np.array([0.001]), np.array([0.002]))


def test_fixed_batch_export_rejects_other_shapes(trained, tmp_path):
    from openset_imagenet_tpu.export import (export_serving, load_serving,
                                             save_exported)

    fn = load_serving(save_exported(
        export_serving(trained, 3, variant="tiny", image_size=32,
                       batch_size=4),
        tmp_path / "m4.stablehlo"))
    rng = np.random.default_rng(2)
    out = fn(rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8))
    assert np.asarray(out[2]).shape == (4, 3)
    with pytest.raises(Exception):
        fn(rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8))


def test_predictor_serves_artifact(trained, tmp_path):
    """OpenSetPredictor accepts a .stablehlo artifact: same decisions as
    the checkpoint-backed predictor, geometry validated up front, mesh
    refused."""
    from openset_imagenet_tpu.export import export_serving, save_exported
    from openset_imagenet_tpu.inference import OpenSetPredictor

    art = save_exported(
        export_serving(trained, 3, variant="tiny", image_size=32),
        tmp_path / "m.stablehlo")
    imgs = np.random.default_rng(3).integers(
        0, 256, (6, 32, 32, 3), dtype=np.uint8)
    from_art = OpenSetPredictor(art, n_classes=3, image_size=32)
    from_ckpt = OpenSetPredictor(trained, n_classes=3, variant="tiny",
                                 image_size=32)
    cls_a, conf_a = from_art.predict(imgs)
    cls_c, conf_c = from_ckpt.predict(imgs)
    np.testing.assert_array_equal(cls_a, cls_c)
    assert_close_bf16(conf_a, conf_c, "conf")

    with pytest.raises(ValueError, match="n_classes"):
        OpenSetPredictor(art, n_classes=7, image_size=32)
    with pytest.raises(ValueError, match="image_size"):
        OpenSetPredictor(art, n_classes=3, image_size=64)
    import jax
    from openset_imagenet_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError, match="sharding"):
        OpenSetPredictor(art, n_classes=3, image_size=32,
                         mesh=make_mesh(num_devices=len(jax.devices())))


def test_predict_cli_serves_artifact(trained, tmp_path):
    """The deployment loop closes: export once, serve the artifact with
    the same predict_imagenet CLI (rejection machinery intact)."""
    import csv

    from PIL import Image

    from openset_imagenet_tpu.export import export_serving, save_exported
    from openset_imagenet_tpu.script import predict as cli

    art = save_exported(
        export_serving(trained, 3, variant="tiny", image_size=32),
        tmp_path / "m.stablehlo")
    rng = np.random.default_rng(4)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                     dtype=np.uint8)).save(
            tmp_path / f"img{i}.jpg", quality=95)
    out = tmp_path / "pred.csv"
    cli.main([str(art), "3", str(tmp_path), "--image-size", "32",
              "-o", str(out)])
    with out.open(newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["path", "prediction", "score"]
    assert len(rows) == 4
    assert all(int(r[1]) in (0, 1, 2) for r in rows[1:])


def test_predictor_serves_fixed_batch_artifact(trained, tmp_path):
    """Fixed-batch artifacts pad every request to B; bigger requests and
    warmup fail/stop cleanly instead of crashing inside the program."""
    from openset_imagenet_tpu.export import export_serving, save_exported
    from openset_imagenet_tpu.inference import OpenSetPredictor

    art = save_exported(
        export_serving(trained, 3, variant="tiny", image_size=32,
                       batch_size=4),
        tmp_path / "m4.stablehlo")
    pred = OpenSetPredictor(art, n_classes=3, image_size=32)
    imgs = np.random.default_rng(5).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    classes, _ = pred.predict(imgs)          # 2 pads to the fixed 4
    assert classes.shape == (2,)
    pred.warmup(max_batch=256)               # capped at the one shape
    with pytest.raises(ValueError, match="fixed batch"):
        pred.predict(np.zeros((5, 32, 32, 3), np.uint8))
    # Chunking in <=B requests serves arbitrarily long inputs.
    big = np.random.default_rng(6).integers(
        0, 256, (7, 32, 32, 3), dtype=np.uint8)
    got = [pred.predict(big[i:i + 4])[0] for i in range(0, 7, 4)]
    assert sum(len(c) for c in got) == 7


def test_export_cli_auto_variant_records_resolved_arch(trained, tmp_path):
    """--model-variant omitted: the CLI resolves the variant from the
    checkpoint's arch metadata and the provenance sidecar records the
    architecture actually built (never null)."""
    from openset_imagenet_tpu.export import load_serving
    from openset_imagenet_tpu.script import export as cli

    art = tmp_path / "auto.stablehlo"
    cli.main([str(trained), "3", "--image-size", "32",
              "--platforms", "cpu", "-o", str(art)])
    assert load_serving(art).meta["variant"] == "tiny"


def test_bundle_metadata_roundtrip(trained, tmp_path):
    """The export CLI writes a serving-config sidecar; the predictor
    resolves unset arguments from it, explicit arguments override it."""
    from openset_imagenet_tpu.export import load_serving, metadata_path
    from openset_imagenet_tpu.inference import OpenSetPredictor
    from openset_imagenet_tpu.script import export as cli

    art = tmp_path / "bundle.stablehlo"
    cli.main([str(trained), "3", "--model-variant", "tiny",
              "--image-size", "32", "--platforms", "cpu", "-o", str(art),
              "--mode", "objectosphere", "--threshold", "0.25"])
    side = metadata_path(art)
    assert side.exists()
    meta = load_serving(art).meta
    assert meta["mode"] == "objectosphere"
    assert meta["threshold"] == 0.25
    assert meta["n_classes"] == 3 and meta["image_size"] == 32
    assert meta["has_background"] is False
    assert meta["source_checkpoint"] == trained.name

    # Zero re-specified configuration: geometry from the shapes, serving
    # config from the sidecar.
    pred = OpenSetPredictor(art)
    assert (pred.n_classes, pred.image_size) == (3, 32)
    assert (pred.mode, pred.threshold) == ("objectosphere", 0.25)
    assert pred.has_background is False
    # Explicit arguments beat the bundle.
    over = OpenSetPredictor(art, mode="softmax", threshold=0.0,
                            has_background=True)
    assert (over.mode, over.threshold, over.has_background) == \
        ("softmax", 0.0, True)

    # The bundle's operating point changes decisions exactly like the
    # equivalent explicit flags on a checkpoint predictor.
    imgs = np.random.default_rng(7).integers(
        0, 256, (4, 32, 32, 3), dtype=np.uint8)
    want = OpenSetPredictor(trained, n_classes=3, variant="tiny",
                            image_size=32, mode="objectosphere",
                            threshold=0.25)
    np.testing.assert_array_equal(pred.predict(imgs)[0],
                                  want.predict(imgs)[0])


def test_save_exported_without_meta_removes_stale_sidecar(trained,
                                                          tmp_path):
    from openset_imagenet_tpu.export import (export_serving, metadata_path,
                                             read_metadata, save_exported)

    exported = export_serving(trained, 3, variant="tiny", image_size=32)
    path = tmp_path / "m.stablehlo"
    save_exported(exported, path, meta={"format": 1, "threshold": 0.9})
    assert read_metadata(path)["threshold"] == 0.9
    save_exported(exported, path)        # re-export without a config
    assert not metadata_path(path).exists()
    assert read_metadata(path) == {}     # and corrupt json degrades too
    metadata_path(path).write_text("{not json")
    assert read_metadata(path) == {}


def test_predict_cli_auto_serves_bundle(trained, tmp_path):
    """predict_imagenet <artifact> auto <imgs>: no geometry, no serving
    flags — everything resolves from the bundle; 'auto' on a raw .pth
    infers n_classes from the checkpoint's logits head."""
    import csv

    from PIL import Image

    from openset_imagenet_tpu.script import export as ecli
    from openset_imagenet_tpu.script import predict as pcli

    art = tmp_path / "bundle.stablehlo"
    ecli.main([str(trained), "3", "--model-variant", "tiny",
               "--image-size", "32", "--platforms", "cpu", "-o", str(art),
               "--threshold", "0.999999"])
    rng = np.random.default_rng(8)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                     np.uint8)).save(img_dir / f"i{i}.png")
    out = tmp_path / "pred.csv"
    rc = pcli.main([str(art), "auto", str(img_dir), "-o", str(out)])
    assert rc == 0
    with out.open(newline="") as f:
        rows = list(csv.reader(f))[1:]
    # The bundle's near-1 threshold rejects everything on a tiny
    # random-image model: the baked-in operating point was applied.
    assert [int(r[1]) for r in rows] == [-1, -1, -1]
    # Explicit flag overrides the bundle: rejection off again.
    out2 = tmp_path / "pred2.csv"
    pcli.main([str(art), "auto", str(img_dir), "-o", str(out2),
               "--threshold", "0"])
    with out2.open(newline="") as f:
        rows2 = list(csv.reader(f))[1:]
    assert all(int(r[1]) >= 0 for r in rows2)

    # 'auto' works for a raw checkpoint too: n_classes read from the
    # logits head (geometry stays explicit — no sidecar to resolve from).
    out3 = tmp_path / "pred3.csv"
    rc = pcli.main([str(trained), "auto", str(img_dir),
                    "--model-variant", "tiny", "--image-size", "32",
                    "-o", str(out3)])
    assert rc == 0
    with out3.open(newline="") as f:
        rows3 = list(csv.reader(f))[1:]
    assert [r[1] for r in rows3] == [r[1] for r in rows2]


def test_export_cli_threshold_at_fpr(trained, tmp_path):
    """--threshold-at-fpr bakes the calibrated operating point into the
    bundle, identical to serve-time calibration on the same arrays."""
    from openset_imagenet_tpu.export import read_metadata
    from openset_imagenet_tpu.inference import calibrate_threshold
    from openset_imagenet_tpu.script import export as cli

    rng = np.random.default_rng(9)
    arr = tmp_path / "val_arr.npz"
    scores = rng.dirichlet(np.ones(3), size=20).astype(np.float32)
    np.savez(arr, gt=np.array([1] * 10 + [-1] * 10),
             features=rng.normal(size=(20, 3)).astype(np.float32),
             scores=scores)
    art = tmp_path / "cal.stablehlo"
    cli.main([str(trained), "3", "--model-variant", "tiny",
              "--image-size", "32", "--platforms", "cpu", "-o", str(art),
              "--threshold-at-fpr", "0.2", "--calibrate", str(arr)])
    meta = read_metadata(art)
    want = calibrate_threshold(arr, 0.2, "softmax", False)
    assert meta["threshold"] == pytest.approx(want)
    assert meta["threshold_fpr_target"] == 0.2

    with pytest.raises(SystemExit):   # calibration flags stay coupled
        cli.main([str(trained), "3", "--threshold-at-fpr", "0.2"])
    with pytest.raises(SystemExit):
        cli.main([str(trained), "3", "--calibrate", str(arr)])


def test_export_cli_writes_and_validates(trained, tmp_path, monkeypatch):
    from openset_imagenet_tpu.script import export as cli

    out = tmp_path / "artifact.stablehlo"
    written = cli.main([str(trained), "3", "--model-variant", "tiny",
                        "--image-size", "32", "-o", str(out),
                        "--platforms", "cpu", "--validate"])
    assert written == str(out)
    assert out.stat().st_size > 0

    # Default output naming: checkpoint stem + .stablehlo next to it.
    monkeypatch.chdir(tmp_path)
    import shutil
    shutil.copy(trained, tmp_path / "ck.pth")
    written = cli.main(["ck.pth", "3", "--model-variant", "tiny",
                        "--image-size", "32", "--platforms", "cpu"])
    assert written.endswith("ck.stablehlo")


def test_int8_export_roundtrip_and_cli(trained, tmp_path):
    """An int8-optimized graph exports (scales baked in — the deployment
    site needs no calibration data) and matches the live int8 forward;
    the CLI wires --optimize int8 --calibration-images and records the
    mode in the sidecar."""
    from PIL import Image

    from openset_imagenet_tpu.export import (build_serving_fn,
                                             export_serving, load_serving,
                                             read_metadata, save_exported)
    from openset_imagenet_tpu.script import export as cli

    rng = np.random.default_rng(21)
    calib = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    exported = export_serving(trained, 3, variant="tiny", image_size=32,
                              optimize="int8", calibration=calib,
                              platforms=("cpu",))
    fn = load_serving(save_exported(exported, tmp_path / "q.stablehlo"))
    live = build_serving_fn(trained, 3, variant="tiny", image_size=32,
                            optimize="int8", calibration=calib)
    for n in (2, 5):  # symbolic batch survives the optimized graph
        imgs = rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)
        for g, w, name in zip(fn(imgs), live(imgs),
                              ("logits", "features", "scores"),
                              strict=True):
            assert_close_bf16(g, w, name)

    img_dir = tmp_path / "calib"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), np.uint8)).save(
            img_dir / f"c{i}.jpg")
    art = tmp_path / "cli_q.stablehlo"
    cli.main([str(trained), "3", "--model-variant", "tiny",
              "--image-size", "32", "--platforms", "cpu", "-o", str(art),
              "--optimize", "int8", "--calibration-images", str(img_dir),
              "--validate"])
    assert read_metadata(art)["optimize"] == "int8"

    # Arg contract: int8 needs calibration images; calibration images
    # need int8.
    with pytest.raises(SystemExit):
        cli.main([str(trained), "3", "-o", str(art), "--optimize", "int8"])
    with pytest.raises(SystemExit):
        cli.main([str(trained), "3", "-o", str(art),
                  "--calibration-images", str(img_dir)])
