"""TF SavedModel export: jax2tf round-trip + CLI.

The SavedModel must reproduce the live serving forward (weights baked
in), serve multiple batch sizes from one bundle (polymorphic batch), and
carry the same serving-config metadata as the StableHLO bundle.  Skipped
wholesale when tensorflow is not installed (it is an optional, lazily
imported dependency of tf_export only).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from openset_imagenet_tpu import train as engine
from openset_imagenet_tpu.export import assert_close_bf16, build_serving_fn
from tests.test_engine import tiny_cfg, write_protocol_csvs


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("tf_export")
    write_protocol_csvs(root)
    cfg = tiny_cfg(root, "entropic", epochs=1)
    engine.worker(cfg)
    return cfg.output_directory / "entropic_best.pth"


def test_savedmodel_roundtrip_symbolic_batch(trained, tmp_path):
    """One bundle serves several batch sizes and matches the live jit."""
    from openset_imagenet_tpu.tf_export import (export_savedmodel,
                                                load_savedmodel)

    live = build_serving_fn(trained, 3, variant="tiny", image_size=32)
    out = export_savedmodel(live, tmp_path / "m.savedmodel",
                            image_size=32, meta={"n_classes": 3})
    fn = load_savedmodel(out)
    assert fn.meta["n_classes"] == 3
    for n in (1, 3, 5):
        imgs = np.random.default_rng(n).integers(
            0, 256, (n, 32, 32, 3), dtype=np.uint8)
        got = fn(imgs)
        want = live(imgs)
        for g, w, name in zip(got, want, ("logits", "features", "scores")):
            assert g.shape[0] == n
            assert_close_bf16(g, w, name)


def test_savedmodel_signature_names_and_tf_consumer(trained, tmp_path):
    """A plain-TF consumer (no package import) reads named outputs."""
    from openset_imagenet_tpu.tf_export import (OUTPUT_NAMES,
                                                export_savedmodel)

    live = build_serving_fn(trained, 3, variant="tiny", image_size=32)
    out = export_savedmodel(live, tmp_path / "m.savedmodel", image_size=32)
    loaded = tf.saved_model.load(str(out))
    sig = loaded.signatures["serving_default"]
    imgs = np.zeros((2, 32, 32, 3), np.uint8)
    res = sig(images=tf.constant(imgs))
    assert set(OUTPUT_NAMES) <= set(res)
    probs = np.asarray(res["scores"])
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-3)


def test_savedmodel_fixed_batch_rejects_other_shapes(trained, tmp_path):
    from openset_imagenet_tpu.tf_export import (export_savedmodel,
                                                load_savedmodel)

    live = build_serving_fn(trained, 3, variant="tiny", image_size=32)
    out = export_savedmodel(live, tmp_path / "m.savedmodel",
                            image_size=32, batch_size=2)
    fn = load_savedmodel(out)
    got = fn(np.zeros((2, 32, 32, 3), np.uint8))
    assert got[0].shape == (2, 3)
    with pytest.raises(Exception):
        fn(np.zeros((3, 32, 32, 3), np.uint8))


def test_export_cli_savedmodel_validate(trained, tmp_path):
    """CLI --format savedmodel writes bundle + config and self-validates."""
    from openset_imagenet_tpu.script import export as cli
    from openset_imagenet_tpu.tf_export import read_metadata

    out = tmp_path / "cli.savedmodel"
    ret = cli.main([str(trained), "3", "--model-variant", "tiny",
                    "--image-size", "32", "--format", "savedmodel",
                    "-o", str(out), "--validate",
                    "--mode", "softmax", "--threshold", "0.25"])
    assert ret == str(out)
    meta = read_metadata(out)
    assert meta["n_classes"] == 3 and meta["image_size"] == 32
    assert meta["threshold"] == 0.25
    assert "platforms" not in meta   # TF runtime owns placement
    assert (out / "saved_model.pb").exists()


def test_predictor_rejects_savedmodel_with_clear_error(trained, tmp_path):
    """A SavedModel dir handed to the jax predictor fails with guidance
    (it runs on the TF runtime), not a cryptic checkpoint-read error."""
    from openset_imagenet_tpu.inference import OpenSetPredictor
    from openset_imagenet_tpu.tf_export import export_savedmodel

    live = build_serving_fn(trained, 3, variant="tiny", image_size=32)
    out = export_savedmodel(live, tmp_path / "m.savedmodel", image_size=32)
    with pytest.raises(ValueError, match="TF SavedModel"):
        OpenSetPredictor(out, n_classes=3, image_size=32)


def test_read_metadata_degrades_to_empty(tmp_path):
    from openset_imagenet_tpu.tf_export import metadata_path, read_metadata

    assert read_metadata(tmp_path / "missing.savedmodel") == {}
    bundle = tmp_path / "m.savedmodel"
    bundle.mkdir()
    metadata_path(bundle).write_text("{not json")
    assert read_metadata(bundle) == {}
    metadata_path(bundle).write_text("[1, 2]")   # wrong type
    assert read_metadata(bundle) == {}


def test_savedmodel_int8_roundtrip(trained, tmp_path):
    """The quantized graph lowers through jax2tf too (TF-Serving path)."""
    from openset_imagenet_tpu.tf_export import (export_savedmodel,
                                                load_savedmodel)

    calib = np.random.default_rng(41).integers(
        0, 256, (8, 32, 32, 3), dtype=np.uint8)
    live = build_serving_fn(trained, 3, variant="tiny", image_size=32,
                            optimize="int8", calibration=calib)
    out = export_savedmodel(live, tmp_path / "q.savedmodel",
                            image_size=32, meta={"optimize": "int8"})
    fn = load_savedmodel(out)
    assert fn.meta["optimize"] == "int8"
    for n in (2, 5):
        imgs = np.random.default_rng(n).integers(
            0, 256, (n, 32, 32, 3), dtype=np.uint8)
        for g, w, name in zip(fn(imgs), live(imgs),
                              ("logits", "features", "scores")):
            assert_close_bf16(g, w, name)
