"""Serving path: OpenSetPredictor from a trained checkpoint + preemption."""

import os
import signal
import threading

import numpy as np
import pytest

from openset_imagenet_tpu import train as engine
from tests.test_engine import tiny_cfg, write_protocol_csvs


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    write_protocol_csvs(root)
    cfg = tiny_cfg(root, "entropic", epochs=1)
    engine.worker(cfg)
    return root, cfg


def test_predictor_classifies_and_rejects(trained):
    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    pred = OpenSetPredictor(ckpt, n_classes=3, variant="tiny",
                            image_size=32)
    images = np.random.default_rng(0).integers(
        0, 256, (8, 32, 32, 3), np.uint8)
    classes, scores = pred.predict(images)
    assert classes.shape == (8,)
    assert np.all((classes >= 0) & (classes < 3))
    assert np.all((scores > 0) & (scores <= 1))

    # Impossible threshold rejects everything.
    pred_rej = OpenSetPredictor(ckpt, n_classes=3, variant="tiny",
                                image_size=32, threshold=1.1)
    classes, _ = pred_rej.predict(images)
    assert np.all(classes == -1)

    # Objectosphere mode + features.  The returned score is the MODE'S
    # rejection measure (||feature|| * max-softmax), not raw max-softmax:
    # re-applying the threshold to it reconstructs the decisions.
    pred_os = OpenSetPredictor(ckpt, n_classes=3, variant="tiny",
                               image_size=32, threshold=1e9,
                               mode="objectosphere")
    classes, os_scores, feats = pred_os.predict(images,
                                                return_features=True)
    assert feats.shape == (8, 3)
    assert np.all(classes == -1)
    _, sm_scores = pred.predict(images)
    np.testing.assert_allclose(
        os_scores, sm_scores * np.linalg.norm(feats, axis=-1),
        rtol=1e-5, atol=1e-7)


def test_predictor_auto_detects_variant_from_checkpoint(trained):
    """No ``variant`` argument: the predictor rebuilds the architecture
    from the arch metadata the trainer stored in the checkpoint."""
    from openset_imagenet_tpu.checkpoint import infer_arch
    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    assert infer_arch(ckpt) == {"variant": "tiny",
                                "space_to_depth": False}
    pred = OpenSetPredictor(ckpt, image_size=32)  # no variant, no n_classes
    assert pred.n_classes == 3
    images = np.random.default_rng(2).integers(
        0, 256, (4, 32, 32, 3), np.uint8)
    explicit = OpenSetPredictor(ckpt, n_classes=3, variant="tiny",
                                image_size=32)
    np.testing.assert_array_equal(pred.predict(images)[0],
                                  explicit.predict(images)[0])


def test_garbage_predictor_excludes_background(trained):
    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, _ = trained
    cfg = tiny_cfg(root, "garbage", epochs=1)
    engine.worker(cfg)
    ckpt = cfg.output_directory / "garbage_best.pth"
    pred = OpenSetPredictor(ckpt, n_classes=4, variant="tiny",
                            image_size=32, has_background=True)
    images = np.random.default_rng(1).integers(
        0, 256, (6, 32, 32, 3), np.uint8)
    classes, _ = pred.predict(images)
    assert np.all(classes < 3)  # background index (3) never predicted


def test_bucket_helper_properties():
    """The shared predict/warmup bucket ladder: unit-divisible, >= n,
    idempotent on its own values, and minimal (halving would undershoot)."""
    from types import SimpleNamespace

    from openset_imagenet_tpu.inference import OpenSetPredictor

    bucket = OpenSetPredictor._bucket
    for unit in (1, 2, 3, 5, 8):
        fake = SimpleNamespace(_bucket_unit=unit, _fixed_batch=None)
        for n in range(0, 80):
            b = bucket(fake, n)
            assert b % unit == 0 and b >= max(n, unit), (unit, n, b)
            assert bucket(fake, b) == b, (unit, n, b)
            if b > unit:
                assert b // 2 < max(n, 1) or b // 2 % unit, (unit, n, b)


def test_warmup_precompiles_buckets(trained):
    """warmup() touches every bucketed shape up to max_batch; later
    requests of any size <= max_batch hit compiled programs (asserted via
    jit cache-miss counters) and predictions are unchanged."""
    jtu = pytest.importorskip("jax._src.test_util")
    if not hasattr(jtu, "count_jit_tracing_cache_miss"):
        pytest.skip("jax test_util no longer exposes the cache-miss "
                    "counter (private API)")

    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    pred = OpenSetPredictor(ckpt, n_classes=3, variant="tiny",
                            image_size=32)
    assert pred.warmup(max_batch=8) is pred
    images = np.random.default_rng(4).integers(
        0, 256, (6, 32, 32, 3), np.uint8)
    with jtu.count_jit_tracing_cache_miss() as misses:
        c, s = pred.predict(images)       # pads to bucket 8: warmed
        c2, s2 = pred.predict(images[:3])  # bucket 4: warmed
    assert misses() == 0, "warmed bucket still recompiled"
    assert c.shape == (6,) and np.all((s > 0) & (s <= 1))
    np.testing.assert_array_equal(c[:3], c2)
    np.testing.assert_allclose(s[:3], s2, rtol=1e-6)


def test_predict_cli_edge_cases(trained, tmp_path):
    """Missing listing entries fail up front with a clear error; comma
    paths are csv-quoted; an empty match still writes a header-only CSV
    with rc 0."""
    import csv

    from PIL import Image

    from openset_imagenet_tpu.script.predict import collect_paths, main

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"

    # A listing with a typo'd path fails at collection, not mid-decode.
    listing = tmp_path / "bad.csv"
    listing.write_text("no/such/image.png,0\n")
    with pytest.raises(FileNotFoundError, match="no such image"):
        collect_paths([str(listing)], tmp_path)

    # Comma in the filename: the row still parses back to three fields.
    rng = np.random.default_rng(5)
    comma = tmp_path / "beach, day.jpg"
    Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                 np.uint8)).save(comma)
    out = tmp_path / "comma.csv"
    assert main([str(ckpt), "3", str(comma), "--model-variant", "tiny",
                 "--image-size", "32", "-o", str(out)]) == 0
    rows = list(csv.reader(out.open()))
    assert rows[0] == ["path", "prediction", "score"]
    assert len(rows) == 2 and len(rows[1]) == 3
    assert rows[1][0] == str(comma)

    # Empty match: rc 0 AND a well-formed header-only output file.
    empty = tmp_path / "empty"
    empty.mkdir()
    out2 = tmp_path / "none.csv"
    assert main([str(ckpt), "3", str(empty), "--model-variant", "tiny",
                 "--image-size", "32", "-o", str(out2)]) == 0
    assert out2.read_text() == "path,prediction,score\n"


def test_wrong_n_classes_fails_at_load(trained):
    """A checkpoint/model shape mismatch (wrong n_classes or variant)
    raises a clear ValueError at LOAD time — not a ScopeParamShapeError
    at the first forward pass."""
    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    with pytest.raises(ValueError, match="n_classes"):
        OpenSetPredictor(ckpt, n_classes=7, variant="tiny", image_size=32)


def test_predict_cli_serves_torch_checkpoint(trained, tmp_path):
    """The CLI's checkpoint argument accepts the reference's torch .pth
    format (auto-converted): identical predictions to the native file."""
    import optax
    from PIL import Image

    import jax

    from openset_imagenet_tpu.checkpoint import load_checkpoint
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.convert import save_reference_checkpoint
    from openset_imagenet_tpu.script.predict import main

    root, cfg = trained
    native = cfg.output_directory / "entropic_best.pth"
    model = engine.build_model(
        NameSpace({"model": {"variant": "tiny"}, "seed": 0, "data": {}}), 3)
    state = engine.create_state(model, jax.random.PRNGKey(0),
                                optax.identity(), image_size=32)
    state, _, _ = load_checkpoint(native, state, restore_opt=False)
    torch_path = tmp_path / "exported_reference.pth"
    save_reference_checkpoint(torch_path, state, epoch=1, best_score=0.5)

    rng = np.random.default_rng(6)
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                     np.uint8)).save(imgs / f"t{i}.png")
    out_a, out_b = tmp_path / "native.csv", tmp_path / "torch.csv"
    base = ["3", str(imgs), "--model-variant", "tiny",
            "--image-size", "32"]
    assert main([str(native)] + base + ["-o", str(out_a)]) == 0
    assert main([str(torch_path)] + base + ["-o", str(out_b)]) == 0
    rows_a = [l.rsplit(",", 2) for l in
              out_a.read_text().strip().splitlines()[1:]]
    rows_b = [l.rsplit(",", 2) for l in
              out_b.read_text().strip().splitlines()[1:]]
    assert [r[1] for r in rows_a] == [r[1] for r in rows_b]
    for (_, _, sa), (_, _, sb) in zip(rows_a, rows_b):
        assert abs(float(sa) - float(sb)) < 1e-5


def test_infer_n_classes_both_formats(trained, tmp_path):
    """'auto' geometry for raw checkpoints: the logits-head width reads
    back from native msgpack AND reference-torch files; non-checkpoints
    fail with a clear error."""
    import optax

    import jax

    from openset_imagenet_tpu.checkpoint import (infer_n_classes,
                                                 load_checkpoint)
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.convert import save_reference_checkpoint
    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, cfg = trained
    native = cfg.output_directory / "entropic_best.pth"
    assert infer_n_classes(native) == 3

    model = engine.build_model(
        NameSpace({"model": {"variant": "tiny"}, "seed": 0, "data": {}}), 3)
    state = engine.create_state(model, jax.random.PRNGKey(0),
                                optax.identity(), image_size=32)
    state, _, _ = load_checkpoint(native, state, restore_opt=False)
    torch_path = tmp_path / "ref.pth"
    save_reference_checkpoint(torch_path, state, epoch=1, best_score=0.5)
    assert infer_n_classes(torch_path) == 3

    junk = tmp_path / "junk.pth"
    junk.write_bytes(b"not a checkpoint")
    with pytest.raises(ValueError, match="infer n_classes"):
        infer_n_classes(junk)

    # The predictor path: n_classes=None resolves from the checkpoint.
    pred = OpenSetPredictor(native, variant="tiny", image_size=32)
    assert pred.n_classes == 3


def test_mesh_predictor_matches_single_device(trained):
    """Data-parallel serving: an 8-device mesh predictor returns the same
    classes/scores as the single-device one, including on a ragged batch
    that must pad up to a multiple of the device count."""
    from openset_imagenet_tpu.inference import OpenSetPredictor
    from openset_imagenet_tpu.parallel.mesh import make_mesh

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    single = OpenSetPredictor(ckpt, n_classes=3, variant="tiny",
                              image_size=32, threshold=0.2)
    sharded = OpenSetPredictor(ckpt, n_classes=3, variant="tiny",
                               image_size=32, threshold=0.2,
                               mesh=make_mesh(num_devices=8))
    # 11 rows: not divisible by 8, so the mesh path pads to 16 (= 8 * 2).
    images = np.random.default_rng(3).integers(
        0, 256, (11, 32, 32, 3), np.uint8)
    c1, s1 = single.predict(images)
    c2, s2 = sharded.predict(images)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)

    # Fewer rows than devices still shards (pads to one row per device).
    c3, s3 = sharded.predict(images[:3])
    np.testing.assert_array_equal(c1[:3], c3)
    np.testing.assert_allclose(s1[:3], s3, rtol=1e-5, atol=1e-6)


def test_sigterm_stops_after_epoch(trained, tmp_path):
    """SIGTERM mid-run: the loop exits after the current epoch cleanly."""
    root, _ = trained
    cfg = tiny_cfg(root, "entropic", epochs=50)
    cfg.output_directory = tmp_path / "preempt"

    # Deliver SIGTERM to ourselves shortly after training starts.
    timer = threading.Timer(3.0, lambda: os.kill(os.getpid(),
                                                 signal.SIGTERM))
    timer.start()
    try:
        info = engine.worker(cfg)
    finally:
        timer.cancel()
    # Far fewer than 50 epochs ran; the run finished cleanly with a _curr
    # checkpoint for resume.
    assert info["last_epoch"] < 49
    assert (tmp_path / "preempt" / "entropic_curr.pth").exists()
    log_text = (tmp_path / "preempt" / "training.log").read_text()
    assert "shutdown requested" in log_text


def test_predict_cli_end_to_end(trained, tmp_path):
    """predict_imagenet CLI: files + a directory + a CSV listing in, a
    predictions CSV out; threshold rejection labels -1."""
    from PIL import Image

    from openset_imagenet_tpu.script.predict import main

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    rng = np.random.default_rng(7)
    img_dir = tmp_path / "imgs" / "sub"
    img_dir.mkdir(parents=True)
    for i in range(3):
        arr = rng.integers(0, 256, (32, 32, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")
    single = tmp_path / "one.jpg"
    Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                 np.uint8)).save(single)
    listing = tmp_path / "list.csv"
    listing.write_text("imgs/sub/im0.png,0\nimgs/sub/im1.png,-1\n")

    out = tmp_path / "pred.csv"
    rc = main([str(ckpt), "3", str(tmp_path / "imgs"), str(single),
               str(listing), "--imagenet-directory", str(tmp_path),
               "--model-variant", "tiny", "--image-size", "32",
               "--batch-size", "4", "-o", str(out)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "path,prediction,score"
    assert len(lines) == 1 + 3 + 1 + 2  # dir + file + listing rows
    for line in lines[1:]:
        path, pred, score = line.rsplit(",", 2)
        assert 0 <= int(pred) < 3
        assert 0.0 < float(score) <= 1.0

    # Impossible threshold: everything rejected as -1.
    out2 = tmp_path / "rej.csv"
    rc = main([str(ckpt), "3", str(single), "--threshold", "1.1",
               "--model-variant", "tiny", "--image-size", "32",
               "-o", str(out2)])
    assert rc == 0
    assert out2.read_text().strip().splitlines()[1].rsplit(
        ",", 2)[1] == "-1"


def test_predict_cli_no_stream_matches_default(trained, tmp_path):
    """--no-stream (serial chunk loop) writes the identical CSV to the
    default pipelined path."""
    from PIL import Image

    from openset_imagenet_tpu.script.predict import main

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    rng = np.random.default_rng(13)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(5):
        arr = rng.integers(0, 256, (32, 32, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")

    outs = {}
    for flag in ((), ("--no-stream",)):
        out = tmp_path / f"pred{'_serial' if flag else ''}.csv"
        rc = main([str(ckpt), "3", str(img_dir),
                   "--model-variant", "tiny", "--image-size", "32",
                   "--batch-size", "2", "-o", str(out), *flag])
        assert rc == 0
        outs[bool(flag)] = out.read_text()
    assert outs[False] == outs[True]
    assert len(outs[False].strip().splitlines()) == 6


def test_predict_cli_features_output(trained, tmp_path):
    """--features-output saves paths/features/scores aligned with the
    predictions CSV; full softmax rows sum to 1 (background included)."""
    from PIL import Image

    from openset_imagenet_tpu.script.predict import main

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    rng = np.random.default_rng(21)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(5):
        Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                     np.uint8)).save(img_dir / f"i{i}.png")
    out = tmp_path / "pred.csv"
    npz = tmp_path / "arrays.npz"
    rc = main([str(ckpt), "3", str(img_dir), "--model-variant", "tiny",
               "--image-size", "32", "--batch-size", "2",
               "-o", str(out), "--features-output", str(npz)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()[1:]
    with np.load(npz) as arr:
        assert list(arr["paths"]) == [l.rsplit(",", 2)[0] for l in lines]
        assert arr["features"].shape == (5, 3)
        assert arr["scores"].shape == (5, 3)
        np.testing.assert_allclose(arr["scores"].sum(-1), 1.0, atol=1e-4)
        # CSV prediction/score reconstruct from the saved full arrays.
        preds = arr["scores"].argmax(-1)
        assert [int(l.rsplit(",", 2)[1]) for l in lines] == list(preds)


def test_predict_stream_matches_serial_predict(trained):
    """predict_stream (pipelined) is bitwise-identical to per-chunk
    predict() calls and yields chunks in input order."""
    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    pred = OpenSetPredictor(ckpt, n_classes=3, variant="tiny",
                            image_size=32, threshold=0.4)

    rng = np.random.default_rng(7)
    images = rng.integers(0, 256, (11, 32, 32, 3), np.uint8)
    tokens = list(range(11))
    pred._load_images = lambda chunk: (
        chunk if isinstance(chunk, np.ndarray)
        else images[np.asarray(chunk)])

    batch = 4
    got_chunks, got_cls, got_scores = [], [], []
    for chunk, cls, scores in pred.predict_stream(tokens, batch_size=batch):
        got_chunks.append(chunk)
        got_cls.append(cls)
        got_scores.append(scores)
    assert got_chunks == [tokens[i:i + batch]
                          for i in range(0, len(tokens), batch)]
    for i, (cls, scores) in enumerate(zip(got_cls, got_scores)):
        ref_cls, ref_scores = pred.predict(images[i * batch:(i + 1) * batch])
        np.testing.assert_array_equal(cls, ref_cls)
        np.testing.assert_array_equal(scores, ref_scores)


def test_predict_stream_decodes_ahead(trained):
    """The producer thread decodes ahead of the consumer (the whole point
    of the pipeline): while the consumer sits on the first chunk, later
    chunks must already be decoding."""
    import time

    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    pred = OpenSetPredictor(ckpt, n_classes=3, variant="tiny", image_size=32)

    rng = np.random.default_rng(9)
    images = rng.integers(0, 256, (12, 32, 32, 3), np.uint8)
    decoded = []

    def loader(chunk):
        decoded.append(list(chunk))
        return images[np.asarray(chunk)]

    pred._load_images = loader
    stream = pred.predict_stream(list(range(12)), batch_size=4, prefetch=2)
    next(stream)
    deadline = time.monotonic() + 10.0
    # Consumer holds the first result; the producer should decode ahead
    # (prefetch=2 queue + the one being built) without further pulls.
    while len(decoded) < 2 and time.monotonic() < deadline:
        time.sleep(0.02)
    assert len(decoded) >= 2, f"no decode-ahead observed: {decoded}"
    stream.close()


def test_predict_stream_propagates_decode_errors(trained):
    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    pred = OpenSetPredictor(ckpt, n_classes=3, variant="tiny", image_size=32)

    def loader(chunk):
        raise OSError("corrupt image in chunk")

    pred._load_images = loader
    with pytest.raises(OSError, match="corrupt image"):
        list(pred.predict_stream([1, 2, 3], batch_size=2))


def test_predict_stream_yields_pending_chunk_before_decode_error(trained):
    """A decode failure in chunk k+1 must not discard chunk k's already-
    dispatched results: the serial loop it replaced delivered every row
    that preceded the bad input, and the per-chunk-flushing CLI relies
    on that (rows 0..k stay in the CSV)."""
    from openset_imagenet_tpu.inference import OpenSetPredictor

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    pred = OpenSetPredictor(ckpt, n_classes=3, variant="tiny", image_size=32)

    rng = np.random.default_rng(11)
    images = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)

    def loader(chunk):
        if isinstance(chunk, np.ndarray):    # predict() reference path
            return chunk
        if 4 in chunk:
            raise OSError("corrupt image in chunk")
        return images[np.asarray(chunk)]

    pred._load_images = loader
    got = []
    with pytest.raises(OSError, match="corrupt image"):
        for item in pred.predict_stream([0, 1, 2, 3, 4, 5], batch_size=2):
            got.append(item)
    # Chunks [0,1] and [2,3] decode fine; [4,5] raises.  Both good chunks
    # must have been yielded, with values identical to predict().
    assert [g[0] for g in got] == [[0, 1], [2, 3]]
    for i, (chunk, cls, scores) in enumerate(got):
        ref_cls, ref_scores = pred.predict(images[2 * i:2 * i + 2])
        np.testing.assert_array_equal(cls, ref_cls)
        np.testing.assert_array_equal(scores, ref_scores)


def test_listing_roundtrip_of_predictions_csv(trained, tmp_path):
    """A predictions CSV (with csv-quoted comma paths and a header row)
    parses back as an input listing: the CLI's own output is a valid
    input (ADVICE round 3)."""
    import csv

    from PIL import Image

    from openset_imagenet_tpu.script.predict import collect_paths, main

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"

    rng = np.random.default_rng(11)
    comma = tmp_path / "city, night.jpg"
    plain = tmp_path / "plain.jpg"
    for p in (comma, plain):
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), np.uint8)).save(p)

    out = tmp_path / "preds.csv"
    assert main([str(ckpt), "3", str(comma), str(plain), "--model-variant",
                 "tiny", "--image-size", "32", "-o", str(out)]) == 0

    # Round-trip: feed the predictions CSV back as the listing.
    paths = collect_paths([str(out)], tmp_path)
    assert paths == [str(comma), str(plain)]

    # And the full CLI accepts it too.
    out2 = tmp_path / "preds2.csv"
    assert main([str(ckpt), "3", str(out), "--model-variant", "tiny",
                 "--image-size", "32", "-o", str(out2)]) == 0
    rows = list(csv.reader(out2.open()))
    assert [r[0] for r in rows[1:]] == [str(comma), str(plain)]


def test_predict_cli_threshold_at_fpr_calibration(trained, tmp_path):
    """--threshold-at-fpr derives the rejection threshold from an
    evaluate_imagenet arrays npz (serving extension: the CCR@FPR view
    operationalized for deployment)."""
    from PIL import Image

    from openset_imagenet_tpu.script.predict import get_args, main

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    rng = np.random.default_rng(17)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        arr = rng.integers(0, 256, (32, 32, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.png")

    # Calibration arrays in the evaluate output format: 3 knowns + 4
    # negatives whose max-softmax measures include 1.0 (>= any real
    # image's measure).
    gt = np.array([0, 1, 2, -1, -1, -1, -2])
    scores = np.full((7, 3), 0.05, np.float32)
    scores[np.arange(7), [0, 1, 2, 0, 1, 2, 0]] = \
        [0.9, 0.9, 0.9, 1.0, 0.5, 0.4, 0.3]
    features = rng.normal(size=(7, 8)).astype(np.float32)
    arr_path = tmp_path / "entropic_val_arr.npz"
    np.savez(arr_path, gt=gt, logits=scores, features=features,
             scores=scores)

    def run(fpr):
        out = tmp_path / f"pred_{fpr}.csv"
        rc = main([str(ckpt), "3", str(img_dir), "--model-variant", "tiny",
                   "--image-size", "32", "--threshold-at-fpr", str(fpr),
                   "--calibrate", str(arr_path), "-o", str(out)])
        assert rc == 0
        return [line.rsplit(",", 2)[1]
                for line in out.read_text().strip().splitlines()[1:]]

    # FPR 0: threshold just above the calibration max (1.0) -> every
    # image rejected.  FPR 1: threshold 0 -> nothing rejected.
    assert run(0.0) == ["-1"] * 4
    assert all(p != "-1" for p in run(1.0))

    # Arg contract: --threshold-at-fpr needs --calibrate; both threshold
    # flags together are an error; --calibrate alone is an error.
    for argv in (["c.pth", "3", "x", "--threshold-at-fpr", "0.1"],
                 ["c.pth", "3", "x", "--threshold-at-fpr", "0.1",
                  "--calibrate", str(arr_path), "--threshold", "0.5"],
                 ["c.pth", "3", "x", "--calibrate", str(arr_path)]):
        with pytest.raises(SystemExit):
            get_args(argv)

    # No unknown rows in the calibration arrays -> a clear error.
    np.savez(tmp_path / "kn_only.npz", gt=gt[:3], logits=scores[:3],
             features=features[:3], scores=scores[:3])
    with pytest.raises(ValueError, match="no negative/unknown"):
        main([str(ckpt), "3", str(img_dir), "--model-variant", "tiny",
              "--image-size", "32", "--threshold-at-fpr", "0.1",
              "--calibrate", str(tmp_path / "kn_only.npz")])


def test_calibrate_threshold_mode_and_background_branches(tmp_path):
    """calibrate_threshold computes the PREDICTOR'S measure: the garbage
    background column is excluded from the max, and objectosphere mode
    multiplies by the feature norm — each branch locked by a
    hand-computed threshold."""
    from openset_imagenet_tpu.script.predict import calibrate_threshold

    gt = np.array([0, 1, -1, -1, -1, -1])
    # K=2 known cols + 1 background col.  For the unknowns, the bg column
    # holds the global max — only the :-1 slice gives known-region
    # measures [0.6, 0.5, 0.4, 0.3].
    scores = np.array([
        [0.8, 0.1, 0.1],
        [0.1, 0.8, 0.1],
        [0.6, 0.1, 0.9],
        [0.5, 0.2, 0.9],
        [0.1, 0.4, 0.9],
        [0.3, 0.2, 0.9],
    ], np.float32)
    features = np.zeros((6, 4), np.float32)
    features[:, 0] = [1.0, 1.0, 1.0, 2.0, 1.0, 1.0]  # norms
    path = tmp_path / "arr.npz"
    np.savez(path, gt=gt, logits=scores, features=features, scores=scores)

    # softmax + background: unknown measures [0.6, 0.5, 0.4, 0.3];
    # FPR 0.25 allows 1 -> threshold just above 0.5.
    t = calibrate_threshold(path, 0.25, "softmax", True)
    assert 0.5 < t <= np.nextafter(np.float32(0.5), np.float32(np.inf))
    # WITHOUT the background slice the unknown measures were all 0.9 and
    # the threshold would sit above 0.9 — locked apart.
    assert t < 0.9

    # objectosphere + background: measures scale by the feature norm ->
    # [0.6, 1.0, 0.4, 0.3]; FPR 0.25 allows 1 -> just above 0.6.
    t_os = calibrate_threshold(path, 0.25, "objectosphere", True)
    assert 0.6 < t_os <= np.nextafter(np.float32(0.6), np.float32(np.inf))

    # softmax WITHOUT background (entropic/softmax arrays): full-row max
    # [0.9, 0.9, 0.9, 0.9]; FPR 0 -> above 0.9.
    t_nb = calibrate_threshold(path, 0.0, "softmax", False)
    assert t_nb > 0.9


def test_mesh_predictor_int8_matches_single_device(trained):
    """The quantized serving graph shards over a mesh like the bf16 one
    (replicated int8 weights, batch-sharded forward, no collectives)."""
    from openset_imagenet_tpu.inference import OpenSetPredictor
    from openset_imagenet_tpu.parallel.mesh import make_mesh

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    calib = np.random.default_rng(4).integers(
        0, 256, (8, 32, 32, 3), np.uint8)
    single = OpenSetPredictor(ckpt, n_classes=3, variant="tiny",
                              image_size=32, optimize="int8",
                              calibration=calib)
    sharded = OpenSetPredictor(ckpt, n_classes=3, variant="tiny",
                               image_size=32, optimize="int8",
                               calibration=calib,
                               mesh=make_mesh(num_devices=8))
    images = np.random.default_rng(5).integers(
        0, 256, (11, 32, 32, 3), np.uint8)
    c1, s1 = single.predict(images)
    c2, s2 = sharded.predict(images)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)


def test_predict_cli_compile_cache(trained, tmp_path):
    """--compile-cache routes the serving compiles into a persistent XLA
    cache (entries on disk after one run); --no-compile-cache with an
    explicit directory is a contradiction the parser rejects."""
    import jax
    from PIL import Image

    from openset_imagenet_tpu.script.predict import get_args, main

    root, cfg = trained
    ckpt = cfg.output_directory / "entropic_best.pth"
    img = tmp_path / "in.png"
    Image.fromarray(np.random.default_rng(7).integers(
        0, 256, (32, 32, 3), np.uint8)).save(img)

    with pytest.raises(SystemExit):
        get_args([str(ckpt), "3", str(img), "--compile-cache", "x",
                  "--no-compile-cache"])

    before = jax.config.jax_compilation_cache_dir
    cache = tmp_path / "xla-cache"
    try:
        out = tmp_path / "out.csv"
        assert main([str(ckpt), "3", str(img), "--model-variant", "tiny",
                     "--image-size", "32", "-o", str(out),
                     "--compile-cache", str(cache)]) == 0
        assert out.read_text().count("\n") == 2
        # The forward's compile landed in the cache directory.
        assert any(cache.iterdir()), "no persistent cache entries written"
    finally:
        # Re-point AND reset the cache singleton back to the suite's
        # directory (the helper does both) — plain config restoration
        # would leave later compiles writing into this deleted tmp dir.
        from openset_imagenet_tpu.util import enable_compilation_cache
        enable_compilation_cache(before)
