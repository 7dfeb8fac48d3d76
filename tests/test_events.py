"""Scalar-record tests: tensorboard events + CSV sidecar round trip."""

from openset_imagenet_tpu.events import SummaryWriter, read_scalars


def test_write_and_read_back(tmp_path):
    w = SummaryWriter(tmp_path, filename_suffix="-entropic.log")
    for epoch in range(3):
        w.add_scalar("train/loss", 2.0 - epoch * 0.5, epoch)
        w.add_scalar("val/conf_kn", 0.1 * epoch, epoch)
    w.close()

    # Event files exist with the discovery-suffix naming the plot layer
    # globs for (events* + '-{log_name}').
    evs = list(tmp_path.glob("events*-entropic.log"))
    assert evs, list(tmp_path.iterdir())

    data = read_scalars(tmp_path, suffix_filter="-entropic.log")
    assert data["train/loss"] == [(0, 2.0), (1, 1.5), (2, 1.0)]
    assert [s for s, _ in data["val/conf_kn"]] == [0, 1, 2]


def test_csv_sidecar_fallback(tmp_path):
    w = SummaryWriter(tmp_path, filename_suffix="-softmax.log")
    w.add_scalar("val/loss", 1.25, 7)
    w.close()
    # Remove the event files; the CSV sidecar still serves reads.
    for p in tmp_path.glob("events*"):
        p.unlink()
    data = read_scalars(tmp_path, suffix_filter="-softmax.log")
    assert data["val/loss"] == [(7, 1.25)]


def test_suffix_filter_separates_runs(tmp_path):
    for loss in ("a", "b"):
        w = SummaryWriter(tmp_path, filename_suffix=f"-{loss}.log")
        w.add_scalar("val/loss", float(ord(loss)), 0)
        w.close()
    a = read_scalars(tmp_path, suffix_filter="-a.log")
    assert a["val/loss"] == [(0, float(ord("a")))]
