"""util module: dataset_info, read_array_list, get_histogram."""

import numpy as np
import pandas as pd
import pytest

from openset_imagenet_tpu import util


def test_dataset_info(tmp_path):
    for name, labels in (("train", [0, 1, -1, -1]),
                         ("validation", [0, -1]),
                         ("test", [0, 1, -1, -2])):
        pd.DataFrame({0: [f"a/{i}.jpg" for i in range(len(labels))],
                      1: labels}).to_csv(tmp_path / f"{name}.csv",
                                         header=False, index=False)
    table = util.dataset_info(tmp_path)
    assert list(table["split"]) == ["train", "val", "test"]
    test_row = next(r for r in table.rows if r["split"] == "test")
    assert test_row["size"] == 4
    assert test_row["kn size"] == 2
    assert test_row["kn_unk size"] == 1
    assert test_row["unk_unk size"] == 1
    # Readable render without pandas: header + one line per split.
    rendered = str(table)
    assert rendered.splitlines()[0].lstrip().startswith("split")
    assert len(rendered.splitlines()) == 4


def test_read_array_list(tmp_path):
    np.savez(tmp_path / "entropic_test_arr_curr.npz", gt=np.arange(3))
    # dict form
    arrays = util.read_array_list({"e": tmp_path / "entropic_test_arr_curr.npz"})
    assert list(arrays["e"]["gt"]) == [0, 1, 2]
    # list form: name = filename minus trailing 8 chars ("curr.npz")
    arrays = util.read_array_list([str(tmp_path / "entropic_test_arr_curr.npz")])
    assert "entropic_test_arr_" in arrays


def test_get_best_arrays():
    out = util.get_best_arrays({"a": "x/entropic_curr_arr.npz"})
    assert str(out["a"]).endswith("entropic_best_arr.npz")


def test_get_histogram_score_and_norm():
    gt = np.array([0, 1, -1, -1])
    scores = np.array([[0.9, 0.1], [0.3, 0.7], [0.6, 0.4], [0.5, 0.5]])
    feats = np.array([[3.0, 4.0]] * 4)
    arr = {"gt": gt, "scores": scores, "features": feats}
    kn_hist, kn_edges, unk_hist, unk_edges = util.get_histogram(
        arr, unk_label=-1, metric="score", bins=10)
    assert kn_hist.sum() == 2 and unk_hist.sum() == 2
    kn_hist, *_ = util.get_histogram(arr, metric="norm", bins=5)
    assert kn_hist.sum() == 2
    with pytest.raises(ValueError):
        util.get_histogram(arr, metric="nope")


def test_get_histogram_drop_bg():
    gt = np.array([0, -1])
    scores = np.array([[0.2, 0.3, 0.5], [0.1, 0.2, 0.7]])
    feats = np.zeros((2, 2))
    arr = {"gt": gt, "scores": scores, "features": feats}
    def unk_mass_center(drop_bg):
        _, _, unk_hist, unk_edges = util.get_histogram(
            arr, unk_label=-1, bins=4, drop_bg=drop_bg)
        i = int(np.argmax(unk_hist))
        return (unk_edges[i] + unk_edges[i + 1]) / 2

    # BG column dropped: unknown max score is 0.2 instead of 0.7.
    assert abs(unk_mass_center(True) - 0.2) < 0.15
    assert abs(unk_mass_center(False) - 0.7) < 0.15


def test_plot_helpers_lazy_export():
    assert callable(util.plot_oscr)
    with pytest.raises(AttributeError):
        util.nonexistent_helper

def test_enable_compilation_cache_points_xla_at_dir(tmp_path):
    """The shared cache switch expands ~, creates the directory, zeroes
    the write thresholds, and restores cleanly (global jax config)."""
    import jax

    before = (jax.config.jax_compilation_cache_dir,
              jax.config.jax_persistent_cache_min_entry_size_bytes,
              jax.config.jax_persistent_cache_min_compile_time_secs)
    try:
        target = tmp_path / "deep" / "xla"
        out = util.enable_compilation_cache(target)
        assert out == target and target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == 0
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0
    finally:
        jax.config.update("jax_compilation_cache_dir", before[0])
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          before[1])
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          before[2])


def test_enable_compilation_cache_uncreatable_dir_disables_not_crashes(
        tmp_path):
    """The cache is default-on for the serving CLIs, so an uncreatable
    directory (read-only HOME in a container) must degrade to no-cache
    with a warning, not a startup traceback."""
    import logging

    import jax

    # A regular file as the parent makes mkdir raise for every uid
    # (chmod-based denial is invisible to root, which CI runs as).
    blocker = tmp_path / "blocker"
    blocker.write_text("not a directory")
    before = jax.config.jax_compilation_cache_dir
    # Capture on the module logger itself: configure_logger (run by
    # earlier CLI tests in a full-suite order) stops propagation at the
    # package logger, so caplog's root handler would miss the record.
    records = []
    handler = logging.Handler()
    handler.emit = records.append
    lg = logging.getLogger("openset_imagenet_tpu.util")
    lg.addHandler(handler)
    try:
        out = util.enable_compilation_cache(blocker / "xla")
        assert out is None
        # XLA was never pointed at the unusable directory.
        assert jax.config.jax_compilation_cache_dir == before
        assert any("compilation cache disabled" in r.getMessage()
                   for r in records)
    finally:
        lg.removeHandler(handler)
        jax.config.update("jax_compilation_cache_dir", before)
