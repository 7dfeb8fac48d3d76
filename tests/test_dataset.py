"""Dataset index + label surgery tests (parity: reference dataset.py:10-86)."""

import numpy as np
import pandas as pd
import pytest

from openset_imagenet_tpu.dataset import ImagenetDataset


@pytest.fixture
def csv_file(tmp_path):
    rows = [
        ("train/n001/a.JPEG", 0),
        ("train/n001/b.JPEG", 0),
        ("train/n002/c.JPEG", 1),
        ("train/n002/d.JPEG", 1),
        ("train/n002/e.JPEG", 1),
        ("train/n003/f.JPEG", -1),
        ("train/n003/g.JPEG", -1),
        ("train/n004/h.JPEG", -1),
    ]
    f = tmp_path / "p1_train.csv"
    pd.DataFrame(rows).to_csv(f, header=False, index=False)
    return f


def test_basic_properties(csv_file, tmp_path):
    ds = ImagenetDataset(csv_file, tmp_path)
    assert len(ds) == 8
    assert ds.label_count == 3  # {-1, 0, 1}
    assert list(ds.unique_classes) == [-1, 0, 1]
    assert ds.has_negatives()
    assert ds.labels.dtype == np.int32
    assert ds.paths[0] == "train/n001/a.JPEG"
    assert str(ds.absolute_path(0)).endswith("train/n001/a.JPEG")


def test_replace_negative_label(csv_file, tmp_path):
    """Garbage regime: -1 -> label_count - 1 == 2 (reference dataset.py:60-68)."""
    ds = ImagenetDataset(csv_file, tmp_path)
    ds.replace_negative_label()
    assert list(ds.unique_classes) == [0, 1, 2]
    assert (ds.labels >= 0).all()
    assert (ds.labels == 2).sum() == 3
    assert ds.label_count == 3


def test_remove_negative_label(csv_file, tmp_path):
    """Softmax regime: drop rows with label < 0 (reference dataset.py:70-74)."""
    ds = ImagenetDataset(csv_file, tmp_path)
    ds.remove_negative_label()
    assert len(ds) == 5
    assert list(ds.unique_classes) == [0, 1]
    assert ds.label_count == 2
    assert not ds.has_negatives()


def test_calculate_class_weights(csv_file, tmp_path):
    """w_c = len(ds) / (count_c * label_count) (reference dataset.py:77-86)."""
    ds = ImagenetDataset(csv_file, tmp_path)
    ds.replace_negative_label()
    w = ds.calculate_class_weights()
    # counts by ascending label: [2, 3, 3], len=8, C=3
    np.testing.assert_allclose(w, [8 / 6, 8 / 9, 8 / 9], rtol=1e-6)


def test_entropic_n_classes_rule(csv_file, tmp_path):
    """Entropic: n_classes = label_count - 1 (reference train.py:331-336)."""
    ds = ImagenetDataset(csv_file, tmp_path)
    assert ds.label_count - 1 == 2  # two known classes
